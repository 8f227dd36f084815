"""Regression: queries must work at the DRIVER's parallelism (32
CPUs), not just the 4-CPU test session. Two bug classes hit only at
high parallelism in ray 2.49.2: (a) Arrow returns from
batch_format='pandas' map_groups break the multi-block group merge,
(b) concurrent hash-shuffle join aggregator pools can deadlock.
Runs a representative query set in a fresh 32-CPU subprocess."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
import __ray_entry__ as e
import pyarrow as pa
qs = e.queries()
SF = "/root/testdata/sf0.001"
expect_rows = {"exact_dedup_keep": 500, "window_fill": 1000,
               "sessionize": None, "minhash_pairs": None,
               "decontaminate": None, "tfidf_top_term": 500,
               "kmeans_balanced_sample": None, "bigram_pmi": None,
               "perplexity_buckets": 500}
for name in ["exact_dedup_keep", "window_fill", "sessionize",
             "minhash_pairs", "decontaminate", "tfidf_top_term",
             "kmeans_balanced_sample", "bigram_pmi",
             "perplexity_buckets"]:
    r = qs[name](SF)
    import ray.data
    if isinstance(r, ray.data.Dataset):
        n = sum(t.num_rows for t in ray.get(r.to_arrow_refs()))
    else:
        n = r.num_rows if isinstance(r, pa.Table) else len(r)
    exp = expect_rows[name]
    assert exp is None or n == exp, (name, n, exp)
    print(name, "ok", n)
ray.shutdown()
"""


def test_queries_at_driver_parallelism():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420)
    assert res.returncode == 0, (res.stdout[-1000:], res.stderr[-2000:])
    for name in ["exact_dedup_keep", "window_fill", "sessionize",
                 "minhash_pairs", "decontaminate", "tfidf_top_term",
                 "kmeans_balanced_sample", "bigram_pmi",
                 "perplexity_buckets"]:
        assert f"{name} ok" in res.stdout
