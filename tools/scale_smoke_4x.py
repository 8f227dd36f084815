"""4x scale smoke for the round-4 operator batch (round-4 VERDICT #7,
the round-3 20k-doc discipline applied to the newcomers): time
bm25_search, dup_rate_by_source, window_funnel and ann_ivf_pq at sf0.1
and at a 4x-replicated copy (re-keyed ids), and report seconds plus
the per-unit-data ratio (t_4x / t_1x / 4). A ratio near 1 means linear
scaling; the round bar is <= 3 (sub-linear fixed costs amortize, but
any super-linear blow-up must be root-caused). Results are recorded in
BASELINE.md."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pandas as pd
import pyarrow.parquet as pq
import ray

SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/pgstosrt_scale4x"
REP = 4


def build_4x() -> str:
    marker = os.path.join(DST, "_SUCCESS")
    if os.path.exists(marker):
        return DST
    os.makedirs(DST, exist_ok=True)
    for table, keys in (("documents", ["doc_id"]),
                        ("events", ["event_id", "user_id"]),
                        ("embeddings", ["vec_id"])):
        t = pq.read_table(f"{SRC}/{table}.parquet").to_pandas()
        reps = []
        for i in range(REP):
            df = t.copy()
            for k in keys:
                df[k] = df[k] + i * 10_000_000
            reps.append(df)
        pd.concat(reps, ignore_index=True).to_parquet(
            f"{DST}/{table}.parquet")
    with open(marker, "w") as f:
        f.write("ok")
    return DST


def consume(res) -> int:
    if hasattr(res, "to_arrow_refs"):
        import pyarrow as pa
        tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
        return sum(t.num_rows for t in tabs)
    return res.num_rows if hasattr(res, "num_rows") else len(res)


def main() -> None:
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from pgstosrt_ray.pipelines import similarity, webops
    queries = {
        "bm25_search": webops.q_bm25_search,
        "dup_rate_by_source": webops.q_dup_rate_by_source,
        "window_funnel": webops.q_window_funnel,
        "ann_ivf_pq": similarity.ivf_pq_topk,
        # round-5 newcomers under the same discipline
        "idf_table": webops.q_idf_table,
        "bigram_pmi": webops.q_bigram_pmi,
        "perplexity_buckets": webops.q_perplexity_buckets,
    }
    dst = build_4x()
    out = {}
    for name, q in queries.items():
        t0 = time.perf_counter()
        n1 = consume(q(SRC))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        n4 = consume(q(dst))
        t4 = time.perf_counter() - t0
        out[name] = {"t_1x_s": round(t1, 2), "t_4x_s": round(t4, 2),
                     "rows_1x": n1, "rows_4x": n4,
                     "per_unit_ratio": round(t4 / t1 / REP, 3)}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
