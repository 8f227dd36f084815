"""Data-sized shuffle-bucket counts (round-3 verdict #1): the
bucketed map_groups family must derive its bucket count from the
input size so no task ever materializes a corpus/B frame beyond the
per-bucket byte target, at any corpus scale."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pgstosrt_ray.pipelines.reduce import (TARGET_BUCKET_DISK_BYTES,
                                           buckets_for, input_bytes,
                                           parquet_rows, shuffle_groups)


def test_buckets_for_floor_on_small_input():
    # inputs below one target bucket stay at the parallelism floor
    assert buckets_for(None) == shuffle_groups()
    assert buckets_for(0) == shuffle_groups()
    assert buckets_for(1024) == shuffle_groups()
    assert buckets_for(TARGET_BUCKET_DISK_BYTES - 1) == shuffle_groups()


def test_buckets_for_grows_with_bytes():
    t = TARGET_BUCKET_DISK_BYTES
    floor = shuffle_groups()
    assert buckets_for(1000 * t) == max(floor, 1000)
    # ceil division: a partial bucket still gets its own task
    assert buckets_for(1000 * t + 1) == max(floor, 1001)
    # 4x the input => 4x the buckets (per-bucket bytes stay constant)
    assert buckets_for(4000 * t) == 4 * buckets_for(1000 * t)


def test_buckets_for_explicit_target_and_floor():
    assert buckets_for(1 << 20, target_bytes=1 << 18, floor=2) == 4
    assert buckets_for(1 << 20, target_bytes=1 << 18, floor=16) == 16


def test_input_bytes_grows_with_replication(tmp_path):
    # the concrete scale criterion: replicating the input grows the
    # derived bucket count (a fixed B=64 would not move)
    t = pa.table({"x": pa.array(np.arange(5000), pa.int64()),
                  "pad": pa.array(["y" * 64] * 5000, pa.string())})
    p1 = os.path.join(tmp_path, "a.parquet")
    pq.write_table(t, p1)
    one = input_bytes(p1)
    assert one > 0
    p2 = os.path.join(tmp_path, "b.parquet")
    pq.write_table(t, p2)
    both = input_bytes(str(tmp_path))
    assert both == 2 * one
    target = max(one // 4, 1)
    b1 = buckets_for(one, target_bytes=target, floor=1)
    b2 = buckets_for(both, target_bytes=target, floor=1)
    assert b1 == -(-one // target) and b2 == -(-both // target)
    assert b2 > b1 > 0
    assert parquet_rows(str(tmp_path)) == 10000


def test_no_bucket_frame_beyond_target(ray_session, tmp_path):
    """Scale smoke: with a data-derived B, no map_groups task sees a
    frame materially beyond total/B (the fixed-64 family saw
    corpus/64 regardless of corpus size)."""
    from pgstosrt_ray.pipelines.relational import _by_key_bucketed

    n = 20_000
    rng = np.random.RandomState(3)
    t = pa.table({"user_id": pa.array(rng.randint(0, 997, n), pa.int64()),
                  "v": pa.array(rng.standard_normal(n))})
    path = os.path.join(tmp_path, "events.parquet")
    pq.write_table(t, path)
    import ray.data
    ds = ray.data.read_parquet(path)
    B = buckets_for(input_bytes(path), target_bytes=input_bytes(path) // 8,
                    floor=1)
    assert B == 8

    def measure(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"rows": [len(g)]})

    sizes = _by_key_bucketed(ds, "user_id", measure,
                             buckets=B).to_pandas()["rows"]
    assert len(sizes) == B
    assert sizes.sum() == n
    # hash-balanced buckets: no frame beyond ~2x the even share
    assert sizes.max() <= 2 * (n // B)


def test_queries_use_derived_buckets(monkeypatch):
    """The weak-family queries must consult buckets_for (not a
    constant): force the estimate high and observe the derived count
    flow through _by_key_bucketed."""
    import pgstosrt_ray.pipelines.relational as rel

    seen = {}
    real = rel._by_key_bucketed

    def spy(ds, key, fn, buckets=None, out_schema=None, est_bytes=None):
        seen["est_bytes"] = est_bytes
        seen["buckets"] = buckets or buckets_for(est_bytes)
        raise RuntimeError("stop before execution")

    monkeypatch.setattr(rel, "_by_key_bucketed", spy)
    monkeypatch.setattr(rel, "_read",
                        lambda sf, tbl, columns=None, **kw: None)
    monkeypatch.setattr(
        rel, "_table_bytes",
        lambda sf, tbl: 500 * TARGET_BUCKET_DISK_BYTES)
    with pytest.raises(RuntimeError):
        rel.q_top_orders_per_cust("/nonexistent")
    assert seen["est_bytes"] == 500 * TARGET_BUCKET_DISK_BYTES
    assert seen["buckets"] == max(shuffle_groups(), 500)
    assert real is not spy


def test_inverted_index_posting_cap(ray_session, tmp_path):
    """A planted stop-word above the cap emits multiple <=cap rows
    whose concatenation is the exact posting list."""
    from pgstosrt_ray.pipelines.extended import q_inverted_index

    n_docs = 40
    texts = [f"the unique{t}" for t in range(n_docs)]
    t = pa.table({"doc_id": pa.array(np.arange(n_docs), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = q_inverted_index(str(tmp_path), posting_cap=16).to_pandas()
    the = out[out["token"] == "the"].copy()
    # 40 docs at cap 16 => 3 shard rows (16 + 16 + 8)
    assert len(the) == 3
    assert (the["n_docs"] <= 16).all()
    assert int(the["n_docs"].sum()) == n_docs
    joined = sorted(int(d) for lst in the["postings"] for d in lst)
    assert joined == list(range(n_docs))
    # uncapped tokens unaffected: one row each, one doc each
    rest = out[out["token"] != "the"]
    assert len(rest) == n_docs and (rest["n_docs"] == 1).all()


def test_salted_pair_groups_grow_with_corpus(tmp_path):
    """The dedup band/cell shuffles size their salted group count from
    the corpus row count (x explode factor), not only the cluster —
    at 10^12 docs a cluster-sized-only count would hand each group
    task corpus x bands / groups rows."""
    from pgstosrt_ray.pipelines.dedupe import _salted_groups
    d = str(tmp_path)
    pd.DataFrame({"doc_id": np.arange(100, dtype="int64"),
                  "text": ["w"] * 100}).to_parquet(
        f"{d}/documents.parquet")
    small = _salted_groups(d, None, "documents", 16, 24)
    assert small == shuffle_groups()  # tiny corpus stays at the floor
    # an explicit count wins (the checkpointed flow persists its own)
    assert _salted_groups(d, 7, "documents", 16, 24) == 7
    # a corpus big enough to exceed the floor derives a larger count
    from pgstosrt_ray.pipelines.reduce import buckets_for
    rows_needed = (shuffle_groups() + 1) * TARGET_BUCKET_DISK_BYTES \
        // (16 * 24)
    assert buckets_for(est_bytes=rows_needed * 16 * 24) \
        > shuffle_groups()
