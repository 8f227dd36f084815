"""The flagship extraction pipeline (SURVEY.md §3, Ray lifecycle).

    read_parquet(pages)                      [S1-S7: pruned columns,
       |                                      optional lang pushdown]
    map_batches(demux_batch)                 [M1-M8: stateless tasks]
       |
    map_batches(ExtractorEngine, actors)     [M9-M16 + O1: warm pool,
       |                                      decode fused with OCR]
    groupby("url").map_groups(assemble)      [the ONE shuffle: D2 merge,
       |                                      fill, A2-A3, R1, F3]
    docs (url, text, n_cues)                 [S8 sink via write_parquet]

Never calls ray.init(); callers own the session (driver contract).
"""

from __future__ import annotations

import functools

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..sources.pages import read_pages
from ..stages.assemble import assemble_bucket
from ..stages.demux import demux_batch
from ..stages.extract import ExtractorEngine


_TASK_ENGINE: dict = {}


def _task_extract(batch: pa.Table) -> pa.Table:
    """Task-mode extract: the engine is a per-worker-process singleton,
    constructed once and reused across every batch the worker sees —
    the same warm-engine amortization as the actor pool, scheduled
    elastically (no pool spin-up)."""
    eng = _TASK_ENGINE.get("engine")
    if eng is None:
        eng = _TASK_ENGINE["engine"] = ExtractorEngine()
    return eng(batch)


def _spans_of(pages_ds, cfg: PipelineConfig, demux_bs: int, extract_bs: int):
    if cfg.extract_mode == "tasks":
        cues = pages_ds.map_batches(demux_batch, batch_format="pyarrow",
                                    batch_size=demux_bs)
        return cues.map_batches(_task_extract, batch_format="pyarrow",
                                batch_size=extract_bs)
    # actor-pool mode (O1 shape for expensive engines): demux runs as
    # SEPARATE tasks (fractional num_cpus blocks fusion into the pool),
    # so page-size skew is bounded by the small demux batch and the
    # pool consumes UNIFORM cue batches regardless of cues-per-page
    cues = pages_ds.map_batches(demux_batch, batch_format="pyarrow",
                                batch_size=demux_bs,
                                num_cpus=cfg.demux_num_cpus)
    return cues.map_batches(
        ExtractorEngine, batch_format="pyarrow",
        batch_size=extract_bs,
        concurrency=cfg.concurrency(),
        num_cpus=cfg.extract_num_cpus)


def extract_docs(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """pages Dataset -> docs Dataset (url, text, n_cues). Lazy.

    Skew defense (SURVEY §4, north_star "explicit repartitioning to
    defeat payload-size skew"): rows with html larger than
    ``cfg.skew_split_bytes`` go through a small-batch lane (few rows
    per task) while the bulk lane keeps large batches; the two span
    streams union before the url groupby, which re-co-locates any url
    whose rows straddled the lanes."""
    import pyarrow.compute as pc

    if cfg.skew_split_bytes is not None:
        thr = cfg.skew_split_bytes

        def _lane(batch: pa.Table, big: bool) -> pa.Table:
            sizes = pc.binary_length(batch.column("html"))
            mask = pc.greater_equal(sizes, thr) if big \
                else pc.less(sizes, thr)
            return batch.filter(mask)

        small = pages_ds.map_batches(
            functools.partial(_lane, big=False), batch_format="pyarrow")
        big = pages_ds.map_batches(
            functools.partial(_lane, big=True), batch_format="pyarrow")
        # big lane: STATELESS tasks with tiny batches — elastic (no
        # idle actor pool when the lane is empty) and one multi-MB
        # payload never shares a batch with 63 others
        big_engine = ExtractorEngine()

        def big_extract(batch: pa.Table) -> pa.Table:
            return big_engine(demux_batch(batch))

        big_spans = big.map_batches(big_extract, batch_format="pyarrow",
                                    batch_size=cfg.skew_big_batch_size)
        spans = _spans_of(small, cfg, cfg.demux_batch_size,
                          cfg.extract_batch_size).union(big_spans)
    else:
        spans = _spans_of(pages_ds, cfg, cfg.demux_batch_size,
                          cfg.extract_batch_size)
    # shuffle on a hash bucket, not the raw url: the sort-based shuffle
    # then moves small-int keys and per-group overhead is paid per
    # bucket (B groups) instead of per url (millions at scale); the
    # same sha1(url) keying the checkpoint sink uses (state/checkpoint)
    from ..state.checkpoint import partition_of
    n_buckets = cfg.assemble_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("_bucket", pa.array(
            [partition_of(u, n_buckets)
             for u in batch.column("url").to_pylist()], pa.int32()))

    assemble = functools.partial(assemble_bucket,
                                 skip_merge=cfg.skip_merge,
                                 force_merge_all=cfg.force_merge_all)
    docs = (spans.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(assemble, batch_format="pyarrow"))
    return docs


def extract_corpus_docs(corpus: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Corpus directory -> docs Dataset."""
    return extract_docs(read_pages(corpus, lang=cfg.lang), cfg)


def docs_to_table(docs_ds) -> pa.Table:
    """Materialize a (small) docs Dataset to one url-sorted Arrow table."""
    return pa.Table.from_pandas(docs_ds.to_pandas(),
                                preserve_index=False).sort_by("url")
