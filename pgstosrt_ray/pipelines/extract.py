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
from ..stages.assemble import assemble_url_group
from ..stages.demux import demux_batch
from ..stages.extract import ExtractorEngine


def _spans_of(pages_ds, cfg: PipelineConfig, demux_bs: int, extract_bs: int):
    cues = pages_ds.map_batches(demux_batch, batch_format="pyarrow",
                                batch_size=demux_bs)
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
    assemble = functools.partial(assemble_url_group,
                                 skip_merge=cfg.skip_merge,
                                 force_merge_all=cfg.force_merge_all)
    return spans.groupby("url").map_groups(assemble, batch_format="pyarrow")


def extract_corpus_docs(corpus: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Corpus directory -> docs Dataset."""
    return extract_docs(read_pages(corpus, lang=cfg.lang), cfg)


def docs_to_table(docs_ds) -> pa.Table:
    """Materialize a (small) docs Dataset to one sorted Arrow table."""
    tbl = pa.concat_tables([pa.Table.from_pandas(df) for df in
                            [docs_ds.to_pandas()]])
    return tbl.sort_by("url")
