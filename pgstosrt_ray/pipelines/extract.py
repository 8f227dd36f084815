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


def extract_docs(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """pages Dataset -> docs Dataset (url, text, n_cues). Lazy."""
    cues = pages_ds.map_batches(demux_batch, batch_format="pyarrow",
                                batch_size=cfg.demux_batch_size)
    spans = cues.map_batches(
        ExtractorEngine, batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.concurrency(),
        num_cpus=cfg.extract_num_cpus)
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
