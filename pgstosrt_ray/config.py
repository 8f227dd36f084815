"""Pipeline configuration (SURVEY.md §2.10: the reference's knob
surface — CLI options CommandLineOptions.cs:5-34 + the merge flags
BluRaySupParserImageSharp.cs:15-16 — re-expressed as a dataclass)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    # merge policy toggles (reference global flags :15-16)
    skip_merge: bool = False
    force_merge_all: bool = False
    # language filter (reference --tracklanguage, MkvUtilities.cs:76-96);
    # None = all languages
    lang: str | None = None
    # stage sizing — payload-heavy demux reads few rows per batch; the
    # extractor pool is the warm-engine stage (SURVEY §4)
    demux_batch_size: int = 32
    extract_batch_size: int = 64
    extract_concurrency: tuple[int, int] | int = (2, 8)
    extract_num_cpus: float = 1.0
    # partitioned-output / checkpoint layout
    num_partitions: int = 16
    # skew defense (SURVEY §4): pages whose html payload exceeds this
    # threshold are routed through a small-batch lane so one multi-MB
    # blob cannot straggle a 64-row batch; None disables the split
    skew_split_bytes: int | None = 256 * 1024
    skew_big_batch_size: int = 4

    def concurrency(self):
        c = self.extract_concurrency
        return tuple(c) if isinstance(c, (list, tuple)) else c


DEFAULT_CONFIG = PipelineConfig()
