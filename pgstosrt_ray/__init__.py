"""pgstosrt_ray — a Ray-Data-native web-scale extraction engine.

From-scratch reimplementation of the data-processing capabilities of
the reference converter (Tentacule/PgsToSrt, studied read-only at
/root/reference), generalized per BASELINE.json to a streaming
ray.data pipeline over Common-Crawl-style ``pages`` Parquet tables:
segment demux -> bitmap decode + deterministic OCR (warm actor pool) ->
per-url timestamp-ordered assembly, byte-identical per url to the
single-threaded oracle in ``oracle.py``.

Layout:
  format.py / parse.py / decode.py / glyph.py / merge.py / srt.py
      pure core (no Ray): codecs, state machine, merge, serialization
  oracle.py    single-threaded golden pipeline
  fixtures.py  deterministic corpus generator
  stages/      Ray map_batches / actor / map_groups stage UDFs
  pipelines/   end-to-end Dataset pipelines + relational operator suite
  sources/     readers / fixture materialization
  functions/   text analysis, dedup, similarity kernels
  state/       checkpoint manifests + resume
"""

__version__ = "0.1.0"
