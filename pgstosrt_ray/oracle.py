"""Single-threaded reference pipeline ("the oracle", SURVEY.md §5.2).

A direct, simple reimplementation of the reference's end-to-end path
(E1 in SURVEY §3: parse -> fill -> filter -> reassemble -> merge ->
decode+OCR -> SRT) with NO Ray, generalized to multiple rows per url.
Golden outputs for the fixture corpus come from here; the Ray pipeline
must be byte-identical per url to this, under any input row order and
any parallelism (the BASELINE.json north_rule invariant).

Generalized multi-row semantics (defined here, mirrored by the Ray
assembly stage):
  1. rows of one url are ordered by (warc_ts, sha256(html)) — an
     order-independent deterministic key; rows with identical
     (warc_ts, sha256(html)) are deduplicated (keep one);
  2. each row's payload parses independently (self-contained state
     machine, parse.py);
  3. the concatenated cue list gets the reference's list passes in the
     reference's order: end-time fill -> empty filter -> fragment
     reassembly -> near-dup merge (merge.py);
  4. cues are numbered 1..n in list order, times convert ticks->ms, text
     is OCR of the decoded composition, trimmed
     (/root/reference/src/PgsToSrt/PgsOcr.cs:88-94,122);
  5. the SRT document serializes per srt.py.
"""

from __future__ import annotations

import hashlib

from .decode import DecodeMeta, cue_meta_and_text
from .merge import (cue_view_of, end_time_fill, merge_cue_runs,
                    reassemble_fragments)
from .parse import DisplaySet, parse_payload
from .srt import serialize_srt, ticks_to_ms


def row_sort_key(warc_ts: int, html: bytes) -> tuple[int, bytes]:
    """Deterministic, order-independent ordering of a url's rows."""
    return (warc_ts, hashlib.sha256(html).digest())


def prepare_url_cues(rows: list[tuple[int, bytes]],
                     skip_merge: bool = False) -> list[DisplaySet]:
    """Steps 1-3 above: rows (warc_ts, html) -> merged, filled, filtered,
    reassembled cue list for one url."""
    keyed = {}
    for warc_ts, html in rows:
        keyed[row_sort_key(warc_ts, html)] = html
    cues: list[DisplaySet] = []
    for key in sorted(keyed):
        cues.extend(parse_payload(keyed[key]))
    end_time_fill(cues)
    cues = [c for c in cues if len(c.objects) > 0]
    for c in cues:
        reassemble_fragments(c)
    views = [cue_view_of(c) for c in cues]
    meta_cache: dict[int, DecodeMeta] = {}

    def get_meta(i: int) -> DecodeMeta:
        if i not in meta_cache:
            meta_cache[i] = cue_meta_and_text(cues[i])[0]
        return meta_cache[i]

    keep = merge_cue_runs(views, get_meta, skip_merge=skip_merge)
    survivors = []
    for i in keep:
        c = cues[i]
        c.start_ticks = views[i].start_ticks
        c.end_ticks = views[i].end_ticks
        survivors.append(c)
    return survivors


def extract_url(rows: list[tuple[int, bytes]],
                skip_merge: bool = False) -> tuple[str, int]:
    """Full oracle: rows of one url -> (srt_text, n_cues). Decode+OCR
    goes through the SAME cue_meta_and_text kernel the Ray extract
    stage uses (trim included, PgsOcr.cs:122)."""
    cues = prepare_url_cues(rows, skip_merge=skip_merge)
    triples = []
    for c in cues:
        _meta, text = cue_meta_and_text(c)
        triples.append((ticks_to_ms(c.start_ticks), ticks_to_ms(c.end_ticks),
                        text))
    return serialize_srt(triples), len(triples)


def extract_corpus(urls: dict[str, list[tuple[int, bytes]]],
                   skip_merge: bool = False) -> dict[str, tuple[str, int]]:
    """Oracle over a whole corpus: url -> (srt_text, n_cues)."""
    return {url: extract_url(rows, skip_merge=skip_merge)
            for url, rows in urls.items()}


def demux_meta_rows(url: str,
                    rows: list[tuple[int, bytes]]) -> list[dict]:
    """Golden cue-level metadata for one url, mirroring the demux
    stage's per-pages-row projection (stages/demux.py + the driver's
    ``demux_cues`` view): one output row per parsed display set, in
    pages-row order, NO dedup/fill/merge; a pages row whose payload
    yields zero display sets emits one sentinel row (seq=-1) so the
    url never vanishes from downstream outputs."""
    out: list[dict] = []
    for _warc_ts, html in rows:
        sets = parse_payload(html)
        if not sets:
            out.append({"url": url, "seq": -1, "comp_num": 0,
                        "start_ticks": 0, "end_ticks": 0, "width": 0,
                        "height": 0, "n_objects": 0, "forced": False,
                        "palette_count": 0, "pos_x": 0, "pos_y": 0})
            continue
        for seq, ds in enumerate(sets):
            pos_x, pos_y = ds.position()
            out.append({"url": url, "seq": seq, "comp_num": ds.comp_num,
                        "start_ticks": ds.start_ticks,
                        "end_ticks": ds.end_ticks, "width": ds.width,
                        "height": ds.height, "n_objects": len(ds.objects),
                        "forced": ds.is_forced,
                        "palette_count": len(ds.palette_buffers),
                        "pos_x": pos_x, "pos_y": pos_y})
    return out
