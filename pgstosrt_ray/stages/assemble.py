"""Assemble stage: spans -> docs (SURVEY.md §2.5 A2-A3, §2.6 R1, §2.7 D1-D2).

Runs inside ``groupby("url").map_groups`` — the pipeline's ONE wide
shuffle. Per url: order cues by the deterministic key
(warc_ts, row_key, seq), dedupe identical rows, then apply the
reference's list passes via the SAME functions the oracle uses
(merge.end_time_fill / merge.merge_cue_runs — byte-identity by
construction), then number cues 1..n and serialize SRT (srt.py).

The merge's decode-dependent heuristics read the metadata the extract
stage precomputed (DecodeMeta), so no bitmaps are decoded here.
"""

from __future__ import annotations

import pyarrow as pa

from ..decode import DecodeMeta
from ..merge import CueView, end_time_fill, merge_cue_runs
from ..srt import serialize_srt, ticks_to_ms

DOCS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("text", pa.string()),
    ("n_cues", pa.int32()),
])


def assemble_url_group(group: pa.Table, *, skip_merge: bool = False,
                       force_merge_all: bool = False) -> pa.Table:
    """One url's spans -> one (url, text, n_cues) row."""
    url = group.column("url")[0].as_py()
    rows = group.to_pylist()
    # deterministic order + exact-duplicate payload drop (oracle step 1):
    # duplicate (warc_ts, html) rows produce identical (warc_ts,
    # row_key, seq) cue keys, so keeping one row per key dedupes them
    uniq = {}
    for r in rows:
        uniq.setdefault((r["warc_ts"], r["row_key"], r["seq"]), r)
    cues = [uniq[k] for k in sorted(uniq)]

    views = [CueView(
        start_ticks=r["start_ticks"], end_ticks=r["end_ticks"],
        width=r["width"], height=r["height"], n_objects=r["n_objects"],
        obj_keys=tuple((  # one reassembled fragment per object
            (ln, sha),) for ln, sha in zip(r["obj_lens"], r["obj_shas"])),
        palette_count=r["palette_count"],
    ) for r in cues]
    end_time_fill(views)
    # empty-composition filter (reference :398) — after fill, like the oracle
    keep_nonempty = [i for i, v in enumerate(views) if v.n_objects > 0]
    views_f = [views[i] for i in keep_nonempty]
    cues_f = [cues[i] for i in keep_nonempty]

    def get_meta(i: int) -> DecodeMeta:
        r = cues_f[i]
        return DecodeMeta(dec_h=r["dec_h"], dec_w=r["dec_w"],
                          nt_h=r["nt_h"], nt_w=r["nt_w"],
                          pixel_sha=r["pixel_sha"])

    kept = merge_cue_runs(views_f, get_meta, skip_merge=skip_merge,
                          force_merge_all=force_merge_all)
    triples = [(ticks_to_ms(views_f[i].start_ticks),
                ticks_to_ms(views_f[i].end_ticks),
                cues_f[i]["text"]) for i in kept]
    return pa.Table.from_pydict(
        {"url": [url], "text": [serialize_srt(triples)],
         "n_cues": [len(triples)]}, schema=DOCS_SCHEMA)
