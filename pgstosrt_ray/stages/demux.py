"""Demux stage: pages -> cues (SURVEY.md §2.2 M1-M6, §3 step 2).

A stateless ``map_batches`` task (plain function, not an actor): each
row's ``html`` payload is self-contained, so the reference's segment
walk (BluRaySupParserImageSharp.cs:259-398) runs per row with
function-local state and flat_map semantics (1 page -> N cue rows).
Fragment reassembly (:399-422) is row-local and happens here so the
object store only ever carries one compressed buffer per object.

End-time fill / empty filter / merge are NOT done here — they need the
url's complete time-ordered cue list and live in the assemble stage
after the groupby(url) shuffle (see stages/assemble.py).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..parse import parse_payload
from ..merge import reassemble_fragments

CUES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("row_key", pa.binary()),      # sha256(html): order-independent row id
    ("warc_ts", pa.int64()),       # microseconds
    ("seq", pa.int32()),           # cue index within the payload
    ("comp_num", pa.int32()),
    ("start_ticks", pa.int64()),
    ("end_ticks", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_objects", pa.int32()),
    ("forced", pa.bool_()),
    ("palette_count", pa.int32()),
    ("palette_last", pa.binary()),           # last palette version buffer
    ("obj_x", pa.list_(pa.int32())),         # per PCS object
    ("obj_y", pa.list_(pa.int32())),
    ("obj_w", pa.list_(pa.int32())),         # per found bitmap object
    ("obj_h", pa.list_(pa.int32())),
    ("bitmaps", pa.list_(pa.binary())),      # reassembled RLE, per object
])


def demux_batch(batch: pa.Table) -> pa.Table:
    """pages batch (url, warc_ts, html) -> cues rows."""
    urls = batch.column("url").to_pylist()
    ts = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    htmls = batch.column("html").to_pylist()
    cols: dict[str, list] = {name: [] for name in CUES_SCHEMA.names}
    for url, warc_ts, html in zip(urls, ts, htmls):
        row_key = hashlib.sha256(html).digest()
        sets = parse_payload(html)
        if not sets:
            # sentinel row (seq=-1): a payload with zero display sets
            # must still anchor its url through the shuffle so assemble
            # emits an empty doc, matching the oracle's (url, "", 0)
            cols["url"].append(url)
            cols["row_key"].append(row_key)
            cols["warc_ts"].append(warc_ts)
            cols["seq"].append(-1)
            cols["comp_num"].append(0)
            cols["start_ticks"].append(0)
            cols["end_ticks"].append(0)
            cols["width"].append(0)
            cols["height"].append(0)
            cols["n_objects"].append(0)
            cols["forced"].append(False)
            cols["palette_count"].append(0)
            cols["palette_last"].append(b"")
            cols["obj_x"].append([])
            cols["obj_y"].append([])
            cols["obj_w"].append([])
            cols["obj_h"].append([])
            cols["bitmaps"].append([])
            continue
        for seq, ds in enumerate(sets):
            reassemble_fragments(ds)
            cols["url"].append(url)
            cols["row_key"].append(row_key)
            cols["warc_ts"].append(warc_ts)
            cols["seq"].append(seq)
            cols["comp_num"].append(ds.comp_num)
            cols["start_ticks"].append(ds.start_ticks)
            cols["end_ticks"].append(ds.end_ticks)
            cols["width"].append(ds.width)
            cols["height"].append(ds.height)
            cols["n_objects"].append(len(ds.objects))
            cols["forced"].append(ds.is_forced)
            cols["palette_count"].append(len(ds.palette_buffers))
            cols["palette_last"].append(
                ds.palette_buffers[-1] if ds.palette_buffers else b"")
            cols["obj_x"].append([o.x for o in ds.objects])
            cols["obj_y"].append([o.y for o in ds.objects])
            cols["obj_w"].append([fr[0].width for fr in ds.bitmap_objects])
            cols["obj_h"].append([fr[0].height for fr in ds.bitmap_objects])
            cols["bitmaps"].append([fr[0].data for fr in ds.bitmap_objects])
    return pa.Table.from_pydict(cols, schema=CUES_SCHEMA)
