"""Deterministic fixture-corpus generator (FIXTURES.md §1).

Synthesizes the ``pages`` table — (url, warc_ts, html, text, lang) per
BASELINE.json input_hint — whose ``html`` payloads are valid framed
segment streams (format.py) RLE-encoding glyph bitmaps of known text
(glyph.py). Same seed => same bytes, no wall-clock, no external data.

The ``text`` column carries the url's golden SRT document (oracle
output; FIXTURES.md: "used only by tests, never by the pipeline"); the
separate golden table is (url, text, n_cues).

The tiny corpus enumerates the full payload feature matrix
(FIXTURES.md §1, cases 1-14); ``build_corpus`` scales up with a seeded
random mix of the same features for correctness/bench runs.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from . import format as F
from .glyph import render_text
from .oracle import extract_corpus

# default palette entries: (index, Y, Cr, Cb, A) — index 1 white, 2/3 colors
WHITE = (1, 235, 128, 128, 255)
COLOR2 = (2, 110, 90, 240, 255)
COLOR3 = (3, 80, 170, 90, 255)
DEFAULT_PALETTE = [WHITE, COLOR2, COLOR3]


@dataclass
class ObjSpec:
    obj_id: int
    bitmap: np.ndarray | None          # palette-index array, None => no ODS
    x: int = 0
    y: int = 0
    window_id: int = 0
    forced: bool = False
    max_fragment: int | None = None    # fragment the ODS when set


@dataclass
class DsSpec:
    start_ticks: int
    objects: list[ObjSpec] = field(default_factory=list)
    state: int = F.STATE_NORMAL
    palette_update: bool = False
    palette_id: int = 0
    palette_versions: list[list[tuple[int, int, int, int, int]]] = field(
        default_factory=lambda: [DEFAULT_PALETTE])
    emit_palette: bool = True
    width: int = 1920
    height: int = 1080
    fps_type: int = 0x10
    comp_num: int = 0
    wds: bool = True


def _segments_for(ds: DsSpec) -> list[tuple[int, bytes]]:
    """(seg_type, payload) list for one display set, in stream order
    PCS -> WDS -> PDS* -> ODS* -> END."""
    segs: list[tuple[int, bytes]] = []
    objs = [(o.obj_id, o.window_id, o.forced, o.x, o.y) for o in ds.objects]
    segs.append((F.SEG_PCS, F.encode_pcs_payload(
        ds.width, ds.height, ds.fps_type, ds.comp_num, ds.state,
        ds.palette_update, ds.palette_id, objs)))
    if ds.wds and ds.objects:
        wins = [(o.window_id, o.x, o.y,
                 o.bitmap.shape[1] if o.bitmap is not None else 0,
                 o.bitmap.shape[0] if o.bitmap is not None else 0)
                for o in ds.objects]
        segs.append((F.SEG_WDS, F.encode_wds_payload(wins)))
    if ds.emit_palette:
        for ver, entries in enumerate(ds.palette_versions):
            segs.append((F.SEG_PDS, F.encode_pds_payload(ds.palette_id, ver, entries)))
    for o in ds.objects:
        if o.bitmap is not None:
            h, w = o.bitmap.shape
            rle = F.rle_encode(o.bitmap)
            for body in F.encode_ods_payloads(o.obj_id, 0, w, h, rle,
                                              max_fragment=o.max_fragment):
                segs.append((F.SEG_ODS, body))
    segs.append((F.SEG_END, b""))
    return segs


def sup_payload(display_sets: list[DsSpec]) -> bytes:
    out = bytearray()
    for i, ds in enumerate(display_sets):
        if ds.comp_num == 0:
            ds.comp_num = i
        for seg_type, payload in _segments_for(ds):
            out += F.encode_sup_segment(seg_type, ds.start_ticks, payload)
    return bytes(out)


def mkv_payload(blocks: list[tuple[int, int, DsSpec]]) -> bytes:
    """(start_ms, end_ms, display set) blocks -> MKPG container."""
    enc_blocks = []
    for i, (start_ms, end_ms, ds) in enumerate(blocks):
        if ds.comp_num == 0:
            ds.comp_num = i
        data = b"".join(F.encode_mkv_segment(t, p) for t, p in _segments_for(ds))
        enc_blocks.append((start_ms, end_ms, data))
    return F.encode_mkv_container(enc_blocks)


def text_ds(text: str, start_ticks: int, *, scale: int = 1, x: int = 100,
            y: int = 800, obj_id: int = 0, forced: bool = False,
            state: int = F.STATE_EPOCH_START, color_index: int = 1,
            palette_versions=None, max_fragment: int | None = None) -> DsSpec:
    """Convenience: one display set showing ``text`` as a glyph bitmap."""
    bitmap = render_text(text, scale=scale, color_index=color_index)
    return DsSpec(
        start_ticks=start_ticks, state=state,
        objects=[ObjSpec(obj_id=obj_id, bitmap=bitmap, x=x, y=y,
                         forced=forced, max_fragment=max_fragment)],
        palette_versions=palette_versions or [DEFAULT_PALETTE])


def clear_ds(start_ticks: int) -> DsSpec:
    """Empty composition used as a cue closer (filtered out per
    reference :398, but its start time closes the previous cue)."""
    return DsSpec(start_ticks=start_ticks, objects=[], state=F.STATE_NORMAL,
                  emit_palette=False, wds=False)


TICK = 90_000  # 1 second in 90 kHz ticks


def _rle_opcode_bitmap(text: str) -> np.ndarray:
    """Case 11: a bitmap whose rows exercise every RLE opcode — long
    (>=0x40) and short zero runs, long and short color runs, literals —
    plus a readable glyph block."""
    glyph = render_text(text)
    gh, gw = glyph.shape
    h, w = gh + 4, max(400, gw + 20)
    bm = np.zeros((h, w), dtype=np.uint8)
    bm[0, w - 1] = 1                # row 0: long zero run + literal
    bm[1, :] = 2                    # row 1: long color run
    bm[2, 30:35] = 1                # row 2: short zero run + short color run
    bm[3, 0:2] = 3                  # row 3: 2-px color run
    bm[4:4 + gh, 10:10 + gw] = glyph
    return bm


def _dup_run(texts_start: int, text: str, count: int, *, scale: int = 1,
             duration_ticks: int = TICK,
             palette_versions=None, second_palette=None) -> list[DsSpec]:
    """``count`` time-adjacent display sets with byte-identical bitmaps
    (each closed by the next one's PCS => 0-tick gap), exercising the
    merge-run scan (reference :424-521)."""
    out = []
    for k in range(count):
        pv = palette_versions
        if second_palette is not None and k == count - 1:
            pv = second_palette
        ds = text_ds(text, texts_start + k * duration_ticks, scale=scale,
                     state=F.STATE_EPOCH_START if k == 0 else F.STATE_ACQU_POINT,
                     palette_versions=pv)
        out.append(ds)
    out.append(clear_ds(texts_start + count * duration_ticks))
    return out


def tiny_corpus_payloads() -> dict[str, list[tuple[int, bytes]]]:
    """url -> [(warc_ts_us, payload)] covering FIXTURES.md cases 1-14."""
    t0 = 1_600_000_000_000_000  # deterministic base warc_ts (us)
    urls: dict[str, list[tuple[int, bytes]]] = {}

    # 1. happy path
    urls["https://example.org/t/happy/0"] = [(t0, sup_payload(
        [text_ds("Hello, world!", TICK), clear_ds(3 * TICK)]))]
    # 2. fragmented ODS (reassembly)
    urls["https://example.org/t/frag/1"] = [(t0 + 1, sup_payload(
        [text_ds("fragmented object stream", 2 * TICK, scale=3, max_fragment=64),
         clear_ds(5 * TICK)]))]
    # 3. multi-object composition
    multi = DsSpec(start_ticks=TICK, state=F.STATE_EPOCH_START, objects=[
        ObjSpec(obj_id=0, bitmap=render_text("upper region"), x=100, y=100),
        ObjSpec(obj_id=1, bitmap=render_text("lower region"), x=140, y=400),
    ])
    urls["https://example.org/t/multi/2"] = [(t0 + 2, sup_payload(
        [multi, clear_ds(4 * TICK)]))]
    # 4. palette update + 3-version palette (merge heuristic :546)
    three_versions = [DEFAULT_PALETTE,
                      [(1, 200, 128, 128, 255), COLOR2, COLOR3],
                      [(1, 170, 128, 128, 255), COLOR2, COLOR3]]
    upd = text_ds("palette versions", TICK, palette_versions=three_versions)
    pal_update = DsSpec(start_ticks=2 * TICK, state=F.STATE_NORMAL,
                        palette_update=True, palette_id=0,
                        palette_versions=[[(1, 140, 128, 128, 255), COLOR2, COLOR3]],
                        objects=[ObjSpec(obj_id=0, bitmap=None, x=100, y=800)])
    urls["https://example.org/t/palette/3"] = [(t0 + 3, sup_payload(
        [upd, pal_update, clear_ds(4 * TICK)]))]
    # 5. epoch reset mid-stream
    urls["https://example.org/t/epoch/4"] = [(t0 + 4, sup_payload(
        [text_ds("first epoch", TICK),
         text_ds("second epoch", 3 * TICK, state=F.STATE_EPOCH_START),
         clear_ds(5 * TICK)]))]
    # 6. missing palette => composition dropped (:173-174)
    missing = text_ds("visible cue", TICK)
    ghost = DsSpec(start_ticks=2 * TICK, state=F.STATE_NORMAL, palette_id=7,
                   emit_palette=False,
                   objects=[ObjSpec(obj_id=5, bitmap=render_text("ghost"),
                                    x=10, y=10)])
    urls["https://example.org/t/missingpal/5"] = [(t0 + 5, sup_payload(
        [missing, ghost, clear_ds(4 * TICK)]))]
    # 7. empty composition mid-stream (filter :398) — also closes cue 1
    urls["https://example.org/t/empty/6"] = [(t0 + 6, sup_payload(
        [text_ds("before empty", TICK), clear_ds(2 * TICK),
         text_ds("after empty", 3 * TICK), clear_ds(4 * TICK)]))]
    # 8. open-ended cue: closed by next payload's first PCS (fill) in a
    # 2-row url with out-of-order warc_ts; plus a url whose last cue
    # stays open at stream end (end stays 0)
    urls["https://example.org/t/open/7"] = [
        (t0 + 8, sup_payload([text_ds("later page", 6 * TICK),
                              clear_ds(8 * TICK)])),
        (t0 + 7, sup_payload([text_ds("earlier page stays open", 4 * TICK)])),
    ]
    urls["https://example.org/t/open/8"] = [(t0 + 9, sup_payload(
        [text_ds("never closed", TICK)]))]
    # 9. merge runs: >=3 groups so mergeCount>=3 (:538), with a >=3-run,
    # a short-duration pair, a pixel-identical pair, and a
    # pixel-different pair (same RLE, different palette)
    specs: list[DsSpec] = []
    specs += _dup_run(1 * TICK, "triple run", 3)
    specs += _dup_run(10 * TICK, "quick pair", 2, duration_ticks=TICK // 4)
    specs += _dup_run(20 * TICK, "identical pair", 2)
    specs += _dup_run(30 * TICK, "recolored pair", 2,
                      second_palette=[[(1, 100, 128, 128, 255)]])
    urls["https://example.org/t/merge/9"] = [(t0 + 10, sup_payload(specs))]
    # 9b. big-extent pair (scale pushes nt_height>110 => qualifies :552-555)
    urls["https://example.org/t/merge/10"] = [(t0 + 11, sup_payload(
        _dup_run(1 * TICK, "big", 2, scale=8)
        + _dup_run(10 * TICK, "a", 2) + _dup_run(20 * TICK, "b", 2)))]
    # 10. forced flag
    urls["https://example.org/t/forced/11"] = [(t0 + 12, sup_payload(
        [text_ds("forced subtitle", TICK, forced=True), clear_ds(2 * TICK)]))]
    # 11. all RLE opcodes
    op_bitmap = _rle_opcode_bitmap("opcodes")
    urls["https://example.org/t/rle/12"] = [(t0 + 13, sup_payload(
        [DsSpec(start_ticks=TICK, state=F.STATE_EPOCH_START,
                objects=[ObjSpec(obj_id=0, bitmap=op_bitmap, x=50, y=50)]),
         clear_ds(3 * TICK)]))]
    # 12. truncated payload: valid cue, then a segment header claiming
    # more bytes than present (parse stops cleanly :275-282)
    good = sup_payload([text_ds("survives truncation", TICK), clear_ds(2 * TICK)])
    trunc = F.encode_sup_segment(F.SEG_ODS, 3 * TICK, b"\x00" * 500)[:30]
    urls["https://example.org/t/trunc/13"] = [(t0 + 14, good + trunc)]
    # 13. alpha<14 clamp (:641-651): glyph drawn with a low-alpha color
    # (clamped to transparent-black but alpha 5 > 0 still renders) and a
    # decoration in a fully-transparent color (skipped by PutPixel)
    low_alpha_pal = [[(1, 235, 128, 128, 5), (2, 110, 90, 240, 0), COLOR3]]
    bm = render_text("low alpha", color_index=1)
    deco = np.zeros((4, bm.shape[1]), dtype=np.uint8)
    deco[:, :] = 2  # alpha-0 color: invisible
    stacked = np.vstack([deco, bm])
    urls["https://example.org/t/alpha/14"] = [(t0 + 15, sup_payload(
        [DsSpec(start_ticks=TICK, state=F.STATE_EPOCH_START,
                palette_versions=low_alpha_pal,
                objects=[ObjSpec(obj_id=0, bitmap=stacked, x=80, y=700)]),
         clear_ds(3 * TICK)]))]
    # 14. mkv framing with container timestamps, overlap clipping
    # (:52-53) and a gap block capping an open cue (:62-67)
    urls["https://example.org/t/mkv/15"] = [(t0 + 16, mkv_payload(
        [(1000, 2500, text_ds("mkv block one", 0)),
         (2400, 3500, text_ds("mkv block two overlaps", 0)),  # clip prev end
         (5000, 5000, text_ds("mkv zero length", 0))]         # start==end
        # no explicit gap block: zero-duration cue stays (cap path is in
        # the multi-row mkv url below)
    ))]
    # gap blocks (data <= 2 bytes) close zero-duration cues (:59-67):
    # the first is closed to the gap's start; the second gap is > 11.1s
    # away so the cap resets the runaway cue to zero duration
    ds_a = text_ds("gap closed", 0)
    ds_a.comp_num = 1
    ds_b = text_ds("gap capped", 0)
    ds_b.comp_num = 2
    blk_a = b"".join(F.encode_mkv_segment(t, p) for t, p in _segments_for(ds_a))
    blk_b = b"".join(F.encode_mkv_segment(t, p) for t, p in _segments_for(ds_b))
    urls["https://example.org/t/mkv/16"] = [(t0 + 17, F.encode_mkv_container([
        (1000, 1000, blk_a),
        (3000, 0, b"\x00"),        # gap: closes cue A at (3000-1)*90
        (4000, 4000, blk_b),
        (20000, 0, b"\x00"),       # gap > 1,000,000 ticks: cap => zero duration
    ]))]
    # ties: two rows, same warc_ts, different payloads (sha tiebreak)
    urls["https://example.org/t/ties/17"] = [
        (t0 + 20, sup_payload([text_ds("tie A", TICK), clear_ds(2 * TICK)])),
        (t0 + 20, sup_payload([text_ds("tie B", 3 * TICK), clear_ds(4 * TICK)])),
    ]
    # all-unparseable url: every payload yields zero display sets; the
    # pipeline must still emit (url, "", 0) like the oracle (demux
    # sentinel row) rather than dropping the url
    urls["https://example.org/t/garbage/18"] = [
        (t0 + 22, b"<html><body>not a segment stream at all</body></html>"),
        (t0 + 23, b"PG\x00\x01"),  # magic only, truncated header
    ]
    return urls


_LANGS = ["eng", "fra", "deu", "spa", "ita"]
_WORDS = ("the quick brown fox jumps over lazy dog data stream ray arrow "
          "batch shuffle actor block page text cue time palette object "
          "segment epoch window merge dedup extract web scale").split()


def random_payload_rows(rng: random.Random, url_idx: int,
                        heavy: bool = False,
                        profile: str | None = None) -> list[tuple[int, bytes]]:
    """A seeded random url: 1-3 rows, mixed features.

    Profiles: "default" small mixed payloads (correctness);
    "heavy" large glyph scales (big-bitmap stress; memory-bound);
    "wide" many long single-scale cues (CPU-bound, cache-friendly —
    the scaling-bench profile: per-cue canvases stay ~20 KB so the
    workload parallelizes instead of saturating memory bandwidth)."""
    profile = profile or ("heavy" if heavy else "default")
    t0 = 1_600_000_000_000_000 + url_idx * 1_000_000
    n_rows = rng.choices([1, 2, 3], weights=[6, 3, 1])[0]
    rows = []
    tick_base = TICK
    for r in range(n_rows):
        n_cues = {"heavy": (4, 12), "wide": (14, 24),
                  "default": (1, 6)}[profile]
        n_cues = rng.randint(*n_cues)
        specs: list[DsSpec] = []
        for c in range(n_cues):
            words = {"heavy": (20, 60), "wide": (40, 80),
                     "default": (2, 8)}[profile]
            text = " ".join(rng.choices(_WORDS, k=rng.randint(*words)))
            if profile == "heavy":
                scale = rng.choices([1, 2, 3, 4], weights=[2, 4, 3, 1])[0]
            elif profile == "wide":
                scale = 1
            else:
                scale = rng.choices([1, 1, 1, 2, 3],
                                    weights=[5, 5, 5, 2, 1])[0]
            frag = rng.choice([None, None, 96])
            specs.append(text_ds(
                text, tick_base, scale=scale, max_fragment=frag,
                x=rng.randint(0, 500), y=rng.randint(0, 900),
                forced=rng.random() < 0.1,
                state=F.STATE_EPOCH_START if c == 0 else F.STATE_ACQU_POINT))
            tick_base += rng.randint(TICK // 2, 3 * TICK)
        if rng.random() < 0.25:  # duplicate-run block
            specs += _dup_run(tick_base, "dup " + str(url_idx), rng.randint(2, 4))
            tick_base += 6 * TICK
        if rng.random() < 0.8:
            specs.append(clear_ds(tick_base))
            tick_base += TICK
        # out-of-order warc_ts across rows sometimes
        ts = t0 + (n_rows - r if rng.random() < 0.3 else r)
        rows.append((ts, sup_payload(specs)))
    return rows


def _url_rng(seed: int, i: int, profile: str) -> random.Random:
    """Per-url RNG: stable string seeding (sha512-based in CPython,
    independent of PYTHONHASHSEED and of n_urls), so url i's payloads
    are identical whether the corpus is built serially or in parallel
    and whatever its total size."""
    return random.Random(f"{seed}:{i}:{profile}")


def _build_one_url(args):
    """-> (url, rows, (text, n_cues), (text_nomerge, n_cues_nomerge),
    demux-meta rows). The two extract variants and the cue-level golden
    are computed here so corpus build parallelism covers them too."""
    seed, i, profile = args
    rng = _url_rng(seed, i, profile)
    rows = random_payload_rows(rng, i, profile=profile)
    from .oracle import demux_meta_rows, extract_url
    url = f"https://example.org/{seed}/{i}"
    return (url, rows, extract_url(rows), extract_url(rows, skip_merge=True),
            demux_meta_rows(url, rows))


CUES_GOLDEN_SCHEMA = pa.schema([
    ("url", pa.string()), ("seq", pa.int32()), ("comp_num", pa.int32()),
    ("start_ticks", pa.int64()), ("end_ticks", pa.int64()),
    ("width", pa.int32()), ("height", pa.int32()),
    ("n_objects", pa.int32()), ("forced", pa.bool_()),
    ("palette_count", pa.int32()),
    ("pos_x", pa.int32()), ("pos_y", pa.int32()),
])


def build_corpus_full(n_urls: int, seed: int = 42,
                      include_tiny: bool = True, heavy: bool = False,
                      profile: str | None = None,
                      workers: int | None = None) -> dict[str, pa.Table]:
    """{"pages", "golden", "golden_nomerge", "golden_cues"} tables.
    Deterministic in (n_urls, seed, profile) regardless of ``workers``
    (per-url seeding). golden_nomerge is the skip-merge extract variant;
    golden_cues is the demux-level per-display-set metadata (sentinel
    seq=-1 rows for unparseable payloads)."""
    profile = profile or ("heavy" if heavy else "default")
    urls: dict[str, list[tuple[int, bytes]]] = {}
    golden: dict[str, tuple[str, int]] = {}
    golden_nm: dict[str, tuple[str, int]] = {}
    cue_rows: dict[str, list[dict]] = {}
    if include_tiny:
        from .oracle import demux_meta_rows
        tiny = tiny_corpus_payloads()
        urls.update(tiny)
        golden.update(extract_corpus(tiny))
        golden_nm.update(extract_corpus(tiny, skip_merge=True))
        for url, rows in tiny.items():
            cue_rows[url] = demux_meta_rows(url, rows)
    args = [(seed, i, profile) for i in range(n_urls)]
    if workers is None:
        import os
        workers = min(16, os.cpu_count() or 1) if n_urls >= 200 else 1
    results: list
    try:
        import ray
        ray_live = ray.is_initialized()
    except ImportError:  # pragma: no cover
        ray_live = False
    if workers > 1 and ray_live:
        # inside a live Ray session (e.g. the driver's first queries()
        # call): parallelize with Ray tasks — forking a process with
        # live grpc threads can deadlock, and spawn needs an importable
        # __main__
        import ray

        @ray.remote(num_cpus=1)
        def _gen_chunk(chunk):
            return [_build_one_url(a) for a in chunk]

        chunks = [args[i::workers] for i in range(workers)]
        results = [r for part in ray.get(
            [_gen_chunk.remote(c) for c in chunks if c]) for r in part]
        results.sort(key=lambda r: int(r[0].rsplit("/", 1)[1]))
    elif workers > 1:
        import multiprocessing as mp
        with mp.Pool(workers) as pool:
            results = pool.map(_build_one_url, args, chunksize=32)
    else:
        results = [_build_one_url(a) for a in args]
    for url, rows, merged, nomerge, cues in results:
        urls[url] = rows
        golden[url] = merged
        golden_nm[url] = nomerge
        cue_rows[url] = cues
    u_col, ts_col, html_col, text_col, lang_col = [], [], [], [], []
    g_url, g_text, g_n = [], [], []
    nm_text, nm_n = [], []
    all_cues: list[dict] = []
    lang_rng = random.Random(seed + 1)
    for url in urls:
        lang = lang_rng.choice(_LANGS)
        doc_text, n_cues = golden[url]
        for ts, payload in urls[url]:
            u_col.append(url)
            ts_col.append(ts)
            html_col.append(payload)
            text_col.append(doc_text)
            lang_col.append(lang)
        g_url.append(url)
        g_text.append(doc_text)
        g_n.append(n_cues)
        nm_text.append(golden_nm[url][0])
        nm_n.append(golden_nm[url][1])
        all_cues.extend(cue_rows[url])
    pages = pa.table({
        "url": pa.array(u_col, pa.string()),
        "warc_ts": pa.array(ts_col, pa.timestamp("us")),
        "html": pa.array(html_col, pa.binary()),
        "text": pa.array(text_col, pa.string()),
        "lang": pa.array(lang_col, pa.string()),
    })
    golden_t = pa.table({
        "url": pa.array(g_url, pa.string()),
        "text": pa.array(g_text, pa.string()),
        "n_cues": pa.array(g_n, pa.int32()),
    })
    golden_nm_t = pa.table({
        "url": pa.array(g_url, pa.string()),
        "text": pa.array(nm_text, pa.string()),
        "n_cues": pa.array(nm_n, pa.int32()),
    })
    cues_t = pa.Table.from_pylist(all_cues, schema=CUES_GOLDEN_SCHEMA)
    return {"pages": pages, "golden": golden_t,
            "golden_nomerge": golden_nm_t, "golden_cues": cues_t}


def build_corpus(n_urls: int, seed: int = 42, include_tiny: bool = True,
                 heavy: bool = False, profile: str | None = None,
                 workers: int | None = None) -> tuple[pa.Table, pa.Table]:
    """(pages, golden) — the classic two-table view of
    ``build_corpus_full``."""
    full = build_corpus_full(n_urls, seed=seed, include_tiny=include_tiny,
                             heavy=heavy, profile=profile, workers=workers)
    return full["pages"], full["golden"]


def build_tiny() -> tuple[pa.Table, pa.Table]:
    return build_corpus(30, seed=7, include_tiny=True)
