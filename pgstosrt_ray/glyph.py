"""Deterministic text <-> bitmap glyph codec — the "OCR engine".

The container has no Tesseract, so per SURVEY.md §2.3 O1 the OCR engine
is a deterministic region->text decoder with the same actor shape the
real engine would have (model "loaded" once per actor, batched decode
per call). The codec is fixture-defined:

Encoding (used only by the fixture generator): text of length n renders
as a palette-index bitmap of height 16*s and width (n+2)*s for integer
scale s >= 1. Column blocks, each s pixels wide:
  [marker][char 0][char 1]...[char n-1][marker]
The marker blocks are fully set (all 16*s rows). Char block i has the
pixel block at row r set iff bit r of ord(text[i]) is set (codepoints
must be < 0x10000; every codepoint >= 0x20 sets at least one bit).
Newlines are encoded like any other codepoint, so multi-line cue text
round-trips. The scale knob exists to exercise the merge heuristics'
decoded-extent thresholds (>110px high / >300px wide,
/root/reference/src/PgsToSrt/BluRaySup/BluRaySupParserImageSharp.cs:552-555).

Decoding ("OCR") works on the decoded RGBA canvas only through the
alpha channel: a column whose longest vertical opaque run L satisfies
L >= 16 and L % 16 == 0 is a marker candidate with scale s = L // 16.
Adjacent candidate columns with the same (top, L) fuse into a marker
block; consecutive marker blocks with the same (top, L) delimit one
glyph block, decoded by sampling block centers. Multiple glyph blocks
(multi-object compositions) are decoded in (top, left) order and joined
with a newline. Anything unreadable decodes to "".
"""

from __future__ import annotations

import numpy as np

GLYPH_ROWS = 16


def render_text(text: str, scale: int = 1, color_index: int = 1) -> np.ndarray:
    """Render ``text`` to a palette-index bitmap (uint8), see module doc."""
    n = len(text)
    h, w = GLYPH_ROWS * scale, (n + 2) * scale
    cols = np.zeros((GLYPH_ROWS, n + 2), dtype=np.uint8)
    cols[:, 0] = color_index
    cols[:, -1] = color_index
    for i, ch in enumerate(text):
        cp = ord(ch)
        if cp >= 0x10000:
            raise ValueError(f"codepoint out of glyph range: {cp:#x}")
        for r in range(GLYPH_ROWS):
            if cp >> r & 1:
                cols[r, i + 1] = color_index
    return np.repeat(np.repeat(cols, scale, axis=0), scale, axis=1)


def _longest_runs_per_column(opaque: np.ndarray):
    """Vectorized per-column longest vertical True-run. Returns
    (cols, tops, lens) arrays, one entry per column that has any run;
    ties broken by the earliest (topmost) run."""
    h, w = opaque.shape
    padded = np.zeros((h + 2, w), dtype=np.int8)
    padded[1:-1] = opaque
    d = np.diff(padded, axis=0)
    sr, sc = np.nonzero(d == 1)    # run starts, row-major => sorted by (row, col)
    er, _ec = np.nonzero(d == -1)  # run ends, same run order per column
    if sr.size == 0:
        return (np.empty(0, np.int64),) * 3
    order = np.lexsort((sr, sc))   # group by column, row ascending
    sc, sr, er = sc[order], sr[order], er[np.lexsort((er, _ec))]
    lens = er - sr
    # pick per-column max length, earliest on ties: sort by (col, -len, row)
    pick = np.lexsort((sr, -lens, sc))
    cols_sorted = sc[pick]
    first = np.concatenate(([0], np.flatnonzero(np.diff(cols_sorted)) + 1))
    sel = pick[first]
    return sc[sel], sr[sel], lens[sel]


def ocr_bitmap(rgba: np.ndarray) -> str:
    """Decode text from an RGBA canvas via the alpha channel."""
    return ocr_mask(rgba[:, :, 3] > 0)


def ocr_mask(opaque: np.ndarray) -> str:
    """Decode text from a per-pixel opacity mask (the hot-path entry:
    the pipeline never materializes RGBA, see decode.py)."""
    cols, tops, lens = _longest_runs_per_column(opaque)
    keep = (lens >= GLYPH_ROWS) & (lens % GLYPH_ROWS == 0)
    cand = list(zip(cols[keep].tolist(), tops[keep].tolist(), lens[keep].tolist()))
    if not cand:
        return ""
    # fuse adjacent candidates with identical (top, length) into marker blocks
    blocks = []  # (x_start, x_end_exclusive, top, length)
    for x, top, ln in cand:
        if blocks and blocks[-1][1] == x and blocks[-1][2] == top and blocks[-1][3] == ln:
            blocks[-1] = (blocks[-1][0], x + 1, top, ln)
        else:
            blocks.append((x, x + 1, top, ln))
    # pair consecutive marker blocks with the same (top, length)
    texts = []  # (top, x, text)
    used = [False] * len(blocks)
    for i in range(len(blocks)):
        if used[i]:
            continue
        for j in range(i + 1, len(blocks)):
            if used[j]:
                continue
            if blocks[j][2] == blocks[i][2] and blocks[j][3] == blocks[i][3]:
                xa0, xa1, top, ln = blocks[i]
                xb0 = blocks[j][0]
                s = ln // GLYPH_ROWS
                if (xa1 - xa0) != s or (blocks[j][1] - blocks[j][0]) != s:
                    break
                span = xb0 - xa1
                if span % s != 0:
                    break
                n = span // s
                # vectorized glyph sampling: bits[r, c] at block centers
                cxs = xa1 + np.arange(n) * s + s // 2
                cys = top + np.arange(GLYPH_ROWS) * s + s // 2
                bits = opaque[np.ix_(cys, cxs)]
                cps = (bits.astype(np.uint32)
                       * (1 << np.arange(GLYPH_ROWS, dtype=np.uint32))[:, None]
                       ).sum(axis=0)
                if (cps != 0).all():
                    texts.append((top, xa0,
                                  cps.astype("<u4").tobytes()
                                  .decode("utf-32-le")))
                    used[i] = used[j] = True
                break
        # unpaired marker blocks are ignored
    if not texts:
        return ""
    texts.sort(key=lambda t: (t[0], t[1]))
    return "\n".join(t[2] for t in texts)
