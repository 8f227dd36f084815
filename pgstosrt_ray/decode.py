"""Display set -> dense RGBA bitmap, and the derived merge metadata.

Replicates the reference decode chain (studied, not copied):
  - RLE run expansion + transparent-pixel skip:
    /root/reference/src/PgsToSrt/BluRaySup/BluRaySupParserExtensions.cs:43-134
    (PutPixel writes only when alpha > 0, :149-155)
  - +50px canvas padding with a 25px offset: same file :136-140
  - multi-object union-rect compositing: :12-34. NOTE the reference
    passes opacity 0 to DrawImage at :30, which makes the merged canvas
    fully transparent — an apparent upstream bug. We composite at full
    opacity (source-over, overwrite where source alpha > 0), which is
    the clearly intended semantics and what SURVEY.md §2 M11 specifies.
  - non-transparent extent metrics:
    /root/reference/src/PgsToSrt/BluRaySup/ImageExtensions.cs:36-70
  - pixel equality: ImageExtensions.cs:72-92 (we compare via dims +
    SHA-256 of the pixel buffer so equality can be evaluated after a
    shuffle without shipping dense bitmaps).

Vectorization: runs are expanded with numpy scatter (np.repeat-style),
never per-pixel Python loops over the image.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from .format import build_palette_lut, rle_decode_runs
from .parse import DisplaySet

PAD = 50          # canvas grows by +50 in each dimension (reference :136)
PAD_OFF = 25      # bitmap drawn at (25, 25) (reference :138)


def _pad_canvas(img: np.ndarray) -> np.ndarray:
    """+50px padding with the bitmap at (25, 25) (reference :136-140)."""
    h, w = img.shape[:2]
    canvas = np.zeros((h + PAD, w + PAD, 4), dtype=np.uint8)
    canvas[PAD_OFF:PAD_OFF + h, PAD_OFF:PAD_OFF + w] = img
    return canvas


def decode_object_raw(rle: bytes, width: int, height: int,
                      lut: np.ndarray) -> np.ndarray:
    """Decode one reassembled ODS buffer into an (H, W, 4) uint8 RGBA
    array, replicating DecodeImage's RLE walk (:55-134): zero-initialized
    image, runs written only where palette alpha > 0 (PutPixel :149-155).

    Vectorized: the opcode walk yields (pos, idx, len) runs; pixels are
    scattered with a numpy repeat-expansion (last-write-wins on the
    forward-moving cursor, identical to the sequential loop), then
    alpha-0 pixels are cleared — equivalent to PutPixel's skip because
    unwritten pixels are zero and written-transparent pixels must end
    up zero too."""
    if width <= 0 or height <= 0 or len(rle) == 0:
        return np.zeros((1, 1, 4), dtype=np.uint8)
    runs = rle_decode_runs(rle, width)
    n = width * height
    if runs:
        arr = np.array(runs, dtype=np.int32)
        pos_arr, idx_arr, len_arr = arr[:, 0], arr[:, 1], arr[:, 2]
        ends = np.cumsum(len_arr, dtype=np.int32)
        starts = ends - len_arr
        total = int(ends[-1])
        if total <= n and np.array_equal(pos_arr, starts):
            # fast path: runs tile the image contiguously from pixel 0
            # (the overwhelmingly common stream shape) — one uint8
            # repeat, no position scatter, no int64 temporaries
            idx_img = np.zeros(n, dtype=np.uint8)
            idx_img[:total] = np.repeat(idx_arr.astype(np.uint8), len_arr)
        else:
            idx_img = np.zeros(n, dtype=np.uint8)
            within = np.arange(total, dtype=np.int32) \
                - np.repeat(starts, len_arr)
            positions = np.repeat(pos_arr, len_arr) + within
            values = np.repeat(idx_arr.astype(np.uint8), len_arr)
            ok = positions < n  # overflow would raise in C#; clamp-safe
            positions, values = positions[ok], values[ok]
            idx_img[positions] = values
            if lut[0].any():
                # palette entry 0 is normally transparent-black; if a
                # stream redefines it, unwritten pixels must stay clear
                img = lut[idx_img]
                written = np.zeros(n, dtype=bool)
                written[positions] = True
                img[~written] = 0
                return img.reshape(height, width, 4)
    else:
        idx_img = np.zeros(n, dtype=np.uint8)
    # lut[0] is all-zero in well-formed palettes, so unwritten pixels
    # come out zero, and alpha-0 LUT rows are provably all-zero
    # (build_palette_lut clamps alpha<14 colors to black), matching
    # PutPixel's skip (:149-155)
    if runs and lut[0].any() and total < n:
        img = lut[idx_img]
        img[total:] = 0
        return img.reshape(height, width, 4)
    return lut[idx_img].reshape(height, width, 4)


def decode_display_set(ds: DisplaySet, lut_cache: dict | None = None
                       ) -> np.ndarray:
    """GetRgba32 equivalent (BluRaySupParserExtensions.cs:12-34), WITHOUT
    the +50 transparent padding (:136-140): padding carries no content,
    so every derived quantity is computed pad-free and the canvas
    dimensions are reported as content+PAD by decode_meta_of — the
    padded image is a pure function of (content, dims), making padded
    equality equivalent to (content equality AND dims equality). This
    halves memory traffic in the extract hot loop.

    Deviation (documented in the module docstring): the reference's
    multi-object path draws each *padded* decode into an *unpadded*
    union-rect canvas with opacity 0 — a double bug that yields a fully
    transparent canvas. We composite the unpadded decodes at
    (origin - union.origin) with source-over overwrite, consistent with
    the single-object path.

    ``lut_cache`` (dict) memoizes palette LUT construction per distinct
    last-version palette buffer (palettes repeat heavily across cues)."""
    if lut_cache is not None:
        key = ds.palette_buffers[-1] if ds.palette_buffers else b""
        lut = lut_cache.get(key)
        if lut is None:
            lut = build_palette_lut(ds.palette_buffers)
            if len(lut_cache) < 256:
                lut_cache[key] = lut
    else:
        lut = build_palette_lut(ds.palette_buffers)
    if len(ds.objects) == 1:
        f0 = ds.bitmap_objects[0][0]
        return decode_object_raw(f0.data, f0.width, f0.height, lut)
    # multi-object: union of (origin, first-fragment size) rects (:17-22)
    rects = []
    for i, obj in enumerate(ds.objects):
        f0 = ds.bitmap_objects[i][0]
        rects.append((obj.x, obj.y, f0.width, f0.height))
    x0 = min(r[0] for r in rects)
    y0 = min(r[1] for r in rects)
    x1 = max(r[0] + r[2] for r in rects)
    y1 = max(r[1] + r[3] for r in rects)
    canvas = np.zeros((y1 - y0, x1 - x0, 4), dtype=np.uint8)
    for i, obj in enumerate(ds.objects):
        f0 = ds.bitmap_objects[i][0]
        sub = decode_object_raw(f0.data, f0.width, f0.height, lut)
        ox, oy = obj.x - x0, obj.y - y0
        src = sub[:canvas.shape[0] - oy, :canvas.shape[1] - ox]
        dst = canvas[oy:oy + src.shape[0], ox:ox + src.shape[1]]
        mask = src[:, :, 3] > 0
        dst[mask] = src[mask]
    return canvas


def non_transparent_extents(img: np.ndarray) -> tuple[int, int]:
    """(height, width) of the image minus fully-transparent leading and
    trailing rows/columns (ImageExtensions.cs:36-70). Note the reference
    counts *trailing* transparent lines via a run that resets on any
    opaque line — equivalent to trimming leading+trailing only."""
    opaque = img[:, :, 3] > 0
    rows = np.flatnonzero(opaque.any(axis=1))
    cols = np.flatnonzero(opaque.any(axis=0))
    nt_h = 0 if rows.size == 0 else int(rows[-1] - rows[0] + 1)
    nt_w = 0 if cols.size == 0 else int(cols[-1] - cols[0] + 1)
    return nt_h, nt_w


@dataclass(frozen=True)
class DecodeMeta:
    """Everything the near-dup merge heuristics need about a decoded cue
    (QualifiesForMerge, BluRaySupParserImageSharp.cs:533-558) so they can
    run after a shuffle without the dense bitmap."""
    dec_h: int
    dec_w: int
    nt_h: int
    nt_w: int
    pixel_sha: bytes  # SHA-256 of the raw RGBA buffer (pixel-equality proxy)


def decode_meta_of(img: np.ndarray) -> DecodeMeta:
    """Merge metadata from the UNPADDED canvas. Reported dims include
    the reference's +50 padding (:136-140) so the size comparison in
    IsEqualTo semantics is unchanged; extents are padding-invariant
    (padding is fully transparent); the pixel hash is over the content,
    and (content hash, dims) equality <=> padded-image equality."""
    nt_h, nt_w = non_transparent_extents(img)
    return DecodeMeta(dec_h=img.shape[0] + PAD, dec_w=img.shape[1] + PAD,
                      nt_h=nt_h, nt_w=nt_w,
                      pixel_sha=hashlib.sha256(
                          np.ascontiguousarray(img).tobytes()).digest())
