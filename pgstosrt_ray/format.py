"""Segment-stream framing + RLE + palette codecs (pure, no Ray).

This is the byte-level layer of the engine: the framed binary payload
format carried in the ``html`` column of the ``pages`` table, a direct
generalization of the reference's PGS segment stream.

Reference semantics (studied, not copied) live at:
  - 13-byte SUP segment header ("PG" magic, BE32 PTS, type byte, BE16
    size): /root/reference/src/PgsToSrt/BluRaySup/BluRaySupParserImageSharp.cs:87-98
  - 3-byte Matroska-variant header (type, BE16 size): same file :100-107
  - segment types PDS=0x14 ODS=0x15 PCS=0x16 WDS=0x17 END=0x80: :286,304,328,344,364
  - PCS payload layout: :120-162 (fields at fixed offsets 0,2,4,5,7,8,9,10;
    8-byte object entries at 11+8*i)
  - PDS payload layout: :191-215 ((size-2)/5 entries of 5 raw bytes)
  - ODS payload layout: :217-257 (first fragment has width/height at 7/9,
    pixel data at 11; continuation data at 4)
  - RLE opcode set: /root/reference/src/PgsToSrt/BluRaySup/BluRaySupParserExtensions.cs:43-141
  - palette decode incl. alpha<14 transparent-black clamp:
    BluRaySupParserImageSharp.cs:622-662

The *encoders* here exist so the fixture generator can synthesize valid
payloads deterministically; the reference has no encoder.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Segment type bytes (BluRaySupParserImageSharp.cs:286,304,328,344,364)
SEG_PDS = 0x14
SEG_ODS = 0x15
SEG_PCS = 0x16
SEG_WDS = 0x17
SEG_END = 0x80

# Composition states (BluRaySupParserImageSharp.cs:575-590)
STATE_NORMAL = 0
STATE_ACQU_POINT = 1
STATE_EPOCH_START = 2
STATE_EPOCH_CONTINUE = 3
STATE_INVALID = 4

_STATE_BYTE = {STATE_NORMAL: 0x00, STATE_ACQU_POINT: 0x40,
               STATE_EPOCH_START: 0x80, STATE_EPOCH_CONTINUE: 0xC0}


def composition_state_from_byte(b: int) -> int:
    """Map the PCS state byte to an enum (reference :575-590)."""
    return {0x00: STATE_NORMAL, 0x40: STATE_ACQU_POINT,
            0x80: STATE_EPOCH_START, 0xC0: STATE_EPOCH_CONTINUE}.get(b, STATE_INVALID)


# Payload container magics (ours; the reference dispatches on file
# extension instead — PgsParser.cs:21-28)
SUP_MAGIC = b"PG"          # first segment header starts with this
MKV_MAGIC = b"MKPG"        # our container for the Matroska-block variant


def be16(buf: bytes, off: int) -> int:
    return buf[off + 1] | (buf[off] << 8)


def be32(buf: bytes, off: int) -> int:
    return buf[off + 3] | (buf[off + 2] << 8) | (buf[off + 1] << 16) | (buf[off] << 24)


def pack_be16(v: int) -> bytes:
    return bytes(((v >> 8) & 0xFF, v & 0xFF))


def pack_be32(v: int) -> bytes:
    return bytes(((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF))


# ---------------------------------------------------------------------------
# Segment encoders (fixture generation)

def encode_sup_segment(seg_type: int, pts_ticks: int, payload: bytes) -> bytes:
    """13-byte header + payload: "PG", PTS BE32 @2, (DTS @6, zero), type @10,
    size BE16 @11 (mirrors the offsets the reference reads at :87-98)."""
    return (SUP_MAGIC + pack_be32(pts_ticks) + pack_be32(0)
            + bytes((seg_type,)) + pack_be16(len(payload)) + payload)


def encode_mkv_segment(seg_type: int, payload: bytes) -> bytes:
    """3-byte header variant: type @0, size BE16 @1 (reference :100-107)."""
    return bytes((seg_type,)) + pack_be16(len(payload)) + payload


def encode_pcs_payload(width: int, height: int, fps_type: int, comp_num: int,
                       state: int, palette_update: bool, palette_id: int,
                       objects: list[tuple[int, int, bool, int, int]]) -> bytes:
    """PCS body per reference :120-162. ``objects`` entries are
    (object_id, window_id, forced, x, y); forced is bit 0x40 of the
    flags byte (:115)."""
    out = bytearray()
    out += pack_be16(width) + pack_be16(height)
    out.append(fps_type)
    out += pack_be16(comp_num)
    out.append(_STATE_BYTE[state])
    out.append(0x80 if palette_update else 0x00)
    out.append(palette_id)
    out.append(len(objects))
    for obj_id, window_id, forced, x, y in objects:
        out += pack_be16(obj_id)
        out.append(window_id)
        out.append(0x40 if forced else 0x00)
        out += pack_be16(x) + pack_be16(y)
    return bytes(out)


def encode_pds_payload(palette_id: int, version: int,
                       entries: list[tuple[int, int, int, int, int]]) -> bytes:
    """PDS body: id, version, then 5-byte entries (idx, Y, Cr, Cb, A)
    — buffer order per reference :632-640 (Y then Cr then Cb)."""
    out = bytearray((palette_id, version))
    for idx, y, cr, cb, a in entries:
        out += bytes((idx, y, cr, cb, a))
    return bytes(out)


def encode_ods_payloads(obj_id: int, version: int, width: int, height: int,
                        rle: bytes, max_fragment: int | None = None) -> list[bytes]:
    """ODS body/bodies per reference :217-257. If ``max_fragment`` is set
    and the RLE data exceeds it, emit first + continuation fragments
    (exercising reassembly :399-422)."""
    total = len(rle) + 4  # 3-byte data-length field counts width/height too
    if max_fragment is None or len(rle) <= max_fragment:
        chunks = [rle]
    else:
        chunks = [rle[i:i + max_fragment] for i in range(0, len(rle), max_fragment)]
    out = []
    for i, chunk in enumerate(chunks):
        first = i == 0
        last = i == len(chunks) - 1
        flags = (0x80 if first else 0x00) | (0x40 if last else 0x00)
        body = bytearray()
        body += pack_be16(obj_id)
        body.append(version)
        body.append(flags)
        if first:
            body += bytes(((total >> 16) & 0xFF, (total >> 8) & 0xFF, total & 0xFF))
            body += pack_be16(width) + pack_be16(height)
        body += chunk
        out.append(bytes(body))
    return out


def encode_wds_payload(windows: list[tuple[int, int, int, int, int]]) -> bytes:
    """WDS body: count, then 9-byte entries (id, x, y, w, h) — reference
    :344-363 (log-only in the reference; we keep it for stream fidelity)."""
    out = bytearray((len(windows),))
    for wid, x, y, w, h in windows:
        out.append(wid)
        out += pack_be16(x) + pack_be16(y) + pack_be16(w) + pack_be16(h)
    return bytes(out)


def encode_mkv_container(blocks: list[tuple[int, int, bytes]]) -> bytes:
    """Our container framing for the Matroska variant: MKPG magic then
    blocks of (start_ms BE32, end_ms BE32, len BE32, data). The data uses
    3-byte segment headers, mirroring what MatroskaSubtitle.GetData hands
    the reference (BluRaySupParserImageSharp.cs:36-58)."""
    out = bytearray(MKV_MAGIC)
    for start_ms, end_ms, data in blocks:
        out += pack_be32(start_ms) + pack_be32(end_ms) + pack_be32(len(data)) + data
    return bytes(out)


# ---------------------------------------------------------------------------
# RLE codec
#
# Decoder opcodes (reference BluRaySupParserExtensions.cs:65-134):
#   literal nonzero byte            -> 1 pixel of that palette index
#   0x00 0x00                       -> end of line (snap to next row start)
#   0x00 LL        (LL < 0x40)      -> LL pixels of index 0
#   0x00 0x40|hi lo                 -> ((hi&0x3F)<<8|lo) pixels of index 0
#   0x00 0x80|LL cc (LL < 0x40)     -> LL pixels of index cc
#   0x00 0xC0|hi lo cc              -> ((hi&0x3F)<<8|lo) pixels of index cc

def rle_encode(indices: np.ndarray) -> bytes:
    """Encode a 2-D uint8 palette-index bitmap into PGS RLE. Each row is
    emitted as runs followed by the 0x00 0x00 end-of-line marker. The
    output decodes to ``indices`` exactly under ``rle_decode``."""
    h, w = indices.shape
    out = bytearray()
    for r in range(h):
        row = indices[r]
        # run-length encode the row
        change = np.flatnonzero(np.diff(row)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [w]))
        for s, e in zip(starts, ends):
            v = int(row[s])
            n = int(e - s)
            if v == 0:
                while n > 0:
                    take = min(n, 0x3FFF)
                    if take < 0x40:
                        out += bytes((0x00, take))
                    else:
                        out += bytes((0x00, 0x40 | (take >> 8), take & 0xFF))
                    n -= take
            elif n == 1:
                out.append(v)
            else:
                while n > 0:
                    take = min(n, 0x3FFF)
                    if take == 1:
                        out.append(v)
                    elif take < 0x40:
                        out += bytes((0x00, 0x80 | take, v))
                    else:
                        out += bytes((0x00, 0xC0 | (take >> 8), take & 0xFF, v))
                    n -= take
        out += bytes((0x00, 0x00))
    return bytes(out)


def rle_decode_runs(buf: bytes, width: int):
    """Walk the RLE opcode stream once, yielding (linear_pixel_index,
    palette_index, run_length) with the exact cursor arithmetic of the
    reference decoder (incl. the end-of-line snap at :71-77). Returns a
    list of runs; the caller scatters them into an image. The loop is
    opcode-level (not pixel-level) and micro-optimized: it is the hot
    inner loop of the extract stage."""
    runs = []
    append = runs.append
    pos = 0          # num1: linear output cursor
    col = 0          # num2: pixels written in current line
    i = 0            # num3: input cursor
    n = len(buf)
    while i < n:
        b = buf[i]
        i += 1
        if b != 0 or i >= n:
            # literal single pixel (also taken when b==0 at end of input,
            # matching the reference's `color1 == 0 && num3 < len` guard)
            append((pos, b, 1))
            pos += 1
            col += 1
            continue
        op = buf[i]
        i += 1
        if op == 0:
            # end of line: snap to start of next row (reference :71-77)
            pos = pos // width * width
            if col < width:
                pos += width
            col = 0
            continue
        kind = op & 0xC0
        if kind == 0x80:
            if i < n:
                ln = op - 0x80
                append((pos, buf[i], ln))
                i += 1
                pos += ln
                col += ln
        elif kind == 0x40:
            if i < n:
                ln = ((op - 0x40) << 8) + buf[i]
                i += 1
                append((pos, 0, ln))
                pos += ln
                col += ln
        elif kind == 0xC0:
            if i < n:
                ln = ((op - 0xC0) << 8) + buf[i]
                append((pos, buf[i + 1], ln))
                i += 2
                pos += ln
                col += ln
        else:
            append((pos, 0, op))
            pos += op
            col += op
    return runs


# ---------------------------------------------------------------------------
# Palette

def build_palette_lut(palette_buffers: list[bytes]) -> np.ndarray:
    """Build the 256x4 RGBA uint8 LUT from palette buffers, replicating
    DecodePalette (reference :622-662): only the LAST version is used;
    entries are (idx, Y, Cr, Cb, A); an entry whose alpha >= the current
    alpha updates alpha, and alpha < 14 forces transparent-black
    (Y=16, Cr=Cb=128); the color channels are always rewritten.

    YCbCr->RGB is pinned to BT.601 limited-range (the BDSup2Sub lineage
    the reference's external libse palette implements):
      r = 1.164*(Y-16) + 1.596*(Cr-128)
      g = 1.164*(Y-16) - 0.813*(Cr-128) - 0.391*(Cb-128)
      b = 1.164*(Y-16) + 2.018*(Cb-128)
    rounded half-away-from-zero and clamped to [0, 255].
    """
    lut = np.zeros((256, 4), dtype=np.uint8)  # fresh palette: all transparent black
    if not palette_buffers:
        return lut
    buf = palette_buffers[-1]
    n = len(buf) // 5
    alpha = lut[:, 3].astype(np.int32)
    for e in range(n):
        o = e * 5
        idx = buf[o]
        y = buf[o + 1]
        cr = buf[o + 2]
        cb = buf[o + 3]
        a = buf[o + 4]
        if a >= alpha[idx]:
            if a < 14:
                y, cr, cb = 16, 128, 128
            alpha[idx] = a
        yy = 1.164 * (y - 16)
        r = yy + 1.596 * (cr - 128)
        g = yy - 0.813 * (cr - 128) - 0.391 * (cb - 128)
        b = yy + 2.018 * (cb - 128)
        rgb = np.clip(np.floor(np.array([r, g, b]) + 0.5), 0, 255).astype(np.uint8)
        lut[idx, 0], lut[idx, 1], lut[idx, 2] = rgb[0], rgb[1], rgb[2]
        lut[idx, 3] = alpha[idx]
    return lut
