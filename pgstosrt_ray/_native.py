"""Optional C kernel for the RLE opcode walk (the engine's hottest
loop: ~1.3us/opcode in CPython, tens of millions of opcodes per batch).

Compiled on first use with the system C compiler into a cached shared
object; everything degrades to the pure-Python reference implementation
in format.rle_decode_runs when no compiler is available. The C walk is
a LINE-FOR-LINE mirror of the Python loop (same reference semantics,
BluRaySupParserExtensions.cs:55-134) and is covered by the same
round-trip/property tests through decode_object_indexed.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

/* Walk the PGS RLE opcode stream; emit (pos, idx, len) runs with the
   exact cursor arithmetic of the decoder (incl. end-of-line snap).
   Returns the number of runs. out arrays must hold >= n entries. */
int rle_decode_runs(const uint8_t* buf, int n, int width,
                    int32_t* out_pos, int32_t* out_idx, int32_t* out_len)
{
    int pos = 0, col = 0, i = 0, r = 0;
    while (i < n) {
        uint8_t b = buf[i++];
        if (b != 0 || i >= n) {
            out_pos[r] = pos; out_idx[r] = b; out_len[r] = 1; r++;
            pos += 1; col += 1;
            continue;
        }
        uint8_t op = buf[i++];
        if (op == 0) {
            pos = pos / width * width;
            if (col < width) pos += width;
            col = 0;
            continue;
        }
        uint8_t kind = op & 0xC0;
        if (kind == 0x80) {
            if (i < n) {
                int ln = op - 0x80;
                out_pos[r] = pos; out_idx[r] = buf[i]; out_len[r] = ln; r++;
                i += 1; pos += ln; col += ln;
            }
        } else if (kind == 0x40) {
            if (i < n) {
                int ln = ((op - 0x40) << 8) + buf[i];
                out_pos[r] = pos; out_idx[r] = 0; out_len[r] = ln; r++;
                i += 1; pos += ln; col += ln;
            }
        } else if (kind == 0xC0) {
            if (i + 1 < n) {
                int ln = ((op - 0xC0) << 8) + buf[i];
                out_pos[r] = pos; out_idx[r] = buf[i + 1]; out_len[r] = ln; r++;
                i += 2; pos += ln; col += ln;
            } else if (i < n) {
                /* mirror Python: reads buf[i+1] would raise; stop */
                return -1;
            }
        } else {
            out_pos[r] = pos; out_idx[r] = 0; out_len[r] = op; r++;
            pos += op; col += op;
        }
    }
    return r;
}

/* Expand runs into the index image: last-write-wins scatter with
   bounds clamping, matching the numpy path. Returns total pixels the
   cursor covered (sum of in-bounds run lengths written). */
void expand_runs(const int32_t* pos, const int32_t* idx,
                 const int32_t* len, int nruns,
                 uint8_t* img, uint8_t* written, int n)
{
    for (int r = 0; r < nruns; r++) {
        int p = pos[r];
        int e = p + len[r];
        if (e > n) e = n;
        if (p < 0 || p >= e) continue;
        uint8_t v = (uint8_t) idx[r];
        for (int k = p; k < e; k++) { img[k] = v; written[k] = 1; }
    }
}
"""


def _build() -> str | None:
    cache = os.path.join(tempfile.gettempdir(), "pgstosrt_native")
    os.makedirs(cache, exist_ok=True)
    tag = hashlib.sha1(_C_SRC.encode()).hexdigest()[:12]
    so_path = os.path.join(cache, f"rle_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    c_path = os.path.join(cache, f"rle_{tag}.c")
    with open(c_path, "w") as f:
        f.write(_C_SRC)
    try:
        subprocess.run(["cc", "-O2", "-shared", "-fPIC", "-o",
                        so_path + ".tmp", c_path],
                       check=True, capture_output=True)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(so)
            lib.rle_decode_runs.restype = ctypes.c_int
            lib.rle_decode_runs.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.expand_runs.restype = None
            lib.expand_runs.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
            _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


_I32P = ctypes.POINTER(ctypes.c_int32)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def rle_decode_runs_arrays(buf: bytes, width: int):
    """(pos, idx, len) int32 arrays via the C kernel, or None if the
    kernel is unavailable or the stream is truncated mid-opcode (the
    Python path then raises exactly like the reference would)."""
    lib = _lib()
    if lib is None:
        return None
    n = len(buf)
    pos = np.empty(n + 1, dtype=np.int32)
    idx = np.empty(n + 1, dtype=np.int32)
    ln = np.empty(n + 1, dtype=np.int32)
    r = lib.rle_decode_runs(buf, n, width,
                            pos.ctypes.data_as(_I32P),
                            idx.ctypes.data_as(_I32P),
                            ln.ctypes.data_as(_I32P))
    if r < 0:
        return None
    return pos[:r], idx[:r], ln[:r]


def expand_runs_into(pos: np.ndarray, idx: np.ndarray, ln: np.ndarray,
                     img: np.ndarray, written: np.ndarray) -> bool:
    """Scatter runs into flat uint8 ``img`` (+``written``) via C."""
    lib = _lib()
    if lib is None:
        return False
    lib.expand_runs(pos.ctypes.data_as(_I32P), idx.ctypes.data_as(_I32P),
                    ln.ctypes.data_as(_I32P), len(pos),
                    img.ctypes.data_as(_U8P), written.ctypes.data_as(_U8P),
                    img.size)
    return True
