"""Distributed cardinality sketch: deterministic HyperLogLog.

The 100 TB shape: every batch folds into a fixed 2^P-byte register
array (map-side combine — the ONLY thing that ever leaves a worker),
register arrays merge by elementwise max (associative + commutative,
so any merge tree gives the same answer), and the estimate is computed
once from the final 4 KiB array. No shuffle of raw values, driver
traffic bounded by n_batches * 4 KiB.

Standard HLL estimator (Flajolet et al. 2007): alpha_m * m^2 /
sum(2^-M), with linear-counting small-range correction below 2.5m.
Hashing is sha1-based (functions.text.sha1_u64): deterministic across
processes, no PYTHONHASHSEED dependence.
"""

from __future__ import annotations

import numpy as np

P = 12                       # 4096 registers
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)  # alpha_m for m >= 128


def registers_of(hashes: np.ndarray) -> np.ndarray:
    """uint64 hashes -> (M,) uint8 register array (max rank per
    bucket). Vectorized: no per-value Python."""
    regs = np.zeros(M, dtype=np.uint8)
    if hashes.size == 0:
        return regs
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)  # pad tail with 1s
    # rank = leading zeros of `rest` + 1, in [1, 64-P+1] (tail 1s cap it)
    nbits = 64
    cur = rest.copy()
    # binary-search leading zeros, vectorized over 6 steps
    shift = 32
    acc = np.zeros(h.size, dtype=np.int64)
    while shift:
        top = cur >> np.uint64(nbits - shift)
        zero_top = top == 0
        acc = np.where(zero_top, acc + shift, acc)
        cur = np.where(zero_top, cur << np.uint64(shift), cur)
        shift //= 2
    rank = (acc + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def merge_registers(blobs: list[bytes]) -> np.ndarray:
    out = np.zeros(M, dtype=np.uint8)
    for b in blobs:
        out = np.maximum(out, np.frombuffer(b, dtype=np.uint8))
    return out


def estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with small-range linear counting."""
    regs = regs.astype(np.float64)
    e = _ALPHA * M * M / np.sum(np.exp2(-regs))
    if e <= 2.5 * M:
        zeros = int(np.sum(regs == 0))
        if zeros:
            return M * np.log(M / zeros)
    return float(e)


# ---------------------------------------------------- count-min sketch
# Frequency sketch with the same 100 TB shape as the HLL above: each
# batch folds token occurrences into a fixed (D x W) int64 grid (the
# only worker output, 256 KiB), grids merge by ELEMENTWISE SUM —
# associative, commutative AND exact in int64, so any merge tree gives
# bit-identical counts — and point queries read min over the D rows
# (Cormode & Muthukrishnan 2005). Row hashing is multiply-shift over
# the sha1-u64 item hash with fixed public mixing constants
# (splitmix64 / xxhash primes): deterministic across processes and
# engines, no PYTHONHASHSEED dependence.
CMS_D = 4
CMS_W_BITS = 13
CMS_W = 1 << CMS_W_BITS          # 8192 columns
CMS_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                  0x165667B19E3779F9, 0x27D4EB2F165667C5],
                 dtype=np.uint64)
CMS_B = np.array([0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x165667B1],
                 dtype=np.uint64)


def cms_indices(hashes: np.ndarray) -> np.ndarray:
    """(D, n) column indices for uint64 item hashes (vectorized
    multiply-shift: ((h*A_i + B_i) mod 2^64) >> (64 - W_BITS))."""
    h = hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = CMS_A[:, None] * h[None, :] + CMS_B[:, None]
    return (mixed >> np.uint64(64 - CMS_W_BITS)).astype(np.int64)


def cms_of(hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(unique-item hashes, occurrence counts) -> (D, W) int64 grid."""
    grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if hashes.size == 0:
        return grid
    idx = cms_indices(hashes)
    c = counts.astype(np.int64)
    for i in range(CMS_D):
        np.add.at(grid[i], idx[i], c)
    return grid


def cms_merge(blobs: list[bytes]) -> np.ndarray:
    out = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for b in blobs:
        out += np.frombuffer(b, dtype=np.int64)
    return out.reshape(CMS_D, CMS_W)


def cms_query(grid: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over the D rows (>= true count,
    overshoot bounded by e*N/W with prob 1-e^-D per query)."""
    if hashes.size == 0:
        return np.zeros(0, dtype=np.int64)
    idx = cms_indices(hashes)
    ests = np.stack([grid[i][idx[i]] for i in range(CMS_D)])
    return ests.min(axis=0).astype(np.int64)
