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
