"""Near-duplicate detection kernels: shingling, MinHash, SimHash.

Vectorized with numpy (uint64 wraparound arithmetic); deterministic
(fixed seeds, no process hashing). Designed to be computed per batch
inside ``map_batches`` and shuffled as small signature rows, never as
full texts (SURVEY §4 / ray_guide aggregation-at-scale pattern).
"""

from __future__ import annotations

import numpy as np

_MERSENNE = (1 << 61) - 1
_B = np.uint64(1099511628211)  # FNV-ish odd multiplier for rolling hash


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of all k-byte shingles (vectorized rolling hash)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if data.size < k:
        data = np.pad(data, (0, k - data.size), constant_values=0)
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    powers = np.array([_B ** np.uint64(k - 1 - j) for j in range(k)],
                      dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (win * powers).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """uint64 hashes of word n-grams (for n-gram Jaccard)."""
    words = text.split()
    if len(words) < n:
        words = words + [""] * (n - len(words))
    grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        b = np.frombuffer(g.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = np.uint64(1469598103934665603)
            for v in b:  # small loops per gram; grams are short
                h = np.uint64((h ^ v) * _B)
        out[i] = h
    return np.unique(out)


class MinHasher:
    """k-permutation MinHash over shingle hash sets."""

    def __init__(self, num_perm: int = 128, seed: int = 1234):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)\
            .astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)\
            .astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 MinHash signature."""
        if hashes.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = (self.a[:, None] * hashes[None, :] + self.b[:, None])
        return m.min(axis=1)

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split the signature into ``bands`` rows-per-band groups and hash
    each band to a bucket key (int64-safe)."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        band = sig[b * rows:(b + 1) * rows]
        with np.errstate(over="ignore"):
            h = np.uint64(14695981039346656037)
            for v in band:
                h = np.uint64((h ^ v) * _B)
        keys.append(int(h >> np.uint64(1)))  # fits int64
    return keys


def lsh_band_keys_matrix(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """Vectorized ``lsh_band_keys`` over a (n_docs, num_perm) uint64
    signature matrix -> (n_docs, bands) int64; row-for-row identical to
    calling ``lsh_band_keys`` per signature (pinned by test)."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    with np.errstate(over="ignore"):
        h = np.full((n, bands), np.uint64(14695981039346656037),
                    dtype=np.uint64)
        for r in range(rows):  # loop over rows-per-band (e.g. 8), not docs
            cols = np.arange(bands) * rows + r
            h = (h ^ sigs[:, cols]) * _B
    return (h >> np.uint64(1)).astype(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (for SimHash hamming)."""
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    bytes_view = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return np.unpackbits(bytes_view.reshape(x.size, 8),
                         axis=1).sum(axis=1).astype(np.int64)


def salt_bucket(band: np.ndarray, key: np.ndarray,
                groups: int) -> np.ndarray:
    """Deterministic shuffle-group id for a (band, key) bucket: the
    wide groupby runs over ``groups`` salted groups (a scale knob that
    grows with the cluster) instead of one group per band; the exact
    per-(band, key) pairing happens in-process inside each group."""
    with np.errstate(over="ignore"):
        mixed = (key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 ^ (band.astype(np.uint64) + np.uint64(0x1B873593)) * _B)
    return (mixed % np.uint64(groups)).astype(np.int32)


def simhash64(token_hashes: np.ndarray,
              weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a token hash multiset."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    w = (weights if weights is not None
         else np.ones(len(token_hashes)))[:, None]
    score = ((bits * 2 - 1) * w).sum(axis=0)
    out = 0
    for i in range(64):
        if score[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two unique-hash arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def union_find_clusters(pairs: list[tuple[int, int]],
                        ids: list[int]) -> dict[int, int]:
    """Min-label union-find: id -> cluster representative (min id).
    Driver-side only for provably small candidate sets; the scale path
    is iterative min-label propagation via groupby (documented in
    pipelines/dedupe.py)."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in ids}
