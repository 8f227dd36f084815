"""Trainer-sample sizing (round-4 VERDICT #2): driver-side samples
must scale with MODEL size (cells / centroids / codewords), not stay
fixed at 2048. The fixture here makes the failure deterministic: ids
are laid out so the 2048 smallest-hash rows cover only 32 of 64 true
clusters, while the scaled sample (256 x n_cells = 16384) covers all
64 — so a 2048-point fit provably cannot place a centroid near half
the data and IVF recall collapses for those clusters."""

import numpy as np
import pandas as pd
import pytest

N_ROWS = 24576
N_CLUSTERS = 64
DIM = 64


@pytest.fixture(scope="module")
def skewed_embeddings(tmp_path_factory):
    from pgstosrt_ray.pipelines.similarity import _sample_hash
    ids = np.arange(N_ROWS, dtype=np.int64)
    h = _sample_hash(ids)
    rnk = np.empty(N_ROWS, dtype=np.int64)
    rnk[np.lexsort((ids, h))] = np.arange(N_ROWS)
    # hash-rank < 2048 (exactly the fixed-sample draw) -> clusters
    # 0..31 only; everything else round-robins over all 64
    cluster = np.where(rnk < 2048, rnk % 32, rnk % N_CLUSTERS)
    noise = np.random.RandomState(7).randn(N_ROWS, DIM) * 0.05
    m = noise
    m[np.arange(N_ROWS), cluster] += 1.0
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    d = str(tmp_path_factory.mktemp("skewed"))
    pd.DataFrame({
        "vec_id": ids,
        "embedding": list(m.astype(np.float32)),
        "label": cluster.astype(np.int32),
    }).to_parquet(f"{d}/embeddings.parquet")
    return d, m.astype(np.float64), cluster


def _ivf_recall(cent: np.ndarray, m: np.ndarray, cluster: np.ndarray,
                nprobe: int = 4, k: int = 10) -> float:
    """Mean top-k recall of centroid-probed search over one query per
    VICTIM cluster (32..63 — the ones the fixed sample misses)."""
    cell = np.argmax(m @ cent.T, axis=1)
    recalls = []
    for c in range(32, N_CLUSTERS):
        q = m[np.flatnonzero(cluster == c)[0]]
        truth = set(np.argsort(-(m @ q))[:k])
        probed = np.argsort(-(cent @ q))[:nprobe]
        cand = np.flatnonzero(np.isin(cell, probed))
        got = set(cand[np.argsort(-(m[cand] @ q))[:k]])
        recalls.append(len(truth & got) / k)
    return float(np.mean(recalls))


def test_sample_rule_values():
    from pgstosrt_ray.pipelines.similarity import (PQ_K,
                                                   trainer_sample_size)
    assert trainer_sample_size() == 2048
    assert trainer_sample_size(k=8) == 2048          # 64*8 < floor
    assert trainer_sample_size(k=64) == 4096
    assert trainer_sample_size(n_cells=32) == 8192
    assert trainer_sample_size(n_cells=64) == 16384
    assert trainer_sample_size(n_cells=8, pq_k=PQ_K) == 4096


def test_fixed_2048_sample_undertrains_scaled_recovers(
        ray_session, skewed_embeddings):
    from pgstosrt_ray.pipelines import similarity
    d, m, cluster = skewed_embeddings
    cent_small, _ = similarity.build_ivf_index(d, n_cells=N_CLUSTERS,
                                               sample=2048)
    cent_scaled, _ = similarity.build_ivf_index(d, n_cells=N_CLUSTERS)
    assert similarity.trainer_sample_size(n_cells=N_CLUSTERS) == 16384
    r_small = _ivf_recall(cent_small, m, cluster)
    r_scaled = _ivf_recall(cent_scaled, m, cluster)
    # the fixed sample contains ZERO points from clusters 32..63, so
    # no centroid can sit near them; the scaled sample has ~224 each
    # (measured: 0.384 vs 1.0 at nprobe=4)
    assert r_small <= 0.55, r_small
    assert r_scaled >= 0.95, r_scaled
