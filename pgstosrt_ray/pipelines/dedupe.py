"""Deduplication pipelines over the ``documents`` table (task-mandated
training-data operators, alongside SURVEY §2.7 D1/D2).

Scale notes (100 TB design):
  - signatures are computed per batch in ``map_batches`` and only the
    small (doc_id, band_key / simhash / signature) rows shuffle;
  - candidate generation is a ``groupby`` on band buckets — the only
    wide op; texts never shuffle;
  - cluster labeling here uses driver-side union-find over the
    candidate PAIRS (provably small: bounded by LSH collisions). The
    1e12-row path replaces it with iterative min-label propagation:
    repeat (pair -> groupby(node).min(label)) until fixpoint, each
    round a small shuffle over the pair list only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.dedup import (MinHasher, char_shingle_hashes, hamming64,
                               jaccard, lsh_band_keys, simhash64,
                               union_find_clusters, word_ngram_hashes)

NUM_PERM = 128
BANDS = 16


def _read_docs(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


class MinHashSignatures:
    """Actor-pool stage: warm MinHasher (permutation tables built once
    per actor — the O1 pattern) computing signatures per batch."""

    def __init__(self, num_perm: int = NUM_PERM):
        self.hasher = MinHasher(num_perm=num_perm)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.hasher.signature(char_shingle_hashes(t))
                for t in df["text"]]
        return pd.DataFrame({
            "doc_id": df["doc_id"].values,
            "sig": [s.astype(np.int64).tobytes() for s in sigs],
        })


def minhash_candidate_pairs(sf_dir: str, threshold: float = 0.5):
    """documents -> candidate near-dup pairs with estimated Jaccard.

    shingle -> minhash (actor pool) -> explode to (band_key, doc_id)
    -> groupby(band) -> within-bucket pairs -> signature-estimate
    Jaccard >= threshold -> distinct pairs.
    """
    import ray.data
    sigs = _read_docs(sf_dir).map_batches(
        MinHashSignatures, batch_format="pandas", batch_size=256,
        concurrency=2)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"band": [], "key": [], "doc_id": [], "sig": []}
        for doc_id, sig in zip(df["doc_id"], df["sig"]):
            s = np.frombuffer(sig, dtype=np.int64).astype(np.uint64)
            for band, key in enumerate(lsh_band_keys(s, bands=BANDS)):
                rows["band"].append(band)
                rows["key"].append(key)
                rows["doc_id"].append(doc_id)
                rows["sig"].append(sig)
        return pd.DataFrame(rows)

    buckets = sigs.map_batches(explode, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_a": [], "doc_b": [], "est_jaccard": []}
        # one Ray group per BAND (few, large groups — per-(band,key)
        # map_groups costs ~ms of overhead per tiny group); the inner
        # per-bucket pairing is an in-process pandas groupby. At 1e12
        # scale, group by (band, key_prefix) for more parallelism.
        for _, bucket in g.groupby("key", sort=True):
            if len(bucket) < 2:
                continue
            bucket = bucket.sort_values("doc_id")
            ids = bucket["doc_id"].tolist()
            sigs_ = [np.frombuffer(s, dtype=np.int64) for s in bucket["sig"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    est = float((sigs_[i] == sigs_[j]).mean())
                    if est >= threshold:
                        out["doc_a"].append(ids[i])
                        out["doc_b"].append(ids[j])
                        out["est_jaccard"].append(est)
        return pd.DataFrame(out).astype({"doc_a": "int64", "doc_b": "int64",
                                         "est_jaccard": "float64"})

    pair_ds = buckets.groupby("band").map_groups(
        bucket_pairs, batch_format="pandas")
    # same pair can surface from many bands: distinct
    from ray.data.aggregate import Max
    return pair_ds.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


def minhash_dedup_clusters(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """documents -> (doc_id, cluster_id) via MinHash-LSH + union-find."""
    pairs_tbl = minhash_candidate_pairs(sf_dir, threshold).to_pandas()
    ids = _read_docs(sf_dir).select_columns(["doc_id"]).to_pandas()
    labels = union_find_clusters(
        list(zip(pairs_tbl["doc_a"], pairs_tbl["doc_b"])),
        ids["doc_id"].tolist())
    return pa.table({
        "doc_id": pa.array(sorted(labels), pa.int64()),
        "cluster_id": pa.array([labels[i] for i in sorted(labels)],
                               pa.int64()),
    })


def simhash_signatures(sf_dir: str):
    """documents -> (doc_id, simhash, band0..band3): 64-bit SimHash with
    4x16-bit bands for candidate bucketing (hamming<=3 guarantee)."""

    def sh(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": df["doc_id"].values, "simhash": [],
               "band0": [], "band1": [], "band2": [], "band3": []}
        for t in df["text"]:
            h = simhash64(word_ngram_hashes(t, n=1))
            out["simhash"].append(np.int64(np.uint64(h)))
            for b in range(4):
                out[f"band{b}"].append((h >> (16 * b)) & 0xFFFF)
        return pd.DataFrame(out)

    return _read_docs(sf_dir).map_batches(sh, batch_format="pandas",
                                          batch_size=256)


def simhash_near_dup_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash banding: equal 16-bit band => candidate; verify hamming."""
    sigs = simhash_signatures(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in df.iterrows():
            for b in range(4):
                rows.append((b, int(r[f"band{b}"]), int(r["doc_id"]),
                             int(r["simhash"])))
        return pd.DataFrame(rows, columns=["band", "key", "doc_id",
                                           "simhash"])

    buckets = sigs.map_batches(explode, batch_format="pandas")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for _, bucket in g.groupby("key", sort=True):
            if len(bucket) < 2:
                continue
            bucket = bucket.sort_values("doc_id")
            recs = list(zip(bucket["doc_id"], bucket["simhash"]))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    mask = (1 << 64) - 1
                    d = hamming64(int(recs[i][1]) & mask,
                                  int(recs[j][1]) & mask)
                    if d <= max_hamming:
                        out["doc_a"].append(recs[i][0])
                        out["doc_b"].append(recs[j][0])
                        out["hamming"].append(d)
        return pd.DataFrame(out).astype({"doc_a": "int64", "doc_b": "int64",
                                         "hamming": "int64"})

    pair_ds = buckets.groupby("band").map_groups(
        band_pairs, batch_format="pandas")
    from ray.data.aggregate import Min
    return pair_ds.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def ngram_jaccard_verify(sf_dir: str, threshold: float = 0.3) -> pa.Table:
    """Exact word-3-gram Jaccard verification of the MinHash candidate
    pairs (texts fetched only for the candidate ids — broadcast the
    small candidate set, not the corpus)."""
    import ray
    import ray.data
    cand = minhash_candidate_pairs(sf_dir, threshold=0.2).to_pandas()
    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    if not need:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard3": pa.array([], pa.float64())})
    need_ref = ray.put(set(need))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(need_ref)
        return df[df["doc_id"].isin(wanted)]

    texts = _read_docs(sf_dir).map_batches(
        pick, batch_format="pandas").to_pandas()
    grams = {i: word_ngram_hashes(t, n=3)
             for i, t in zip(texts["doc_id"], texts["text"])}
    out = {"doc_a": [], "doc_b": [], "jaccard3": []}
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        j = jaccard(grams[int(a)], grams[int(b)])
        if j >= threshold:
            out["doc_a"].append(int(a))
            out["doc_b"].append(int(b))
            out["jaccard3"].append(j)
    return pa.table({"doc_a": pa.array(out["doc_a"], pa.int64()),
                     "doc_b": pa.array(out["doc_b"], pa.int64()),
                     "jaccard3": pa.array(out["jaccard3"], pa.float64())})


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.35):
    """Embedding-cosine near-dup: block-wise matmul of normalized
    vectors against a broadcast matrix; emits pairs above threshold.
    At 1e12 scale the broadcast side becomes IVF cells (similarity.py);
    the per-batch kernel is the same."""
    import ray
    import ray.data
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"]).to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
    ids = emb["vec_id"].to_numpy()
    mat_ref = ray.put((ids, mat))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(mat_ref)
        q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
        sims = q @ all_mat.T
        qa, qb = np.nonzero(sims >= threshold)
        doc_a = df["vec_id"].to_numpy()[qa]
        doc_b = all_ids[qb]
        keep = doc_a < doc_b  # dedupe symmetric pairs, drop self
        return pd.DataFrame({"doc_a": doc_a[keep], "doc_b": doc_b[keep],
                             "cosine": sims[qa, qb][keep]})

    return ds.map_batches(block, batch_format="pandas", batch_size=256)


QUERIES = {
    "minhash_pairs": minhash_candidate_pairs,
    "minhash_clusters": minhash_dedup_clusters,
    "simhash_pairs": simhash_near_dup_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_verify,
    "embedding_near_dup": embedding_near_dup_pairs,
}

# non-SQL-expressible (signature algorithms): rows-only driver checks
ORACLE_SQL: dict[str, str] = {}
