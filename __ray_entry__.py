"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the DRIVER before this module is imported; no
ray.init()/ray.shutdown() here or in anything this calls.

- ``entry()``: flagship extraction pipeline (SURVEY.md §3) over the
  deterministic fixture corpus sized for sf0.001 smoke.
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 + the training-data additions; each takes sf_dir.
- ``oracle_sql()``: DuckDB equivalents for the SQL-expressible ones
  (pipeline/signature/approximate ops are rows-only by design).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# corpus sizing per sf dir (deterministic, cached under /tmp)
_CORPUS_FOR_SF = {
    "sf0.001": ("t1", 60),
    "sf0.01": ("t2", 300),
    "sf0.1": ("bench", 1500),
}


def _corpus_for(sf_dir: str) -> str:
    from pgstosrt_ray.sources.pages import materialize_corpus
    tail = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    name, n_urls = _CORPUS_FOR_SF.get(tail, ("t1", 60))
    return materialize_corpus(name, n_urls, seed=42)


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; driver checks rows>=0."""
    from pgstosrt_ray.pipelines.extract import extract_corpus_docs
    return extract_corpus_docs(_corpus_for("/root/testdata/sf0.001"))


def _extract_docs(sf_dir: str):
    from pgstosrt_ray.pipelines.extract import extract_corpus_docs
    return extract_corpus_docs(_corpus_for(sf_dir))


def _extract_docs_nomerge(sf_dir: str):
    from pgstosrt_ray.config import PipelineConfig
    from pgstosrt_ray.pipelines.extract import extract_corpus_docs
    return extract_corpus_docs(_corpus_for(sf_dir),
                               PipelineConfig(skip_merge=True))


def _demux_cues(sf_dir: str):
    import pyarrow as pa
    from pgstosrt_ray.sources.pages import read_pages
    from pgstosrt_ray.stages.demux import demux_batch
    ds = read_pages(_corpus_for(sf_dir))
    cues = ds.map_batches(demux_batch, batch_format="pyarrow", batch_size=32)

    def _list_min(col, default=0):
        # vectorized per-row min over a list column: segmented min via
        # np.minimum.reduceat; empty lists get ``default``
        import numpy as np
        arr = col.combine_chunks()
        offs = arr.offsets.to_numpy()
        vals = arr.flatten().to_numpy(zero_copy_only=False)
        starts = (offs[:-1] - offs[0]).astype(np.int64)
        lens = np.diff(offs)
        out = np.full(len(lens), default, dtype=np.int64)
        nonempty = lens > 0
        if nonempty.any() and len(vals):
            mins = np.minimum.reduceat(vals, starts[nonempty])
            out[nonempty] = mins
        return out.astype(np.int32)

    def project(t: pa.Table) -> pa.Table:
        # cue position = (min x, min y) over objects, (0,0) when empty
        # (SURVEY M19, reference GetPosition :695-698)
        pos_x = _list_min(t.column("obj_x"))
        pos_y = _list_min(t.column("obj_y"))
        out = t.select(["url", "seq", "comp_num", "start_ticks",
                        "end_ticks", "width", "height", "n_objects",
                        "forced", "palette_count"])
        out = out.append_column("pos_x", pa.array(pos_x, pa.int32()))
        return out.append_column("pos_y", pa.array(pos_y, pa.int32()))

    return cues.map_batches(project, batch_format="pyarrow")


def _media_features(sf_dir: str):
    from pgstosrt_ray.pipelines.multimodal import media_features
    from pgstosrt_ray.sources.pages import read_pages
    return media_features(read_pages(_corpus_for(sf_dir)))


def _media_frame_sample(sf_dir: str):
    from pgstosrt_ray.pipelines.multimodal import media_frame_sample
    from pgstosrt_ray.sources.pages import read_pages
    return media_frame_sample(read_pages(_corpus_for(sf_dir)))


def _media_thumbnail(sf_dir: str):
    from pgstosrt_ray.pipelines.multimodal import media_thumbnail
    from pgstosrt_ray.sources.pages import read_pages
    return media_thumbnail(read_pages(_corpus_for(sf_dir)))


def _url_section_stats(sf_dir: str):
    from pgstosrt_ray.pipelines.webops import url_section_stats
    return url_section_stats(_corpus_for(sf_dir))


def _lang_id(sf_dir: str):
    import pandas as pd
    import ray.data
    from pgstosrt_ray.functions.text import lang_id

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def li(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "lang_pred": lang_id(df["text"])})

    return ds.map_batches(li, batch_format="pandas")


def _quality_score(sf_dir: str):
    import pandas as pd
    import ray.data
    from pgstosrt_ray.functions.text import quality_score

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def qs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "quality": quality_score(df["text"])})

    return ds.map_batches(qs, batch_format="pandas")


# Registration ORDER is deliberate: the driver records exactly the
# first 50 registered entries per round. Round-5 layout (the round-4
# VERDICT's #1 task): positions 1-28 are the round-4 additions that
# have never had a driver-recorded CORRECTNESS row, 29-31 the flagship
# trio (always kept inside the cap), 32-47 the 16 queries whose last
# driver row was round 3 (displaced by the r4 cap), 48-50 the round-5
# additions. Everything r4-green rotates past 50 — its rows are fresh
# in CORRECTNESS_r04 and the union across rounds covers all of them.
_ROUND4_NEVER_DRIVER_CHECKED = (
    "repetition_scores", "decontaminate", "redact_pii",
    "percent_rank_chars", "tfidf_top_term",
    "kmeans_clusters", "kmeans_balanced_sample",
    "simhash_clusters", "event_type_pivot", "source_stats",
    "lang_top_tokens", "stratified_sample",
    "window_distinct_users", "dup_ngram_coverage", "dup_rate_by_source",
    "running_total", "grouped_p90", "asof_join_forward",
    "rolling_sum", "window_funnel",
    "bm25_search", "unigram_logprob", "cms_token_counts",
    "ann_ivf_pq", "ann_ivf_pq_rerank", "pca_project",
    "url_section_stats", "media_thumbnail",
)
_R3_ONLY_REFRESH = (
    "ann_brute_force", "ann_brute_multi", "ann_ivf", "ann_lsh",
    "cross_join", "full_outer_join", "left_outer_join",
    "embedding_near_dup", "minhash_clusters", "minhash_dedup_keep",
    "ngram_jaccard_pairs", "simhash_pairs", "inverted_index",
    "unnest_tokens", "prep_corpus", "semi_join_bloom",
)
_ROUND5_NEW = ("bigram_pmi", "perplexity_buckets", "idf_table")


def queries() -> dict[str, Callable[[str], Any]]:
    from pgstosrt_ray.pipelines import (dedupe, extended, relational,
                                        similarity, webops)
    registry: dict[str, Callable[[str], Any]] = {
        "extract_docs": _extract_docs,
        "extract_docs_nomerge": _extract_docs_nomerge,
        "demux_cues": _demux_cues,
        "media_features": _media_features,
        "media_frame_sample": _media_frame_sample,
        "media_thumbnail": _media_thumbnail,
        "url_section_stats": _url_section_stats,
        "lang_id": _lang_id,
        "quality_score": _quality_score,
    }
    registry.update(relational.QUERIES)
    registry.update(dedupe.QUERIES)
    registry.update(similarity.QUERIES)
    registry.update(extended.QUERIES)
    registry.update(webops.QUERIES)

    out: dict[str, Callable[[str], Any]] = {}
    head = (_ROUND4_NEVER_DRIVER_CHECKED
            + ("extract_docs", "extract_docs_nomerge", "demux_cues")
            + _R3_ONLY_REFRESH
            + tuple(n for n in _ROUND5_NEW if n in registry))
    for name in head:
        out[name] = registry[name]
    for name, fn in registry.items():
        out.setdefault(name, fn)
    return out


# language-ID / quality-score oracles: exact SQL re-expressions of
# functions/text.py lang_id and quality_score (same regexes, same
# float op order; integer-exact 'zh' threshold: cjk/n > 0.2 == 5*cjk > n)
_STOP_EN = r"\b(?:a|and|in|is|it|of|that|the|to|you)\b"
SQL_LANG_ID = f"""
WITH s AS (
  SELECT doc_id,
    length(regexp_extract_all(text, '[一-鿿぀-ヿ]')) AS cjk,
    GREATEST(length(text), 1) AS n,
    length(regexp_extract_all(lower(text), '{_STOP_EN}')) AS s_en,
    length(regexp_extract_all(lower(text),
      '\\b(?:de|el|en|la|los|no|que|se|un|y)\\b')) AS s_es,
    length(regexp_extract_all(lower(text),
      '\\b(?:de|des|du|en|et|la|le|les|que|un)\\b')) AS s_fr,
    length(regexp_extract_all(lower(text),
      '\\b(?:das|den|der|die|ein|ist|mit|und|von|zu)\\b')) AS s_de
  FROM documents)
SELECT doc_id,
  CASE WHEN cjk * 5 > n THEN 'zh'
       WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
       WHEN s_fr >= s_de THEN 'fr'
       ELSE 'de' END AS lang_pred
FROM s
"""

SQL_QUALITY_SCORE = f"""
WITH q AS (
  SELECT doc_id,
    length(text) AS n_chars,
    length(regexp_extract_all(text, '\\S+')) AS n_tokens,
    length(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
    length(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
    length(regexp_extract_all(lower(text), '{_STOP_EN}')) AS n_stopwords
  FROM documents)
SELECT doc_id,
  CAST(0.25 AS DOUBLE)
    * (CASE WHEN n_chars >= 50 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END)
  + CAST(0.35 AS DOUBLE) * (n_alpha / GREATEST(n_chars, 1))
  + CAST(0.2 AS DOUBLE)
    * (CAST(1.0 AS DOUBLE)
       - LEAST(n_punct / GREATEST(n_chars, 1), CAST(0.5 AS DOUBLE))
         * CAST(2.0 AS DOUBLE))
  + CAST(0.2 AS DOUBLE)
    * (LEAST(n_stopwords / GREATEST(n_tokens, 1), CAST(0.5 AS DOUBLE))
       * CAST(2.0 AS DOUBLE)) AS quality
FROM q
"""


def oracle_sql() -> dict[str, str]:
    from pgstosrt_ray.pipelines import (dedupe, extended, relational,
                                        similarity, webops)
    out: dict[str, str] = {}
    out.update(relational.ORACLE_SQL)
    out.update(dedupe.ORACLE_SQL)
    out.update(similarity.ORACLE_SQL)
    out.update(extended.ORACLE_SQL)
    out.update(webops.ORACLE_SQL)
    out["lang_id"] = SQL_LANG_ID
    out["quality_score"] = SQL_QUALITY_SCORE
    # flagship oracles: the deterministic golden parquet written by the
    # single-threaded oracle at corpus materialization (driver compares
    # at sf0.01; _corpus_for also ensures the files exist)
    corpus = _corpus_for("/root/testdata/sf0.01")
    out["extract_docs"] = ("SELECT url, text, n_cues FROM "
                           f"read_parquet('{corpus}/golden.parquet')")
    out["extract_docs_nomerge"] = (
        "SELECT url, text, n_cues FROM "
        f"read_parquet('{corpus}/golden_nomerge.parquet')")
    out["demux_cues"] = ("SELECT * FROM "
                         f"read_parquet('{corpus}/golden_cues.parquet')")
    out["media_features"] = _media_features_sql(corpus)
    from pgstosrt_ray.pipelines.webops import sql_url_section_stats
    out["url_section_stats"] = sql_url_section_stats(corpus)
    # round-3: the signature/sketch/approximate queries are value-
    # checked against golden parquet computed by the INDEPENDENT
    # single-threaded oracle (pgstosrt_ray/golden.py — fresh
    # implementations of the same seeded algorithms, no shared kernels)
    from pgstosrt_ray.golden import ensure_goldens
    gpaths = ensure_goldens("/root/testdata/sf0.01", corpus)
    for name, cols in _GOLDEN_COLS.items():
        out[name] = (f"SELECT {cols} FROM "
                     f"read_parquet('{gpaths[name]}')")
    return out


_GOLDEN_COLS = {
    "minhash_pairs": "doc_a, doc_b, est_jaccard",
    "minhash_clusters": "doc_id, cluster_id",
    "minhash_dedup_keep": "doc_id",
    "simhash_pairs": "doc_a, doc_b, hamming",
    "simhash_clusters": "doc_id, cluster_id",
    "cms_token_counts": "token, est_n",
    "bm25_search": "doc_id, score",
    "unigram_logprob": "doc_id, n_tokens, nll_per_tok",
    "perplexity_buckets": "doc_id, nll_per_tok, ppl_bucket",
    "ngram_jaccard_pairs": "doc_a, doc_b, jaccard3",
    "embedding_near_dup": "doc_a, doc_b, cosine",
    "ann_lsh": "vec_id, sim",
    "ann_ivf": "vec_id, sim",
    "ann_ivf_pq": "vec_id, adc",
    "ann_ivf_pq_rerank": "vec_id, sim",
    "pca_project": ("vec_id, pc0, pc1, pc2, pc3, pc4, pc5, pc6, pc7"),
    "kmeans_clusters": "vec_id, cluster, sim",
    "kmeans_balanced_sample": "vec_id, cluster, sim",
    "rolling_fingerprint": "doc_id, rfp",
    "hll_distinct_users": "n_users_approx",
    "approx_quantiles": "q, est_cents",
    "grouped_approx_quantiles": "event_type, q, est_cents",
    "media_frame_sample": ("url, frame_idx, start_ms, end_ms, "
                           "n_bytes, frame_sha"),
    "media_thumbnail": "url, obj_w, obj_h, thumb_sha",
}


def _media_features_sql(corpus: str) -> str:
    """Exact SQL re-expression of MediaFeatureStage (multimodal.py):
    magic sniffing over the blob's hex prefix, and the deterministic
    fake feature = 8 little-endian uint32s of md5(hex(blob)) +
    md5(md5-hexdigest) divided by 2^32 as FLOAT."""
    def u32(d: str, base: str) -> str:
        return (f"(('0x' || substr({d}, (i%4)*8 + 1, 2))::BIGINT"
                f" + ('0x' || substr({d}, (i%4)*8 + 3, 2))::BIGINT * 256"
                f" + ('0x' || substr({d}, (i%4)*8 + 5, 2))::BIGINT * 65536"
                f" + ('0x' || substr({d}, (i%4)*8 + 7, 2))::BIGINT"
                f" * 16777216)")
    return f"""
WITH p AS (
  SELECT url, hex(html) AS hx, octet_length(html) AS n_bytes
  FROM read_parquet('{corpus}/pages/*.parquet')
), h AS (
  SELECT url, n_bytes, hx, md5(hx) AS h1d FROM p
), g AS (
  SELECT url, n_bytes, hx, h1d, md5(h1d) AS h2d FROM h
)
SELECT url,
  CAST(n_bytes AS BIGINT) AS n_bytes,
  CASE WHEN substr(hx, 1, 4) = '5047' THEN 'PG'
       WHEN substr(hx, 1, 8) = '4D4B5047' THEN 'MKPG'
       WHEN substr(hx, 1, 8) = '89504E47' THEN 'PNG'
       WHEN substr(hx, 1, 6) = '494433'
            OR substr(hx, 1, 4) = 'FFFB' THEN 'MP3'
       ELSE '?' END AS magic,
  CASE WHEN substr(hx, 1, 4) = '5047' THEN 'image'
       WHEN substr(hx, 1, 8) = '4D4B5047' THEN 'video'
       WHEN substr(hx, 1, 8) = '89504E47' THEN 'image'
       WHEN substr(hx, 1, 6) = '494433'
            OR substr(hx, 1, 4) = 'FFFB' THEN 'audio'
       ELSE 'unknown' END AS media_type,
  list_transform(range(8), i -> CAST(
    {u32("CASE WHEN i < 4 THEN h1d ELSE h2d END", "")}
    / 4294967296.0 AS FLOAT)) AS feature
FROM g
"""
