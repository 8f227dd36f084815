"""The round-3 value gate for the signature/sketch/approximate
queries: every former ``no_oracle`` query must match the INDEPENDENT
single-threaded golden oracle (pgstosrt_ray/golden.py) bit-exactly —
the same compare the driver runs at sf0.01 via
``oracle_sql() -> SELECT ... FROM read_parquet(golden_*.parquet)``."""

import pandas as pd
import pyarrow as pa
import pytest

from pgstosrt_ray import golden

SF_DIR = "/root/testdata/sf0.001"


def _to_df(result) -> pd.DataFrame:
    import ray
    import ray.data
    if isinstance(result, ray.data.Dataset):
        tabs = [t for t in ray.get(result.to_arrow_refs()) if t.num_rows]
        t = pa.concat_tables(tabs) if tabs else pa.table({})
    elif isinstance(result, pa.Table):
        t = result
    else:
        t = pa.Table.from_pandas(result, preserve_index=False)
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _query(name):
    import __ray_entry__
    return __ray_entry__.queries()[name]


CASES = sorted(n for n, (_, kind) in golden.GOLDEN_BUILDERS.items()
               if kind == "sf")


@pytest.mark.parametrize("name", CASES)
def test_matches_independent_golden(ray_session, name):
    builder, _ = golden.GOLDEN_BUILDERS[name]
    ours = _to_df(_query(name)(SF_DIR))
    exp = _to_df(builder(SF_DIR))
    assert list(ours.columns) == list(exp.columns)
    assert len(ours) == len(exp)
    pd.testing.assert_frame_equal(ours, exp, check_dtype=False)


def test_media_frame_sample_matches_golden(ray_session):
    from pgstosrt_ray.pipelines.multimodal import media_frame_sample
    from pgstosrt_ray.sources.pages import materialize_corpus, read_pages
    corpus = materialize_corpus("t1", 60, seed=42)
    ours = _to_df(media_frame_sample(read_pages(corpus)))
    exp = _to_df(golden.golden_media_frame_sample(corpus))
    pd.testing.assert_frame_equal(ours, exp, check_dtype=False)


def test_media_thumbnail_matches_golden(ray_session):
    """REAL pixel path: the pipeline decodes + resizes with its own
    RLE kernel; the golden carries an independent segment walk AND an
    independent RLE decoder (golden._gold_rle_decode)."""
    from pgstosrt_ray.pipelines.multimodal import media_thumbnail
    from pgstosrt_ray.sources.pages import materialize_corpus, read_pages
    corpus = materialize_corpus("t1", 60, seed=42)
    ours = _to_df(media_thumbnail(read_pages(corpus)))
    exp = _to_df(golden.golden_media_thumbnail(corpus))
    assert len(ours) > 50          # most PG pages decode
    pd.testing.assert_frame_equal(ours, exp, check_dtype=False)


def test_oracle_sql_covers_every_query():
    """Driver contract: every queries() entry now has an oracle_sql()
    entry (66/66 — zero rows-only checks left)."""
    import __ray_entry__
    q = set(__ray_entry__.queries())
    o = set(__ray_entry__.oracle_sql())
    assert q <= o, f"missing oracles: {sorted(q - o)}"


class TestGoldenOnRandomInputs:
    """The independent golden implementations must agree with the
    distributed pipelines on ARBITRARY inputs, not just the driver
    testdata — random corpora with planted near-duplicates."""

    def _write_docs(self, tmp_path, texts):
        import pandas as pd
        d = tmp_path / "sf"
        d.mkdir()
        pd.DataFrame({"doc_id": range(len(texts)),
                      "text": texts}).to_parquet(d / "documents.parquet")
        return str(d)

    def test_minhash_pairs_random_corpus(self, ray_session, tmp_path):
        import random
        rng = random.Random(123)
        words = [f"w{i}" for i in range(200)]
        base = " ".join(rng.choices(words, k=120))
        texts = [base,
                 base.replace("w0", "w199"),           # near-dup of 0
                 base + " extra tail tokens here"]     # near-dup of 0
        texts += [" ".join(rng.choices(words, k=100)) for _ in range(25)]
        texts += ["", "x", "  "]                       # degenerate docs
        sf = self._write_docs(tmp_path, texts)
        from pgstosrt_ray.pipelines.dedupe import minhash_candidate_pairs
        ours = _to_df(minhash_candidate_pairs(sf))
        exp = _to_df(golden.golden_minhash_pairs(sf))
        pd.testing.assert_frame_equal(ours, exp)
        assert len(exp) >= 2  # the planted near-dups were found

    def test_simhash_pairs_random_corpus(self, ray_session, tmp_path):
        import random
        rng = random.Random(7)
        words = [f"tok{i}" for i in range(80)]
        base = " ".join(rng.choices(words, k=60))
        texts = [base, base + " tok0", ""]
        texts += [" ".join(rng.choices(words, k=50)) for _ in range(20)]
        sf = self._write_docs(tmp_path, texts)
        from pgstosrt_ray.pipelines.dedupe import simhash_near_dup_pairs
        ours = _to_df(simhash_near_dup_pairs(sf))
        exp = _to_df(golden.golden_simhash_pairs(sf))
        pd.testing.assert_frame_equal(ours, exp)

    def test_hll_random_events(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd
        d = tmp_path / "sf"
        d.mkdir()
        uids = np.random.RandomState(3).randint(0, 700, 5000)
        pd.DataFrame({"user_id": uids.astype("int64")}).to_parquet(
            d / "events.parquet")
        from pgstosrt_ray.pipelines.relational import q_hll_distinct_users
        ours = _to_df(q_hll_distinct_users(str(d)))
        exp = _to_df(golden.golden_hll_distinct_users(str(d)))
        pd.testing.assert_frame_equal(ours, exp)


def test_kmeans_golden_on_random_embeddings(ray_session,
                                            tmp_path_factory):
    """kmeans_clusters / kmeans_balanced_sample agree with their
    independent goldens on a RANDOM clustered embedding table
    (including k > natural clusters and non-contiguous ids), not just
    the driver testdata."""
    import numpy as np
    import pandas as pd
    from pgstosrt_ray.pipelines import similarity
    rng = np.random.default_rng(99)
    centers = rng.normal(size=(3, 16))
    rows = []
    for i in range(300):
        c = i % 3
        rows.append((centers[c] + 0.05 * rng.normal(size=16))
                    .astype(np.float32))
    tmpdir = str(tmp_path_factory.mktemp("emb"))
    pd.DataFrame({
        "vec_id": np.arange(300, dtype="int64") * 7 + 3,
        "embedding": [list(map(float, r)) for r in rows],
    }).to_parquet(f"{tmpdir}/embeddings.parquet")
    for pipe, gold in ((similarity.kmeans_clusters, golden.golden_kmeans),
                       (similarity.kmeans_balanced_sample,
                        golden.golden_kmeans_sample)):
        ours = _to_df(pipe(tmpdir)).sort_values(
            "vec_id", ignore_index=True)
        exp = _to_df(gold(tmpdir)).sort_values(
            "vec_id", ignore_index=True)
        pd.testing.assert_frame_equal(ours, exp, check_dtype=False)
