"""Extended-operator conformance (round 3): join-type completion,
unnest/inverted index, deterministic sampling, rollup, normalization,
quantile sketch — same driver-style compare as test_relational.py."""

import duckdb
import pandas as pd
import pytest

from pgstosrt_ray.pipelines import extended

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray
    import ray.data
    if isinstance(result, ray.data.Dataset):
        tabs = [t for t in ray.get(result.to_arrow_refs()) if t.num_rows]
        t = pa.concat_tables(tabs) if tabs else pa.table({})
    else:
        t = result
    return t.to_pandas()


@pytest.mark.parametrize("name", sorted(extended.ORACLE_SQL))
def test_extended_matches_oracle(ray_session, con, name):
    a = _to_df(extended.QUERIES[name](SF_DIR))
    b = con.sql(extended.ORACLE_SQL[name]).to_df()
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    if name == "inverted_index":
        a = a.sort_values("token", ignore_index=True)
        b = b.sort_values("token", ignore_index=True)
        a["postings"] = a["postings"].map(list)
        b["postings"] = b["postings"].map(list)
    else:
        if len(a):
            a = a.sort_values(by=list(a.columns), ignore_index=True)
            b = b.sort_values(by=list(b.columns), ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_approx_quantiles_matches_golden(ray_session):
    from pgstosrt_ray import golden
    a = _to_df(extended.q_approx_quantiles(SF_DIR))
    b = golden.golden_approx_quantiles(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_approx_quantiles_error_bound(ray_session, con):
    """The log-histogram sketch's estimate is within its design bound
    (2^(1/16)-1 relative) of the EXACT quantile."""
    est = _to_df(extended.q_approx_quantiles(SF_DIR))
    bound = 2 ** (1 / 16) - 1
    for q, e in zip(est["q"], est["est_cents"]):
        exact = con.sql(
            "SELECT quantile_disc(CAST(ROUND(l_extendedprice*100) AS "
            f"BIGINT), {q}) FROM lineitem").fetchone()[0]
        assert abs(e - exact) / exact <= bound + 1e-9, (q, e, exact)


def test_sample_per_key_stable_under_rerun(ray_session):
    a = _to_df(extended.q_sample_per_key(SF_DIR)).sort_values(
        ["user_id", "event_id"], ignore_index=True)
    b = _to_df(extended.q_sample_per_key(SF_DIR)).sort_values(
        ["user_id", "event_id"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("user_id").size() <= 2).all()


def test_bloom_prefilter_drops_nonmatching(ray_session):
    """The bloom filter must reject keys absent from the build side
    (modulo false positives) and accept every present key."""
    import numpy as np
    from pgstosrt_ray.pipelines.extended import _bloom_of, _bloom_test
    present = np.arange(0, 10_000, dtype=np.int64)
    filt = _bloom_of(present)
    assert _bloom_test(filt, present).all()
    absent = np.arange(1_000_000, 1_010_000, dtype=np.int64)
    fp_rate = _bloom_test(filt, absent).mean()
    assert fp_rate < 0.01, fp_rate


def test_grouped_approx_quantiles_matches_golden(ray_session):
    from pgstosrt_ray import golden
    a = _to_df(extended.q_grouped_approx_quantiles(SF_DIR)).sort_values(
        ["event_type", "q"], ignore_index=True)
    b = golden.golden_grouped_approx_quantiles(SF_DIR).to_pandas()\
        .sort_values(["event_type", "q"], ignore_index=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)],
                                  b[sorted(b.columns)])


def test_prep_corpus_single_shuffle(ray_session, con):
    """The composed prep pipeline matches the SQL chain and keeps one
    wide op (the dedup bucket groupby)."""
    a = _to_df(extended.q_prep_corpus(SF_DIR)).sort_values(
        "doc_id", ignore_index=True)
    b = con.sql(extended.ORACLE_SQL["prep_corpus"]).to_df().sort_values(
        "doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)],
                                  b[sorted(b.columns)], check_dtype=False)
    assert set(a["split"]) <= {"train", "val", "test"}


def test_word_ngrams_doc_boundaries():
    """Grams never span documents; docs shorter than n yield none;
    per-doc duplicates collapse."""
    import numpy as np
    from pgstosrt_ray.pipelines.extended import _word_ngrams
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype="int64"),
        "text": ["a b c d", "x y", "a b a b a b"]})
    out = _word_ngrams(df, 3)
    got = set(zip(out["doc_id"], out["g"]))
    assert got == {(1, "a b c"), (1, "b c d"),
                   (3, "a b a"), (3, "b a b")}
    # strictly shorter than n everywhere -> typed empty frame
    empty = _word_ngrams(pd.DataFrame({"doc_id": np.array([7]),
                                       "text": ["lone"]}), 3)
    assert len(empty) == 0 and list(empty.columns) == ["doc_id", "g"]


def test_decontaminate_zero_hit_short_circuit(ray_session,
                                              tmp_path_factory):
    """No shared n-grams at all: every probe doc comes back clean (the
    empty-candidate join short-circuit path)."""
    import numpy as np
    tmpdir = str(tmp_path_factory.mktemp("docs"))
    texts = [" ".join(f"w{d}t{i}" for i in range(12)) for d in range(6)]
    pd.DataFrame({"doc_id": np.arange(0, 6 * 97, 97, dtype="int64")
                  + np.array([0, 1, 2, 3, 4, 5]),
                  "text": texts}).to_parquet(f"{tmpdir}/documents.parquet")
    out = _to_df(extended.q_decontaminate(tmpdir)).sort_values(
        "doc_id", ignore_index=True)
    assert (~out["contaminated"]).all()
    assert (out["doc_id"] % 97 != 0).all()


def test_decontaminate_flags_planted_overlap(ray_session,
                                             tmp_path_factory):
    """A probe doc embedding a benchmark 8-gram is flagged; unrelated
    docs are not."""
    import numpy as np
    tmpdir = str(tmp_path_factory.mktemp("docs"))
    bench = " ".join(f"b{i}" for i in range(10))
    dirty = "pad1 pad2 " + " ".join(f"b{i}" for i in range(8)) + " tail"
    clean = " ".join(f"c{i}" for i in range(12))
    pd.DataFrame({"doc_id": np.array([0, 1, 2], dtype="int64"),
                  "text": [bench, dirty, clean]}).to_parquet(
        f"{tmpdir}/documents.parquet")
    out = _to_df(extended.q_decontaminate(tmpdir)).set_index("doc_id")
    assert bool(out.loc[1, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])


def test_redact_pii_planted_matches_duckdb():
    """The kernel masks planted PII the same way DuckDB's RE2 applies
    the shared patterns (the cross-engine contract the corpus data
    never exercises), and leaves clean text untouched."""
    from pgstosrt_ray.functions.text import redact_pii
    from pgstosrt_ray.pipelines.extended import SQL_REDACT_PII
    texts = pd.Series([
        "contact bob.smith+spam@mail.example.co for details",
        "server at 10.0.255.7 answered, backup 192.168.1.1.",
        "call +1 555-867 5309 now",
        "mixed: a@b.io then 8.8.8.8 then +49 30-1234567 end",
        "clean text with no identifiers at all",
        "not an ip 1234.5.6.7890 stays",  # \b guards the octets
    ])
    got = redact_pii(texts)
    assert got[0] == "contact <EMAIL> for details"
    assert got[1] == "server at <IP> answered, backup <IP>."
    assert got[2] == "call <PHONE> now"
    assert got[3] == "mixed: <EMAIL> then <IP> then <PHONE> end"
    assert got[4] == texts[4]
    expr = SQL_REDACT_PII.split("SELECT doc_id, ")[1].split(" AS text")[0]
    want = duckdb.connect().execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS text)",
        [texts.tolist()]).df().iloc[:, 0]
    assert got.tolist() == want.tolist()


def test_percent_rank_ties_and_extremes(ray_session, tmp_path_factory):
    """Tied lengths share the rank of their first member; the minimum
    is exactly 0 and the unique maximum exactly 1 (PERCENT_RANK
    semantics), matching DuckDB on a planted frame."""
    import numpy as np
    tmpdir = str(tmp_path_factory.mktemp("docs"))
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "n_chars": np.array([5, 5, 9, 9, 9, 20], dtype="int64")})
    df.to_parquet(f"{tmpdir}/documents.parquet")
    out = _to_df(extended.q_percent_rank_chars(tmpdir)).set_index(
        "doc_id")["pr"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmpdir}/documents.parquet'")
    want = con.sql(extended.ORACLE_SQL["percent_rank_chars"]).to_df(
        ).set_index("doc_id")["pr"]
    assert out.sort_index().tolist() == want.sort_index().tolist()
    assert out[0] == 0.0 and out[1] == 0.0 and out[5] == 1.0


def test_tfidf_tie_breaks_to_smallest_token(ray_session,
                                            tmp_path_factory):
    """Two tokens with identical tf and df resolve to the
    lexicographically smallest, identically on both engines."""
    import numpy as np
    tmpdir = str(tmp_path_factory.mktemp("docs"))
    # doc 0: zz and aa both appear once with df=1 -> tie -> aa wins
    df = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype="int64"),
        "text": ["zz shared aa", "shared shared only"]})
    df.to_parquet(f"{tmpdir}/documents.parquet")
    out = _to_df(extended.q_tfidf_top_term(tmpdir)).set_index("doc_id")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmpdir}/documents.parquet'")
    want = con.sql(extended.ORACLE_SQL["tfidf_top_term"]).to_df(
        ).set_index("doc_id")
    assert out.loc[0, "tok"] == "aa"
    pd.testing.assert_frame_equal(out.sort_index(), want.sort_index(),
                                  check_dtype=False)


def test_tfidf_join_path_equals_broadcast(ray_session, monkeypatch):
    """The broadcast-df and join-df scoring strategies agree — small
    corpora take the broadcast path, so the join path keeps coverage
    through this forced-path guard."""

    def result():
        t = _to_df(extended.q_tfidf_top_term(SF_DIR))
        return set(zip(t["doc_id"], t["tok"], t["score"].round(12)))

    via_broadcast = result()
    monkeypatch.setattr(extended, "BROADCAST_VOCAB_LIMIT", -1)
    via_join = result()
    assert via_broadcast == via_join
    assert len(via_broadcast) > 0


def test_round4_ops_on_random_corpus(ray_session, tmp_path_factory):
    """Round-4 operators vs their DuckDB oracles on a seeded RANDOM
    corpus with planted edge cases (empty text, single token, double
    spaces, all-identical docs, PII strings, tied lengths) — the
    driver testdata never exercises these boundaries."""
    import numpy as np
    rng = np.random.default_rng(1234)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(80)]
    texts += ["", "solo", "a  b", "dup dup dup dup",
              "dup dup dup dup",
              "mail me at x.y@example.org or ping 10.1.2.3",
              "call +1 415-555 0199 today"]
    tmpdir = str(tmp_path_factory.mktemp("rnd"))
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64") * 3 + 1,
        "text": texts})
    df["n_chars"] = df["text"].str.len().astype("int64")
    df.to_parquet(f"{tmpdir}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmpdir}/documents.parquet'")
    for name in ("repetition_scores", "redact_pii",
                 "percent_rank_chars", "tfidf_top_term",
                 "decontaminate"):
        a = _to_df(extended.QUERIES[name](tmpdir))
        b = con.sql(extended.ORACLE_SQL[name]).to_df()
        a = a[sorted(a.columns)].sort_values(
            by=sorted(a.columns), ignore_index=True)
        b = b[sorted(b.columns)].sort_values(
            by=sorted(b.columns), ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      obj=name)
