"""Relational conformance: every oracle-checked query must match its
DuckDB SQL on the same parquet (mimics the driver's compare: row count
+ schema + order-insensitive values)."""

import duckdb
import pandas as pd
import pytest

from pgstosrt_ray.pipelines import relational

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _to_arrow(result):
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        refs = result.to_arrow_refs()
        import ray
        return pa.concat_tables([t for t in ray.get(refs) if t.num_rows > 0]
                                or [ray.get(refs[0])])
    if isinstance(result, pa.Table):
        return result
    return pa.Table.from_pandas(result, preserve_index=False)


def _type_tag(t) -> str:
    """Normalize benign type differences (timestamp unit, string width)
    while keeping the driver-breaking ones (decimal128 vs int64)."""
    import pyarrow as pa
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    return str(t)


@pytest.mark.parametrize("name", sorted(relational.ORACLE_SQL))
def test_query_matches_oracle(ray_session, con, name):
    ours_t = _to_arrow(relational.QUERIES[name](SF_DIR))
    theirs_t = con.sql(relational.ORACLE_SQL[name]).arrow()
    # driver-strict: arrow value types must agree (DuckDB HUGEINT ->
    # decimal128(38,0) vs int64 broke 4 queries in round 1)
    ours_types = {f.name: _type_tag(f.type) for f in ours_t.schema}
    theirs_types = {f.name: _type_tag(f.type) for f in theirs_t.schema}
    assert ours_types == theirs_types
    ours = _normalize(ours_t.to_pandas())
    theirs = _normalize(theirs_t.to_pandas())
    assert len(ours) == len(theirs), f"row count {len(ours)} != {len(theirs)}"
    assert list(ours.columns) == list(theirs.columns)
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)
