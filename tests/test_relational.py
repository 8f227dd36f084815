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


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


@pytest.mark.parametrize("name", sorted(relational.ORACLE_SQL))
def test_query_matches_oracle(ray_session, con, name):
    ours = _normalize(_to_df(relational.QUERIES[name](SF_DIR)))
    theirs = _normalize(con.sql(relational.ORACLE_SQL[name]).df())
    assert len(ours) == len(theirs), f"row count {len(ours)} != {len(theirs)}"
    assert list(ours.columns) == list(theirs.columns)
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)
