"""Generative conformance for the bucketed per-key family: random
events tables (adversarial shapes — duplicate timestamps, single-event
users, empty-ish frames) must match DuckDB exactly. Complements the
fixed-testdata conformance in test_relational.py."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _events_frame(draw_ids, draw_ts):
    n = min(len(draw_ids), len(draw_ts))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": np.asarray(draw_ids[:n], dtype="int64"),
        "ts": pd.to_datetime(np.asarray(draw_ts[:n], dtype="int64"),
                             unit="us"),
    })


events_strategy = st.builds(
    _events_frame,
    st.lists(st.integers(min_value=0, max_value=5), min_size=1,
             max_size=60),
    st.lists(st.integers(min_value=0, max_value=3 * 10 ** 9),
             min_size=1, max_size=60),
).filter(lambda df: len(df) >= 1)


def _run_window_fill(df: pd.DataFrame, tmpdir: str):
    import pyarrow as pa
    import ray
    import ray.data
    from pgstosrt_ray.pipelines.relational import q_window_fill
    df.to_parquet(f"{tmpdir}/events.parquet")
    res = q_window_fill(tmpdir)
    tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
    return (pa.concat_tables(tabs).to_pandas()
            .sort_values(["user_id", "ts", "event_id"],
                         ignore_index=True))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=events_strategy)
def test_window_fill_matches_duckdb_on_random_frames(ray_session,
                                                     tmp_path_factory,
                                                     df):
    # ts collisions and singleton users are the interesting cases;
    # align lengths (builds may draw unequal lists)
    n = min(len(df), 60)
    df = df.iloc[:n].reset_index(drop=True)
    tmpdir = str(tmp_path_factory.mktemp("ev"))
    ours = _run_window_fill(df, tmpdir)
    con = duckdb.connect()
    con.register("events", df)
    theirs = con.sql(
        "SELECT event_id, user_id, ts, LEAD(ts) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS next_ts "
        "FROM events").to_df().sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True)

    def norm_units(df):
        # us- vs ns-backed datetimes are the same instants; compare
        # in one unit
        for c in ("ts", "next_ts"):
            df[c] = df[c].astype("datetime64[ns]")
        return df

    pd.testing.assert_frame_equal(
        norm_units(ours[sorted(ours.columns)].copy()),
        norm_units(theirs[sorted(theirs.columns)].copy()),
        check_dtype=False)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=events_strategy)
def test_sessionize_matches_duckdb_on_random_frames(ray_session,
                                                    tmp_path_factory, df):
    import pyarrow as pa
    import ray
    from pgstosrt_ray.pipelines.relational import (SQL_SESSIONIZE,
                                                   q_sessionize)
    tmpdir = str(tmp_path_factory.mktemp("ev"))
    df.to_parquet(f"{tmpdir}/events.parquet")
    res = q_sessionize(tmpdir)
    tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
    ours = (pa.concat_tables(tabs).to_pandas()
            .sort_values(["user_id", "session_id"], ignore_index=True))
    con = duckdb.connect()
    con.register("events", df)
    theirs = con.sql(SQL_SESSIONIZE).to_df().sort_values(
        ["user_id", "session_id"], ignore_index=True)
    for frame in (ours, theirs):
        for c in ("start_ts", "end_ts"):
            frame[c] = frame[c].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(ours[sorted(ours.columns)],
                                  theirs[sorted(theirs.columns)],
                                  check_dtype=False)


# timestamps on a grid straddling 5-min band boundaries (exact
# multiples of RANGE_US and +/-1 us) — the adversarial cases for the
# banded range join's count-each-pair-once rule
_BAND = 5 * 60 * 1_000_000
_ts_grid = sorted({k * _BAND + d for k in range(4) for d in (-1, 0, 1)}
                  | {37, _BAND // 2, 2 * _BAND + 12345})
pairs_events_strategy = st.builds(
    _events_frame,
    st.lists(st.integers(min_value=0, max_value=3), min_size=1,
             max_size=40),
    st.lists(st.sampled_from([t for t in _ts_grid if t >= 0]),
             min_size=1, max_size=40),
).filter(lambda df: len(df) >= 1)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=pairs_events_strategy)
def test_event_pairs_range_matches_duckdb_on_random_frames(
        ray_session, tmp_path_factory, df):
    import pyarrow as pa
    import ray
    from pgstosrt_ray.pipelines.relational import (SQL_EVENT_PAIRS_RANGE,
                                                   q_event_pairs_range)
    tmpdir = str(tmp_path_factory.mktemp("ev"))
    df.to_parquet(f"{tmpdir}/events.parquet")
    res = q_event_pairs_range(tmpdir)
    tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
    ours = (pa.concat_tables(tabs).to_pandas() if tabs
            else pd.DataFrame({"user_id": [], "ev_a": [], "ev_b": []}))
    ours = ours.sort_values(["user_id", "ev_a", "ev_b"],
                            ignore_index=True).astype("int64")
    con = duckdb.connect()
    con.register("events", df)
    theirs = con.sql(SQL_EVENT_PAIRS_RANGE).to_df().sort_values(
        ["user_id", "ev_a", "ev_b"], ignore_index=True).astype("int64")
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)


orders_strategy = st.builds(
    lambda custs, prices: pd.DataFrame({
        "o_orderkey": np.arange(min(len(custs), len(prices)),
                                dtype="int64"),
        "o_custkey": np.asarray(custs[:min(len(custs), len(prices))],
                                dtype="int64"),
        "o_totalprice": np.asarray(prices[:min(len(custs), len(prices))],
                                   dtype="float64"),
    }),
    st.lists(st.integers(min_value=0, max_value=4), min_size=1,
             max_size=40),
    # duplicate prices exercise the o_orderkey tiebreak
    st.lists(st.sampled_from([10.0, 20.0, 30.0]), min_size=1,
             max_size=40),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=orders_strategy)
def test_top_orders_matches_duckdb_on_random_frames(ray_session,
                                                    tmp_path_factory, df):
    import pyarrow as pa
    import ray
    from pgstosrt_ray.pipelines.relational import (SQL_TOP_ORDERS_PER_CUST,
                                                   q_top_orders_per_cust)
    tmpdir = str(tmp_path_factory.mktemp("ord"))
    df.to_parquet(f"{tmpdir}/orders.parquet")
    res = q_top_orders_per_cust(tmpdir)
    tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
    ours = (pa.concat_tables(tabs).to_pandas()
            .sort_values(["o_custkey", "rn"], ignore_index=True))
    con = duckdb.connect()
    con.register("orders", df)
    theirs = con.sql(SQL_TOP_ORDERS_PER_CUST).to_df().sort_values(
        ["o_custkey", "rn"], ignore_index=True)
    pd.testing.assert_frame_equal(ours[sorted(ours.columns)],
                                  theirs[sorted(theirs.columns)],
                                  check_dtype=False)


# --- round-4 window ops: rolling sum + forward as-of ---------------------
def _rich_events_frame(draw_ids, draw_ts, draw_vals, draw_types):
    n = min(len(draw_ids), len(draw_ts), len(draw_vals), len(draw_types))
    kinds = np.array(["view", "click", "purchase"], dtype=object)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": np.asarray(draw_ids[:n], dtype="int64"),
        "ts": pd.to_datetime(np.asarray(draw_ts[:n], dtype="int64"),
                             unit="us"),
        # sixteenth-units: value*1000 = 62.5*k exactly, so odd k lands
        # EXACTLY on the .5 milli boundary — exercising the explicit
        # half-up floor(x+0.5) rule shared by pipeline and oracle
        # (banker's vs half-away would diverge here)
        "value": np.asarray(draw_vals[:n], dtype="float64") / 16.0,
        "event_type": kinds[np.asarray(draw_types[:n]) % 3],
    })


rich_events_strategy = st.builds(
    _rich_events_frame,
    st.lists(st.integers(min_value=0, max_value=4), min_size=1,
             max_size=50),
    st.lists(st.integers(min_value=0, max_value=10 ** 9), min_size=1,
             max_size=50),
    st.lists(st.integers(min_value=-800, max_value=800), min_size=1,
             max_size=50),
    st.lists(st.integers(min_value=0, max_value=2), min_size=1,
             max_size=50),
).filter(lambda df: len(df) >= 1)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=rich_events_strategy)
def test_round4_window_ops_match_duckdb_on_random_frames(
        ray_session, tmp_path_factory, df):
    import pyarrow as pa
    import ray
    from pgstosrt_ray.pipelines import webops
    tmpdir = str(tmp_path_factory.mktemp("ev4"))
    df.to_parquet(f"{tmpdir}/events.parquet")
    con = duckdb.connect()
    con.register("events", df)

    def run(q):
        res = q(tmpdir)
        tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
        out = (pa.concat_tables(tabs).to_pandas() if tabs
               else pd.DataFrame())
        return out

    def norm(frame):
        frame = frame[sorted(frame.columns)].copy()
        for c in frame.columns:
            if str(frame[c].dtype).startswith("datetime64"):
                frame[c] = frame[c].astype("datetime64[ns]")
        return frame.sort_values(list(frame.columns),
                                 ignore_index=True)

    for q, sql in ((webops.q_rolling_sum, webops.SQL_ROLLING_SUM),
                   (webops.q_asof_join_forward,
                    webops.SQL_ASOF_JOIN_FORWARD)):
        ours = run(q)
        theirs = con.sql(sql).to_df()
        pd.testing.assert_frame_equal(norm(ours), norm(theirs),
                                      check_dtype=False)
