"""Driver-cap layout guard: the correctness driver records exactly the
FIRST 50 registered queries per round, so the registration order IS
the evidence plan (round-4 verdict #1). This pins it against
accidental reordering."""


def test_driver_cap_layout(ray_session):
    import __ray_entry__ as e
    names = list(e.queries())
    assert len(names) == len(set(names)) == 97
    first50 = set(names[:50])
    # the 28 operators that had no driver-recorded row before round 5
    assert set(e._ROUND4_NEVER_DRIVER_CHECKED) <= first50
    # the flagship trio always stays inside the cap
    assert {"extract_docs", "extract_docs_nomerge",
            "demux_cues"} <= first50
    # the round-5 additions got the reserved tail slots of the cap
    assert set(e._ROUND5_NEW) <= first50
    assert len(e._ROUND4_NEVER_DRIVER_CHECKED) == 28
    assert len(e._ROUND5_NEW) == 3


def test_every_query_has_a_value_oracle(ray_session):
    import __ray_entry__ as e
    qs, sql = e.queries(), e.oracle_sql()
    assert set(sql) == set(qs)
