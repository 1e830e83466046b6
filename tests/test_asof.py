"""Backward as-of join tests: inclusivity, no-match nulls, per-key
isolation, and equivalence with the naive (quadratic) formulation."""

import datetime as dt

from pyspark.sql import functions as F

from eva_opentargets_spark.operators.events import asof_join


def _t(minute):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


L_SCHEMA = "lid long, user_id long, ts timestamp"
R_SCHEMA = "rid long, user_id long, ts timestamp, px double"


def test_asof_join_basic_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _t(5)),   # after r@0 and r@5 (tie) -> matches r@5 (inclusive)
            (2, 10, _t(30)),  # after r@20 -> matches r@20
            (3, 10, _t(1)),   # after r@0 only
            (4, 20, _t(50)),  # user 20 has no right rows -> nulls
            (5, 30, _t(0)),   # user 30: right row is LATER -> null
        ],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (100, 10, _t(0), 1.0),
            (101, 10, _t(5), 2.0),
            (102, 10, _t(20), 3.0),
            (103, 30, _t(10), 9.0),
        ],
        R_SCHEMA,
    )
    out = {
        r.lid: (r.px_asof, r.rid_asof)
        for r in asof_join(left, right, on="user_id", value_cols=["px", "rid"]).collect()
    }
    assert out == {
        1: (2.0, 101),
        2: (3.0, 102),
        3: (1.0, 100),
        4: (None, None),
        5: (None, None),
    }


def test_asof_join_matches_naive_quadratic_form(spark):
    """Union-window result equals the naive greatest-ts-at-or-before
    join on a randomized multi-key instance."""
    lrows = [(i, i % 7, _t((i * 13) % 240)) for i in range(120)]
    rrows = [(1000 + j, j % 7, _t((j * 29) % 240), float(j)) for j in range(90)]
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)

    got = {
        r.lid: (r.px_asof, r.rid_asof)
        for r in asof_join(left, right, on="user_id", value_cols=["px", "rid"]).collect()
    }

    rmap = {}
    for rid, u, ts, px in rrows:
        rmap.setdefault(u, []).append((ts, rid, px))
    want = {}
    for lid, u, ts in lrows:
        cands = [c for c in rmap.get(u, []) if c[0] <= ts]
        if cands:
            # unique (key, ts) on the right by construction; latest wins
            best = max(cands, key=lambda c: c[0])
            want[lid] = (best[2], best[1])
        else:
            want[lid] = (None, None)
    assert got == want
