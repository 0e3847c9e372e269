"""asof_join: direction, tolerance, tie, and null semantics on known data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mini_feature_store_spark.operators.point_in_time import asof_join


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _t(10)), (2, "u", _t(12)), (3, "v", _t(10)), (4, "w", _t(10))],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _t(9), 100, 9.0),
            ("u", _t(11), 101, 11.0),
            ("u", _t(11), 102, 11.5),  # same ts as 101 → tie
            ("v", _t(18), 103, 18.0),
        ],
        "k string, rts timestamp, rid long, rv double",
    )
    return left, right


def _picks(df):
    return {r.lid: r.rid for r in df.collect()}


def test_backward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lts", "rts", direction="backward",
                    tie_breakers=["rid"])
    assert _picks(out) == {1: 100, 2: 102, 3: None, 4: None}


def test_forward_with_tie_breaker(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lts", "rts", direction="forward",
                    tie_breakers=["rid"])
    # lid=2 at 12:00: forward candidates none (11:00 < 12:00) → null
    assert _picks(out) == {1: 101, 2: None, 3: 103, 4: None}


def test_nearest_tie_goes_backward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lts", "rts", direction="nearest",
                    tie_breakers=["rid"])
    picks = _picks(out)
    # lid=1 at 10:00: 9:00 (Δ=1h back) vs 11:00 (Δ=1h fwd) → backward wins.
    assert picks[1] == 100
    assert picks[3] == 103  # only candidate, 8h away, no tolerance


def test_tolerance_bounds_search(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lts", "rts", direction="nearest",
                    tolerance="2 hours", tie_breakers=["rid"])
    assert _picks(out)[3] is None  # 18:00 is 8h from 10:00 > 2h radius
    out = asof_join(left, right, ["k"], "lts", "rts", direction="backward",
                    tolerance="90 minutes", tie_breakers=["rid"])
    assert _picks(out) == {1: 100, 2: 102, 3: None, 4: None}


def test_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lts", "rts", direction="forward",
                    how="inner", tie_breakers=["rid"])
    assert sorted(_picks(out)) == [1, 3]


def test_one_row_per_left_row(spark):
    left, right = _frames(spark)
    for d in ("backward", "forward", "nearest"):
        out = asof_join(left, right, ["k"], "lts", "rts", direction=d)
        assert out.count() == left.count()
        assert out.columns == ["lid", "k", "lts", "rts", "rid", "rv"]


def test_duplicate_left_rows_each_preserved(spark):
    """ADVICE r1: exact full-row duplicate left rows must each keep their own
    match instead of collapsing through the groupBy."""
    _, right = _frames(spark)
    left = spark.createDataFrame(
        [(1, "u", _t(10)), (1, "u", _t(10)), (9, "z", _t(10)), (9, "z", _t(10))],
        "lid long, k string, lts timestamp",
    )
    for d in ("backward", "forward", "nearest"):
        out = asof_join(left, right, ["k"], "lts", "rts", direction=d).collect()
        assert len(out) == 4
        assert sorted(r.lid for r in out) == [1, 1, 9, 9]
        # the unmatched duplicates ('z') both survive with nulls
        assert sum(1 for r in out if r.rid is None) == 2


def test_no_nested_loop_plan(spark):
    from mini_feature_store_spark.functions import plan_text

    left, right = _frames(spark)
    plan = plan_text(asof_join(left, right, ["k"], "lts", "rts"))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Differential ground truth: our distributed asof_join vs pandas
    merge_asof on randomized per-key event streams, across all three
    directions and with/without tolerance. pandas defines the semantics the
    operator docstring claims (backward/forward/nearest at timestamp
    grain), so any divergence is a bug on our side.

    Note on `nearest` ties: pandas resolves equidistant candidates to the
    LAST right row by position, ours deterministically to the backward
    (earlier) candidate — timestamps are generated at distinct seconds so
    ties cannot occur here.
    """
    import datetime as dt
    import random

    import pandas as pd

    from mini_feature_store_spark.operators.point_in_time import asof_join

    rng = random.Random(1234)
    base = dt.datetime(2024, 1, 1)

    def stream(n, keys):
        seen = set()
        rows = []
        for _ in range(n):
            while True:
                k = rng.choice(keys)
                ts = base + dt.timedelta(seconds=rng.randrange(0, 5000))
                if (k, ts) not in seen:  # distinct ts per key → no ties
                    seen.add((k, ts))
                    break
            rows.append((k, ts, round(rng.random(), 4)))
        return rows

    keys = ["a", "b", "c"]
    left_rows = stream(40, keys)
    right_rows = stream(60, keys)
    left = spark.createDataFrame(left_rows, "k string, lts timestamp, lv double")
    right = spark.createDataFrame(right_rows, "k string, rts timestamp, rv double")
    lpd = pd.DataFrame(left_rows, columns=["k", "lts", "lv"]).sort_values("lts")
    rpd = pd.DataFrame(right_rows, columns=["k", "rts", "rv"]).sort_values("rts")

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, "600 seconds"):
            got = {
                (r.k, r.lts): (r.rts, r.rv)
                for r in asof_join(
                    left,
                    right,
                    keys=["k"],
                    left_ts="lts",
                    right_ts="rts",
                    direction=direction,
                    tolerance=tol,
                ).collect()
            }
            want_df = pd.merge_asof(
                lpd,
                rpd,
                left_on="lts",
                right_on="rts",
                by="k",
                direction=direction,
                tolerance=pd.Timedelta(tol) if tol else None,
            )
            want = {
                (r.k, r.lts.to_pydatetime()): (
                    None if pd.isna(r.rts) else r.rts.to_pydatetime(),
                    None if pd.isna(r.rv) else r.rv,
                )
                for r in want_df.itertuples()
            }
            assert got == want, (direction, tol)
