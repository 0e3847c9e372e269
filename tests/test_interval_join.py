"""interval_join: bucketized range join ≡ naive range join, scale-safe plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mini_feature_store_spark.functions import plan_text
from mini_feature_store_spark.operators.interval import interval_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _frames(spark):
    points = spark.createDataFrame(
        [(i, _ts(1 + i % 28, i % 24), float(i)) for i in range(200)],
        "point_id long, ts timestamp, v double",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(1), _ts(8)),
            (101, _ts(5), _ts(12)),  # overlaps 100
            (102, _ts(20), _ts(20, 6)),  # sub-day interval
            (103, _ts(25), _ts(28)),
        ],
        "ival_id long, s timestamp, e timestamp",
    )
    return points, intervals


def _naive(points, intervals, closed="both"):
    lo = F.col("ts") > F.col("s") if closed in ("right", "neither") else F.col("ts") >= F.col("s")
    hi = F.col("ts") < F.col("e") if closed in ("left", "neither") else F.col("ts") <= F.col("e")
    return points.crossJoin(intervals).where(lo & hi)


def test_matches_naive_all_closed_modes(spark):
    points, intervals = _frames(spark)
    for closed in ("both", "left", "right", "neither"):
        got = interval_join(
            points, intervals, "ts", "s", "e",
            bucket_width="2 days", closed=closed,
        )
        want = _naive(points, intervals, closed)
        g = {tuple(r) for r in got.select("point_id", "ival_id").collect()}
        w = {tuple(r) for r in want.select("point_id", "ival_id").collect()}
        assert g == w, f"closed={closed}"
    assert len(g) > 0


def test_pre_epoch_timestamps_bucket_consistently(spark):
    """ADVICE r1: negative epoch seconds must floor-divide, not truncate
    toward zero — otherwise a pre-1970 point and its containing interval land
    in different buckets and the match is silently dropped."""
    points = spark.createDataFrame(
        [(1, dt.datetime(1969, 12, 31, 23, 30)), (2, dt.datetime(1969, 12, 25))],
        "point_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, dt.datetime(1969, 12, 31, 22), dt.datetime(1970, 1, 1, 2)),
         (101, dt.datetime(1969, 12, 24), dt.datetime(1969, 12, 26))],
        "ival_id long, s timestamp, e timestamp",
    )
    got = {
        tuple(r)
        for r in interval_join(
            points, intervals, "ts", "s", "e", bucket_width="1 days"
        ).select("point_id", "ival_id").collect()
    }
    assert got == {(1, 100), (2, 101)}


def test_no_duplicate_pairs_when_interval_spans_many_buckets(spark):
    points, intervals = _frames(spark)
    got = interval_join(
        points, intervals, "ts", "s", "e", bucket_width="6 hours"
    )
    pairs = got.select("point_id", "ival_id").collect()
    assert len(pairs) == len({tuple(r) for r in pairs})


def test_left_join_keeps_unmatched_points(spark):
    points, intervals = _frames(spark)
    got = interval_join(
        points, intervals, "ts", "s", "e", bucket_width="2 days", how="left"
    )
    assert got.where(F.col("ival_id").isNull()).count() == (
        points.count()
        - _naive(points, intervals).select("point_id").distinct().count()
    )


def test_equi_keys_restrict_matches(spark):
    points = spark.createDataFrame(
        [(1, "a", _ts(2)), (2, "b", _ts(2))],
        "point_id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("a", _ts(1), _ts(5))], "k string, s timestamp, e timestamp"
    )
    got = interval_join(
        points, intervals, "ts", "s", "e", keys=["k"], bucket_width="1 days"
    )
    assert [r.point_id for r in got.collect()] == [1]


def test_plan_is_hash_join_not_nested_loop(spark):
    points, intervals = _frames(spark)
    plan = plan_text(
        interval_join(points, intervals, "ts", "s", "e", bucket_width="2 days")
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan
