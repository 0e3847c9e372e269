"""table_profile / numeric_histogram: stats correctness + one-scan plan."""

from __future__ import annotations

import math

from mini_feature_store_spark.functions import plan_text
from mini_feature_store_spark.operators.profile import (
    numeric_histogram,
    table_profile,
)


def _df(spark):
    rows = [(1.0, 10.0), (2.0, None), (3.0, 30.0), (4.0, None)]
    return spark.createDataFrame(rows, "a double, b double")


def test_profile_stats(spark):
    out = {r["column"]: r for r in table_profile(_df(spark), ["a", "b"]).collect()}
    a, b = out["a"], out["b"]
    assert (a.n, a.n_null, a.min, a.max, a.mean) == (4, 0, 1.0, 4.0, 2.5)
    assert math.isclose(a.stddev, 1.2909944487358056)
    assert (b.n, b.n_null, b.min, b.max, b.mean) == (2, 2, 10.0, 30.0, 20.0)


def test_profile_stddev_null_for_single_value(spark):
    df = spark.createDataFrame([(7.0,)], "a double")
    row = table_profile(df, ["a"]).collect()[0]
    assert row.stddev is None and row.n == 1


def test_profile_is_single_scan(spark):
    plan = plan_text(table_profile(_df(spark), ["a", "b"]))
    # All columns profiled in one aggregate pass — a per-column design would
    # need a Union/Join to recombine, and >1 final aggregate.
    assert "Union" not in plan and "Join" not in plan
    assert plan.count("Functions [11]") >= 1  # all 11 aggs in ONE node


def test_histogram_edges(spark):
    df = spark.createDataFrame(
        [(x,) for x in [-0.1, 0.0, 4.9, 5.0, 9.9, 10.0, 10.1, None]],
        "x double",
    )
    out = {r.bucket: r for r in numeric_histogram(df, "x", 0.0, 10.0, 2).collect()}
    assert out[0].n == 2  # 0.0, 4.9 in [0, 5)
    assert out[1].n == 3  # 5.0, 9.9, and hi-edge 10.0 clamped into last bucket
    assert set(out) == {0, 1}  # -0.1, 10.1, None dropped
    assert (out[0].bucket_lo, out[0].bucket_hi) == (0.0, 5.0)
    assert (out[1].bucket_lo, out[1].bucket_hi) == (5.0, 10.0)


def test_histogram_counts_sum_to_in_range_rows(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = numeric_histogram(df, "x", 0.0, 99.0, 7)
    assert sum(r.n for r in out.collect()) == 100
