"""Unit pins for plan_walk's boundedness classifier.

The registry-wide sweep in test_broadcast_discipline.py exercises the
classifier end-to-end; these tests pin each RULE on minimal synthetic
plans so a rule regression is reported as the rule, not as a mysterious
registry violation.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mini_feature_store_spark.plan_walk import broadcast_hint_sites


def _sites(df):
    return broadcast_hint_sites(df)


def _one(df):
    sites = _sites(df)
    assert len(sites) == 1, sites
    return sites[0]


def test_no_hint_no_sites(spark):
    df = spark.range(10).join(spark.range(5), "id")
    assert _sites(df) == []


def test_global_aggregate_is_bounded(spark):
    agg = spark.range(1000).agg(F.max("id").alias("m"))
    df = spark.range(10).crossJoin(F.broadcast(agg))
    s = _one(df)
    assert s.bounded and "global aggregate" in s.reason


def test_grouped_aggregate_over_scan_is_unbounded(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = ev.groupBy("user_id").count()
    df = ev.join(F.broadcast(agg), "user_id")
    s = _one(df)
    assert not s.bounded and "scan of scale-dependent" in s.reason


def test_grouped_aggregate_over_literal_range_is_bounded(spark):
    # grouped output <= input rows, and Range's size is plan-time known —
    # boundedness propagates through the aggregate
    agg = spark.range(1000).groupBy((F.col("id") % 97).alias("k")).count()
    df = spark.range(10).join(F.broadcast(agg), F.col("id") == F.col("k"))
    assert _one(df).bounded


def test_limit_is_bounded(spark):
    capped = spark.range(1_000_000).limit(7)
    df = spark.range(10).join(F.broadcast(capped), "id")
    assert _one(df).bounded


def test_nation_scan_is_bounded_and_other_scans_are_not(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ok = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    s = _one(ok)
    assert s.bounded and "nation" in s.reason
    bad = nation.join(
        F.broadcast(cust), F.col("n_nationkey") == F.col("c_nationkey")
    )
    s = _one(bad)
    assert not s.bounded and "customer" in s.reason


def test_create_dataframe_is_conservatively_unbounded(spark):
    # createDataFrame plans as LogicalRDD — an opaque RDD wrapper whose
    # size the walker cannot prove (an RDD can be arbitrarily large), so
    # the conservative answer is unbounded; a genuinely tiny literal side
    # should carry .limit(n) to make its bound plan-visible.
    tiny = spark.createDataFrame([(1,), (2,)], "id long")
    df = spark.range(10).join(F.broadcast(tiny), "id")
    s = _one(df)
    assert not s.bounded and "unknown leaf" in s.reason
    assert _one(
        spark.range(10).join(F.broadcast(tiny.limit(2)), "id")
    ).bounded


def test_literal_sequence_explode_is_bounded(spark):
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-31").cast("date"),
            )
        ).alias("day")
    )
    df = spark.range(3).crossJoin(F.broadcast(spine))
    assert _one(df).bounded


def test_data_dependent_explode_is_unbounded(spark):
    words = spark.createDataFrame([("a b c",)], "t string").select(
        F.explode(F.split("t", " ")).alias("w")
    )
    df = spark.createDataFrame([("a",)], "w string").join(
        F.broadcast(words), "w"
    )
    s = _one(df)
    # the generator references the `t` attribute → fan-out is data-driven,
    # even though this particular input is a 1-row LocalRelation
    assert not s.bounded


def test_map_in_pandas_is_unbounded_even_over_limit(spark):
    def expand(it):
        for pdf in it:
            yield pd.concat([pdf] * 100)

    capped = spark.range(1_000_000).limit(5)
    blown = capped.mapInPandas(expand, "id long")
    df = spark.range(10).join(F.broadcast(blown), "id")
    s = _one(df)
    assert not s.bounded and "fan-out" in s.reason


def test_join_of_bounded_sides_is_bounded(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    dim = nation.join(
        region, F.col("n_regionkey") == F.col("r_regionkey")
    )
    df = spark.range(10).crossJoin(F.broadcast(dim))
    assert _one(df).bounded


def test_nested_hints_each_reported(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = (
        cust.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(cust.select(F.col("c_custkey").alias("k"))),
              F.col("c_custkey") == F.col("k"))
    )
    sites = _sites(df)
    assert len(sites) == 2
    assert sorted(s.bounded for s in sites) == [False, True]
