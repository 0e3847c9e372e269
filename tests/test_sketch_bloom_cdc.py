"""Tests for the scale-path operators: mergeable HLL sketches, the pure-
expression Bloom prefilter, and CDC snapshot diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_feature_store_spark.operators.bloom import (
    bloom_prefilter,
    build_bloom_bits,
)
from mini_feature_store_spark.operators.cdc import snapshot_diff
from mini_feature_store_spark.operators.sketches import (
    distinct_sketch,
    merge_sketch_estimate,
)

# ── HLL sketches ────────────────────────────────────────────────────────────


def test_sketch_estimate_accuracy_and_merge_invariant(spark):
    # 3 groups × overlapping ids; merged estimate must equal the estimate
    # of a sketch built directly over the union (mergeability), and both
    # must be within ~5% of the exact distinct count.
    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 1000).alias("v")
    )
    per_group = distinct_sketch(df, ["g"], "v")
    merged = merge_sketch_estimate(
        per_group.select(F.lit(1).alias("all"), "sketch"), ["all"]
    )
    [m] = merged.collect()
    direct = distinct_sketch(df.select(F.lit(1).alias("all"), "v"), ["all"], "v")
    [d] = direct.collect()
    assert m.estimate == d.estimate  # merge == direct (same sketch state)
    assert abs(m.estimate - 1000) / 1000 < 0.05


def test_sketch_per_group_estimates(spark):
    df = spark.range(200).select(
        (F.col("id") < 100).alias("g"), F.col("id").alias("v")
    )
    out = {r.g: r.estimate for r in distinct_sketch(df, ["g"], "v").collect()}
    # 100 distinct per group — tiny cardinalities are exact in HLL sparse mode.
    assert out[True] == 100.0 and out[False] == 100.0


# ── Bloom prefilter ─────────────────────────────────────────────────────────


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    kept = bloom_prefilter(big, keys, "k", num_bits=1 << 14)
    kept_ids = {r.k for r in kept.collect()}
    assert set(range(500)) <= kept_ids  # every true member survives


def test_bloom_filters_most_nonmembers(spark):
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    big = spark.range(0, 100_000).select(F.col("id").alias("k"))
    kept = bloom_prefilter(big, keys, "k", num_bits=1 << 16).count()
    # m=65536, k=4, n=100 → FPP ≈ 0; allow generous slack.
    assert kept < 100 + 1000


def test_bloom_bits_shape(spark):
    keys = spark.range(10).select(F.col("id").alias("k"))
    [row] = build_bloom_bits(keys, "k", num_bits=1 << 10).collect()
    assert len(row.bloom_bits) == (1 << 10) // 64
    assert any(w != 0 for w in row.bloom_bits)


def test_bloom_probe_stays_jvm_side(spark):
    from mini_feature_store_spark.functions import plan_text

    keys = spark.range(10).select(F.col("id").alias("k"))
    big = spark.range(100).select(F.col("id").alias("k"))
    plan = plan_text(bloom_prefilter(big, keys, "k", num_bits=1 << 10))
    # Exactly ONE Arrow node (the 1-row bitset densify on the build side —
    # the formatted plan mentions each node twice: tree + detail section);
    # the per-row probe path must be pure JVM — no row-pickling Python.
    import re

    arrow_nodes = set(re.findall(r"ArrowEvalPython \((\d+)\)", plan))
    assert len(arrow_nodes) == 1
    assert "BatchEvalPython" not in plan


# ── CDC snapshot diff ───────────────────────────────────────────────────────


def test_snapshot_diff_classifies_all_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k int, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 9.0), (4, "d", 4.0)], "k int, s string, v double"
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[1].change == "deleted" and out[1].s_new is None
    assert 2 not in out  # unchanged dropped by default
    assert out[3].change == "updated" and (out[3].v_old, out[3].v_new) == (3.0, 9.0)
    assert out[4].change == "inserted" and out[4].s_old is None


def test_snapshot_diff_null_vs_empty_string(spark):
    # The digest must distinguish null from '' (null-sentinel in the hash).
    old = spark.createDataFrame([(1, None)], "k int, s string")
    new = spark.createDataFrame([(1, "")], "k int, s string")
    [row] = snapshot_diff(old, new, ["k"]).collect()
    assert row.change == "updated"


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a")], "k int, s string")
    new = spark.createDataFrame([(1, "a")], "k int, s string")
    assert snapshot_diff(old, new, ["k"]).count() == 0
    out = snapshot_diff(old, new, ["k"], include_unchanged=True).collect()
    assert out[0].change == "unchanged"
