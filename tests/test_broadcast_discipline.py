"""Broadcast-hint discipline (r5 VERDICT #1).

A hard ``F.broadcast()`` hint, unlike an AQE runtime choice, never degrades
to sort-merge — it OOMs when the hinted side outgrows executor memory. So
the rule pinned here is: hard hints ONLY on provably-bounded relations
(a 25-row nation dim, a 1-row scalar aggregate, a capped blacklist);
relations that grow linearly with data (dropped-id sets, distinct-buyer
sets, full non-tiny dims, per-order aggregates) carry NO hint and are
left to the planner/AQE.

Each query test counts ``strategy=broadcast`` hint nodes in the ANALYZED
plan (hints survive analysis verbatim, so the count is exact) and pins it
to the number of provably-bounded sides — any new forced broadcast on an
unbounded side fails the pin.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mini_feature_store_spark.operators.graph import apply_dedup
from mini_feature_store_spark.queries import QUERIES


def _hint_count(df) -> int:
    return df._jdf.queryExecution().analyzed().toString().count(
        "strategy=broadcast"
    )


# (query, expected forced-broadcast hints, the bounded sides that keep them)
_PINS = [
    # Q18 shape: the qualifying-orders aggregate is O(orders) — no hints.
    ("large_volume_customers", 0, ()),
    # Q16 shape: the s_acctbal<0 blacklist is a filtered fraction of the
    # smallest dim — bounded, keeps its hint. The full part dim does NOT.
    ("parts_supplier_relationship", 1, ("blacklist",)),
    # Q22 shape: the avg-balance aggregate is 1 row — bounded. The
    # recently-active-buyers set is O(customers) — no hint.
    ("dormant_rich_customers", 1, ("avg_bal",)),
]


@pytest.mark.parametrize("name,expected,_bounded", _PINS)
def test_query_broadcast_hints_bounded_only(spark, sf_dir, name, expected, _bounded):
    assert _hint_count(QUERIES[name](spark, sf_dir)) == expected


@pytest.fixture()
def dedup_fixture(spark):
    corpus = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    # chains {0..9}, {20,21}, {40,41,42} → drops 9+1+2 = 12 ids
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(20, 21), (40, 41), (41, 42)],
        "id_a long, id_b long",
    )
    return corpus, pairs


def test_apply_dedup_default_has_no_forced_broadcast(spark, dedup_fixture):
    """The flagship LLM-pipeline operator: dropped ids are 30-50% of a
    real web-crawl corpus, so the default plan must leave the anti-join
    strategy to the planner."""
    corpus, pairs = dedup_fixture
    assert _hint_count(apply_dedup(corpus, pairs, "doc_id")) == 0


def test_apply_dedup_explicit_broadcast_adds_exactly_one_hint(spark, dedup_fixture):
    corpus, pairs = dedup_fixture
    assert _hint_count(
        apply_dedup(corpus, pairs, "doc_id", broadcast_drops=True)
    ) == 1


@pytest.mark.parametrize("strategy", [None, True, False])
def test_apply_dedup_result_identical_across_strategies(
    spark, dedup_fixture, strategy
):
    """Join strategy is a physical choice — survivors must be identical
    whether the drops side is planner-chosen, broadcast, or shuffled."""
    corpus, pairs = dedup_fixture
    kept = sorted(
        r.doc_id
        for r in apply_dedup(
            corpus, pairs, "doc_id", broadcast_drops=strategy
        ).collect()
    )
    expected = sorted(set(range(200)) - set(range(1, 10)) - {21, 41, 42})
    assert kept == expected


def test_apply_dedup_forbid_broadcast_plan_shuffles(spark, dedup_fixture):
    """broadcast_drops=False must pin a non-broadcast physical anti join
    even when the drops side is tiny enough for AQE to promote."""
    corpus, pairs = dedup_fixture
    out = apply_dedup(corpus, pairs, "doc_id", broadcast_drops=False)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Interior joins inside the clustering subtree MAY be AQE-promoted to
    # broadcast (that's the point of leaving them unhinted) — the pin is
    # on the anti join itself.
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines and all(
        "BroadcastHashJoin" not in ln for ln in anti_lines
    ), plan


def test_query_results_unchanged_by_hint_removal(spark, sf_dir):
    """Belt-and-braces for the three de-hinted queries: re-adding a hard
    broadcast on the formerly-hinted side must not change results (the
    oracle gate also re-checks these, but that runs at sf0.01 only)."""
    from mini_feature_store_spark.io import load_testdata

    t = load_testdata(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 160)
    )

    def q18(agg):
        return (
            agg.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "o_orderkey", F.round("total_qty", 2))
        )

    unhinted = Counter(map(tuple, q18(big).collect()))
    hinted = Counter(map(tuple, q18(F.broadcast(big)).collect()))
    assert unhinted == hinted and sum(unhinted.values()) > 0
