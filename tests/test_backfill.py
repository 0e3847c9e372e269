"""Golden tests for the rolling backfill, ported from the reference's suite
(TestBackfillPipeline.scala via FIXTURES.md §5), run against BOTH physical
forms — the join form is the correctness oracle, the window form the scale
path; they must agree exactly (SURVEY.md §4.4)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mini_feature_store_spark.operators.rolling import (
    backfill_features_join_form,
    backfill_features_window_form,
)

FORMS = [backfill_features_join_form, backfill_features_window_form]


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime.fromisoformat(ts)) for u, t, ts in rows],
        "user_id string, event_type string, ts timestamp",
    )


def _rows(df):
    return {
        (r.user_id, r.day.isoformat()): (
            r.event_count_7d,
            r.event_count_30d,
            r.last_event_days_ago,
            r.event_type_counts,
        )
        for r in df.collect()
    }


@pytest.mark.parametrize("form", FORMS, ids=["join", "window"])
def test_dense_backfill_golden(spark, form):
    """FIXTURES.md §5.2 / TestBackfillPipeline.scala:40-81: 3 events over 5
    days → exactly 5 rows, 7d counts 1,1,2,2,3, recency 0,1,0,1,0."""
    events = _events(
        spark,
        [
            ("user1", "click", "2024-01-01 10:00:00"),
            ("user1", "purchase", "2024-01-03 14:30:00"),
            ("user1", "click", "2024-01-05 16:45:00"),
        ],
    )
    out = _rows(form(events, "2024-01-01", "2024-01-05"))
    assert len(out) == 5
    assert [out[("user1", f"2024-01-0{d}")][0] for d in range(1, 6)] == [1, 1, 2, 2, 3]
    assert [out[("user1", f"2024-01-0{d}")][2] for d in range(1, 6)] == [0, 1, 0, 1, 0]
    # distinct types: click only on day1-2; click+purchase from day 3
    assert [out[("user1", f"2024-01-0{d}")][3] for d in range(1, 6)] == [
        "1",
        "1",
        "2",
        "2",
        "2",
    ]


@pytest.mark.parametrize("form", FORMS, ids=["join", "window"])
def test_window_edges_golden(spark, form):
    """FIXTURES.md §5.3 / TestBackfillPipeline.scala:186-235: events on days
    1, 5, 8 over days 1-10. Day 8 → 7d=3 (day-1 event exactly 7 days ago is
    still IN — the inclusive 8-calendar-day edge); day 9 → 7d=2, 30d=3,
    recency=1; day 10 → 7d=2, 30d=3, recency=2."""
    events = _events(
        spark,
        [
            ("user1", "click", "2024-01-01 10:00:00"),
            ("user1", "view", "2024-01-05 11:00:00"),
            ("user1", "click", "2024-01-08 12:00:00"),
        ],
    )
    out = _rows(form(events, "2024-01-01", "2024-01-10"))
    assert len(out) == 10
    assert out[("user1", "2024-01-08")][:3] == (3, 3, 0)
    assert out[("user1", "2024-01-09")][:3] == (2, 3, 1)
    assert out[("user1", "2024-01-10")][:3] == (2, 3, 2)


@pytest.mark.parametrize("form", FORMS, ids=["join", "window"])
def test_multi_user_isolation(spark, form):
    """TestBackfillPipeline.scala:125-179: users never see each other's events;
    a user with zero events in range still gets dense zero rows."""
    events = _events(
        spark,
        [
            ("u1", "click", "2024-01-01 10:00:00"),
            ("u2", "view", "2024-01-02 10:00:00"),
            ("u2", "view", "2024-01-02 11:00:00"),
        ],
    )
    out = _rows(form(events, "2024-01-01", "2024-01-03"))
    assert len(out) == 6
    assert out[("u1", "2024-01-01")] == (1, 1, 0, "1")
    assert out[("u2", "2024-01-01")] == (0, 0, None, "0")
    assert out[("u2", "2024-01-02")] == (2, 2, 0, "1")
    assert out[("u1", "2024-01-03")] == (1, 1, 2, "1")


@pytest.mark.parametrize("form", FORMS, ids=["join", "window"])
def test_events_before_start_are_visible(spark, form):
    """An event 3 days before the backfill start must count toward early days'
    rolling windows (the reference reads the whole event log and bounds only
    via the 30-day join residual, BackfillPipeline.scala:124-131)."""
    events = _events(
        spark,
        [
            ("u1", "click", "2024-01-02 10:00:00"),
            ("u1", "view", "2024-01-06 10:00:00"),
        ],
    )
    out = _rows(form(events, "2024-01-05", "2024-01-07"))
    assert len(out) == 3
    assert out[("u1", "2024-01-05")] == (1, 1, 3, "1")
    assert out[("u1", "2024-01-06")] == (2, 2, 0, "2")
    assert out[("u1", "2024-01-07")] == (2, 2, 1, "2")


def test_forms_agree_on_testdata(spark, sf_dir):
    """Property: join form ≡ window form on the real events table."""
    from mini_feature_store_spark.io import load_testdata

    events = load_testdata(spark, sf_dir, "events")["events"].withColumn(
        "user_id", F.col("user_id").cast("string")
    )
    a = backfill_features_join_form(events, "2024-01-01", "2024-01-30")
    b = backfill_features_window_form(events, "2024-01-01", "2024-01-30")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert a.count() == b.count()


def test_window_form_plan_build_runs_zero_jobs(spark):
    """Building the window-form plan must not trigger any Spark job
    (VERDICT r2 item 4): at 100 TB an eager probe is an extra full pass
    over the corpus before the real job even starts. The old behavior
    (distinct event_type collect at plan-build) is now the opt-in
    ``distinct_types_strategy='probe'``."""
    events = _events(
        spark,
        [
            ("user1", "click", "2024-01-01 10:00:00"),
            ("user1", "purchase", "2024-01-03 14:30:00"),
        ],
    )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    df = backfill_features_window_form(events, "2024-01-01", "2024-01-05")
    after = set(tracker.getJobIdsForGroup(None))
    assert after == before, f"plan build triggered Spark jobs: {after - before}"
    # and the lazy plan still computes the golden result
    assert _rows(df)[("user1", "2024-01-03")] == (2, 2, 0, "2")


def test_window_form_known_types_and_probe_agree(spark):
    events = _events(
        spark,
        [
            ("u1", "click", "2024-01-01 10:00:00"),
            ("u1", "purchase", "2024-01-02 11:00:00"),
            ("u2", "click", "2024-01-02 12:00:00"),
        ],
    )
    base = _rows(backfill_features_window_form(events, "2024-01-01", "2024-01-03"))
    known = _rows(
        backfill_features_window_form(
            events,
            "2024-01-01",
            "2024-01-03",
            known_types=["click", "purchase"],
        )
    )
    probe = _rows(
        backfill_features_window_form(
            events,
            "2024-01-01",
            "2024-01-03",
            distinct_types_strategy="probe",
        )
    )
    cset = _rows(
        backfill_features_window_form(
            events,
            "2024-01-01",
            "2024-01-03",
            distinct_types_strategy="collect_set",
        )
    )
    assert base == known == probe == cset


def test_window_form_known_types_unseen_type_fails_loudly(spark):
    """An event type missing from known_types must error, not silently
    vanish from the distinct count."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    events = _events(spark, [("u1", "scroll", "2024-01-01 10:00:00")])
    df = backfill_features_window_form(
        events, "2024-01-01", "2024-01-02", known_types=["click"]
    )
    with _pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        df.collect()


def test_typed_form_golden(spark):
    """Map-valued variant: per-type rolling 30d counts with the exact same
    grid/7d/30d/recency semantics; empty map (not null) on windowless
    days; repeated same-type events accumulate."""
    from mini_feature_store_spark.operators.rolling import (
        backfill_features_typed,
    )

    events = _events(
        spark,
        [
            ("u1", "click", "2024-01-02 10:00:00"),
            ("u1", "click", "2024-01-02 11:00:00"),
            ("u1", "purchase", "2024-01-03 09:00:00"),
            ("u2", "view", "2024-01-05 08:00:00"),
        ],
    )
    out = {
        (r.user_id, r.day.isoformat()): (
            r.event_count_7d,
            r.event_count_30d,
            r.last_event_days_ago,
            dict(r.event_type_counts),
        )
        for r in backfill_features_typed(
            events, "2024-01-01", "2024-01-06"
        ).collect()
    }
    assert len(out) == 12  # dense: 2 users x 6 days
    assert out[("u1", "2024-01-01")] == (0, 0, None, {})
    assert out[("u1", "2024-01-02")] == (2, 2, 0, {"click": 2})
    assert out[("u1", "2024-01-03")] == (3, 3, 0, {"click": 2, "purchase": 1})
    assert out[("u1", "2024-01-06")] == (3, 3, 3, {"click": 2, "purchase": 1})
    assert out[("u2", "2024-01-04")] == (0, 0, None, {})
    assert out[("u2", "2024-01-05")] == (1, 1, 0, {"view": 1})


def test_typed_form_agrees_with_string_contract(spark, sf_dir):
    """Property on the real events table: the typed map REFINES the string
    contract — size(map) = distinct-type count, sum(map values) =
    event_count_30d, and the shared columns are identical row-for-row."""
    from mini_feature_store_spark.io import load_testdata
    from mini_feature_store_spark.operators.rolling import (
        backfill_features_typed,
        backfill_features_window_form,
    )

    events = load_testdata(spark, sf_dir, "events")["events"].withColumn(
        "user_id", F.col("user_id").cast("string")
    )
    typed = backfill_features_typed(events, "2024-01-01", "2024-01-30")
    flat = typed.select(
        "user_id",
        "day",
        "event_count_7d",
        "event_count_30d",
        "last_event_days_ago",
        F.size("event_type_counts").cast("long").cast("string").alias(
            "event_type_counts"
        ),
        F.aggregate(
            F.map_values("event_type_counts"),
            F.lit(0).cast("bigint"),
            lambda a, b: a + b,
        ).alias("_sum_counts"),
    )
    bad = flat.where(F.col("_sum_counts") != F.col("event_count_30d"))
    assert bad.isEmpty()
    base = backfill_features_window_form(events, "2024-01-01", "2024-01-30")
    a, b = flat.drop("_sum_counts"), base
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
