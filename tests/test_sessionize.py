"""Sessionization golden tests: gap semantics, boundaries, per-user isolation."""

from __future__ import annotations

import datetime as dt

from mini_feature_store_spark.operators.sessionize import (
    sessionize,
    with_session_id,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(rows)],
        "user_id string, event_id long, ts timestamp",
    )


def test_gap_splits_sessions(spark):
    # gaps: 100s (same), 2000s (new), 1800s exactly (same — strict >)
    df = _events(spark, [("u", 0), ("u", 100), ("u", 2100), ("u", 3900)])
    out = sessionize(df, gap_seconds=1800, tiebreak_col="event_id").collect()
    by_idx = {r.session_idx: r for r in out}
    assert len(by_idx) == 2
    assert by_idx[0].n_events == 2 and by_idx[0].duration_s == 100
    assert by_idx[1].n_events == 2 and by_idx[1].duration_s == 1800


def test_single_event_session(spark):
    df = _events(spark, [("u", 0)])
    [row] = sessionize(df).collect()
    assert row.n_events == 1 and row.duration_s == 0
    assert row.session_start == row.session_end


def test_users_isolated(spark):
    df = _events(spark, [("a", 0), ("b", 10), ("a", 50), ("b", 5000)])
    out = sessionize(df, gap_seconds=1800, tiebreak_col="event_id").collect()
    sessions = {(r.user_id, r.session_idx): r.n_events for r in out}
    assert sessions == {("a", 0): 2, ("b", 0): 1, ("b", 1): 1}


def test_single_shuffle_plan(spark):
    """Both window passes and the (user, session) aggregate must reuse ONE
    hash exchange on user_id: HashPartitioning(user) satisfies the
    ClusteredDistribution of the (user, session_idx) group-by, and the lag
    and running-sum windows share partitioning+ordering."""
    import re

    from mini_feature_store_spark.functions import plan_text

    df = _events(spark, [("u", 0), ("u", 100)])
    plan = plan_text(sessionize(df, tiebreak_col="event_id"))
    exchange_nodes = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(exchange_nodes) == 1, plan


def test_session_idx_is_zero_based_and_dense(spark):
    df = _events(spark, [("u", 0), ("u", 10_000), ("u", 20_000)])
    tagged = with_session_id(df, gap_seconds=1800).collect()
    assert sorted(r.session_idx for r in tagged) == [0, 1, 2]
