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


def test_sessionize_properties_random(spark):
    """Property-based invariants on random event sets (hypothesis):
    1. sessions partition the events (counts sum to total);
    2. within a session, consecutive gaps ≤ gap_seconds;
    3. across consecutive sessions of a user, the gap > gap_seconds."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    GAP = 600

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=0, max_value=50_000),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(rows):
        df = spark.createDataFrame(
            [
                (u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
                for i, (u, s) in enumerate(rows)
            ],
            "user_id string, event_id long, ts timestamp",
        )
        sess = sessionize(
            df, gap_seconds=GAP, tiebreak_col="event_id"
        ).collect()
        assert sum(r.n_events for r in sess) == len(rows)
        by_user: dict[str, list] = {}
        for r in sess:
            by_user.setdefault(r.user_id, []).append(r)
        for user, srs in by_user.items():
            srs.sort(key=lambda r: r.session_idx)
            times = sorted(s for (u, s) in rows if u == user)
            # session bounds ordered and separated by > GAP
            for prev, nxt in zip(srs, srs[1:]):
                assert nxt.session_idx == prev.session_idx + 1
                gap = (nxt.session_start - prev.session_end).total_seconds()
                assert gap > GAP
            # within-session max gap ≤ GAP: reconstruct from raw times
            for r in srs:
                inside = [
                    t
                    for t in times
                    if r.session_start
                    <= dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t)
                    <= r.session_end
                ]
                for t1, t2 in zip(inside, inside[1:]):
                    assert t2 - t1 <= GAP

    check()


def test_native_session_window_equivalence(spark):
    """sessionize (lag/running-sum) and sessionize_native (session_window)
    must produce identical session boundaries on data without exact-gap
    boundaries (the two APIs differ only at gap == gap_duration exactly)."""
    from mini_feature_store_spark.operators.sessionize import sessionize_native

    rows = [("u", s) for s in (0, 100, 700, 2600, 2700, 9000)] + [
        ("v", s) for s in (50, 5000)
    ]
    df = _events(spark, rows)
    gap_based = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, gap_seconds=1800, tiebreak_col="event_id").collect()
    }
    native = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_native(df, gap="30 minutes").collect()
    }
    assert gap_based == native and len(native) == 5
