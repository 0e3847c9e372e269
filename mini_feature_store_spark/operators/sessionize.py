"""Batch sessionization: gap-based event sessions (training-data pipelines).

The streaming analog lives in ``streaming/ingest.py`` (``session_window``);
this is the batch form over the historical event log, the operator a
training-data pipeline uses to build per-session examples.

Plan shape (the only scalable one): a single shuffle by ``user_id`` serves
both window passes (lag → gap flag → running-sum session index) because the
second window's partitioning is identical to the first's — Catalyst reuses
the sort+exchange. The per-session aggregate then shuffles (user, session)
which AQE sizes. No self-joins, no driver loops; skewed users cost one hot
partition in the window stage (cap sessions per user upstream if a key is
truly pathological).

Reference parity: none — the reference has no sessionization; this is a
north-star extension (task brief: operators a 100 TB training-data pipeline
needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_id(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Tag each event with ``session_idx`` (0-based per user).

    A new session starts when the gap from the previous event of the same
    user exceeds ``gap_seconds``. ``tiebreak_col`` makes ordering total when
    timestamps collide (required for deterministic oracle comparison).
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_idx",
        (
            F.sum(new_session).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("bigint"),
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (user, session): bounds, size, duration.

    Output: (user_id, session_idx, session_start, session_end, n_events,
    duration_s).
    """
    tagged = with_session_id(df, user_col, ts_col, gap_seconds, tiebreak_col)
    return tagged.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_s"),
    )


def sessionize_native(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions via Spark's native ``session_window`` in BATCH
    mode — same aggregate the streaming path uses (one code path for both,
    like the reference's batch/online split should have been).

    Returns (user, session_start, session_end, n_events, duration_s) where
    ``session_end`` is the LAST EVENT's ts (not the window close, which
    native session windows pad to last_ts + gap).

    Boundary semantics vs ``sessionize``: ``session_window`` merges an
    event landing strictly inside ``[last_ts, last_ts + gap)``, i.e. a gap
    of exactly ``gap`` starts a NEW session, while ``sessionize``'s
    ``gap > gap_seconds`` keeps it in the same session. Identical on data
    without exact-boundary gaps (pinned by the equivalence test).
    """
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            ).alias("duration_s"),
        )
        .drop("session_window")
    )
