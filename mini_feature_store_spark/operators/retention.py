"""Cohort retention analysis over an event log.

Groups users into cohorts by their first-activity period (week/month/day)
and measures what fraction of each cohort is still active N periods later —
the standard engagement matrix a feature store feeds to growth dashboards.
Absent from the reference (its only per-user time derivation is the rolling
backfill, ``pipelines/BackfillPipeline.scala:132-160``).

Scale shape: two hash aggregates (first-activity per user; distinct
(user, period)) that share the user_id partitioning, then a join that
re-uses it, then a final small aggregate keyed by (cohort, offset) — the
cohort-size join is a broadcast of the tiny per-cohort counts. No windows,
no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_feature_store_spark.functions import round_half_up

__all__ = ["cohort_retention"]

_PERIOD_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention matrix: one row per (cohort_period, period_offset).

    Columns: ``cohort_{period}`` (date), ``{period}_offset`` (int),
    ``n_active`` (bigint), ``cohort_size`` (bigint), ``retention_rate``
    (double, 4 dp). Offset 0 rows have ``n_active = cohort_size`` by
    construction (a user is active in their own first period).

    ``period`` is 'day' or 'week' ('month' offsets aren't a fixed day
    count; use months_between explicitly if needed).
    """
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    step = _PERIOD_DAYS[period]
    bucket = F.date_trunc(period, F.col(ts_col)).cast("date")
    cohort_col, offset_col = f"cohort_{period}", f"{period}_offset"

    first = events.groupBy(user_col).agg(F.min(bucket).alias(cohort_col))
    active = events.select(
        F.col(user_col), bucket.alias("_active_p")
    ).distinct()
    # Offsets are exact integers: both sides are period-truncated dates.
    joined = active.join(first, on=user_col).select(
        F.col(cohort_col),
        (F.datediff(F.col("_active_p"), F.col(cohort_col)) / step)
        .cast("int")
        .alias(offset_col),
        F.col(user_col),
    )
    counts = joined.groupBy(cohort_col, offset_col).agg(
        F.count_distinct(F.col(user_col)).alias("n_active")
    )
    sizes = first.groupBy(cohort_col).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), on=cohort_col).select(
        cohort_col,
        offset_col,
        "n_active",
        "cohort_size",
        round_half_up(F.col("n_active") / F.col("cohort_size")).alias(
            "retention_rate"
        ),
    )
