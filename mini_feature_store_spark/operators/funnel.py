"""Sequential funnel analysis over an event log.

The reference's pipelines only aggregate per-(user, day) counts
(``pipelines/BackfillPipeline.scala:132-160``); it has no notion of ordered
multi-step behavior. This operator adds the classic conversion funnel: for an
ordered list of steps, a user "reaches" step *i* only via an event of that
type at-or-after the timestamp at which they reached step *i-1* (strict
sequence semantics — a click before the first view does not count).

Scale shape: every per-step timestamp is a conditional ``min`` window over
ONE hash partitioning by user — Catalyst stacks the dependent window
projections on a single Exchange + Sort, so the whole funnel costs one
shuffle of the event log regardless of the number of steps. The final
summary is a single-row global aggregate (map-side partial, then a
SinglePartition reduce of one row per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mini_feature_store_spark.functions import round_half_up

__all__ = ["funnel_user_steps", "funnel_summary"]


def funnel_user_steps(
    events: DataFrame,
    steps: list[str] | tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user with ``step{i}_ts`` = when the user reached step i.

    ``step{i}_ts`` is the earliest event of type ``steps[i]`` at-or-after
    ``step{i-1}_ts``; null (and all later steps null) if never reached.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    df = events
    prev: str | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            # A null prev timestamp makes the condition null → the event is
            # excluded, so unreached steps propagate null down the funnel.
            cond = cond & (F.col(ts_col) >= F.col(prev))
        name = f"step{i}_ts"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    names = [f"step{i}_ts" for i in range(len(steps))]
    # The window made each step{i}_ts constant per user; min() just picks it.
    return df.groupBy(user_col).agg(*[F.min(c).alias(c) for c in names])


def funnel_summary(
    events: DataFrame,
    steps: list[str] | tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-step reach counts and conversion rates.

    Columns: ``step_idx`` (int), ``step`` (string), ``n_users`` (bigint),
    ``pct_of_first`` / ``pct_of_prev`` (double, 4 dp). The whole summary is
    computed from ONE single-row aggregate — no window, no second shuffle.
    """
    per_user = funnel_user_steps(events, steps, user_col, type_col, ts_col)
    counts = per_user.agg(
        *[F.count(f"step{i}_ts").alias(f"c{i}") for i in range(len(steps))]
    )
    rows = []
    for i, step in enumerate(steps):
        c, c0 = F.col(f"c{i}"), F.col("c0")
        prev = F.col(f"c{max(i - 1, 0)}")
        rows.append(
            F.struct(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(step).alias("step"),
                c.alias("n_users"),
                F.when(c0 > 0, round_half_up(c / c0)).alias("pct_of_first"),
                F.when(prev > 0, round_half_up(c / prev)).alias("pct_of_prev"),
            )
        )
    return counts.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")
