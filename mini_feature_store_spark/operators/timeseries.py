"""Time-series gap filling, forward fill, and validity-interval (SCD2) builds.

The reference densifies a (user × day) grid for the backfill
(``pipelines/BackfillPipeline.scala:117-119``) but has no carry-forward
semantics: a gap day simply recomputes window counts. Training pipelines
routinely need the *last observed* value on every grid day (feature
freshness, state-as-of-day), which is forward fill, and the dual view —
"each observation is valid until the next one" — which is the SCD2 /
validity-interval form.

Scale shape: the grid join and every fill window hash-partition by the key
columns only, so one Exchange serves the join and all window passes; the
fill itself is ``last(ignorenulls)`` over an unbounded-preceding rows frame
— a single running state per key, no per-row lookback join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gap_fill_forward", "scd_intervals"]


def gap_fill_forward(
    daily: DataFrame,
    keys: list[str] | tuple[str, ...],
    day_col: str,
    value_cols: list[str] | tuple[str, ...],
    start: str | None = None,
    end: str | None = None,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Densify ``daily`` to one row per (key, day) and forward-fill values.

    ``daily`` must be unique on (keys, day). The output adds, per value
    column ``v``: ``v`` forward-filled, plus ``{v}_age_days`` = days since
    the observation that supplied it (0 on observation days, null before
    the first observation).

    The day grid is ``sequence(start, end)`` crossed with the distinct keys
    (broadcast date side — same shape as the reference's scaffold,
    BackfillPipeline.scala:110-119) unless an explicit ``grid`` is given.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    if grid is None:
        if start is None or end is None:
            raise ValueError("need start/end (or an explicit grid)")
        days = (
            daily.sparkSession.range(1)
            .select(
                F.explode(
                    F.sequence(
                        F.lit(start).cast("date"), F.lit(end).cast("date")
                    )
                ).alias(day_col)
            )
        )
        grid = daily.select(*keys).distinct().crossJoin(F.broadcast(days))
    dense = grid.join(daily, on=keys + [day_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_cols: list[Column] = [F.col(c) for c in keys] + [F.col(day_col)]
    for v in value_cols:
        filled = F.last(F.col(v), ignorenulls=True).over(w)
        obs_day = F.last(
            F.when(F.col(v).isNotNull(), F.col(day_col)), ignorenulls=True
        ).over(w)
        out_cols.append(filled.alias(v))
        out_cols.append(
            F.datediff(F.col(day_col), obs_day).cast("int").alias(f"{v}_age_days")
        )
    return dense.select(*out_cols)


def scd_intervals(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    ts_col: str,
    tie_breakers: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Turn per-key observation rows into validity intervals (SCD type 2).

    Each row becomes ``valid_from = ts`` and ``valid_to`` = the next
    observation's ts for the same key (null = still current, also flagged
    ``is_current``). One window over one hash exchange on the keys.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col, *tie_breakers)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
