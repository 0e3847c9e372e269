"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 3.5+).

The 100 TB answer to "distinct users per day / week / month / campaign":
compute a sketch ONCE per fine-grained group, store it as bytes, and answer
every coarser rollup by *merging sketches* — never rescanning the raw data.
``approx_count_distinct`` (HLL++, used by ``approx_distinct_stats``) can't do
this: its estimate is final, not mergeable, so each new rollup costs a full
pass. The reference has only exact ``countDistinct``
(``pipelines/BackfillPipeline.scala:159``).

Scale shape: one shuffle keyed by the fine group for the sketch build
(map-side partial sketches combine before the exchange); every rollup after
that is an aggregate over |fine groups| rows of ~KB sketches — driver-free,
re-aggregable all the way up a date/dimension hierarchy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_sketch", "merge_sketch_estimate"]


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of distinct ``value_col`` per group (binary column
    ``sketch`` + exact-enough ``estimate``). ``lg_k=12`` → ~1.6% RSE, ~2 KB."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
        ).alias("estimate"),
    )


def merge_sketch_estimate(
    sketches: DataFrame,
    rollup_cols: list[str] | tuple[str, ...] | list[Column],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain: union-merge, then
    estimate. Input is the output of ``distinct_sketch`` (or any table with
    a binary HLL column) — the raw data is never touched."""
    return sketches.groupBy(*rollup_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("estimate")
    )
