"""Small reusable column/table helpers (SURVEY.md §2.8 scalar surface)."""

from __future__ import annotations

import datetime as dt

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (captured ``df.explain``) — used by
    tests and plan audits to assert pushdown/pruning/codegen properties."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def date_range(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    col_name: str = "day",
) -> DataFrame:
    """One row per day in [start, end] inclusive.

    Idiomatic form of the reference's date-scaffold generator
    (``pipelines/BackfillPipeline.scala:110-115``, which spells it
    ``posexplode(split(space(datediff(end,start)),' '))``): ``sequence()`` +
    ``explode()`` builds the same rows without the string round-trip.
    Tiny (≤ tens of thousands of rows) → always broadcast-joinable.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
        ).alias(col_name)
    )
