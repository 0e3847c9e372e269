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


def strip_initial_plans(plan: str) -> str:
    """Drop embedded ``== Initial Plan ==`` sections from an explain dump.

    An executed ``AdaptiveSparkPlan`` nested inside the plan (an
    ``InMemoryRelation``'s cached child, materialized by a plan-build
    probe) prints BOTH its Final Plan and its pre-AQE Initial Plan, each
    with freshly numbered operators — so a flat node-count over the text
    counts every cached exchange twice even though the Initial copy never
    executes. Tests/audits that pin exchange/scan ceilings should count on
    the stripped text (tree-line syntax ``Exchange (n)``), which reflects
    the operators a run can actually execute."""
    out: list[str] = []
    skip_indent: int | None = None
    for line in plan.splitlines(keepends=True):
        stripped = line.lstrip()
        indent = len(line) - len(stripped)
        if skip_indent is not None:
            if stripped and indent <= skip_indent:
                skip_indent = None
            else:
                continue
        if "== Initial Plan ==" in stripped:
            skip_indent = indent
            continue
        out.append(line)
    return "".join(out)


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan is under-parallel.

    Compute-heavy projections (shingling, signature hashing, per-pair
    similarity scoring) are CPU-bound, not IO-bound: a small parquet input
    (one row group → one split) or an AQE-coalesced shuffle otherwise pins
    the whole operator to a single core. One cheap round-robin exchange
    before the hot projection buys full-cluster parallelism. No-op when the
    input is already at least ``defaultParallelism``-wide (the 100 TB case,
    where inputs arrive thousands of partitions wide and an extra shuffle
    would be pure cost).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def round_half_up(col, scale: int = 4):
    """Engine-portable fixed-point rounding: ``floor(x·10^scale + 0.5) /
    10^scale``.

    Engine ``round()`` is NOT portable on doubles: Spark routes through
    BigDecimal HALF_UP on the decimal expansion of the double while DuckDB
    rounds in double arithmetic, and the two provably split on
    small-denominator rationals (57/800 → Spark 0.0713, DuckDB 0.0712).
    ``floor`` and IEEE multiply/add are bit-identical on both engines, so
    this form — applied on BOTH sides, the oracle mirror spelled
    ``FLOOR((x)*10000 + 0.5)/10000`` — is deterministic across them.
    Ties round toward +∞ (for the positive ratios/fractions this repo
    rounds, that equals HALF_UP; exact negative halves land one ulp up,
    consistently on both engines).
    """
    p = F.lit(float(10 ** scale))
    return F.floor(col * p + F.lit(0.5)) / p


def round_half_up_py(x: float, scale: int = 4) -> float:
    """Driver-side twin of ``round_half_up`` — the identical
    ``floor(x·10^scale + 0.5)/10^scale`` form in Python floats, for
    bounded-collect trainer artifacts that surface through
    ``createDataFrame`` (same double arithmetic as the JVM, so the two
    paths cannot drift)."""
    import math

    m = float(10 ** scale)
    return math.floor(x * m + 0.5) / m


def melt(
    df: DataFrame,
    id_vars: list[str] | tuple[str, ...],
    value_vars: list[str] | tuple[str, ...] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long reshape (pandas ``melt`` surface) on the native
    ``DataFrame.unpivot`` operator.

    ``unpivot`` is a zero-shuffle generator (each input row fans out to
    ``len(value_vars)`` rows inside the same task), so it composes with a
    downstream groupBy at no extra exchange — the right way to feed
    "one row per (entity, metric)" layouts at 100 TB. When ``value_vars``
    is omitted, every non-id column is melted; mixed numeric widths are
    up-cast to the common type by unpivot itself (it requires a least
    common type — cast beforehand for mixed string/numeric).
    """
    id_vars = list(id_vars)
    if value_vars is None:
        value_vars = [c for c in df.columns if c not in id_vars]
    return df.unpivot(id_vars, list(value_vars), var_name, value_name)


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
