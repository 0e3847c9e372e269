"""Data profiling: one-pass multi-column stats and fixed-width histograms.

The reference exposes no profiling at all (closest is the ad-hoc
``printSchema``/``show`` calls in its pipelines); for a training-data engine
feeding 100 TB runs, schema-drift and distribution checks are table stakes,
so this is a §2.11 capability add.

Scale shape:

- ``table_profile`` computes EVERY requested column's (count, nulls, min,
  max, mean, stddev) in ONE aggregate over the table — a single scan, all
  partial aggregates map-side, one row crossing the shuffle per partition.
  The wide 1-row result is then unpivoted driver-free with ``stack`` into
  the long (column, stat...) form. Never one pass per column.

- ``numeric_histogram`` is a projection (bucket arithmetic, no UDF) plus one
  hash aggregate — bucket count is bounded so the reduce side is tiny no
  matter the input size. Values outside [lo, hi] are dropped; x == hi lands
  in the last bucket (half-open buckets, closed final edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_profile", "numeric_histogram"]

_STATS = ("n", "n_null", "min", "max", "mean", "stddev")


def table_profile(df: DataFrame, columns: list[str] | tuple[str, ...]) -> DataFrame:
    """Long-format numeric profile: one row per column, one scan total.

    Output schema: ``column string, n bigint, n_null bigint, min double,
    max double, mean double, stddev double`` (sample stddev; null for n<2).
    """
    columns = list(columns)
    aggs = []
    for c in columns:
        x = F.col(c).cast("double")
        aggs += [
            F.count(x).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(x)).alias(f"{c}__n_null"),
            F.min(x).alias(f"{c}__min"),
            F.max(x).alias(f"{c}__max"),
            F.avg(x).alias(f"{c}__mean"),
            F.stddev_samp(x).alias(f"{c}__stddev"),
        ]
    wide = df.agg(*aggs)
    # stack(n, 'c1', c1__n, ..., 'cN', cN__n...) → long form without any
    # driver round-trip; the input to stack is a single row.
    stack_args = ", ".join(
        "'{c}', {fields}".format(
            c=c, fields=", ".join(f"`{c}__{s}`" for s in _STATS)
        )
        for c in columns
    )
    cols_sig = ", ".join(_STATS)
    return wide.selectExpr(
        f"stack({len(columns)}, {stack_args}) AS (column, {cols_sig})"
    ).select(
        "column",
        F.col("n").cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        "min", "max", "mean", "stddev",
    )


def numeric_histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-width histogram of ``col`` over [lo, hi] with ``nbins`` buckets.

    Output: ``bucket bigint, bucket_lo double, bucket_hi double, n bigint``;
    only non-empty buckets are emitted (join against a bucket dimension to
    densify if needed).
    """
    if nbins <= 0 or not hi > lo:
        raise ValueError("need nbins > 0 and hi > lo")
    width = (hi - lo) / nbins
    x = F.col(col).cast("double")
    bucket = F.least(
        F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(nbins - 1)
    ).cast("long")
    return (
        df.where(x.isNotNull() & (x >= lo) & (x <= hi))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("bucket_hi"),
            "n",
        )
    )
