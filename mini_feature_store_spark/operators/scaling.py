"""Per-group feature scaling: z-score standardization and min-max rescale.

The classic last-mile transforms before model training. The reference stores
raw counts only (``domain/Schemas.scala:43-52``); scaling is left to the
training framework — at 100 TB that normalization belongs in the engine,
next to the data.

Scale shape — deliberately NOT a whole-partition window: an unbounded
window (``AVG(x) OVER (PARTITION BY g)``) materializes and sorts every
partition just to attach two numbers to each row. Instead: one hash
aggregate (map-side partial combine) computes the per-group moments — output
is |groups| rows — and a join (AQE-chosen strategy: broadcast while
|groups| fits executor memory, shuffle beyond) attaches them back. One
shuffle of group-sized aggregates, zero sorts, strictly cheaper than the
window's sort at any |groups|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_feature_store_spark.functions import round_half_up

__all__ = ["scale_features"]


def scale_features(
    df: DataFrame,
    value_col: str,
    by: list[str] | tuple[str, ...] = (),
    z_clip: float | None = None,
    ndigits: int = 4,
) -> DataFrame:
    """Attach ``{v}_z`` (z-score, sample stddev) and ``{v}_minmax``
    (min-max to [0, 1]) for ``value_col``, computed within each ``by`` group
    (global when ``by`` is empty).

    Degenerate groups are null-safe: stddev 0 or a single row yields null
    ``_z``; min == max yields null ``_minmax``. ``z_clip`` winsorizes the
    z-score to ±z_clip (outlier clamping). Both outputs rounded to
    ``ndigits`` so results are engine-portable (float summation order).
    """
    by = list(by)
    v = F.col(value_col)
    stats = df.groupBy(*by).agg(
        F.avg(v).alias("_mean"),
        F.stddev_samp(v).alias("_sd"),
        F.min(v).alias("_lo"),
        F.max(v).alias("_hi"),
    )
    # Grouped stats are O(distinct groups) — caller-controlled, so the
    # grouped join is UNHINTED (AQE decides); only the global 1-row
    # aggregate keeps the provably-bounded hard broadcast.
    joined = (
        df.join(stats, on=by) if by else df.crossJoin(F.broadcast(stats))
    )
    z = (v - F.col("_mean")) / F.col("_sd")
    if z_clip is not None:
        z = F.greatest(F.least(z, F.lit(float(z_clip))), F.lit(-float(z_clip)))
    rng = F.col("_hi") - F.col("_lo")
    return joined.select(
        *df.columns,
        round_half_up(F.when(F.col("_sd") > 0, z), ndigits).alias(f"{value_col}_z"),
        round_half_up(F.when(rng > 0, (v - F.col("_lo")) / rng), ndigits).alias(
            f"{value_col}_minmax"
        ),
    )
