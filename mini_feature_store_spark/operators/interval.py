"""Interval (range-containment) join — points × intervals without a cartesian.

The reference has no range join at all (its only temporal join is the
equi-key + bounded-range form in ``PointInTimeJoinPipeline.scala:103-122``);
this is a §2.11 capability add. Spark itself plans a pure range predicate
(no equi key) as BroadcastNestedLoopJoin — O(|points| x |intervals|) work that
is fine for a dimension-sized interval table but fatal when both sides are
large.

The scale form here is the classic *bucketized* range join (the same trick
Databricks' range-join hint and GeoSpark's 1-D grid partitioning use): pick a
bucket width ``w``, assign every point to bucket ``floor(t / w)``, explode
every interval into the buckets it overlaps (``sequence(floor(s/w),
floor(e/w))``), then **equi-join on the bucket id** (+ any equi keys) and
re-check the exact predicate. The nested loop becomes a hash/sort-merge join
with per-interval fan-out ``len/w + 1``:

- point side: 1 row per point (a point lives in exactly one bucket — no
  duplicate results, no distinct needed);
- interval side: small constant replication, chosen by ``bucket_width``
  (pick ~ the typical interval length so fan-out ≈ 2).

At 100 TB both sides shuffle-partition on the bucket id, so the join
parallelizes across the cluster instead of serializing through a nested
loop; AQE still handles residual skew on hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _bucket(col: Column, width_s: int) -> Column:
    # floor(), not cast-after-divide: cast truncates toward zero, so negative
    # epoch seconds (pre-1970 timestamps) would bucket differently on the
    # point and interval sides and silently drop matches.
    return F.floor(col.cast("timestamp").cast("long") / F.lit(width_s)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: list[str] | tuple[str, ...] = (),
    bucket_width: str = "7 days",
    closed: str = "both",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``closed`` picks the containment predicate: ``'both'`` ([s, e]),
    ``'left'`` ([s, e)), ``'right'`` ((s, e]), ``'neither'`` ((s, e)).
    ``keys`` are extra equi-join columns (must exist on both sides).
    ``bucket_width`` is a duration literal (``'3 days'``, ``'12 hours'``,
    ``'900 seconds'``) — choose ≈ the typical interval length.
    ``how='left'`` keeps points that fall in no interval (null interval cols).

    Output: all point columns, then interval columns (minus shared keys).
    """
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"bad closed: {closed!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    qty, unit = bucket_width.split()
    width_s = int(qty) * {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    keys = list(keys)
    ival_cols = [c for c in intervals.columns if c not in keys]

    p = points.withColumn("_b", _bucket(F.col(point_ts), width_s))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(start_ts), width_s), _bucket(F.col(end_ts), width_s)
            )
        ),
    )

    lo = F.col(f"p.{point_ts}") >= F.col(f"i.{start_ts}")
    hi = F.col(f"p.{point_ts}") <= F.col(f"i.{end_ts}")
    if closed in ("right", "neither"):
        lo = F.col(f"p.{point_ts}") > F.col(f"i.{start_ts}")
    if closed in ("left", "neither"):
        hi = F.col(f"p.{point_ts}") < F.col(f"i.{end_ts}")
    cond = (F.col("p._b") == F.col("i._b")) & lo & hi
    for k in keys:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))

    joined = p.alias("p").join(iv.alias("i"), cond, how)
    return joined.select(
        *[F.col(f"p.{c}") for c in points.columns],
        *[F.col(f"i.{c}") for c in ival_cols],
    )
