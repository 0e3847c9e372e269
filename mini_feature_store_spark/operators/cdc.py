"""Snapshot diff — change-data-capture between two versions of a keyed table.

The reference versions its offline store through Iceberg but never *queries*
versions ("in production you'd use proper Iceberg time travel",
``api/offline.py:90``). The useful primitive on top of time travel is the
diff: which keys were inserted / updated / deleted between two snapshots —
what an online store must re-sync, what an audit must explain.

Scale shape: ONE full-outer hash join on the keys; change classification is
a codegen'd comparison of 64-bit xxhash64 row digests computed scan-side
(no column-by-column struct comparison crossing the shuffle — 8 bytes per
row decide "updated"). Unchanged rows can be dropped before any further
processing, so downstream cost tracks the churn rate, not the table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | tuple[str, ...],
    compare_cols: list[str] | tuple[str, ...] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify each key as inserted / deleted / updated / unchanged.

    Output: the key columns, ``change`` (string), and every compared column
    twice (``{c}_old``, ``{c}_new``; null on the missing side). Both inputs
    must be unique on ``keys`` (snapshots of a keyed table).
    ``compare_cols`` defaults to all shared non-key columns.
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    compare_cols = list(compare_cols)

    def digested(df: DataFrame, tag: str) -> DataFrame:
        # Row digest over the compared columns (values cast to string with a
        # null sentinel — concat_ws alone would conflate null with '').
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in compare_cols
        ]
        return df.select(
            *keys,
            F.xxhash64(*parts).alias(f"_dig_{tag}"),
            F.lit(True).alias(f"_present_{tag}"),
            *[F.col(c).alias(f"{c}_{tag}") for c in compare_cols],
        )

    o, n = digested(old, "old"), digested(new, "new")
    joined = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("_present_old").isNull(), F.lit("inserted"))
        .when(F.col("_present_new").isNull(), F.lit("deleted"))
        .when(F.col("_dig_old") != F.col("_dig_new"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *keys,
        change.alias("change"),
        *[F.col(f"{c}_old") for c in compare_cols],
        *[F.col(f"{c}_new") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out
