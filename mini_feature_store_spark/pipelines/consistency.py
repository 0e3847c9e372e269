"""Online/offline consistency check — the missing audit in the reference.

The reference syncs features to Redis (``OnlineSyncPipeline.scala:76-97``)
but has no way to verify the online store actually matches the offline
table — the classic source of training/serving skew. This pipeline reads
the online store *distributed* (the FileKVStore lays each key out as one
JSON file, so ``spark.read.json`` over the directory scans it in parallel
with the offline schema applied — no driver-side key loop) and full-outer
joins it against the expected offline snapshot.

At Redis scale the online side would arrive via a connector dump (e.g.
RDB export to object storage) read the same way; the comparison plan is
identical — one full-outer hash join on the key, struct equality on the
value columns, only anomalies returned (the result is empty when healthy,
so the action is cheap regardless of table size).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["online_offline_diff"]


def online_offline_diff(
    spark: SparkSession,
    kv_root: str,
    offline: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Rows where online and offline disagree; empty == consistent.

    Output: ``key_col``, ``status`` (``missing_online`` — key expected but
    not served, ``missing_offline`` — key served but no longer expected,
    ``mismatch`` — value drift), ``online`` / ``offline`` structs of the
    value columns for inspection.
    """
    value_cols = [c for c in offline.columns if c != key_col]
    online = spark.read.schema(offline.schema).json(
        os.path.join(kv_root, "*.json")
    )
    off, on = offline.alias("off"), online.alias("on")
    joined = off.join(
        on,
        F.col(f"off.{key_col}").eqNullSafe(F.col(f"on.{key_col}")),
        "full_outer",
    )
    off_struct = F.struct(*[F.col(f"off.{c}").alias(c) for c in value_cols])
    on_struct = F.struct(*[F.col(f"on.{c}").alias(c) for c in value_cols])
    status = (
        F.when(F.col(f"on.{key_col}").isNull(), "missing_online")
        .when(F.col(f"off.{key_col}").isNull(), "missing_offline")
        .when(off_struct.eqNullSafe(on_struct), "ok")
        .otherwise("mismatch")
    )
    return (
        joined.select(
            F.coalesce(
                F.col(f"off.{key_col}"), F.col(f"on.{key_col}")
            ).alias(key_col),
            status.alias("status"),
            on_struct.alias("online"),
            off_struct.alias("offline"),
        )
        .where(F.col("status") != "ok")
    )
