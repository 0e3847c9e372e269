"""Sinks: parquet / JSON / CSV writes + atomic partitioned table overwrite.

Re-expresses ``platform/Writers.scala`` + ``platform/ProdWriter.scala``:
writeParquet (ProdWriter.scala:23-35), writeJson (:37-42), writeCsv (:44-55),
insertOverwriteIcebergTable (:57-70). The table sink targets Delta when the
package is present (ACID overwrite + time travel per BASELINE.json), else a
plain partitioned-parquet ``saveAsTable`` — same logical semantics, weaker
atomicity, clearly flagged.

Scale notes:
- ``partition_overwrite='dynamic'`` (or Delta ``replaceWhere``) makes an
  incremental backfill rewrite only the touched ``day`` partitions instead of
  the whole 100 TB table.
- Writers never repartition behind the caller's back; callers own layout
  (e.g. pipelines coalesce tiny dimension outputs, leave fact outputs as AQE
  sized them).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from mini_feature_store_spark.session import HAVE_DELTA


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """Partitioned parquet write (ProdWriter.scala:23-35)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines write (ProdWriter.scala:37-42)."""
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
) -> None:
    """CSV write (ProdWriter.scala:44-55)."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("delimiter", delimiter)
        .csv(path)
    )


def insert_overwrite_table(
    df: DataFrame,
    table: str,
    partition_by: Sequence[str] = (),
    replace_where: str | None = None,
) -> None:
    """Atomic full- or partition-scoped table overwrite.

    Maps the reference's ``insertOverwriteIcebergTable``
    (ProdWriter.scala:57-70) onto Delta when available. ``replace_where``
    (Delta only) scopes the overwrite to matching partitions — the 100 TB
    path for incremental backfills.
    """
    fmt = "delta" if HAVE_DELTA else "parquet"
    writer = df.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if replace_where is not None:
        if not HAVE_DELTA:
            raise NotImplementedError(
                "partition-scoped overwrite (replaceWhere) requires delta-spark; "
                "install it or overwrite the full table"
            )
        writer = writer.option("replaceWhere", replace_where)
    writer.saveAsTable(table)
