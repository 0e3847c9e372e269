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

    The Delta branch is wiring-tested only (tests/test_delta_wiring.py,
    fake writer — delta-spark is absent in this container); the parquet
    fallback is the branch exercised live.
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


def write_parquet_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    """Layout-aware parquet write: range-partition rows across files by
    ``cluster_by`` and sort within each file on the same key.

    Why this matters at 100 TB: parquet stores per-row-group min/max
    statistics; a reader filtering on ``cluster_by`` columns skips whole
    row groups/files when values are clustered, and skips nothing when
    they're scattered. Range partitioning gives disjoint key ranges per
    file (file-level skipping via footer stats), the within-file sort
    tightens row-group stats — the open-format analog of Delta
    ``OPTIMIZE ZORDER BY`` for the single-key case, built from
    ``repartitionByRange`` + ``sortWithinPartitions`` (both pure Spark).

    ``target_files`` overrides the output file count (defaults to the
    session's shuffle parallelism via repartitionByRange's default).
    """
    cluster_cols = list(cluster_by)
    if not cluster_cols:
        raise ValueError("cluster_by must name at least one column")
    if target_files is not None:
        clustered = df.repartitionByRange(target_files, *cluster_cols)
    else:
        clustered = df.repartitionByRange(*cluster_cols)
    clustered = clustered.sortWithinPartitions(*cluster_cols)
    write_parquet(clustered, path, mode=mode, partition_by=partition_by)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    mode: str = "overwrite",
) -> list[dict]:
    """Deterministic sharded export for training dataloaders: rows land in
    ``n_shards`` files by ``xxhash64(key) % n_shards`` (same key → same shard
    across runs and engines), one file per shard, plus a ``_shards.json``
    manifest recording per-shard row counts and bytes read back from the
    parquet footers (O(n_shards) driver metadata reads — never a data scan).

    Dataloaders consume the manifest to size epochs and stripe workers; the
    hash assignment means adding data re-shuffles nothing retroactively.
    """
    import glob
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    sharded = df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )
    (
        sharded.repartition(n_shards, "_shard")
        .sortWithinPartitions(key_col)
        .write.mode(mode)
        .partitionBy("_shard")
        .parquet(path)
    )
    manifest = []
    for d in sorted(glob.glob(_os.path.join(path, "_shard=*"))):
        shard = int(d.rsplit("=", 1)[1])
        rows = nbytes = 0
        for f in glob.glob(_os.path.join(d, "*.parquet")):
            md = _pq.read_metadata(f)
            rows += md.num_rows
            nbytes += _os.path.getsize(f)
        manifest.append({"shard": shard, "rows": rows, "bytes": nbytes})
    with open(_os.path.join(path, "_shards.json"), "w") as f:
        _json.dump(manifest, f)
    return manifest
