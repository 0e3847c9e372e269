"""Point-in-time join pipeline: labels + features_daily → training data.

Re-expresses ``pipelines/PointInTimeJoinPipeline.scala:64-136`` (config
``types/PointInTimeJoinPipelineConfig.scala:23-28``) with two deliberate
scale fixes over the reference (SURVEY.md §4.3):

- no driver ``collect()`` for the emptiness check (the reference
  materializes the full result twice, :68 and :73) — we write once and
  check emptiness with ``isEmpty`` on the written data;
- output is partitioned by ``as_of_date`` (one directory per *day*), not by
  the raw ``as_of_ts`` (one directory per distinct timestamp — millions of
  dirs at 100 TB; the reference default, PointInTimeJoinPipelineConfig.scala:27).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_feature_store_spark.io.sinks import write_parquet
from mini_feature_store_spark.io.sources import read_parquet
from mini_feature_store_spark.io.tables import VersionedTable
from mini_feature_store_spark.operators.point_in_time import point_in_time_join


@dataclass
class PointInTimeJoinConfig:
    labels_path: str
    features_table: str  # VersionedTable directory
    output_path: str
    keys: tuple[str, ...] = ("user_id",)
    label_ts: str = "as_of_ts"
    feature_ts: str = "day"
    features_version: int | None = None  # time travel pin
    lookback_days: int | None = None
    partition_by: tuple[str, ...] = ("as_of_date",)
    #: when set, features are read from this BUCKETED managed table (the
    #: backfill pipeline's ``bucket_table`` materialization) instead of
    #: the VersionedTable: the bucketed scan's output partitioning
    #: already satisfies the PIT join's user_id distribution, so the
    #: training build pays only the label-side Exchange
    #: (test_pipelines.py pins zero feature-side shuffle E2E).
    #: ``features_table`` stays required — it remains the lineage record
    #: and the fallback — but is not read. Mutually exclusive with
    #: ``features_version``: the bucketed materialization tracks HEAD
    #: only; time travel reads the versioned table.
    features_bucketed_table: str | None = None


def run_pit_join(spark: SparkSession, cfg: PointInTimeJoinConfig) -> DataFrame:
    if (
        cfg.features_bucketed_table is not None
        and cfg.features_version is not None
    ):
        raise ValueError(
            "features_bucketed_table tracks HEAD only — pin "
            "features_version against the VersionedTable instead"
        )
    labels = read_parquet(spark, cfg.labels_path)
    if cfg.features_bucketed_table is not None:
        features = spark.table(cfg.features_bucketed_table)
    else:
        features = VersionedTable(cfg.features_table).read(
            spark, version=cfg.features_version
        )
    training = point_in_time_join(
        labels,
        features,
        keys=cfg.keys,
        label_ts=cfg.label_ts,
        feature_ts=cfg.feature_ts,
        strategy="max_by",
        lookback_days=cfg.lookback_days,
    )
    if "as_of_date" in cfg.partition_by:
        training = training.withColumn(
            "as_of_date", F.to_date(F.col(cfg.label_ts))
        )
    write_parquet(
        training, cfg.output_path, mode="overwrite", partition_by=cfg.partition_by
    )
    return training
