"""Backfill pipeline: events parquet → versioned features_daily table.

Re-expresses the reference's ``pipelines/BackfillPipeline.scala:81-169``
(config ``types/BackfillPipelineConfig.scala:26-32``) with the window-frame
plan (SURVEY.md §4.4) instead of the 31×-fanout join, writing a versioned
table partitioned by ``day`` (the reference's Iceberg INSERT OVERWRITE,
``ProdWriter.scala:57-70``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from mini_feature_store_spark.io.sources import read_parquet
from mini_feature_store_spark.io.tables import VersionedTable
from mini_feature_store_spark.operators.rolling import (
    backfill_features_window_form,
)


@dataclass
class BackfillConfig:
    events_path: str
    output_table: str  # directory of the VersionedTable
    start_date: str
    end_date: str
    user_col: str = "user_id"
    ts_col: str = "ts"
    type_col: str = "event_type"
    partition_by: tuple[str, ...] = ("day",)
    extra: dict = field(default_factory=dict)


def run_backfill(spark: SparkSession, cfg: BackfillConfig) -> DataFrame:
    """Compute features and commit them as a new table version.

    Returns the (lazy) feature DataFrame that was written — callers needing
    row counts read the committed version instead of re-running the plan
    (the reference recomputes, PointInTimeJoinPipeline.scala:68-77 — an
    anti-pattern we don't copy, SURVEY.md §4.3-2).
    """
    events = read_parquet(spark, cfg.events_path)
    features = backfill_features_window_form(
        events,
        cfg.start_date,
        cfg.end_date,
        user_col=cfg.user_col,
        ts_col=cfg.ts_col,
        type_col=cfg.type_col,
    )
    VersionedTable(cfg.output_table).write(features, partition_by=cfg.partition_by)
    return features
