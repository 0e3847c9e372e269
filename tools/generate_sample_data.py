"""Generate sample events/labels parquet for the demo pipelines.

Re-expresses the reference's ``scripts/generate_sample_data.py`` (pandas
loops writing /tmp parquet) Spark-first: the same shape of data — N days of
per-user click/purchase/view events plus point-in-time labels — built as
DataFrame expressions, written with deterministic content so demo runs are
reproducible (the reference anchors at wall-clock ``datetime.now()``; we take
an explicit ``--start-date``, the same reproducibility deviation as the
pipelines, SURVEY.md §4.3).

Usage:
    python tools/generate_sample_data.py --out /tmp/fsx-demo \
        --start-date 2024-01-01 --days 7 --users 3
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="output dir (events/, labels/)")
    p.add_argument("--start-date", default="2024-01-01")
    p.add_argument("--days", type=int, default=7)
    p.add_argument("--users", type=int, default=3)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from mini_feature_store_spark.session import get_spark

    spark = get_spark(app_name="generate-sample-data")
    start = F.lit(args.start_date).cast("date")

    # (day × user × event-index) grid, 1-3 events per user-day like the
    # reference generator (num_events = day % 3 + 1), entirely lazily.
    grid = (
        spark.range(args.days)
        .withColumnRenamed("id", "day_no")
        .crossJoin(
            spark.range(args.users).select(
                F.concat(F.lit("user"), (F.col("id") + 1).cast("string")).alias(
                    "user_id"
                )
            )
        )
        .crossJoin(spark.range(3).withColumnRenamed("id", "i"))
        .where(F.col("i") < (F.col("day_no") % 3) + 1)
    )
    events = grid.select(
        "user_id",
        F.element_at(
            F.array(F.lit("click"), F.lit("purchase"), F.lit("view")),
            (F.col("i") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (
            F.date_add(start, F.col("day_no").cast("int")).cast("timestamp")
            + F.make_interval(hours=F.lit(10) + F.col("i").cast("int"))
        ).alias("ts"),
    )
    events_out = str(Path(args.out) / "events")
    events.write.mode("overwrite").parquet(events_out)

    # One label per user at the middle of the range (reference: labels at
    # "2 days ago" relative to now).
    labels = (
        spark.range(args.users)
        .select(
            F.concat(F.lit("user"), (F.col("id") + 1).cast("string")).alias(
                "user_id"
            ),
            (F.col("id") % 2 == 0).cast("double").alias("label"),
            (
                F.date_add(start, args.days // 2).cast("timestamp")
                + F.make_interval(hours=F.lit(12))
            ).alias("as_of_ts"),
        )
    )
    labels_out = str(Path(args.out) / "labels")
    labels.write.mode("overwrite").parquet(labels_out)

    print(f"events  → {events_out}  ({events.count()} rows)")
    print(f"labels  → {labels_out}  ({labels.count()} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
