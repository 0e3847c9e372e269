"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``mini_feature_store_spark.queries``; this module
stays a thin adapter so the registry is importable as a library too.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mini_feature_store_spark.queries import (  # noqa: E402
    QUERIES,
    ordered_oracle,
    ordered_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the leakage-safe
    point-in-time join producing training data (SURVEY.md §7.1)."""
    return QUERIES["pit_training_data"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in
    verification-priority order (queries.VERIFY_ORDER): never-verified and
    recently-changed queries first so the driver's 50-query correctness
    window always covers the least-proven code."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys match ``queries()``)."""
    return ordered_oracle()
