from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    """Shared local session; few shuffle partitions for test speed (the
    reference test base pins shuffle.partitions=1, SparkTestBase.scala:18-21)."""
    from mini_feature_store_spark.session import get_spark

    spark = get_spark(
        app_name="mfss-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/mfss-test-warehouse"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ["SPARK_GRAFT_SF_DIR"]
