"""salted_join must be result-identical to the plain join, per join type."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_feature_store_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one celebrity key (u0: 5000 rows), a long tail, and an unmatched key
    big = spark.range(6000).select(
        F.when(F.col("id") < 5000, F.lit("u0"))
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 37 + 1).cast("string")))
        .alias("user_id"),
        F.col("id").alias("event_id"),
    )
    small = spark.createDataFrame(
        [("u0", "gold"), ("u1", "silver"), ("u2", "bronze"), ("zzz", "ghost")],
        "user_id string, tier string",
    )
    return big.cache(), small


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_equals_plain(skewed, how):
    big, small = skewed
    plain = big.join(small, ["user_id"], how)
    salted = salted_join(big, small, ["user_id"], how=how, salt=8)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salt_actually_splits_hot_key(skewed):
    big, small = skewed
    out = salted_join(big, small, ["user_id"], how="inner", salt=8)
    # the celebrity key's rows must carry >1 distinct salt pre-drop; proxy:
    # result correctness plus replication factor of the small side
    assert out.where(F.col("user_id") == "u0").count() == 5000


def test_right_outer_rejected(skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(big, small, ["user_id"], how="full")
