"""hash_sample / hash_split: determinism, key-consistency, split laws."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_feature_store_spark.operators.sampling import hash_sample, hash_split


def _keys(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_sample_fraction_approximate_and_deterministic(spark):
    df = _keys(spark)
    a = {r.k for r in hash_sample(df, ["k"], 0.3).collect()}
    b = {r.k for r in hash_sample(df, ["k"], 0.3).collect()}
    assert a == b  # rerun-stable
    assert 0.25 < len(a) / 2000 < 0.35


def test_sample_key_consistent_across_tables(spark):
    # Two "tables" sharing the key sample the SAME keys → joins stay complete.
    left = _keys(spark).withColumn("x", F.lit(1))
    right = _keys(spark).withColumn("y", F.lit(2))
    ls = {r.k for r in hash_sample(left, ["k"], 0.2).collect()}
    rs = {r.k for r in hash_sample(right, ["k"], 0.2).collect()}
    assert ls == rs


def test_sample_nested_fractions(spark):
    # The 10% sample is a subset of the 20% sample (threshold monotonicity).
    df = _keys(spark)
    s10 = {r.k for r in hash_sample(df, ["k"], 0.1).collect()}
    s20 = {r.k for r in hash_sample(df, ["k"], 0.2).collect()}
    assert s10 <= s20


def test_sample_edge_fractions(spark):
    df = _keys(spark, 50)
    assert hash_sample(df, ["k"], 0.0).count() == 0
    assert hash_sample(df, ["k"], 1.0).count() == 50
    with pytest.raises(ValueError):
        hash_sample(df, ["k"], 1.5)


def test_split_partitions_every_row_exactly_once(spark):
    df = _keys(spark)
    out = hash_split(df, ["k"], {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_weights_must_sum_to_one(spark):
    with pytest.raises(ValueError):
        hash_split(_keys(spark, 10), ["k"], {"a": 0.5, "b": 0.4})


def test_split_agrees_with_sample(spark):
    # split's first bucket == sample at the same fraction (same primitive).
    df = _keys(spark)
    first = {
        r.k
        for r in hash_split(df, ["k"], {"a": 0.3, "b": 0.7})
        .where(F.col("split") == "a")
        .collect()
    }
    assert first == {r.k for r in hash_sample(df, ["k"], 0.3).collect()}


def test_sample_plan_is_pure_filter(spark):
    from mini_feature_store_spark.functions import plan_text

    plan = plan_text(hash_sample(_keys(spark), ["k"], 0.5))
    assert "Exchange" not in plan  # no shuffle: a projection + filter only


def test_stratified_sample_per_stratum_rates(spark):
    from mini_feature_store_spark.operators.sampling import stratified_hash_sample

    df = _keys(spark, 3000).withColumn(
        "lang", F.when(F.col("k") % 3 == 0, "en").when(F.col("k") % 3 == 1, "de").otherwise("zh")
    )
    kept = stratified_hash_sample(
        df, ["k"], "lang", {"en": 0.2, "de": 1.0}, default_fraction=0.0
    )
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("zh") is None          # default 0 drops whole stratum
    assert counts["de"] == 1000              # fraction 1.0 keeps all
    assert 0.12 < counts["en"] / 1000 < 0.28 # ≈20%


def test_stratified_sample_agrees_with_plain_sample(spark):
    """A stratum sampled at fraction f keeps exactly hash_sample(f)'s keys —
    same md5 predicate, so cross-table key-consistency carries over."""
    from mini_feature_store_spark.operators.sampling import (
        hash_sample,
        stratified_hash_sample,
    )

    df = _keys(spark, 2000).withColumn("lang", F.lit("en"))
    a = {r.k for r in stratified_hash_sample(df, ["k"], "lang", {"en": 0.3}).collect()}
    b = {r.k for r in hash_sample(df, ["k"], 0.3).collect()}
    assert a == b


def test_stratified_sample_rejects_bad_fractions(spark):
    from mini_feature_store_spark.operators.sampling import stratified_hash_sample

    df = _keys(spark, 10).withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError):
        stratified_hash_sample(df, ["k"], "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        stratified_hash_sample(df, ["k"], "lang", {"en": 0.5}, default_fraction=-1)


def test_balanced_mixture_sample(spark):
    """Every stratum down-samples toward the smallest one's size; the
    smallest stratum is kept in full (rate 1.0 short-circuit); membership
    is key-deterministic (a second run keeps the same rows)."""
    from mini_feature_store_spark.operators.sampling import (
        balanced_mixture_sample,
    )

    rows = []
    k = 0
    for stratum, n in [("big", 4000), ("mid", 1000), ("small", 200)]:
        for _ in range(n):
            rows.append((k, stratum))
            k += 1
    df = spark.createDataFrame(rows, "id long, dom string")

    kept = balanced_mixture_sample(df, ["id"], "dom")
    counts = {r.dom: r.n for r in kept.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["small"] == 200  # rate 1.0 -> kept whole
    # others land near the 200 target (hash sampling: O(sqrt n) noise)
    assert 120 <= counts["big"] <= 280, counts
    assert 120 <= counts["mid"] <= 280, counts
    # deterministic: identical membership on re-run
    ids1 = {r.id for r in kept.collect()}
    ids2 = {r.id for r in balanced_mixture_sample(df, ["id"], "dom").collect()}
    assert ids1 == ids2
    # and the rate helper column never leaks
    assert kept.columns == ["dom", "id"] or set(kept.columns) == {"id", "dom"}


def test_epoch_shuffle_partitions_and_determinism(spark):
    from mini_feature_store_spark.operators.sampling import epoch_shuffle

    df = _keys(spark, 1000)
    out = epoch_shuffle(df, ["k"], seed=3, n_shards=8).toPandas()
    assert len(out) == 1000  # permutation: nothing lost, nothing duplicated
    assert out["k"].nunique() == 1000
    assert set(out["shard"]) <= set(range(8))
    # pos_in_shard is a dense 1..n ranking inside each shard
    for _, g in out.groupby("shard"):
        assert sorted(g["pos_in_shard"]) == list(range(1, len(g) + 1))
    # identical rerun, different permutation for a different seed
    again = epoch_shuffle(df, ["k"], seed=3, n_shards=8).toPandas()
    assert out.sort_values("k").reset_index(drop=True).equals(
        again.sort_values("k").reset_index(drop=True)
    )
    other = epoch_shuffle(df, ["k"], seed=4, n_shards=8).toPandas()
    merged = out.merge(other, on="k", suffixes=("_a", "_b"))
    assert (merged["shuffle_rank_a"] != merged["shuffle_rank_b"]).any()
    # shards are balanced to O(sqrt n): no shard under 60% of fair share
    sizes = out.groupby("shard").size()
    assert sizes.min() > 0.6 * 1000 / 8


def test_balanced_mixture_null_stratum_kept(spark):
    """NULL strata are a stratum, not a silent drop: they must survive the
    rate join AND set the min like any other group."""
    from mini_feature_store_spark.operators.sampling import (
        balanced_mixture_sample,
    )

    rows = [(i, "en") for i in range(500)] + [
        (10_000 + i, None) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, dom string")
    kept = balanced_mixture_sample(df, ["id"], "dom")
    by = {
        r["dom"]: r["n"]
        for r in kept.groupBy("dom")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by.get(None) == 20  # smallest stratum kept whole, not dropped
    assert 5 <= by.get("en", 0) <= 45  # en sampled toward 20


def test_temperature_mixture_alpha0_equals_balanced(spark, sf_dir):
    """alpha=0 must reproduce balanced_mixture_sample exactly — same
    rates, same md5 predicate, same kept set."""
    from mini_feature_store_spark.io import load_testdata
    from mini_feature_store_spark.operators.sampling import (
        balanced_mixture_sample,
        temperature_mixture_sample,
    )

    docs = load_testdata(spark, sf_dir, "documents")["documents"]
    bal = {r.doc_id for r in balanced_mixture_sample(docs, ["doc_id"], "lang").collect()}
    tmp = {
        r.doc_id
        for r in temperature_mixture_sample(
            docs, ["doc_id"], "lang", alpha=0.0
        ).collect()
    }
    assert bal == tmp and bal


def test_temperature_mixture_alpha1_keeps_everything(spark, sf_dir):
    from mini_feature_store_spark.io import load_testdata
    from mini_feature_store_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = load_testdata(spark, sf_dir, "documents")["documents"]
    assert (
        temperature_mixture_sample(docs, ["doc_id"], "lang", alpha=1.0).count()
        == docs.count()
    )


def test_temperature_mixture_half_interpolates(spark, sf_dir):
    """alpha=0.5 kept counts sit between balanced and natural per
    stratum, tracking n_min^0.5 * n_s^0.5 within sampling noise."""
    import math

    from mini_feature_store_spark.io import load_testdata
    from mini_feature_store_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = load_testdata(spark, sf_dir, "documents")["documents"]
    natural = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    n_min = min(natural.values())
    kept = {
        r.lang: r.cnt
        for r in temperature_mixture_sample(docs, ["doc_id"], "lang", alpha=0.5)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for lang, n in natural.items():
        target = math.sqrt(n_min * n)
        # hash sampling is binomial around the target — allow 4 sigma
        sigma = math.sqrt(max(target, 1.0))
        assert abs(kept.get(lang, 0) - target) <= 4 * sigma + 1, (
            lang, kept.get(lang), target
        )


def test_temperature_mixture_token_budget(spark):
    """tokens_col weighs strata by token MASS: a stratum of few huge
    docs is down-sampled like one of many small docs. Doc-count
    weighting would keep 'big' whole (fewest docs); token weighting
    must keep 'small' whole instead (least mass) and sample 'big' at
    sqrt(m_small/m_big). NULL token counts weigh 0; an all-NULL stratum
    clamps to mass 1 and is kept whole."""
    import math

    from mini_feature_store_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = (
        [(i, "big", 1000) for i in range(50)]          # mass 50_000
        + [(1000 + i, "small", 10) for i in range(200)]  # mass 2_000
        + [(9000 + i, "nulls", None) for i in range(5)]  # mass -> 1
    )
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tok long")
    kept = (
        temperature_mixture_sample(
            df, ["doc_id"], "src", alpha=0.5, tokens_col="n_tok"
        )
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    by = {r.src: r.n for r in kept.collect()}
    assert by.get("nulls") == 5  # min mass 1 -> rate 1 for itself
    # rates vs mass 1 minimum: sqrt(1/50000) and sqrt(1/2000) — tiny;
    # use a mass-only frame to test the big-vs-small relationship
    df2 = df.where(F.col("src") != "nulls")
    by2 = {
        r.src: r.n
        for r in temperature_mixture_sample(
            df2, ["doc_id"], "src", alpha=0.5, tokens_col="n_tok"
        )
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by2.get("small") == 200  # least token mass: kept whole
    # big: per-doc admission at rate sqrt(2000/50000) = 0.2 -> ~10 docs
    target = 50 * math.sqrt(2000 / 50000)
    sigma = math.sqrt(target)
    assert abs(by2.get("big", 0) - target) <= 4 * sigma + 1, by2

    # doc-count weighting (the default) flips which stratum is whole
    by3 = {
        r.src: r.n
        for r in temperature_mixture_sample(df2, ["doc_id"], "src", alpha=0.5)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by3.get("big") == 50  # fewest DOCS: kept whole under counts


def test_temperature_mixture_rejects_out_of_range_alpha(spark, sf_dir):
    from mini_feature_store_spark.io import load_testdata
    from mini_feature_store_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = load_testdata(spark, sf_dir, "documents")["documents"]
    for bad in (-0.1, 1.5):
        with pytest.raises(ValueError):
            temperature_mixture_sample(docs, ["doc_id"], "lang", alpha=bad)


def test_upsample_epochs_materializes_floor_plus_fraction(spark):
    from mini_feature_store_spark.operators.sampling import upsample_epochs

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = upsample_epochs(df, ["doc_id"], 2.5)
    per_epoch = {r.epoch: r["count"] for r in out.groupBy("epoch").count().collect()}
    # every doc appears in epochs 1 and 2; ~half get a 3rd copy
    assert per_epoch[1] == 2000 and per_epoch[2] == 2000
    assert abs(per_epoch[3] - 1000) < 4 * 1000**0.5 + 1
    assert set(per_epoch) == {1, 2, 3}


def test_upsample_epochs_fractional_only_matches_weighted_sample(spark):
    """rate < 1 must admit exactly weighted_hash_sample's set — the
    column-rate family shares one truncation-based threshold rendering
    (_col_threshold); hash_sample's literal-fraction rounding can differ
    on the 2^-32 boundary cell, so the pinned identity is within the
    family, not across it (r7 review)."""
    from mini_feature_store_spark.operators.sampling import (
        upsample_epochs,
        weighted_hash_sample,
    )

    df = spark.range(3000).select(F.col("id").alias("doc_id"))
    up = {r.doc_id for r in upsample_epochs(df, ["doc_id"], 0.3).collect()}
    ws = {
        r.doc_id
        for r in weighted_hash_sample(df, ["doc_id"], F.lit(0.3)).collect()
    }
    assert up == ws and up


def test_upsample_epochs_integer_rate_and_zero(spark):
    from mini_feature_store_spark.operators.sampling import upsample_epochs

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    assert upsample_epochs(df, ["doc_id"], 3.0).count() == 300
    assert upsample_epochs(df, ["doc_id"], 0.0).count() == 0


def test_upsample_epochs_per_row_rate_column(spark):
    from mini_feature_store_spark.operators.sampling import upsample_epochs

    df = spark.createDataFrame(
        [(i, 2.0 if i < 50 else 1.0) for i in range(100)],
        "doc_id long, r double",
    )
    out = upsample_epochs(df, ["doc_id"], F.col("r"))
    assert out.count() == 50 * 2 + 50 * 1


# ── target_mixture_sample (r13 — the DoReMi-weight consumer) ────────────────


def _mixture_frame(spark):
    # strata a:60, b:30, c:10 docs
    rows = (
        [(i, "a") for i in range(60)]
        + [(100 + i, "b") for i in range(30)]
        + [(200 + i, "c") for i in range(10)]
    )
    return spark.createDataFrame(rows, "doc_id long, s string")


def test_target_mixture_bottleneck_kept_whole_and_proportions(spark):
    from mini_feature_store_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    # target 1:1:1 → c = min(60/1, 30/1, 10/1) = 10 → kept ≈ 10 each;
    # the bottleneck stratum (c) has rate exactly 1.0 → kept WHOLE
    kept = target_mixture_sample(df, ["doc_id"], "s", {"a": 1, "b": 1, "c": 1})
    by = {
        r.s: r.cnt
        for r in kept.groupBy("s").agg(F.count("*").alias("cnt")).collect()
    }
    assert by["c"] == 10  # rate 1.0 short-circuits: deterministic, exact
    # md5 admission is probabilistic per key: O(sqrt(n)) noise around 10
    assert 4 <= by["a"] <= 17 and 4 <= by["b"] <= 17
    # determinism
    again = target_mixture_sample(
        df, ["doc_id"], "s", {"a": 1, "b": 1, "c": 1}
    )
    assert {r.doc_id for r in kept.collect()} == {
        r.doc_id for r in again.collect()
    }


def test_target_mixture_zero_weight_drops_and_null_stratum(spark):
    from mini_feature_store_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None)],
        "doc_id long, s string",
    )
    kept = target_mixture_sample(
        df, ["doc_id"], "s", {"a": 1.0, None: 0.0}
    ).collect()
    # NULL stratum weighted 0 → dropped; 'a' is the bottleneck → whole
    assert {r.doc_id for r in kept} == {1, 2}


def test_target_mixture_missing_stratum_fails_loud(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from mini_feature_store_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    out = target_mixture_sample(df, ["doc_id"], "s", {"a": 1.0, "b": 1.0})
    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException),
        match="missing from weights: c",
    ):
        out.collect()


def test_target_mixture_validations(spark):
    from mini_feature_store_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    with pytest.raises(ValueError, match="non-empty"):
        target_mixture_sample(df, ["doc_id"], "s", {})
    with pytest.raises(ValueError, match="finite non-negative"):
        target_mixture_sample(df, ["doc_id"], "s", {"a": -0.1})
    with pytest.raises(ValueError, match="at least one weight"):
        target_mixture_sample(df, ["doc_id"], "s", {"a": 0.0, "b": 0})


def test_target_mixture_stringified_key_collision_raises(spark):
    """ADVICE r13: two weight keys that stringify identically (5 vs "5")
    would duplicate every document of that stratum through the weight
    join — must raise at build time, not sample twice."""
    from mini_feature_store_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    with pytest.raises(ValueError, match="collide on stratum key"):
        target_mixture_sample(df, ["doc_id"], "s", {5: 1.0, "5": 2.0})


def test_target_mixture_uniform_weights_match_balanced_sampler(spark):
    """With equal weights and doc-count masses the realized mixture is
    exactly balanced_mixture_sample's (c = min_s m_s, rate_s = min/m_s)
    — pinned set-equal, since both ride the same md5 predicate."""
    from mini_feature_store_spark.operators.sampling import (
        balanced_mixture_sample,
        target_mixture_sample,
    )

    df = _mixture_frame(spark)
    a = {
        r.doc_id
        for r in target_mixture_sample(
            df, ["doc_id"], "s", {"a": 1, "b": 1, "c": 1}
        ).collect()
    }
    b = {
        r.doc_id
        for r in balanced_mixture_sample(df, ["doc_id"], "s").collect()
    }
    assert a == b


def test_target_mixture_token_mass(spark):
    """tokens_col masses: a stratum of few huge docs is the bottleneck
    when weighed by tokens even though it has the fewest docs."""
    from mini_feature_store_spark.operators.sampling import (
        target_mixture_sample,
    )

    df = spark.createDataFrame(
        [(i, "small", 1) for i in range(50)]
        + [(100 + i, "huge", 100) for i in range(5)],
        "doc_id long, s string, n long",
    )
    # equal token-share targets: masses are 50 vs 500 → 'small' is the
    # bottleneck (50/1 < 500/1) → kept whole; 'huge' down-samples to
    # rate 0.1 in token mass
    kept = target_mixture_sample(
        df, ["doc_id"], "s", {"small": 1, "huge": 1}, tokens_col="n"
    )
    by = {
        r.s: (r.cnt, r.toks)
        for r in kept.groupBy("s")
        .agg(F.count("*").alias("cnt"), F.sum("n").alias("toks"))
        .collect()
    }
    assert by["small"] == (50, 50)  # bottleneck kept whole
    assert by.get("huge", (0, 0))[1] <= 300  # ~50 expected token mass
