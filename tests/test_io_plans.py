"""IO-layer round-trips (JSON/CSV/table scans, SURVEY.md §2.1-§2.2) and
physical-plan audits: filters and projections must reach the parquet scan
(PushedFilters / ReadSchema), hot operators must stay in whole-stage codegen.
These are the properties that decide 100 TB behavior — a scan that reads all
columns for a 2-column projection is wrong regardless of test-scale timing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mini_feature_store_spark.functions import plan_text
from mini_feature_store_spark.io.sinks import write_csv, write_json, write_parquet
from mini_feature_store_spark.io.sources import (
    read_csv,
    read_json,
    read_parquet,
    read_table,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("n", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)

ROWS = [("u1", 3, 0.5), ("u2", None, 1.25), ("u3", 7, None)]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_json_roundtrip_with_explicit_schema(spark, tmp_path):
    path = str(tmp_path / "j")
    write_json(_df(spark), path)
    back = read_json(spark, path, SCHEMA)
    # File sources force nullable=True on read; names and types must hold.
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in SCHEMA.fields
    ]
    assert sorted(back.collect()) == sorted(_df(spark).collect())


def test_csv_roundtrip_header_and_delimiter(spark, tmp_path):
    path = str(tmp_path / "c")
    write_csv(_df(spark), path, header=True, delimiter="|")
    back = read_csv(spark, path, SCHEMA, header=True, delimiter="|")
    assert sorted(back.collect()) == sorted(_df(spark).collect())


def test_read_table_resolves_path(spark, tmp_path):
    path = str(tmp_path / "t")
    write_parquet(_df(spark), path)
    assert read_table(spark, path).count() == 3


def test_filter_and_projection_reach_parquet_scan(spark, tmp_path):
    path = str(tmp_path / "p")
    write_parquet(_df(spark), path)
    q = (
        read_parquet(spark, path, SCHEMA)
        .where(F.col("n") > 2)
        .select("user_id", "n")
    )
    plan = plan_text(q)
    # Predicate pushdown: the n > 2 filter appears in PushedFilters.
    assert "PushedFilters" in plan and "GreaterThan(n,2)" in plan
    # Column pruning: the unused `score` column is absent from ReadSchema.
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "score" not in read_schema and "user_id" in read_schema


def test_partition_pruning_on_day_layout(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.createDataFrame(
        [("u1", "2024-01-01"), ("u2", "2024-01-02"), ("u3", "2024-01-03")],
        "user_id string, day string",
    )
    write_parquet(df, path, partition_by=["day"])
    q = spark.read.parquet(path).where(F.col("day") >= "2024-01-02")
    plan = plan_text(q)
    # The day predicate lands in PartitionFilters, not a post-scan Filter.
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line
    assert q.count() == 2


def test_hot_dedup_projection_stays_in_codegen(spark):
    """The shingle projection must not fall back to interpreted eval
    (the regexp formulation exists precisely for codegen; see dedup.py)."""
    from mini_feature_store_spark.operators.dedup import shingles

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z")], "doc_id long, text string"
    )
    q = docs.select(shingles(F.col("text"), 3).alias("sh"))
    plan = plan_text(q)
    # formatted mode marks codegen'd operators with `* ... [codegen id : N]`
    assert "* Project" in plan and "codegen id" in plan


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Bucketing both join sides on the key pre-shuffles the data at write
    time: the join plan must contain NO Exchange — the co-located layout
    that turns a daily 100 TB fact-fact join from shuffle-bound to local."""
    import re

    # (warehouse dir is a static conf — tables land in the session default)
    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_users")
    events = spark.range(1000).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("event_id")
    )
    users = spark.range(50).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("score")
    )
    from mini_feature_store_spark.io.sinks import write_bucketed_table

    write_bucketed_table(
        events, "b_events", 8, ["user_id"], sort_by=["user_id"]
    )
    write_bucketed_table(
        users, "b_users", 8, ["user_id"], sort_by=["user_id"]
    )
    # disable broadcast so the plan would otherwise need a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_events").join(spark.table("b_users"), "user_id")
        plan = plan_text(joined)
        assert not re.search(r"\(\d+\) Exchange", plan), plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_events")
        spark.sql("DROP TABLE IF EXISTS b_users")


def test_bucketed_features_make_pit_training_build_shuffle_free(spark):
    """The feature-store payoff of the bucketed layout (SURVEY.md's
    PIT-join bucketing lever): a features table bucketed on user_id is
    already hash-partitioned on disk, so the point-in-time training-set
    build — label join + per-label max_by collapse, both keyed on
    user_id — loses the feature-side shuffle: the bucketed scan's
    output partitioning satisfies the join distribution AND the
    downstream aggregate's clustered distribution, so only the label
    side exchanges. Results pinned identical to the plain path."""
    import re

    from pyspark.sql import functions as F

    from mini_feature_store_spark.functions import plan_text
    from mini_feature_store_spark.io.sinks import write_bucketed_table
    from mini_feature_store_spark.operators.point_in_time import (
        point_in_time_join,
    )

    spark.sql("DROP TABLE IF EXISTS b_features")
    # a unique (user_id, day) grid with clicks a deterministic function
    # of the key — no dropDuplicates: its First() pick is
    # non-deterministic across executions, and the bucketed write
    # freezes one pick while the plain path re-rolls it (review r14)
    features = spark.range(40 * 30).select(
        (F.col("id") % 40).alias("user_id"),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            (F.col("id") / 40).cast("int"),
        ).alias("day"),
        ((F.col("id") * 31) % 7).cast("double").alias("clicks"),
    )
    labels = spark.createDataFrame(
        [(u, f"2024-01-{15 + (u % 10):02d} 12:00:00", float(u % 2))
         for u in range(40)],
        "user_id long, as_of_ts string, label double",
    ).select(
        "user_id", F.col("as_of_ts").cast("timestamp"), "label"
    )
    # broadcast off: at test scale the tiny feature table would
    # broadcast and hide the layout story — the claim under test is the
    # big-data SMJ regime, where only bucketing can delete the
    # feature-side exchange. Shuffle parallelism pinned to the bucket
    # count: with more shuffle partitions than buckets Spark prefers
    # re-shuffling BOTH sides for parallelism over reading the 8-way
    # buckets (the production rule: pick the bucket count to match the
    # target join parallelism)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_bucketed_table(
            features, "b_features", 8, ["user_id"], sort_by=["user_id"]
        )
        bucketed = point_in_time_join(
            labels, spark.table("b_features"), feature_ts="day"
        )
        plain = point_in_time_join(labels, features, feature_ts="day")
        b_rows = {tuple(r) for r in bucketed.collect()}
        assert b_rows == {tuple(r) for r in plain.collect()}
        assert len(b_rows) == 40
        b_plan, p_plan = plan_text(bucketed), plan_text(plain)
        assert "Bucketed: true" in b_plan
        # distinct Exchange NODES in the AQE FINAL plan only (the
        # formatted output re-lists the whole Initial Plan below it)
        def final_exchanges(plan: str) -> int:
            # the tree section writes "Exchange (N)"; node details
            # ("(N) Exchange") only appear after the Initial Plan dump
            final = plan.split("== Initial Plan ==")[0]
            return len(set(re.findall(r"Exchange \((\d+)\)", final)))

        b_ex = final_exchanges(b_plan)
        p_ex = final_exchanges(p_plan)
        # EXACT pin (review r14 — a relative compare would stay green
        # if bucketed-scan exchange elimination regressed): the plain
        # build shuffles BOTH join sides on user_id; the bucketed build
        # pays only the label-side exchange — the feature side reads
        # its buckets, and the post-join aggregate's clustered
        # distribution is satisfied by the join partitioning in both
        assert b_ex == 1, b_plan
        assert p_ex == 2, p_plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.sql("DROP TABLE IF EXISTS b_features")


def test_melt_roundtrip_and_no_shuffle(spark):
    """melt fans each row out to len(value_vars) rows with no exchange."""
    from mini_feature_store_spark.functions import melt, plan_text

    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 30.0, 40.0)], "id long, a double, b double"
    )
    out = melt(df, ["id"], ["a", "b"], var_name="m", value_name="v")
    assert out.columns == ["id", "m", "v"]
    rows = {(r.id, r.m): r.v for r in out.collect()}
    assert rows == {(1, "a"): 10.0, (1, "b"): 20.0, (2, "a"): 30.0, (2, "b"): 40.0}
    assert "Exchange" not in plan_text(out)
    # value_vars default = all non-id columns
    assert melt(df, ["id"]).count() == 4


def test_load_testdata_events_ts_schema_adaptive(spark):
    """The r2 round-killer regression guard: load_testdata must yield a
    TIMESTAMP ts from /root/testdata events.parquet no matter whether the
    physical column arrives as timestamp[us], TIMESTAMP_NTZ, or BIGINT
    nanoseconds (VERDICT r2 item 1)."""
    import pyspark.sql.types as T

    from mini_feature_store_spark.io.sources import load_testdata

    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        for ntz in ("false", "true"):
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntz)
            ev = load_testdata(spark, "/root/testdata/sf0.001", "events")["events"]
            assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
            row = ev.selectExpr(
                "count(*) AS n", "min(ts) AS lo", "max(ts) AS hi"
            ).collect()[0]
            assert row.n > 0 and row.lo.year == 2024
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)


def test_event_rollup_tiers_single_scan_single_exchange(spark):
    """Continuous-aggregate tiering must be ONE scan + ONE exchange via
    GROUPING SETS/Expand — not the three-scan union the oracle spells out
    (at 100 TB the fact table cannot be read three times)."""
    import re

    from mini_feature_store_spark.queries import QUERIES

    df = QUERIES["event_rollup_tiers"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    assert len(re.findall(r"Exchange", plan)) == 1
    assert plan.count("Scan parquet") == 1


def test_clustered_write_enables_row_group_skipping(spark, tmp_path):
    """write_parquet_clustered must produce files with DISJOINT key ranges
    (verified from parquet footer min/max stats) so a key-range filter can
    skip whole files; a round-robin write of the same data cannot."""
    import pyarrow.parquet as pq

    from mini_feature_store_spark.io.sinks import (
        write_parquet,
        write_parquet_clustered,
    )

    df = spark.range(100_000).selectExpr(
        "pmod(hash(id), 1000000) AS k", "id AS payload"
    )
    clustered = str(tmp_path / "clustered")
    write_parquet_clustered(df, clustered, cluster_by=["k"], target_files=8)

    import glob

    ranges = []
    for f in sorted(glob.glob(f"{clustered}/*.parquet")):
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    assert len(ranges) >= 4
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, "file key ranges overlap — no skipping"

    # And the data round-trips unchanged.
    assert spark.read.parquet(clustered).count() == 100_000


def test_json_quarantine_splits_clean_and_corrupt(spark, tmp_path):
    import pyspark.sql.types as T

    from mini_feature_store_spark.io.sources import read_json_with_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "name": "fine"}\n'
        '{"id": "NOT_A_NUMBER", "name": "bad-type"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    clean, quarantine = read_json_with_quarantine(spark, str(p), schema)
    assert {r.id for r in clean.collect()} == {1, 2}
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("NOT_A_NUMBER" in b for b in bad)


def test_training_shards_deterministic_with_manifest(spark, tmp_path):
    from mini_feature_store_spark.io.sinks import write_training_shards

    df = spark.range(5_000).selectExpr("id AS doc_id", "id * 2 AS payload")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(df, out, n_shards=8, key_col="doc_id")
    assert [m["shard"] for m in manifest] == list(range(8))
    assert sum(m["rows"] for m in manifest) == 5_000
    assert all(m["bytes"] > 0 for m in manifest)

    # deterministic: same data → identical shard assignment on a rewrite
    out2 = str(tmp_path / "shards2")
    manifest2 = write_training_shards(df, out2, n_shards=8, key_col="doc_id")
    assert manifest == manifest2

    # round-trip intact, and every doc's shard matches the hash rule
    back = spark.read.parquet(out)
    from pyspark.sql import functions as F

    mism = back.where(
        F.col("_shard") != F.pmod(F.xxhash64("doc_id"), F.lit(8))
    ).count()
    assert mism == 0


def test_zordered_write_skips_on_both_keys(spark, tmp_path):
    """write_parquet_zordered must keep footer min/max narrow on BOTH keys:
    a 10% range filter on either key should overlap far fewer files than
    under single-key clustering (where the second key's per-file range
    spans the whole domain)."""
    import glob

    import pyarrow.parquet as pq

    from mini_feature_store_spark.io.sinks import (
        write_parquet_clustered,
        write_parquet_zordered,
    )

    df = spark.range(120_000).selectExpr(
        "pmod(hash(id), 1000) AS x",
        "pmod(hash(id + 77), 1000) AS y",
        "id AS payload",
    )

    def files_overlapping(path, col_name, lo, hi):
        n_total, n_hit = 0, 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.read_metadata(f)
            idx = next(
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == col_name
            )
            mn = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            n_total += 1
            if mx >= lo and mn <= hi:
                n_hit += 1
        return n_hit, n_total

    xonly = str(tmp_path / "xonly")
    write_parquet_clustered(df, xonly, cluster_by=["x"], target_files=16)
    zord = str(tmp_path / "zord")
    write_parquet_zordered(df, zord, zorder_by=["x", "y"], target_files=16)

    # x is clustered in both layouts: both skip on x
    hit_x_clustered, n1 = files_overlapping(xonly, "x", 0, 99)
    hit_x_zord, n2 = files_overlapping(zord, "x", 0, 99)
    assert n1 == 16 and n2 == 16
    assert hit_x_clustered <= 3
    assert hit_x_zord <= 8  # z-order trades some x-locality ...

    # ... to gain y-locality: x-only clustering cannot skip on y at all
    hit_y_clustered, _ = files_overlapping(xonly, "y", 0, 99)
    hit_y_zord, _ = files_overlapping(zord, "y", 0, 99)
    assert hit_y_clustered == 16
    assert hit_y_zord <= 8, (hit_y_zord, hit_y_clustered)

    # layout changes must never change the data
    assert spark.read.parquet(zord).count() == 120_000


def test_zordered_write_validation(spark, tmp_path):
    from mini_feature_store_spark.io.sinks import write_parquet_zordered

    df = spark.range(10).selectExpr("id AS a", "id AS b")
    with pytest.raises(ValueError, match=">= 2"):
        write_parquet_zordered(df, str(tmp_path / "z1"), zorder_by=["a"])
    with pytest.raises(ValueError, match="long range"):
        write_parquet_zordered(
            df, str(tmp_path / "z2"), zorder_by=["a", "b"], bits=32
        )


def test_funnel_plan_shapes_stay_tagged(spark):
    """The r10 funnel rewrites are PLAN contracts: the five-branch UNION
    form cost 24 scans (classic) / 17 scans + 31 exchanges (LM); the
    tagged single-stack form costs 6/5 scans. Pin generous ceilings so a
    refactor that silently reintroduces per-count chain rebuilds fails
    here rather than at the 100 TB gate.

    r16: counts run on ``strip_initial_plans`` tree text — the funnels'
    shared-subtree persist embeds an executed AQE plan whose Initial-Plan
    copy re-numbers every cached exchange (20 flat vs 11 executable for
    the LM funnel); the flat detail-section count double-counted nodes
    that execute at most once per run."""
    import re

    from mini_feature_store_spark.functions import plan_text, strip_initial_plans
    from mini_feature_store_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    for name, max_scans, max_exchanges in (
        ("corpus_curation_funnel", 8, 16),
        ("corpus_curation_funnel_lm", 7, 16),
    ):
        plan = strip_initial_plans(plan_text(QUERIES[name](spark, sf_dir)))
        # \S* admits an optional catalog-table identifier ('Scan parquet
        # spark_catalog.db.t (1)') so the ceiling survives a switch to
        # catalog-backed reads instead of silently undercounting (r16
        # ADVICE)
        scans = len(set(re.findall(r"Scan parquet\S*\s+\((\d+)\)", plan)))
        exchanges = len(
            set(re.findall(r"(?<!\w)Exchange \((\d+)\)", plan))
        )
        assert scans <= max_scans, (name, scans)
        assert exchanges <= max_exchanges, (name, exchanges)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from pyspark.sql import types as T

    from mini_feature_store_spark.io.sinks import write_orc
    from mini_feature_store_spark.io.sources import read_orc

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "k long, s string, v double",
    )
    path = str(tmp_path / "orc")
    write_orc(df, path, partition_by=("s",))
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("s", T.StringType()),
        ]
    )
    back = read_orc(spark, path, schema)
    assert {(r.k, r.s, r.v) for r in back.collect()} == {
        (1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)
    }
    # filter reaches the ORC scan (native vectorized reader pushdown)
    plan = (
        back.where("k > 1").select("k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,1)]" in plan


def test_text_source_lines_and_whole_file(spark, tmp_path):
    import gzip

    from mini_feature_store_spark.io.sources import read_text

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    with gzip.open(d / "b.txt.gz", "wt") as f:
        f.write("zipped line\n")

    lines = read_text(spark, str(d), line_col="text").collect()
    assert {r.text for r in lines} == {"line one", "line two", "zipped line"}
    # gz decompression is transparent; provenance rides along
    assert all(r.path for r in lines)

    whole = read_text(spark, str(d), whole_file=True).collect()
    by_file = {r.path.rsplit("/", 1)[-1]: r.value for r in whole}
    assert by_file["a.txt"] == "line one\nline two\n"
    assert by_file["b.txt.gz"] == "zipped line\n"
