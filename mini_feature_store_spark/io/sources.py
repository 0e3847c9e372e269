"""Sources: parquet / JSON / CSV / managed-table scans + in-memory test seam.

Re-expresses the reference's ``platform/Fetchers.scala`` trait surface
(readParquet :79-90, readJson :92-103, readCsv :105-120, readIcebergTable
:122-128) as plain functions. An explicit schema is always accepted and always
passed by pipelines (schema-on-write regime, SURVEY.md §1.3); inference is the
``schema=None`` fallback, exactly like ``Fetchers.scala:85-89``.

Scale notes:
- An explicit schema skips the file-footer sampling pass entirely — on a
  100 TB path that inference pass is itself a large job.
- These return *lazy* DataFrames; filters/projections applied by callers reach
  the parquet scan via Catalyst pushdown (verify with
  ``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan with optional explicit schema (Fetchers.scala:79-90)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan (Fetchers.scala:92-103)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan (Fetchers.scala:105-120)."""
    reader = spark.read.option("header", header).option("delimiter", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan — no reference analog (Fetchers.scala stops at CSV), but
    ORC is the other columnar format a Spark-native engine must read;
    same pushdown/pruning contract as parquet (Spark's native vectorized
    ORC reader), same explicit-schema discipline."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_col: str = "value",
) -> DataFrame:
    """Raw text scan — the corpus front door for crawl-shaped inputs
    (one row per line, or one row per FILE with ``whole_file=True``).
    Spark handles .gz/.zst-suffixed files transparently; a 100 TB text
    drop arrives as many files, so parallelism comes from the file
    listing, not from splitting (gzip is unsplittable — the per-file
    row carries its path for provenance)."""
    from pyspark.sql import functions as F

    df = spark.read.text(path, wholetext=whole_file)
    out = df.select(
        F.input_file_name().alias("path"),
        F.col("value").alias(line_col),
    )
    return out


def read_table(spark: SparkSession, name_or_path: str) -> DataFrame:
    """Managed-table scan (Fetchers.scala:122-128 reads Iceberg tables).

    Resolution: session-catalog table name first (covers Delta/parquet
    ``saveAsTable`` output), else treated as a parquet/Delta directory path.
    The ``_delta_log`` dispatch is wiring-tested only
    (tests/test_delta_wiring.py — delta-spark absent in this container).
    """
    looks_like_path = os.sep in name_or_path or name_or_path.startswith(".")
    if not looks_like_path and spark.catalog.tableExists(name_or_path):
        return spark.table(name_or_path)
    from mini_feature_store_spark.session import HAVE_DELTA

    if HAVE_DELTA and os.path.isdir(os.path.join(name_or_path, "_delta_log")):
        return spark.read.format("delta").load(name_or_path)
    return spark.read.parquet(name_or_path)


def load_testdata(
    spark: SparkSession, sf_dir: str, *names: str
) -> dict[str, DataFrame]:
    """Load driver testdata tables (TESTDATA.md) from a scale-factor dir.

    ``events.ts`` handling is *schema-adaptive*: depending on the parquet
    writer and Spark version, the physical column arrives either as a plain
    TIMESTAMP (timestamp[us] parquet, read natively) or as BIGINT nanoseconds
    (TIMESTAMP(NANOS) parquet surfaced via
    ``spark.sql.legacy.parquet.nanosAsLong``). We inspect the *read* schema and
    only apply the ns→µs floor-conversion when the column is integral —
    bit-identical to DuckDB's own ns→µs truncation, so oracle comparisons stay
    exact either way. Never assume one physical layout: that assumption broke
    every events query in round 2.
    """
    from pyspark.sql import functions as F

    from mini_feature_store_spark.schemas import TESTDATA_TABLES

    names = names or TESTDATA_TABLES
    out: dict[str, DataFrame] = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if n == "events":
            # Harmless when ts is already timestamp[us]; lets nanos parquet
            # load as BIGINT instead of erroring on Spark versions where the
            # legacy conf still applies.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, (T.LongType, T.IntegerType)):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif isinstance(ts_type, T.TimestampNTZType):
                # Oracle (DuckDB) reads this as naive timestamp too; keep a
                # session-TZ-stable TIMESTAMP for window/date functions.
                df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        else:
            df = spark.read.parquet(path)
        out[n] = df
    return out


@dataclass
class MemoryStore:
    """In-memory storage seam for tests.

    Plays the role of the reference's dependency-injected
    ``TestWriter``/``TestFetcher`` pair (``suit/TestWriter.scala:16-92``,
    ``suit/TestFetcher.scala:17-89``): writes materialize rows + schema into a
    dict keyed by path/table name; reads rebuild DataFrames from them. Honors
    overwrite / append / ignore / error modes (TestWriter.scala:40-59).

    Test-only by design — production sinks never collect (SURVEY.md §4.3).
    """

    rows: dict[str, list] = field(default_factory=dict)
    schemas: dict[str, T.StructType] = field(default_factory=dict)

    def write(self, df: DataFrame, key: str, mode: str = "overwrite") -> None:
        if key in self.rows:
            if mode == "ignore":
                return
            if mode in ("error", "errorifexists"):
                raise ValueError(f"key already exists: {key}")
        collected = df.collect()
        if mode == "append" and key in self.rows:
            self.rows[key].extend(collected)
        else:
            self.rows[key] = list(collected)
            self.schemas[key] = df.schema

    def read(self, spark: SparkSession, key: str) -> DataFrame:
        if key not in self.rows:
            raise KeyError(f"no such key in MemoryStore: {key}")
        return spark.createDataFrame(self.rows[key], self.schemas[key])

    def keys(self) -> list[str]:
        return sorted(self.rows)

    def clear(self) -> None:
        self.rows.clear()
        self.schemas.clear()


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """JSON scan with an error channel: returns ``(clean, quarantine)``.

    PERMISSIVE mode parks every malformed line's raw text in a corrupt-record
    column instead of failing the job (a poisoned record must never kill a
    100 TB ingest — same rule as the multimodal decode error column). The
    clean side drops the marker column; the quarantine side carries the raw
    line for replay/inspection. Both are lazy views over ONE scan definition;
    a malformed-input metric is ``quarantine.count()``.

    The reference's readJson (Fetchers.scala:92-103) is FAILFAST-by-default
    Spark behavior with a schema; this wraps the same scan with the
    production error channel.
    """
    from pyspark.sql import functions as F

    corrupt = "_corrupt_record"
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType(), True)]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
    )
    clean = df.where(F.col(corrupt).isNull()).drop(corrupt)
    # Spark refuses plans that read ONLY the corrupt-record column from a
    # raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the quarantine side
    # therefore keeps the (partially parsed, mostly null) data columns next
    # to the raw line, which is also the more useful replay artifact.
    quarantine = df.where(F.col(corrupt).isNotNull()).select(
        *[f.name for f in schema.fields], F.col(corrupt).alias("raw_line")
    )
    return clean, quarantine
