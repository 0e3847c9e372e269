"""Declared table schemas (schema-on-write, explicit StructTypes).

Re-expresses the reference's ``domain/Schemas.scala:15-52`` one-constant-per-
table pattern, richer in one deliberate way: ``event_type_counts`` is a real
``MapType(string, long)`` internally (the reference flattens it to a JSON
string column, ``Schemas.scala:50``); we serialize with ``to_json`` only at the
online-store edge. ``FEATURES_DAILY`` keeps the reference's stringified count
for golden parity.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ── reference-parity schemas (domain/Schemas.scala) ──────────────────────────

#: Raw append-only event log (Schemas.scala:15-21).
EVENTS_RAW = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

#: Training labels with a point-in-time timestamp (Schemas.scala:27-33).
LABELS = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("label", T.DoubleType(), False),
        T.StructField("as_of_ts", T.TimestampType(), False),
    ]
)

#: Offline store: one row per (user, day) snapshot (Schemas.scala:43-52);
#: partitioned by ``day``.
FEATURES_DAILY = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("day", T.DateType(), False),
        T.StructField("event_count_7d", T.LongType(), True),
        T.StructField("event_count_30d", T.LongType(), True),
        T.StructField("last_event_days_ago", T.IntegerType(), True),
        T.StructField("event_type_counts", T.StringType(), True),
    ]
)

#: Point-in-time join output (types/TrainingData.scala:10-19).
TRAINING_DATA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("label", T.DoubleType(), False),
        T.StructField("as_of_ts", T.TimestampType(), False),
        T.StructField("day", T.DateType(), True),
        T.StructField("event_count_7d", T.LongType(), True),
        T.StructField("event_count_30d", T.LongType(), True),
        T.StructField("last_event_days_ago", T.IntegerType(), True),
        T.StructField("event_type_counts", T.StringType(), True),
    ]
)

# ── driver testdata schemas (/root/testdata/<sf>/*.parquet, TESTDATA.md) ─────

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: All tables shipped in a testdata scale-factor directory.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
