"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side machinery here is REAL and tested — schemas, partitioning,
Arrow-batched ``mapInPandas`` signatures, batch shapes, error channels. The
codec step itself is STUBBED (this container has no image/audio libraries):
``decode_image_stub`` parses our deterministic fake header instead of calling
Pillow/ffmpeg, and raises ``NotImplementedError`` for real formats. Swapping
in a real decoder changes ONE function, none of the plumbing.

Design rules for 100 TB of media:
- binary payloads travel in their own column so projection pruning can drop
  them (metadata-only queries never read the bytes — verify ``ReadSchema``);
- all per-item Python work goes through ``mapInPandas`` (Arrow batches,
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds memory per batch);
- failures are data, not exceptions: each decoded row carries an ``error``
  column; a poisoned blob must never kill a 10-hour job.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: magic bytes of the deterministic fake image format used by the stub codec:
#: FAKE | uint16 width | uint16 height | uint8 channels | payload
FAKE_MAGIC = b"FAKE"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("uri", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def encode_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic fake image blob (the test-data generator for this tier)."""
    header = FAKE_MAGIC + struct.pack("<HHB", width, height, channels)
    n = width * height * channels
    payload = bytes((seed + i * 31) % 256 for i in range(n))
    return header + payload


def decode_image_stub(blob: bytes) -> dict:
    """STUB decode: parses the FAKE header; real formats raise.

    Replace with a Pillow/libvips call in production — same signature, same
    error contract."""
    if blob is None:
        raise ValueError("null payload")
    if not blob.startswith(FAKE_MAGIC):
        raise NotImplementedError(
            "real image codecs unavailable in this environment (no Pillow); "
            "only the FAKE format is decodable"
        )
    width, height, channels = struct.unpack("<HHB", blob[4:9])
    pixels = blob[9 : 9 + width * height * channels]
    mean = (sum(pixels) / len(pixels)) if pixels else 0.0
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "n_pixels": width * height,
        "mean_intensity": mean,
    }


def decode_images(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode + feature-extract binary payloads via Arrow-batched mapInPandas.

    Per-row failures land in the ``error`` column (row-level error channel);
    successful rows carry extracted features.
    """
    payload_cols = [id_col, "payload"]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf["payload"]):
                row = {
                    "media_id": mid,
                    "width": None,
                    "height": None,
                    "channels": None,
                    "n_pixels": None,
                    "mean_intensity": None,
                    "error": None,
                }
                try:
                    row.update(decode_image_stub(blob))
                except (NotImplementedError, ValueError, struct.error) as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out)

    return media.select(*payload_cols).mapInPandas(decode_batches, DECODED_SCHEMA)


def resize_images(
    media: DataFrame, target: tuple[int, int], id_col: str = "media_id"
) -> DataFrame:
    """Resize plumbing: decodes, 'resizes' (stub: re-encodes a FAKE blob at
    the target size), returns (id, payload, meta). Real implementation swaps
    the body of the inner function only."""
    tw, th = target
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf["payload"]):
                try:
                    meta = decode_image_stub(blob)
                    out.append(
                        {
                            "media_id": mid,
                            "payload": encode_fake_image(
                                tw, th, meta["channels"], seed=int(mid)
                            ),
                            "error": None,
                        }
                    )
                except (NotImplementedError, ValueError, struct.error) as e:
                    out.append(
                        {
                            "media_id": mid,
                            "payload": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.select(id_col, "payload").mapInPandas(resize_batches, out_schema)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — projection pruning means the binary
    ``payload`` column is never read from parquet for this query."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.round(F.avg(F.col("meta.width") * F.col("meta.height")), 2).alias(
            "avg_pixels"
        ),
    )
