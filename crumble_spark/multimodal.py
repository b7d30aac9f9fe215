"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decoded/feature-extracted via Arrow-batched pandas
UDFs (mapInPandas).

The decode kernels are STUBS by design — the sandbox has no image/audio
libraries — but everything Spark-side is real and tested: schemas, the
binary column path through Arrow, batch shapes, partitioning, and the
metadata extraction.  `decode_image_stub` produces a *deterministic fake*
(seeded from the payload bytes) with the exact shape a real decoder would
return; `decode_image_real` marks the integration point.

Reference analogue: crumble treats the aux-tag blob as opaque bytes with
typed accessors (bam_get_aux / aux_type2size, snp_score.c:949-965).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_pixel_e6", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media: payload = md5 bytes of the doc text.
    Real pipelines swap this for spark.read of the blob store manifest."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.unhex(F.md5("text")).alias("payload"),
    ).withColumn("n_bytes", F.length("payload").cast("int"))


def decode_image_real(payload: bytes) -> np.ndarray:
    """Integration point for a real decoder (PIL/libvips/ffmpeg)."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; swap in PIL.Image.open(io.BytesIO(payload)) here"
    )


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: seeded uint8 HxWx3 array with dimensions
    read from the payload header bytes — same contract as a real decode."""
    b = np.frombuffer(payload, dtype=np.uint8)
    h, w = int(b[0]) % 32 + 1, int(b[1]) % 32 + 1
    rng = np.random.default_rng(int.from_bytes(payload[:8], "little"))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def extract_features_df(media: DataFrame, dim: int = 8) -> DataFrame:
    """decode → resize-ish pooling → tiny feature vector, as one
    mapInPandas pass (the pattern a real CLIP/whisper stage follows).
    Arrow batches bound memory; payload bytes never hit the driver."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                img = decode_image_stub(bytes(payload))
                h, w = img.shape[0], img.shape[1]
                mean_px = int(np.floor(img.mean() * 1_000_000))
                pooled = img.reshape(-1, 3).mean(axis=0)
                feat = np.resize(pooled.astype(np.float32), dim)
                rows.append((int(doc_id), mt, w, h, mean_px, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def q_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata off the binary column, pure Catalyst (oracle-checked):
    byte length + header-derived dimensions (the same bytes the stub decoder
    reads: payload[0] → height, payload[1] → width), no decode needed."""
    m = media_table(spark, sf_dir)
    hx = F.md5("text")  # payload == unhex(md5(text)), so header bytes == hex pairs
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.join(m.select("doc_id", "n_bytes"), "doc_id").select(
        "doc_id",
        "n_bytes",
        (F.conv(F.substring(hx, 3, 2), 16, 10).cast("int") % 32 + 1).alias("width"),
        (F.conv(F.substring(hx, 1, 2), 16, 10).cast("int") % 32 + 1).alias("height"),
    )


Q_MM_BINARY_META_SQL = (
    "WITH m AS (SELECT doc_id, from_hex(md5(text)) AS payload, md5(text) AS hx FROM documents) "
    "SELECT doc_id, CAST(octet_length(payload) AS INTEGER) AS n_bytes, "
    "CAST(CAST(('0x' || substr(hx, 3, 2)) AS BIGINT) % 32 + 1 AS INTEGER) AS width, "
    "CAST(CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % 32 + 1 AS INTEGER) AS height "
    "FROM m"
)


QUERIES = {"mm_binary_meta": q_mm_binary_meta}
ORACLES = {"mm_binary_meta": Q_MM_BINARY_META_SQL}
