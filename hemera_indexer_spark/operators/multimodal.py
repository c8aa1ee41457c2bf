"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The container ships no image/audio codecs, so the DECODE step is stubbed
(clearly marked) behind a deterministic fake; everything Spark-side —
schema, batch shape, partitioning, UDF signature — is real and tested. At
scale the pattern is: keep blobs in their own column (Parquet stores them
out-of-line per page), select them ONLY in the stage that decodes
(column pruning keeps every other stage blob-free), and size
``spark.sql.files.maxPartitionBytes`` so a task's batch of blobs fits
executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feat_mean", T.DoubleType(), True),
        T.StructField("feat_std", T.DoubleType(), True),
        T.StructField("feat_dim", T.IntegerType(), True),
    ]
)


def attach_blob_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """JVM-side metadata: byte length + sha256 (no UDF)."""
    c = F.col(content_col)
    return df.withColumn("n_bytes", F.length(c).cast("int")).withColumn(
        "sha", F.sha2(c, 256)
    )


def decode_blob(content: bytes, media_type: str) -> np.ndarray:
    """STUB — real decode (PIL/ffmpeg/soundfile) is unavailable in this
    container. Deterministic fake: derive a fixed-length float vector from
    the blob's sha256 so the pipeline is testable end-to-end. Replace the
    body with the real codec in production."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media_type {media_type}")
    h = hashlib.sha256(content or b"").digest()
    return (
        np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 255.0
    )  # 32-dim deterministic pseudo-features


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, decode every blob
    (stubbed), emit summary features. Blob column is dropped on output so
    downstream stages shuffle no binary payload."""

    import math

    def summarize(content: bytes | None, media_type: str) -> tuple[float, float, int]:
        # mean/std of the 32 stub feature values (sha256 bytes / 255.0),
        # computed from EXACT integer sums so the result is a fixed sequence
        # of IEEE double ops — bit-identical to any engine evaluating the
        # same formula (this is what lets the DuckDB oracle hash-match):
        #   mean = (sum_h / 32) / 255 = sum_h / 8160
        #   std  = sqrt(sum_h2/32 - (sum_h/32)^2) / 255   (population std)
        vec = decode_blob(content, media_type)  # h_i / 255.0, h_i in 0..255
        ints = np.rint(vec * 255.0).astype(np.int64)
        sh = int(ints.sum())
        sh2 = int((ints * ints).sum())
        mean = sh / 8160.0
        m32 = sh / 32.0
        std = math.sqrt(sh2 / 32.0 - m32 * m32) / 255.0
        return mean, std, len(vec)

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                summarize(c, m)
                for c, m in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feat_mean": [f[0] for f in feats],
                    "feat_std": [f[1] for f in feats],
                    "feat_dim": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def blobs_from_documents(docs: DataFrame) -> DataFrame:
    """Build a blob table from the documents fixture (text bytes stand in
    for media bytes; media_type assigned deterministically by doc_id)."""
    return docs.select(
        F.col("doc_id").alias("blob_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )
