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
import struct
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


# --------------------------------------------------------------------------
# Real pure-Python image codecs (no container deps): 24-bit uncompressed
# BMP (BI_RGB) and binary PPM (P6). These are the REAL decode path for
# image blobs — the stub below survives only for formats that need codecs
# the container doesn't ship (jpeg/audio/video).
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BI_RGB): BGR byte
    order, rows bottom-up, each row padded to a 4-byte boundary."""
    h, w, c = pixels.shape
    assert c == 3
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    bgr = pixels[:, :, ::-1]  # RGB -> BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + b"\x00" * pad
    return header + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB. Validates magic, bit
    depth and compression; honors the pixel-data offset, per-row 4-byte
    padding, and both bottom-up (h > 0) and top-down (h < 0) row orders."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP: bpp={bpp}, compression={compression} "
            "(only 24-bit BI_RGB)"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    stride = (w * 3 + 3) & ~3
    if offset + stride * h > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = []
    for r in range(h):
        y = r if top_down else h - 1 - r
        start = offset + y * stride
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=start)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    return np.stack(rows)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    h, w, c = pixels.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8 RGB. Real header parse:
    whitespace-separated tokens with '#' comments, maxval 255 only."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 255)")
    need = w * h * 3
    if len(data) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return (
        np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def decode_image(content: bytes) -> np.ndarray:
    """Magic-sniffing image decode: BMP ('BM') and PPM ('P6') decode for
    REAL; anything else raises (route it through the labeled stub or a
    production codec)."""
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:2] == b"P6":
        return decode_ppm(content)
    raise ValueError("unknown image format (supported: BMP BI_RGB, PPM P6)")


def decode_blob(content: bytes, media_type: str) -> np.ndarray:
    """Decode a media blob to a flat float64 feature vector in [0, 1].

    REAL path: image blobs carrying a BMP/PPM magic decode with the pure-
    Python codecs above (flattened RGB / 255).

    STUB path — clearly marked: other image bytes and all audio/video fall
    back to a deterministic fake (sha256-derived 32-dim vector) because the
    container ships no jpeg/audio/video codecs. Replace with the real codec
    in production; everything Spark-side (schema, batch shape, partitioning,
    UDF signature) is identical either way."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media_type {media_type}")
    if media_type == "image" and content and content[:2] in (b"BM", b"P6"):
        return decode_image(content).reshape(-1).astype(np.float64) / 255.0
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
        n = float(len(ints))
        sh = int(ints.sum())
        sh2 = int((ints * ints).sum())
        mean = sh / (n * 255.0)
        mn = sh / n
        std = math.sqrt(sh2 / n - mn * mn) / 255.0
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


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
    ]
)


def _fixture_pixels(blob_id: int) -> np.ndarray:
    """Deterministic synthetic image for id: w = 4 + id%5, h = 3 + id%4,
    channel values at row-major pixel index i are (c*id + i) % 251 for
    c = 1 (R), 2 (G), 3 (B) — closed-form, so an external SQL oracle can
    reproduce every per-image statistic without running the codec."""
    w = 4 + blob_id % 5
    h = 3 + blob_id % 4
    i = np.arange(h * w, dtype=np.int64)
    px = np.stack(
        [(c * blob_id + i) % 251 for c in (1, 2, 3)], axis=1
    ).astype(np.uint8)
    return px.reshape(h, w, 3)


def synthesize_image_blobs(
    df: DataFrame, id_col: str = "doc_id", fmt: str = "bmp"
) -> DataFrame:
    """Encode a REAL image per row (BMP or PPM bytes via the pure-Python
    codecs) from the deterministic fixture pattern — the writer half of the
    codec roundtrip, and the only way to put genuine image bytes in front
    of the decoder without container codecs. Map-only (no shuffle)."""
    enc = {"bmp": encode_bmp, "ppm": encode_ppm}[fmt]

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "blob_id": ids,
                    "content": [enc(_fixture_pixels(int(b))) for b in ids],
                }
            )

    return df.select(id_col).mapInPandas(
        op, schema="blob_id long, content binary"
    )


def image_stats(blobs: DataFrame) -> DataFrame:
    """REAL decode per blob (magic-sniffed BMP/PPM — no stub in this path)
    -> (blob_id, width, height, per-channel means). Means are exact-integer
    channel sums divided by the pixel count in ONE double op, so any engine
    computing the same rational gets the bit-identical double. The binary
    column is consumed here and never shuffled."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("blob_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for bid, content in zip(pdf["blob_id"], pdf["content"]):
                px = decode_image(bytes(content))
                h, w, _ = px.shape
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                out["blob_id"].append(int(bid))
                out["width"].append(w)
                out["height"].append(h)
                for name, s in zip(("mean_r", "mean_g", "mean_b"), sums):
                    out[name].append(int(s) / float(h * w))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(op, schema=IMAGE_STATS_SCHEMA)


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
