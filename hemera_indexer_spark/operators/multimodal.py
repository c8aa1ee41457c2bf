"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

Decode is REAL for the formats a pure-Python parser can own: BMP/PPM
images, PNG (a genuine DEFLATE-compressed container via stdlib zlib —
CRC-verified chunks, all five scanline filters), RIFF/WAVE PCM16 audio,
YUV4MPEG2 video. Lossy formats (jpeg/mp3/h264) would need codecs the
container doesn't ship, so those fall back to a clearly-marked
deterministic stub; everything
Spark-side — schema, batch shape, partitioning, UDF signature — is
identical on both paths. At
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


# --------------------------------------------------------------------------
# Real pure-Python COMPRESSED image codec: PNG (8-bit truecolor RGB/RGBA,
# non-interlaced) over stdlib zlib. This is a genuine DEFLATE-compressed
# container — chunk walk with CRC-32 verification, IDAT reassembly,
# inflate, and all five scanline unfilters (None/Sub/Up/Average/Paeth).
# The encoder deliberately cycles the filter type per row (y % 5) so a
# decoder that shortcuts any unfilter fails the roundtrip loudly.
# --------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> PNG bytes (8-bit truecolor / truecolor+alpha,
    non-interlaced). Scanline y uses filter type y % 5, exercising every
    filter the spec defines; IDAT is zlib-compressed (a real DEFLATE
    stream, not a stored block)."""
    import zlib

    h, w, ch = pixels.shape
    assert ch in (3, 4) and pixels.dtype == np.uint8
    stream = bytearray()
    zeros = np.zeros(w * ch, dtype=np.int64)
    prior = zeros
    for y in range(h):
        raw = pixels[y].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(ch, np.int64), raw[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int64), prior[:-ch]])
        ft = y % 5
        if ft == 0:
            filt = raw
        elif ft == 1:
            filt = raw - left
        elif ft == 2:
            filt = raw - prior
        elif ft == 3:
            filt = raw - (left + prior) // 2
        else:  # Paeth — vectorized predictor over (left, up, upper-left)
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = raw - pred
        stream += bytes([ft]) + (filt % 256).astype(np.uint8).tobytes()
        prior = raw

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload))
        )

    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream), 9))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (h, w, 3|4) uint8. Real container parse: signature, chunk
    walk with per-chunk CRC-32 verification (corruption fails loudly),
    multi-IDAT reassembly, zlib inflate, and sequential reconstruction of
    all five scanline filters. Supports 8-bit truecolor (color type 2) and
    truecolor+alpha (6), non-interlaced; anything else raises. Ancillary
    chunks are CRC-checked and skipped.

    The per-row unfilter loop is honest pure Python (Sub/Average/Paeth
    carry an intra-row left dependency, so there is nothing to vectorize
    without native code); production swaps this one function for a native
    codec and keeps every Spark-side contract identical."""
    import zlib

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        if pos + 12 + ln > len(data):
            raise ValueError("truncated PNG chunk")
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(typ + payload) != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp or filt_method or interlace:
        raise ValueError(
            f"unsupported PNG: depth={depth} color_type={color_type} "
            f"interlace={interlace} (only 8-bit RGB/RGBA, non-interlaced)"
        )
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    rows, prior = [], bytes(stride)
    for y in range(h):
        base = y * (1 + stride)
        ft, line = raw[base], raw[base + 1 : base + 1 + stride]
        if ft == 0:
            cur = bytearray(line)
        elif ft == 2:
            cur = bytearray((line[i] + prior[i]) & 255 for i in range(stride))
        elif ft in (1, 3, 4):
            cur = bytearray(stride)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0  # left (reconstructed)
                b = prior[i]  # up
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    c = prior[i - ch] if i >= ch else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 255
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        rows.append(np.frombuffer(bytes(cur), np.uint8).reshape(w, ch))
        prior = bytes(cur)
    return np.stack(rows)


def decode_image(content: bytes) -> np.ndarray:
    """Magic-sniffing image decode: BMP ('BM'), PPM ('P6') and PNG
    (8-byte signature) decode for REAL; anything else raises (route it
    through the labeled stub or a production codec). PNG with an alpha
    channel is flattened to RGB here so every format yields the same
    (h, w, 3) shape downstream."""
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:8] == PNG_SIG:
        px = decode_png(content)
        return px[:, :, :3].copy() if px.shape[2] == 4 else px
    raise ValueError(
        "unknown image format (supported: BMP BI_RGB, PPM P6, PNG 8-bit)"
    )


# --------------------------------------------------------------------------
# Real pure-Python AUDIO codec: RIFF/WAVE, 16-bit PCM. The encoder emits a
# junk chunk between fmt and data so the decoder's chunk walk is proven
# real (a header-offset shortcut would land mid-junk and fail loudly).
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(frames, channels) int16 -> RIFF/WAVE PCM16 bytes (interleaved
    little-endian), with a 'JUNK' chunk between 'fmt ' and 'data'."""
    frames, channels = samples.shape
    assert samples.dtype == np.int16
    data = samples.reshape(-1).astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    junk = b"padding!"  # even length — RIFF chunks are word-aligned
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"JUNK" + struct.pack("<I", len(junk)) + junk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> ((frames, channels) int16, sample_rate). Real
    chunk walk: validates the RIFF/WAVE container, skips unknown chunks
    (word-aligned), requires a 'fmt ' chunk (PCM, 16-bit) before 'data'."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        if pos + size > len(data):
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", data, pos)
        elif cid == b"data":
            pcm = data[pos : pos + size]
            break  # fmt must precede data per spec
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV: format={audio_format}, bits={bits} "
            "(only PCM16)"
        )
    if block_align != channels * 2:
        raise ValueError("inconsistent WAV block alignment")
    n = len(pcm) // block_align
    arr = np.frombuffer(pcm, dtype="<i2", count=n * channels).reshape(
        n, channels
    )
    return arr.astype(np.int16, copy=True), sample_rate


# --------------------------------------------------------------------------
# Real pure-Python VIDEO codec: YUV4MPEG2 (Y4M), C420 chroma, 8-bit. The
# uncompressed-stream format mjpegtools/ffmpeg use for raw YUV exchange —
# a text header, then per-frame FRAME markers and raw planes.
# --------------------------------------------------------------------------


def encode_y4m(y_planes: list[np.ndarray], fps: int = 25) -> bytes:
    """list of (h, w) uint8 luma planes (even dims) -> Y4M C420jpeg bytes;
    chroma planes are flat 128 (grayscale video)."""
    h, w = y_planes[0].shape
    assert w % 2 == 0 and h % 2 == 0, "C420 needs even dimensions"
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode())
    uv = bytes([128]) * ((w // 2) * (h // 2))
    for y in y_planes:
        assert y.shape == (h, w) and y.dtype == np.uint8
        out += b"FRAME\n" + y.tobytes() + uv + uv
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[list[np.ndarray], int, int]:
    """Y4M bytes -> (list of (h, w) uint8 luma planes, width, height).
    Real stream parse: tagged header params (W/H/C), per-frame FRAME
    markers with optional frame params, C420*/C444 plane sizing. Chroma
    is skipped, not decoded — frame SAMPLING reads luma only."""
    eol = data.find(b"\n")
    if eol < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    chroma = "420jpeg"
    for tok in data[9:eol].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            chroma = val.decode()
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if chroma.startswith("420"):
        uv_size = 2 * ((w // 2) * (h // 2))
    elif chroma == "444":
        uv_size = 2 * w * h
    else:
        raise ValueError(f"unsupported Y4M chroma {chroma}")
    frames, pos, y_size = [], eol + 1, w * h
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        feol = data.find(b"\n", pos)
        if feol < 0 or len(data) - feol - 1 < y_size + uv_size:
            raise ValueError("truncated Y4M frame")
        pos = feol + 1
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=y_size, offset=pos)
            .reshape(h, w)
            .copy()
        )
        pos += y_size + uv_size
    return frames, w, h


def decode_blob(content: bytes, media_type: str) -> np.ndarray:
    """Decode a media blob to a flat float64 feature vector in [0, 1].

    REAL paths: image blobs with a BMP/PPM/PNG magic (flattened RGB / 255),
    audio blobs with a RIFF/WAVE magic (PCM16 samples mapped to [0, 1] as
    (v + 32768) / 65535), video blobs with a YUV4MPEG2 magic (concatenated
    luma planes / 255) — all via the pure-Python codecs above.

    STUB path — clearly marked: bytes NOT carrying one of those magics
    (jpeg/mp3/h264/...) fall back to a deterministic fake (sha256-derived
    32-dim vector) because the container ships no compressed-media codecs.
    Replace with the real codec in production; everything Spark-side
    (schema, batch shape, partitioning, UDF signature) is identical."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media_type {media_type}")
    if media_type == "image" and content and (
        content[:2] in (b"BM", b"P6") or content[:8] == PNG_SIG
    ):
        return decode_image(content).reshape(-1).astype(np.float64) / 255.0
    if media_type == "audio" and content and content[:4] == b"RIFF":
        samples, _ = decode_wav(content)
        return (samples.reshape(-1).astype(np.float64) + 32768.0) / 65535.0
    if media_type == "video" and content and content[:9] == b"YUV4MPEG2":
        frames, _, _ = decode_y4m(content)
        return np.concatenate(
            [f.reshape(-1) for f in frames]
        ).astype(np.float64) / 255.0
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
    """Encode a REAL image per row (BMP, PPM or PNG bytes via the
    pure-Python codecs) from the deterministic fixture pattern — the writer
    half of the codec roundtrip, and the only way to put genuine image
    bytes in front of the decoder without container codecs. Map-only (no
    shuffle). ``fmt="mixed"`` picks the container per row (blob_id % 3 →
    bmp/ppm/png) so one pass proves the magic-sniff dispatch across all
    three formats."""
    encoders = {"bmp": encode_bmp, "ppm": encode_ppm, "png": encode_png}
    if fmt == "mixed":
        order = [encode_bmp, encode_ppm, encode_png]
        enc = lambda bid: order[bid % 3](_fixture_pixels(bid))  # noqa: E731
    else:
        one = encoders[fmt]
        enc = lambda bid: one(_fixture_pixels(bid))  # noqa: E731

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "blob_id": ids,
                    "content": [enc(int(b)) for b in ids],
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


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("duration_sec", T.DoubleType(), False),
        T.StructField("mean_amp", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def _fixture_samples(blob_id: int) -> tuple[np.ndarray, int]:
    """Deterministic synthetic audio for id: channels = 1 + id%2,
    frames = 24 + id%9, sample_rate = 8000 * (1 + id%3); the sample at
    frame f, channel c (0-based) is ((id*(c+1) + 13*f) % 4001) - 2000 —
    closed-form, so an external SQL oracle reproduces every statistic
    without running the codec."""
    channels = 1 + blob_id % 2
    frames = 24 + blob_id % 9
    rate = 8000 * (1 + blob_id % 3)
    f = np.arange(frames, dtype=np.int64)[:, None]
    c = np.arange(channels, dtype=np.int64)[None, :]
    return (
        ((blob_id * (c + 1) + 13 * f) % 4001 - 2000).astype(np.int16),
        rate,
    )


def synthesize_audio_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode a REAL WAV per row (RIFF/PCM16 bytes, junk chunk included)
    from the deterministic fixture pattern. Map-only (no shuffle)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "blob_id": ids,
                    "content": [
                        encode_wav(*_fixture_samples(int(b))) for b in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        op, schema="blob_id long, content binary"
    )


def audio_stats(blobs: DataFrame) -> DataFrame:
    """REAL WAV decode per blob (RIFF chunk walk — no stub in this path)
    -> (blob_id, sample_rate, channels, frames, duration, mean, rms).
    mean_amp is one exact-int-sum / count double division; rms is
    sqrt(sum_sq / n) — two IEEE ops any engine computes bit-identically
    from the same integers. Binary column consumed here, never shuffled."""
    import math

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {k: [] for k in (
                "blob_id", "sample_rate", "n_channels", "n_frames",
                "duration_sec", "mean_amp", "rms")}
            for bid, content in zip(pdf["blob_id"], pdf["content"]):
                samples, rate = decode_wav(bytes(content))
                frames, channels = samples.shape
                flat = samples.reshape(-1).astype(np.int64)
                n = frames * channels
                cols["blob_id"].append(int(bid))
                cols["sample_rate"].append(rate)
                cols["n_channels"].append(channels)
                cols["n_frames"].append(frames)
                cols["duration_sec"].append(frames / float(rate))
                cols["mean_amp"].append(int(flat.sum()) / float(n))
                cols["rms"].append(
                    math.sqrt(int((flat * flat).sum()) / float(n))
                )
            yield pd.DataFrame(cols)

    return blobs.mapInPandas(op, schema=AUDIO_STATS_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_y", T.DoubleType(), False),
    ]
)


def _fixture_frames(blob_id: int) -> list[np.ndarray]:
    """Deterministic synthetic video for id: w = 4 + 2*(id%3),
    h = 4 + 2*(id%2) (even dims for C420), n_frames = 6 + id%5; luma at
    frame f, row-major pixel i is (id + 31*f + i) % 251 — closed-form
    for the SQL oracle."""
    w = 4 + 2 * (blob_id % 3)
    h = 4 + 2 * (blob_id % 2)
    i = np.arange(h * w, dtype=np.int64)
    return [
        ((blob_id + 31 * f + i) % 251).astype(np.uint8).reshape(h, w)
        for f in range(6 + blob_id % 5)
    ]


def synthesize_video_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode a REAL Y4M stream per row from the deterministic fixture
    frames. Map-only (no shuffle)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "blob_id": ids,
                    "content": [
                        encode_y4m(_fixture_frames(int(b))) for b in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        op, schema="blob_id long, content binary"
    )


def video_frame_stats(blobs: DataFrame, every: int = 2) -> DataFrame:
    """REAL Y4M decode + frame SAMPLING per blob: parse the stream, keep
    every ``every``-th frame (the frame-sample step of a video training
    pipeline), emit one row per sampled frame with its exact-int mean
    luma. One double division per row; chroma planes are skipped at the
    decoder, so only luma bytes are ever touched."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {k: [] for k in (
                "blob_id", "width", "height", "n_frames", "frame_idx",
                "mean_y")}
            for bid, content in zip(pdf["blob_id"], pdf["content"]):
                frames, w, h = decode_y4m(bytes(content))
                for fi in range(0, len(frames), every):
                    cols["blob_id"].append(int(bid))
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["n_frames"].append(len(frames))
                    cols["frame_idx"].append(fi)
                    cols["mean_y"].append(
                        int(frames[fi].astype(np.int64).sum()) / float(h * w)
                    )
            yield pd.DataFrame(cols)

    return blobs.mapInPandas(op, schema=VIDEO_FRAME_SCHEMA)


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
