"""Embedding-column feature engineering: per-dimension distribution
stats (whitening / PCA prep, drift monitoring) and deterministic scalar
quantization (int8 storage compression — the standard pre-ANN-index
shrink; FAISS calls this SQ8).

Everything stays JVM-side: posexplode + map-side-combined groupBy for
the stats; the quantizer is an O(dim) transform over the array column
with the per-dimension parameters shipped as literal arrays (the
parameter table is dim-sized — collecting it driver-side is the
broadcast-small-side rule, same as the IVF coarse quantizer in
operators/similarity.py).

Determinism: stats expose EXACT decimal component sums (mean = sum/n
downstream) and exact min/max; the quantizer uses floor (never
round-half) so no engine pair can disagree on a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dim_stats", "quantize_embeddings"]


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension stats over an array<float> column: (dim, n, sum_v,
    sum_sq, min_v, max_v). Mean and variance derive downstream
    (``var = sum_sq/n − (sum_v/n)²``); the exact decimal sums keep the
    fold order-independent, and min/max on doubles are exact by nature.

    One map-only posexplode + one map-side-combined groupBy keyed by
    dim — ndim groups, embarrassingly parallel, no vector ever touches
    the driver."""
    ex = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
    )
    dec = F.col("v").cast("decimal(18,6)")
    return ex.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("decimal(18,6)").alias("sum_v"),
        # keep the EXACT scale-12 products: rounding each square back to
        # 6dp before summing would introduce a (tiny) tie-break surface
        F.sum(dec * dec).cast("decimal(28,12)").alias("sum_sq"),
        F.round(F.min("v"), 6).cast("decimal(18,6)").alias("min_v"),
        F.round(F.max("v"), 6).cast("decimal(18,6)").alias("max_v"),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Deterministic per-dimension scalar quantization to ``bits`` bits:
    ``q = min(2^bits − 1, floor((v − min_d) / (max_d − min_d) · 2^bits))``
    with min/max computed per dimension over the dataset. Returns
    (id, qvec: array<int>) — a 4× (fp32→int8) storage cut ahead of ANN
    indexing; dequantize with ``min_d + (q + 0.5) · range_d / 2^bits``.

    The parameter pass is ``dim_stats``-shaped (posexplode + groupBy
    dim). The ndim parameter rows are collected driver-side and shipped
    as two literal arrays into an O(dim) transform — the quantize pass
    itself is map-only, no shuffle, no Python. Constant dimensions
    (max == min) quantize to 0. Floor, not round: a half-way value
    cannot split engines."""
    ex = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
    )
    params = (
        ex.groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .orderBy("dim")
        .collect()
    )
    levels = 2 ** bits
    los = F.array(*[F.lit(float(r["lo"])) for r in params])
    spans = F.array(
        *[F.lit(float(r["hi"] - r["lo"])) for r in params]
    )
    arr = F.col(vec_col).cast("array<double>")
    q = F.transform(
        arr,
        lambda v, i: F.when(
            F.element_at(spans, i + 1) == 0.0, F.lit(0)
        ).otherwise(
            F.least(
                F.lit(levels - 1),
                F.floor(
                    (v - F.element_at(los, i + 1))
                    / F.element_at(spans, i + 1)
                    * F.lit(levels)
                ).cast("int"),
            )
        ),
    )
    return df.select(F.col(id_col), q.alias("qvec"))
