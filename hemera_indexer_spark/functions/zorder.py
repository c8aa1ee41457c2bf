"""Z-order (Morton) interleaved sort keys for multi-column data skipping.

A lexicographic ``cluster_by`` sort makes file/row-group min-max stats
tight for the FIRST sort column only — every file spans the full range of
the second column, so a predicate constraining only that column prunes
nothing. Interleaving the bits of several linearly-normalized columns into
one Morton key makes rows that are close in EVERY dimension close on the
curve, so a z-sorted + z-split rewrite yields files whose footer min/max
are tight in ALL interleaved dimensions at once — the layout behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` and the reason a 100 TB table can
answer a 2-D box predicate by opening a handful of files.

Everything here is JVM-side Column arithmetic (shift/and/or inside
whole-stage codegen) — no UDFs, no shuffle of its own; the key is consumed
by the caller's existing repartition/sort.

Reference anchor: the reference engine's PG indexes serve multi-column
lookups (e.g. /root/reference/indexer/domains/token_transfers.py composite
primary keys); on an immutable-file lake the equivalent access path is
multi-dimensional clustering + footer-stat pruning, which this provides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# numeric types a z-order column may have; everything else raises (a
# timestamp caller casts to epoch seconds explicitly — implicit temporal
# coercion has silently-wrong timezone semantics)
_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _norm(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear min-max normalization of ``col`` into [0, 2**bits) as a long.

    NULLs map to 0 (they cluster at the curve origin — a file of NULLs
    gets footer stats of whatever non-NULL rows share it; pruning stays
    correct because zone maps only ever SKIP provably-disjoint files).
    A constant column (hi == lo) contributes 0 bits of information and
    normalizes to 0 everywhere.
    """
    top = (1 << bits) - 1
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(top))
        + F.lit(0.5)
    ).cast("long")
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(top))
    return F.coalesce(clamped, F.lit(0)).cast("long")


def zorder_key(
    specs: list[tuple[Column | str, float, float]], bits: int = 16
) -> Column:
    """Morton key over ``specs`` = [(column, lo, hi), ...].

    Each column is min-max normalized to ``bits`` bits using the caller-
    supplied [lo, hi] range (values outside clamp to the edge cells —
    out-of-range rows degrade pruning for their file, never correctness),
    then the per-column bit strings interleave LSB-first: output bit
    ``i*k + j`` is bit ``i`` of column ``j``. Total width ``k*bits`` must
    fit a signed long (<= 62 so the key stays non-negative).
    """
    k = len(specs)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 62:
        raise ValueError(
            f"{k} columns x {bits} bits = {k * bits} exceeds the 62-bit "
            "long budget — lower bits (pruning granularity saturates at "
            "file counts far below 2^16 per dimension anyway)"
        )
    norms = [_norm(F.col(c) if isinstance(c, str) else c, lo, hi, bits)
             for c, lo, hi in specs]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, n in enumerate(norms):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(n, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return z


def zorder_key_py(
    values: list[float | None],
    bounds: list[tuple[float, float]],
    bits: int = 16,
) -> int:
    """Pure-Python reference of ``zorder_key`` for one row — the test
    oracle (bit-for-bit parity is asserted in tests/test_zorder.py)."""
    k = len(values)
    top = (1 << bits) - 1
    z = 0
    for j, (v, (lo, hi)) in enumerate(zip(values, bounds)):
        span = float(hi) - float(lo)
        if v is None or span <= 0:
            n = 0
        else:
            n = int((float(v) - float(lo)) / span * top + 0.5)
            n = max(0, min(top, n))
        for i in range(bits):
            z |= ((n >> i) & 1) << (i * k + j)
    return z


def validate_zorder_cols(schema: T.StructType, cols) -> None:
    """Raise unless every z-order column exists and is numeric."""
    by_name = {f.name: f.dataType for f in schema.fields}
    for c in cols:
        dt = by_name.get(c)
        if dt is None:
            raise ValueError(
                f"z-order column {c!r} not in schema {list(by_name)}"
            )
        if not isinstance(dt, _NUMERIC):
            raise TypeError(
                f"z-order column {c!r} has non-numeric type "
                f"{dt.simpleString()} — cast temporals to epoch numbers "
                "explicitly; strings have no meaningful linear range"
            )


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """One column-pruned pass computing (min, max) per column — the
    fallback when footer stats can't supply the normalization ranges."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"_lo_{c}"))
        aggs.append(F.max(c).alias(f"_hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
        out[c] = (
            float(lo) if lo is not None else 0.0,
            float(hi) if hi is not None else 0.0,
        )
    return out
