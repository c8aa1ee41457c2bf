"""DuckDB-exact rounding of DOUBLE expressions.

Spark's ``F.round`` on a double goes through the double's SHORTEST
DECIMAL REPRESENTATION (``BigDecimal.valueOf`` = ``Double.toString``)
and HALF_UP; DuckDB's ``ROUND(double, s)`` rounds the BINARY value
(``std::round(value * 10^s) / 10^s`` — nearest, ties away from zero,
evaluated on the IEEE product). The two agree everywhere EXCEPT when
the pre-round double sits within ~1 ulp of a decimal tie — which is
exactly where quotients of 6dp-decimal sums by row counts land
(sum_scaled / count a half-integer). Round 6 found one such row at
sf0.001: -26.624889 / 18 = -1.4791605 exactly; Spark's repr-based
round gave -1.479161, DuckDB -1.47916 — a one-value oracle divergence
invisible at sf0.01.

``round_double`` replicates DuckDB's semantics exactly with only
IEEE-exact operations (multiply by the exact power of ten, ``floor``,
compare, negate — no ``+0.5`` trick, whose addition can itself round
across the boundary; validated against DuckDB on 400k adversarial
boundary cases including the observed one). Use it for any FINAL
projection whose oracle counterpart is ``ROUND(<double expr>, s)``
over a RATIONAL value (ratios of counts, averages of quantized
decimals); keep plain ``F.round`` where the oracle rounds a DECIMAL
(exact HALF_UP on both engines) or where the argument is irrational
(log/cosine outputs — a binary-tie landing is measure-zero there).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["round_double"]


def round_double(col: Column, scale: int = 6) -> Column:
    """DuckDB-equal ROUND of a double column: nearest at ``scale``
    decimals on the BINARY value, ties away from zero. All steps are
    IEEE-exact: ``10^scale`` is an exact double (scale <= 22), ``floor``
    and the fraction compare are exact for |y| < 2^52 (beyond that the
    double is already integral at the scale, as in DuckDB), and the
    re-division is the same correctly-rounded IEEE op DuckDB performs."""
    p = F.lit(float(10 ** scale))
    y = col.cast("double") * p
    ay = F.abs(y)
    fl = F.floor(ay).cast("double")
    r = F.when(
        ay >= F.lit(float(2 ** 52)), ay
    ).otherwise(
        fl + F.when(ay - fl >= F.lit(0.5), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    signed = F.when(y < 0, -r).otherwise(r)
    return signed / p
