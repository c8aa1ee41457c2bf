"""Keyset (seek) pagination — the read-API paging analog.

The reference's explorer API pages with ``.limit(n).offset(m)`` plus seek
predicates on indexed sort keys (/root/reference/api/app/db_service/
transactions.py:150-162). OFFSET is O(offset) everywhere — on Spark it is
also a global sort of everything before the offset — so the lake read API
exposes the seek form instead: ``WHERE (k1, k2, ...) after (v1, v2, ...)
ORDER BY k1, k2 LIMIT n``, which prunes with the predicate (pushed to the
scan for the leading column) and sorts only survivors. Works for any mix
of ascending/descending keys via the standard lexicographic expansion
``(k1 < v1) OR (k1 = v1 AND k2 > v2) OR ...``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order spec: list of (column_name, descending) tuples


def seek_predicate(order_cols: list[tuple[str, bool]], last: tuple) -> Column:
    """Lexicographic 'strictly after ``last`` in sort order' predicate.

    NULL-aware, matching Spark's default sort placement (ascending = nulls
    FIRST, descending = nulls LAST): a plain ``col > v`` would evaluate to
    NULL for null-keyed rows and silently drop them from every page after
    the first."""
    pred = F.lit(False)
    eq = F.lit(True)
    for (name, desc), v in zip(order_cols, last):
        col = F.col(name)
        if v is None:
            # after a null key: asc -> every non-null value; desc -> nothing
            nxt = F.lit(False) if desc else col.isNotNull()
        elif desc:
            # nulls sort last under desc, so they come after any value
            nxt = col.isNull() | (col < F.lit(v))
        else:
            nxt = col > F.lit(v)
        pred = pred | (eq & nxt)
        eq = eq & col.eqNullSafe(F.lit(v))
    return pred


def keyset_page(
    df: DataFrame,
    order_cols: list[tuple[str, bool]],
    last: tuple | None = None,
    n: int = 20,
) -> DataFrame:
    """One page of ``df`` in (order_cols) order, starting strictly after the
    ``last`` key tuple (None = first page). Spark executes LIMIT over sort
    as a TakeOrdered top-k — no global sort materialization."""
    if last is not None:
        df = df.where(seek_predicate(order_cols, last))
    sort = [
        F.col(c).desc() if desc else F.col(c).asc() for c, desc in order_cols
    ]
    return df.orderBy(*sort).limit(n)
