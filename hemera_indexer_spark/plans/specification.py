"""Predicate-combinator algebra over DataFrame columns.

Re-expresses the reference's Specification pattern
(/root/reference/indexer/specification/specification.py:9-129 — And/Or/Not/
AlwaysTrue/AlwaysFalse plus the concrete transaction predicates) as thin
builders of boolean ``Column`` expressions, so the whole composed predicate
stays inside Catalyst (pushdown-able, codegen'd) instead of running as
Python row filters.

The filter-mode pipeline of the reference (union of all jobs' filters pushed
to the source, /root/reference/indexer/jobs/base_job.py:279-288) is
``union_of`` here: one disjunctive predicate Catalyst pushes into the scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def always_true() -> Column:
    return F.lit(True)


def always_false() -> Column:
    return F.lit(False)


def and_(*specs: Column) -> Column:
    return reduce(lambda a, b: a & b, specs, F.lit(True))


def or_(*specs: Column) -> Column:
    return reduce(lambda a, b: a | b, specs, F.lit(False))


def not_(spec: Column) -> Column:
    return ~spec


def field_equals(field: str, value) -> Column:
    """FromAddressSpecification / ToAddressSpecification analog
    (specification.py:57-82)."""
    return F.col(field) == F.lit(value)


def prefix_match(field: str, prefix: str) -> Column:
    """TransactionFunctionSignSpecification analog — calldata prefix match
    (specification.py:85-92)."""
    return F.col(field).startswith(prefix)


def member_of(field: str, values: list) -> Column:
    """TransactionHashSpecification analog — small-set membership
    (specification.py:118-129). For large sets use a broadcast semi-join
    instead."""
    return F.col(field).isin(values)


def any_element(array_field: str, predicate) -> Column:
    """Topic/address log predicate analog — membership test over a nested
    array (specification.py:95-115): exists(logs, l -> p(l))."""
    return F.exists(F.col(array_field), predicate)


def union_of(*specs: Column) -> Column:
    """Filter-mode union: single pushed-down disjunction."""
    return or_(*specs)
