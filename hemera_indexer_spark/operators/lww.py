"""Last-writer-wins compaction — the engine's core operator.

Analog of ``distinct_collections_by_group(..., max_key="block_number")``
(/root/reference/indexer/utils/collection_utils.py:8-19), used by the
reference before every state-table upsert
(/root/reference/indexer/jobs/export_token_balances_job.py:66-86). Three
physical forms, all one logical operator "argmax per key by version":

- ``lww_latest`` — ``groupBy(keys).agg(max_by(payload, version))``. The
  default: all-JVM, whole-stage codegen, and crucially **map-side partial
  aggregation**, which already bounds skew (a hot key is pre-combined within
  every input partition before the shuffle).
- ``lww_latest_window`` — ``row_number() == 1`` over a window. Same result;
  shuffles the full payload and sorts per partition. Kept because it also
  yields ranks when N>1 is wanted.
- ``lww_latest_salted`` — explicit two-phase argmax for *pathological* skew:
  partial argmax per (key, salt), final argmax per key. With max_by the
  built-in partial aggregation usually makes this unnecessary; it exists for
  the window form and as the documented fallback (SURVEY.md §4 custom work
  #2).

Tie-breaking: ``version`` may be a struct column for deterministic composite
ordering, e.g. ``F.struct("seq", "file_order")``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lww_latest(
    df: DataFrame, keys: list[str], version: Column, payload: list[str]
) -> DataFrame:
    """One row per key: the payload columns of the row with max version."""
    return (
        df.groupBy(*keys)
        .agg(
            F.max_by(F.struct(*payload), version).alias("_row"),
            F.max(version).alias("_v"),
        )
        .select(*keys, "_row.*")
    )


def lww_latest_window(
    df: DataFrame, keys: list[str], order_cols: list[Column]
) -> DataFrame:
    """row_number()==1 over Window.partitionBy(keys).orderBy(desc ...)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_latest_salted(
    df: DataFrame,
    keys: list[str],
    version: Column,
    payload: list[str],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase argmax: per-(key, salt) partial, then per-key final.
    Bounds the largest shuffle partition for pathologically hot keys.

    The salt is derived from the row's version column (deterministic row
    content), NOT from rand(): rand() is seeded per-partition, so a task
    retry or a partition-count change would re-deal salts and make runs
    non-reproducible at the plan level. A hot key's rows carry distinct
    versions, so hashing the version still spreads them across salts."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(version), F.lit(num_salts))
    )
    partial = (
        salted.groupBy(*keys, "_salt")
        .agg(F.max_by(F.struct(*payload), version).alias("_row"), F.max(version).alias("_v"))
        .select(*keys, "_v", "_row.*")
    )
    # final phase re-runs the same argmax on at most num_salts rows per key
    return lww_latest(partial, keys, F.col("_v"), payload)


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    tiebreak: str,
    k: int,
    payload: list[str] | None = None,
    descending: bool = True,
) -> DataFrame:
    """Exact top-k rows per group WITHOUT sorting any whole group on a
    single task — the N>1 generalization of ``lww_latest``'s argmax.

    ``lww_latest_window``'s ``row_number`` form funnels every row of a
    group through one task's sort; a dominant group (one source holding
    half a 100 TB corpus) becomes the job's straggler. This form keeps
    the whole reduction k-bounded and parallel:

    1. partial: ``groupBy(keys, spark_partition_id())`` + ``slice(
       sort_array(collect_list(item)), 1, k)`` — map-side combine means
       each task contributes at most k rows per group it saw, and a
       dominant group's partials run across ALL tasks, not one;
    2. final: explode the partials and re-run the same k-bounded
       aggregate per group — at most ``input_partitions * k`` rows per
       group reach the final buffer, independent of group size.

    Ordering is struct-lexicographic over ``(*order_cols, tiebreak)``,
    all in the same direction (``descending`` flips the whole tuple);
    ``tiebreak`` must be unique within a group, which makes the result
    deterministic and the trailing payload fields order-irrelevant.
    Rows whose order columns are NULL follow Spark's struct ordering
    (NULLs first ascending) — coalesce upstream if that is not wanted.
    Output: keys, ``rank`` (1-based), order/tiebreak/payload columns
    under their original names.
    """
    payload = payload or []
    used = set(keys)
    fields = []
    for i, c in enumerate(order_cols):
        fields.append(F.col(c).alias(f"_o{i}"))
    fields.append(F.col(tiebreak).alias("_tb"))
    out_payload = [c for c in payload if c not in used
                   and c not in order_cols and c != tiebreak]
    fields.extend(F.col(c).alias(f"_p_{c}") for c in out_payload)
    item = F.struct(*fields)
    bounded = F.slice(
        F.sort_array(F.collect_list(item), asc=not descending), 1, k
    ).alias("_t")
    partial = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(*keys, "_pid")
        .agg(bounded)
    )
    merged = (
        partial.select(*keys, F.explode("_t").alias("_e"))
        .groupBy(*keys)
        .agg(
            F.slice(
                F.sort_array(F.collect_list("_e"), asc=not descending), 1, k
            ).alias("_t")
        )
    )
    return merged.select(
        *keys, F.posexplode("_t").alias("_pos", "_e")
    ).select(
        *keys,
        (F.col("_pos") + 1).cast("int").alias("rank"),
        *[F.col(f"_e._o{i}").alias(c) for i, c in enumerate(order_cols)],
        F.col("_e._tb").alias(tiebreak),
        *[F.col(f"_e._p_{c}").alias(c) for c in out_payload],
    )
