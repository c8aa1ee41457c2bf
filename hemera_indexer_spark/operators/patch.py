"""Partial-update ("patch") change events — column-wise CDC fold.

Real CDC feeds often ship updates that carry ONLY the changed columns
(MySQL binlog minimal row image, DynamoDB Streams UpdateItem, Debezium
incremental snapshots with column filters). The reference's jobs always
re-emit whole domain rows (e.g. token balances re-read the full row per
change, /root/reference/indexer/jobs/export_token_balances_job.py:66-86),
so its LWW upsert is whole-row argmax. A patch stream needs a different
law — per COLUMN, not per row:

- a NULL payload column in a patch event means UNCHANGED (not "set NULL"),
- ``op='delete'`` resets the row: columns set before the last delete never
  resurrect,
- final state per key = for each payload column, the value from the LAST
  event (by seq) that set it, restricted to events after the last delete;
  the row is live iff any non-delete event follows the last delete.

``patch_fold`` is the full-log fold (the oracle form). The incremental
form is ``LakeTable.merge_patch`` — write-time column coalesce driven by
``patch_fold_batch``, property-tested equal to this fold under the
engine's delivery contract (per-key in-seq-order across batches;
re-delivered duplicates of already-applied events allowed anywhere).

Physical shape: one hash shuffle on the key total — the last-delete
window and the per-column ``max_by`` groupBy share the same partitioning,
so Catalyst reuses one Exchange; the per-column argmax carries scalar agg
buffers (value, seq) per column, map-side combined. No join, no explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_set_by(col: str, seq: Column) -> Column:
    """Value of ``col`` at the greatest ``seq`` among rows where it is set.

    ``max_by`` ignores rows whose ordering expression is NULL, so gating
    the seq on non-NULL-ness makes "last non-null per column" a single
    built-in aggregate — scalar buffers, partial aggregation, no struct
    argmax."""
    return F.max_by(F.col(col), F.when(F.col(col).isNotNull(), seq))


def patch_fold(
    df: DataFrame,
    key_col: str,
    seq_col: str,
    payload_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Fold a patch change stream to its current state (live rows only).

    Output: one row per live key — ``key_col``, each payload column at its
    last-set value, and ``seq_col`` = the greatest surviving event seq
    (the row's version). Keys whose last delete has no later non-delete
    event are absent.

    Seqs must be unique per key (the change-log contract); events with
    ``op == delete_op`` contribute only their position (the reset point),
    never their payload.
    """
    is_del = F.col(op_col) == F.lit(delete_op)
    w = Window.partitionBy(key_col)
    last_del = F.max(F.when(is_del, F.col(seq_col))).over(w)
    live = df.withColumn("_last_del", last_del).where(
        ~is_del
        & (F.col("_last_del").isNull() | (F.col(seq_col) > F.col("_last_del")))
    )
    aggs = [last_set_by(c, F.col(seq_col)).alias(c) for c in payload_cols]
    aggs.append(F.max(seq_col).alias(seq_col))
    return live.groupBy(key_col).agg(*aggs).select(
        key_col, *payload_cols, seq_col
    )


def patch_fold_batch(
    df: DataFrame,
    key_col: str,
    seq_col: str,
    payload_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Batch-granular fold for the incremental merge: one row per key in
    the batch, carrying everything the column-wise merge law needs to
    combine with committed state in a single join — per-column setter
    seqs fence re-delivered duplicates without a per-event anti-join
    against the target.

    Output per key:

    - each payload column ``c`` at its last-set value among LIVE events
      (non-delete, after the batch's last delete), plus ``_seq__<c>`` =
      the seq of that setter (NULL when the batch never set ``c``),
    - ``_last_del``: greatest delete seq in the batch (NULL if none),
    - ``_live_seq``: greatest live-event seq (NULL if the batch leaves
      the key deleted),
    - ``seq_col``: greatest seq over ALL of the key's batch events —
      deletes and re-delivered duplicates included — so a committed
      row's version always advances past everything applied.
    """
    is_del = F.col(op_col) == F.lit(delete_op)
    w = Window.partitionBy(key_col)
    last_del = F.max(F.when(is_del, F.col(seq_col))).over(w)
    live = ~is_del & (
        F.col("_last_del").isNull() | (F.col(seq_col) > F.col("_last_del"))
    )
    rows = df.withColumn("_last_del", last_del).withColumn("_live", live)
    seq_if_set = lambda c: F.when(
        F.col("_live") & F.col(c).isNotNull(), F.col(seq_col)
    )
    aggs: list[Column] = []
    for c in payload_cols:
        aggs.append(F.max_by(F.col(c), seq_if_set(c)).alias(c))
        aggs.append(F.max(seq_if_set(c)).alias(f"_seq__{c}"))
    aggs += [
        F.max("_last_del").alias("_last_del"),
        F.max(F.when(F.col("_live"), F.col(seq_col))).alias("_live_seq"),
        F.max(seq_col).alias(seq_col),
    ]
    return rows.groupBy(key_col).agg(*aggs)
