"""Structured Streaming front-end for the CDC ingest.

The reference's stream loop is a hand-rolled micro-batch puller
(/root/reference/indexer/controller/stream_controller.py:74-107). The
batch ``StreamController`` is this engine's primary analog; this module is
the same sink driven by Spark Structured Streaming instead of a manual
loop — ``readStream`` over the change-log directory, ``foreachBatch`` into
the fenced LWW merge:

- **exactly-once**: Structured Streaming's checkpoint gives at-least-once
  file delivery across restarts; the sink is idempotent (LWW merge +
  batch-id fencing in the snapshot manifest), which together yield
  exactly-once — the standard ``foreachBatch`` idempotent-sink recipe.
- **ordering**: within a micro-batch, LWW-by-seq makes delivery order
  irrelevant; rollback events segment the batch exactly as in the batch
  controller.
- **confirmation delay** (the reference's ``--delay`` lag behind the chain
  head, cli/stream.py:222-229) maps to ``maxFilesPerTrigger`` + watermarks
  on downstream aggregations.

Schema evolution note: a running streaming query has a fixed source schema;
evolving the log (new column) requires a query restart — the same
operational rule real Structured Streaming deployments follow. The batch
controller handles evolution transparently; use it when the log evolves
mid-stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hemera_indexer_spark.functions import log_partition_col
from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import CHANGE_EVENT_SCHEMA


class StructuredIngest:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        log_dir: str,
        n_partitions: int,
        checkpoint_dir: str,
        merge_strategy: str = "auto",
        max_files_per_trigger: int | None = None,
        compact_max_deltas: int = 8,
        view_sink=None,
        fact_table: LakeTable | None = None,
        quarantine_dir: str | None = None,
        index_sink=None,
        fact_compact_max_files: int | None = None,
        fact_compact_small_rows: int | None = 1_000_000,
        fact_retention_lag_seqs: int | None = None,
        event_schema=None,
        catalog=None,
        catalog_tables: list[str] | None = None,
    ):
        # ``event_schema``: the log's event schema (default: the engine's
        # CHANGE_EVENT_SCHEMA). A streaming query's source schema is FIXED
        # for its lifetime, so logs carrying extra payload columns (an
        # embedding column, an evolved field) must declare them here — the
        # batch controller discovers them from footers instead.
        self.event_schema = event_schema
        self.spark = spark
        self.table = table
        self.log_dir = log_dir
        self.n_partitions = n_partitions
        self.checkpoint_dir = checkpoint_dir
        # the streaming path has no per-batch ratio feedback loop (each
        # micro-batch is handed to us by the engine); 'auto' resolves to
        # 'sql', the right pick for update-heavy CDC micro-batches
        self.merge_strategy = "sql" if merge_strategy == "auto" else merge_strategy
        self.max_files_per_trigger = max_files_per_trigger
        self.compact_max_deltas = compact_max_deltas
        # optional IncrementalAggSink: refreshed after each fenced batch
        # (metadata-fingerprint diff -> bucket-pruned recompute)
        self.view_sink = view_sink
        # optional append-only history table (state+facts dual output, the
        # FactSink analog): insert_if_absent per segment is idempotent by
        # (key, seq), so at-least-once replayed micro-batches converge
        # without a separate fact fence
        self.fact_table = fact_table
        # fact small-file maintenance parity with the batch controller's
        # FactSink(compact_max_files=): bin-pack over-threshold buckets in
        # the per-batch maintenance slot; None = never
        self.fact_compact_max_files = fact_compact_max_files
        self.fact_compact_small_rows = fact_compact_small_rows
        # rolling retention parity with FactSink(retention_lag_seqs=):
        # truncate below (max_seq - lag) once whole files fall under the
        # cutoff — the same file-granular guard, zero steady-state cost
        self.fact_retention_lag_seqs = fact_retention_lag_seqs
        # dead-letter parity with the batch controller (see
        # StreamController.__init__): malformed events diverted per
        # micro-batch to <quarantine_dir>/batch=<id>/ and excluded from
        # merge/rollback. A micro-batch exposes no Parquet footers, so
        # there is no footer fast path here — enabling this costs one
        # filtered scan per batch (the batch controller's 'always' mode).
        self.quarantine_dir = quarantine_dir
        # optional SignatureIndexSink: synced after each fenced batch via
        # the same after_commit hook the batch controller drives — the
        # index's own source-version cursor absorbs replayed batches, and
        # its log fence rides table.committed_epoch() (the LOG-epoch
        # domain, same rule as the view sink above)
        self.index_sink = index_sink
        # catalog advance parity with the batch controller: after each
        # fenced micro-batch (including the replayed/no-op arms, whose
        # sink refreshes may still move index tables), re-pin the named
        # tables in one catalog commit so catalog readers see the batch's
        # full multi-table effect atomically
        self.catalog = catalog
        self.catalog_tables = catalog_tables

    def _advance_catalog(self) -> None:
        if self.catalog is not None:
            self.catalog.advance(self.catalog_tables)
            self.catalog.expire()

    # -------------------------------------------------------------- sink
    @property
    def _fence_key(self) -> str:
        # Namespaced per checkpoint location: streaming batch_ids are a
        # DIFFERENT counter from batch-controller epoch ids (they restart at
        # 0 for every new checkpoint dir, over different file groupings), so
        # they must never be fenced against the epoch manifest — that would
        # silently skip micro-batches on any table that already ingested
        # batch epochs. A fresh checkpoint dir gets a fresh fence; replayed
        # overlap is absorbed by the idempotent LWW merge.
        return f"stream_hwm:{os.path.normpath(self.checkpoint_dir)}"

    def stream_hwm(self) -> int:
        return int(self.table.snapshot["properties"].get(self._fence_key, -1))

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch handler: segment at rollbacks, LWW-merge, fence by a
        per-checkpoint stream high-water mark committed atomically with the
        batch's final merge (replayed batches after a crash are no-ops)."""
        # Replayed batch after a crash (state already fenced): the view
        # flip / fact apply may have been lost — both converge by
        # RE-RUNNING the same segmented loop below with the STATE
        # mutations skipped. A flat "re-insert all non-rollback events"
        # would resurrect rolled-back history: a replayed batch whose
        # rollback invalidated seqs that were never re-delivered must
        # re-apply the rollback DELETES too, exactly like the batch
        # controller's full-loop re-drive. The view fence lives in the
        # LOG-epoch domain (the table's committed epoch), never the
        # per-checkpoint stream batch_id counter — mixing the two could
        # move the fence forward past epochs a later batch controller
        # still needs to drive through this sink.
        if self.quarantine_dir is not None:
            from hemera_indexer_spark.streaming.controller import (
                _malformed_reason,
            )

            # deterministic per-batch path + overwrite = idempotent under
            # the engine's at-least-once batch replays
            qdir = os.path.join(self.quarantine_dir, f"batch={batch_id:05d}")
            (
                batch_df.withColumn("quarantine_reason", _malformed_reason())
                .where(F.col("quarantine_reason").isNotNull())
                .write.mode("overwrite")
                .parquet(qdir)
            )
            batch_df = batch_df.where(_malformed_reason().isNull())
        state_done = batch_id <= self.stream_hwm()
        if state_done and self.fact_table is None:
            if self.view_sink is not None:
                self.view_sink.refresh(self.table.committed_epoch())
            if self.index_sink is not None:
                self.index_sink.after_commit(self.table.committed_epoch(), True)
            self._advance_catalog()
            return
        if state_done:
            self.fact_table.refresh()
        # Segment by (epoch, seq), NOT seq alone. The log's replay order is
        # epochs in order, seq within an epoch — a single streaming batch
        # can span several epochs, and a LATER epoch may legitimately carry
        # a LOWER seq (re-delivered duplicates, the generator's idempotence
        # case). Seq-only segmentation mis-files such events on the wrong
        # side of a rollback: a duplicate of a rolled-back event arriving in
        # a post-rollback EPOCH must re-apply (it is a fresh delivery after
        # the repair, exactly how the batch controller treats it by running
        # each epoch as its own commit) — measured as a one-row divergence
        # from the oracle before this fix. Struct comparison gives the
        # (epoch, seq) tuple order (both numeric).
        rollbacks = sorted(
            batch_df.where(F.col("rollback_to_seq").isNotNull())
            .select("epoch", "seq", "partition", "rollback_to_seq")
            .collect(),
            key=lambda r: (r["epoch"], r["seq"]),
        )
        updates = batch_df.where(F.col("op") != "rollback")

        def _pos(rb):
            return F.struct(F.lit(rb["epoch"]).alias("epoch"), F.lit(rb["seq"]).alias("seq"))

        # fact dedup-scan pruning hint: one tiny action over the batch
        min_seq = None
        if self.fact_table is not None:
            row = updates.agg(F.min("seq").alias("mn")).first()
            min_seq = int(row["mn"]) if row["mn"] is not None else None

        ev_pos = F.struct(F.col("epoch"), F.col("seq"))
        bounds = list(rollbacks) + [None]
        lo = None
        for rb in bounds:
            seg = updates
            if lo is not None:
                seg = seg.where(ev_pos > _pos(lo))
            if rb is not None:
                seg = seg.where(ev_pos < _pos(rb))
            if self.fact_table is not None:
                self.fact_table.insert_if_absent(seg, min_seq=min_seq)
            if rb is None:
                if not state_done:
                    self.table.merge_upsert(
                        seg,
                        strategy=self.merge_strategy,
                        properties_update={self._fence_key: batch_id},
                    )
            else:
                if not state_done:
                    self.table.merge_upsert(seg, strategy=self.merge_strategy)
                cond = (
                    log_partition_col(F.col("doc_id"), self.n_partitions)
                    == F.lit(rb["partition"])
                ) & (F.col("seq") >= F.lit(rb["rollback_to_seq"]))
                if not state_done:
                    self.table.delete_keys_where(
                        cond, seq_at_least=rb["rollback_to_seq"]
                    )
                if self.fact_table is not None:
                    # the FactSink rollback analog: history rows of the
                    # invalidated range are removed (nothing to resurrect
                    # in an append-only log)
                    self.fact_table.delete_where(
                        cond, seq_at_least=rb["rollback_to_seq"]
                    )
                lo = rb
        if not state_done:
            self.table.maybe_compact(
                max_deltas=self.compact_max_deltas, strategy=self.merge_strategy
            )
        if self.fact_table is not None and (
            self.fact_compact_max_files is not None
            or self.fact_retention_lag_seqs is not None
        ):
            # no tenant mode on the structured path: a CAS race here means
            # an accidental double runner — fail loudly (the engine-wide
            # ConcurrentCommitError discipline), never mask it
            self.fact_table.refresh()
            if self.fact_retention_lag_seqs is not None:
                seqs = [
                    f["max_seq"]
                    for f in self.fact_table.snapshot["files"]
                    if f.get("max_seq") is not None
                ]
                if seqs:
                    cutoff = max(seqs) - self.fact_retention_lag_seqs
                    if any(s_ < cutoff for s_ in seqs):
                        self.fact_table.truncate_before(cutoff)
                        self.fact_table.refresh()
            if self.fact_compact_max_files is not None:
                self.fact_table.compact_files(
                    max_files=self.fact_compact_max_files,
                    small_rows=self.fact_compact_small_rows,
                )
        if self.view_sink is not None:
            # same epoch domain as the batch controller's after_commit path
            self.view_sink.refresh(self.table.committed_epoch())
        if self.index_sink is not None:
            self.index_sink.after_commit(self.table.committed_epoch(), True)
        self._advance_catalog()

    # -------------------------------------------------------------- query
    def start(self, available_now: bool = True):
        """Start the streaming query. ``available_now=True`` drains all
        currently-available files then stops at a consistent point (the
        reference's catch-up-then-sleep loop)."""
        reader = (
            self.spark.readStream.schema(self.event_schema or CHANGE_EVENT_SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        events = reader.parquet(self.log_dir)
        writer = (
            events.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def hourly_event_counts_stream(
    spark: SparkSession, events_dir: str, schema, watermark: str = "1 hour"
):
    """Windowed streaming aggregation with late-data watermark — the
    streaming analog of the reference's hourly block-ts mapper
    (/root/reference/indexer/jobs/export_blocks_job.py:105-113)."""
    ev = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(events_dir)
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.min("event_id").alias("min_event_id"))
    )
