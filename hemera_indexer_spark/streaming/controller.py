"""StreamController — the epoch micro-batch driver loop.

Analog of the reference's StreamController.action
(/root/reference/indexer/controller/stream_controller.py:50-112): read the
checkpoint, compute the next range, run the batch, commit data THEN cursor —
except here the data files and the cursor (the per-partition manifest) land
in ONE atomic snapshot commit, so the crash window between "data committed"
and "cursor committed" that the reference papers over with idempotent upserts
does not exist at all. Re-running an epoch after any crash is additionally a
no-op because the MERGE is LWW with target-wins-on-tie (idempotent) and the
final commit is epoch-fenced.

**Catch-up batching** (the reference's ``block_batch_size``,
/root/reference/indexer/controller/stream_controller.py:158-161): when the
controller is behind, consecutive epochs are merged in ONE commit, dividing
the per-commit serial cost (Catalyst planning, stage barriers, snapshot
write) by the group size — the dominant scaling lever on many-core runs.
Grouping is only seq-order-equivalent when the group provably contains no
rollback event: the log may re-deliver old events (original seq) in later
epochs, and the oracle applies epochs in order, so a duplicate delivered
AFTER a rollback epoch must not be folded into the same merge as the
rollback (it would be wiped instead of re-applied). The Parquet-footer pass
proves rollback absence per epoch (``rollback_to_seq`` null counts), so the
grouping rule is: batch maximal rollback-free runs of epochs (capped at
``max_batch_epochs``); any epoch that may contain a rollback runs alone
under full segmentation. Footer metadata for upcoming epochs is prefetched
on a background thread while the current group's merge runs on the cluster.

Reorg-rollback (/root/reference/indexer/controller/reorg_controller.py:28-93):
a ``rollback`` event with ``rollback_to_seq=S`` on log partition ``p``
invalidates every state row on ``p`` with ``seq >= S``; corrected events that
follow re-insert repaired rows. The epoch's events are segmented at rollback
sequence numbers (comparison is on ``seq``, never file order, so shuffled
delivery is harmless) and applied segment → rollback → segment. When the log
carries a per-partition hash chain, divergences are *detected* too
(streaming/consensus.py, the check_block_consensus_job analog) and become
synthetic rollbacks.

Retry taxonomy (/root/reference/indexer/controller/stream_controller.py:
123-148): transient I/O / RPC-transport failures retry the epoch group with
backoff (safe: partial commits are fenced and the merge is idempotent);
deterministic errors (bad schema, logic) crash immediately.

Additive schema evolution: new columns appearing in epoch files (detected
from Parquet footers, no data scan) are ALTER-ADDed to the table before the
merge; rows last written earlier read as NULL.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import zlib
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.functions import log_partition_col
from hemera_indexer_spark.lake import ConcurrentCommitError, LakeTable
from hemera_indexer_spark.lake.table import VERSION_FILE
from hemera_indexer_spark.schemas import CHANGE_EVENT_SCHEMA, METRICS_SCHEMA
from hemera_indexer_spark.streaming import consensus  # noqa: submodule import
# (safe under partial package init: Python >=3.5 falls back to sys.modules
# for submodule-from-package imports during circular initialization)

_ARROW_TO_SPARK = {
    pa.string(): T.StringType(),
    pa.large_string(): T.StringType(),
    pa.int64(): T.LongType(),
    pa.int32(): T.IntegerType(),
    pa.float64(): T.DoubleType(),
    pa.float32(): T.FloatType(),
    pa.bool_(): T.BooleanType(),
}

# Transient failure classes worth retrying (I/O hiccups, executor loss,
# transport resets). Py4J surfaces JVM-side transient errors with these
# markers in the message; deterministic analysis/logic errors never match.
_RETRIABLE_TYPES = (IOError, OSError, TimeoutError, ConnectionError)
_RETRIABLE_MARKERS = (
    "Py4JNetworkError",
    "Connection reset",
    "ExecutorLostFailure",
    "FetchFailed",
    "Unable to acquire",
)


# The closed op domain of the change log (FIXTURES.md §2; the reference's
# item-type dispatch rejects unknown domain types the same way,
# /root/reference/indexer/utils/collection_utils.py).
KNOWN_OPS = ("insert", "update", "delete", "rollback")


def _malformed_reason() -> F.Column:
    """NULL for a well-formed event; otherwise a short reason tag. The
    checks mirror the engine's hard assumptions: ``doc_id`` is the LWW key,
    ``seq`` drives ordering/fencing/rollback spans, ``op`` must be in the
    closed domain, and a rollback without a target seq is unactionable."""
    return (
        F.when(F.col("doc_id").isNull(), F.lit("null_key"))
        .when(F.col("seq").isNull(), F.lit("null_seq"))
        .when(
            F.col("op").isNull() | ~F.col("op").isin(*KNOWN_OPS),
            F.lit("unknown_op"),
        )
        .when(
            (F.col("op") == "rollback") & F.col("rollback_to_seq").isNull(),
            F.lit("rollback_without_target"),
        )
    )


class RepairLockHeld(RuntimeError):
    """Another runner holds the repair lock (the reference refuses to start
    a second fixing process the same way, reorg_controller.py:168-179)."""


def is_retriable(exc: BaseException) -> bool:
    if isinstance(exc, _RETRIABLE_TYPES):
        return True
    msg = f"{type(exc).__name__}: {exc}"
    return any(m in msg for m in _RETRIABLE_MARKERS)


def _spark_type(at: pa.DataType) -> T.DataType:
    if at in _ARROW_TO_SPARK:
        return _ARROW_TO_SPARK[at]
    if pa.types.is_list(at):
        return T.ArrayType(_spark_type(at.value_type))
    raise TypeError(f"unsupported evolved column type: {at}")


@dataclass
class EpochStats:
    epoch: int
    events: int
    rollbacks: int
    wall_ms: int
    skipped: bool = False
    retries: int = 0
    strategy: str = ""  # physical merge used ('' for skipped groups)
    quarantined: int = 0  # malformed events routed to the dead-letter dir


@dataclass
class RunStats:
    epochs: list = field(default_factory=list)

    @property
    def total_events(self) -> int:
        return sum(e.events for e in self.epochs if not e.skipped)

    @property
    def total_wall_ms(self) -> int:
        return sum(e.wall_ms for e in self.epochs if not e.skipped)


class StreamController:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        log_dir: str,
        n_partitions: int,
        merge_strategy: str = "auto",
        compact_max_deltas: int = 8,
        max_batch_epochs: int = 8,
        max_batch_rows: int = 16_000_000,
        fact_table: LakeTable | None = None,
        max_retries: int = 2,
        retry_backoff_s: float = 0.5,
        tenant_cas_retries: int = 64,
        confirmation_lag: int = 0,
        hash_tail_len: int = 64,
        sinks: list | None = None,
        tenant_col: str | None = None,
        tenant_id=None,
        quarantine_dir: str | None = None,
        quarantine_scan: str = "footer",
        check_policy: str = "abort",
        rebucket_target_rows: int | None = None,
        fact_compact_max_files: int | None = None,
        fact_compact_small_rows: int | None = 1_000_000,
        fact_retention_lag_seqs: int | None = None,
        catalog=None,
        catalog_tables: list[str] | None = None,
        metrics_dir: str | None = None,
    ):
        # Dead-letter quarantine (the reference logs-and-skips items its
        # exporters cannot convert rather than poisoning the batch,
        # /root/reference/indexer/exporters/postgres_item_exporter.py:
        # 104-118): when ``quarantine_dir`` is set, malformed events (NULL
        # doc_id/seq/op, unknown op, rollback without a target — see
        # ``_malformed_reason``) are written to
        # ``<quarantine_dir>/epoch=<fence>/`` with a ``quarantine_reason``
        # column and EXCLUDED from the merge, rollback segmentation, and
        # consensus, instead of producing undefined LWW/fence behavior.
        # The dead-letter layout is partitioned by SOURCE epoch (parsed
        # from the file path) with dynamic partition overwrite, so
        # retries/re-drives are idempotent even under a DIFFERENT epoch
        # grouping; in tenant mode the dir is namespaced per tenant.
        # ``quarantine_scan``:
        #   'footer' (default) — the scan-and-divert pass only runs for
        #     groups whose Parquet footers cannot PROVE identity columns
        #     null-free (null_count stats), i.e. zero extra cost on clean
        #     logs. Footer-INVISIBLE malformations (all identity columns
        #     non-null) are NOT caught in this mode: an unknown op string
        #     passes through as an ordinary upsert, and a rollback whose
        #     rollback_to_seq is NULL is silently excluded from the merge
        #     (the pre-existing no-quarantine behavior for both).
        #   'always' — every group pays one extra filtered scan and also
        #     catches those two footer-invisible classes.
        # Hash-chained logs: a diverted event breaks chain continuity by
        # construction, so quarantining from a consensus-checked log is
        # refused loudly (see _process_group_once) rather than letting a
        # false divergence degrade into a destructive synthetic rollback.
        # With quarantine_dir=None behavior is unchanged (malformed rows
        # from a foreign writer surface loudly in merge_upsert's identity
        # checks or fold into NULL-key groups — the pre-existing contract).
        if quarantine_scan not in ("footer", "always"):
            raise ValueError(
                f"quarantine_scan must be 'footer' or 'always', "
                f"got {quarantine_scan!r}"
            )
        if quarantine_dir is not None and quarantine_scan == "footer":
            # An operator who enabled quarantine_dir plausibly expects ALL
            # malformed events diverted; footer mode trades that for zero
            # cost on clean logs. Say so once, at runtime, not only in docs.
            import warnings

            warnings.warn(
                "quarantine_scan='footer' catches only footer-provable "
                "malformations: an unknown op string still merges as an "
                "ordinary upsert, and a rollback with NULL rollback_to_seq "
                "is silently dropped from the merge. Pass "
                "quarantine_scan='always' to divert those two classes too "
                "(one extra filtered scan per group).",
                stacklevel=2,
            )
        # ``check_policy``: what happens when the state table has CHECK
        # constraints (LakeTable.set_check) and a batch violates them.
        #   'abort'      — default: merge_upsert raises CheckViolationError
        #                  (loud stop; fences untouched; fix and re-drive).
        #   'quarantine' — divert the violating EVENTS (op insert/update
        #                  only; delete/rollback are control events whose
        #                  payloads are semantically void and are never
        #                  diverted) to the dead-letter dir with reason
        #                  'check:<name>', merge the clean remainder, and
        #                  continue — the same disposition as envelope
        #                  malformations. Requires ``quarantine_dir``.
        # Domain checks are not footer-provable, so 'quarantine' runs the
        # divert scan on every group regardless of ``quarantine_scan``;
        # on a hash-chained log a diverted event breaks chain continuity
        # exactly like an envelope divert, and the same loud refusal
        # applies. ``replay_quarantined`` re-evaluates the CURRENT check
        # set: still-violating rows stay dead-lettered (never crash the
        # replay merge).
        if check_policy not in ("abort", "quarantine"):
            raise ValueError(
                f"check_policy must be 'abort' or 'quarantine', "
                f"got {check_policy!r}"
            )
        if check_policy == "quarantine" and quarantine_dir is None:
            raise ValueError(
                "check_policy='quarantine' requires quarantine_dir"
            )
        self.check_policy = check_policy
        self.quarantine_dir = quarantine_dir
        self.quarantine_scan = quarantine_scan
        self.spark = spark
        self.table = table
        self.log_dir = log_dir
        self.n_partitions = n_partitions
        # 'auto' picks the physical merge per batch from the OBSERVED
        # winners/events ratio of the previous commit: update-heavy batches
        # (ratio <= 0.5) take 'sql' — partial max_by combines map-side, so
        # only per-split winners cross the two exchanges (~2-3x fewer
        # shuffled bytes at dedup ratio ~6, measured 0.80-0.90 N->4N
        # scaling efficiency vs 0.63-0.74 for the full-payload window) —
        # while insert-heavy batches (nothing to combine) take 'jvm', whose
        # single exchange moves each row once. First batch defaults to
        # 'sql' (CDC replays are update-heavy by nature).
        self.merge_strategy = merge_strategy
        self._auto_pick = "sql"
        # merge-on-read: fold a bucket back to base once this many delta
        # files accumulate (bounds read amplification)
        self.compact_max_deltas = compact_max_deltas
        # optional grow-only layout policy (maybe_rebucket) run in the same
        # post-group maintenance slot as compaction; None = never rebucket
        self.rebucket_target_rows = rebucket_target_rows
        # Catalog advance (lake/catalog.py): when set, each committed
        # group ends by re-pinning ``catalog_tables`` (default: every
        # registered table) at their current versions in ONE catalog
        # commit, so catalog readers always see the state table and its
        # index sinks at a mutually-consistent point — the read-side
        # atomicity the per-table fences alone can't give a JOIN.
        self.catalog = catalog
        self.catalog_tables = catalog_tables
        # Per-epoch processing journal (the queryable face of RunStats —
        # the reference keeps per-job record rows in PG the same way,
        # /root/reference/indexer/controller/dispatcher/base_dispatcher.py
        # job bookkeeping): when ``metrics_dir`` is set, every committed
        # group appends one row per processed epoch (events, rollbacks,
        # wall_ms, strategy, quarantined, tenant) into a tiny fact
        # LakeTable there, keyed by ``epoch@state_version`` so a repair or
        # restore re-drive journals a SECOND attempt instead of being
        # silently deduped. Best-effort observability, never load-bearing:
        # the write happens AFTER the state commit, so a crash between the
        # two loses only the journal row (the fenced re-run skips the
        # group and writes nothing), and the insert path is the unfenced
        # idempotent (key, seq) anti-join — a retried journal write cannot
        # double-count.
        self.metrics_dir = metrics_dir
        self._metrics_table = None
        # catch-up batching caps: how many backlogged rollback-free epochs may
        # share one merge+commit, and a row budget per commit (from footer
        # counts, no scan) so a deep backlog cannot produce an unbounded
        # single shuffle — size max_batch_rows to executor memory (a 32M-row
        # merge against an 8g heap measured ~1.8x slower than 2x16M: spill).
        self.max_batch_epochs = max(1, max_batch_epochs)
        self.max_batch_rows = max_batch_rows
        # exporter fan-out (create_item_exporters analog): every sink
        # consumes the SAME cached segment scan, concurrently with the
        # primary state merge. ``fact_table`` is kept as sugar for the
        # common state+history dual-sink setup.
        from hemera_indexer_spark.streaming.sinks import FactSink

        self.fact_table = fact_table
        self.sinks = list(sinks or [])
        if fact_table is not None:
            # fact_compact_max_files: history-table small-file maintenance
            # (bin-pack buckets beyond this many files after each group);
            # None = never — the historical default
            self.sinks.append(
                FactSink(
                    fact_table,
                    compact_max_files=fact_compact_max_files,
                    compact_small_rows=fact_compact_small_rows,
                    retention_lag_seqs=fact_retention_lag_seqs,
                )
            )
        self.max_retries = max_retries
        self.retry_backoff_s = retry_backoff_s
        # Separate budget for tenant-mode snapshot CAS contention (expected
        # traffic when N controllers share a table) — see _process_group.
        self.tenant_cas_retries = tenant_cas_retries
        # confirmation delay: stay this many epochs behind the log head (the
        # reference's --delay lag behind the chain head,
        # /root/reference/cli/stream.py:222-229) so shallow forks resolve
        # upstream before ingestion ever sees them.
        self.confirmation_lag = max(0, confirmation_lag)
        # how many recent (seq, chain_hash) pairs to retain per partition in
        # the manifest — the cross-batch fork-location window. A fork whose
        # ancestor is inside the tail rolls back to ancestor+1; older forks
        # degrade to a bounded floor / full partition re-sync.
        self.hash_tail_len = max(1, hash_tail_len)
        # Multi-tenant ingest (the reference's multi-chain address exporter
        # stamps chain_id onto every exported item,
        # /root/reference/indexer/exporters/
        # hemera_address_postgres_item_exporter.py:42-75): one controller
        # instance per tenant log, each stamping ``tenant_col = tenant_id``
        # onto every applied row, with rollback deletes scoped to the
        # tenant so one tenant's reorg can never touch another's rows.
        # REQUIREMENT: doc_ids must be unique ACROSS tenants sharing a
        # table (the LWW key stays key_col alone — same-key rows from two
        # tenants would LWW-overwrite each other; the reference has the
        # same shape with per-chain address spaces). The tenant column is
        # evolved additively into the state table and every LakeTable-
        # backed sink up front, so pre-existing single-tenant rows read as
        # NULL tenant.
        self.tenant_col = tenant_col
        self.tenant_id = tenant_id
        if tenant_col is not None:
            if tenant_id is None:
                raise ValueError("tenant_col requires a tenant_id value")
            if isinstance(tenant_id, bool) or not isinstance(
                tenant_id, (int, str)
            ):
                raise ValueError(
                    f"tenant_id must be int or str, got {type(tenant_id).__name__}"
                )
            dt = T.LongType() if isinstance(tenant_id, int) else T.StringType()
            self._tenant_field = T.StructField(tenant_col, dt, True)
            targets = [self.table] + [
                st
                for s in self.sinks
                if (st := getattr(s, "table", None)) is not None
                and hasattr(st, "evolve_schema")
            ]
            from hemera_indexer_spark.lake.table import ConcurrentCommitError

            for st in targets:
                # several tenant controllers may evolve the shared column
                # concurrently; refresh-and-retry — after a refresh the
                # already-present column makes evolve a commit-free no-op
                for attempt in range(3):
                    try:
                        st.refresh()
                        st.evolve_schema([self._tenant_field])
                        break
                    except ConcurrentCommitError:
                        if attempt == 2:
                            raise
            # a LakeTable-backed sink sharing a table between tenants must
            # fence per tenant too (see _state_manifest below)
            for s in self.sinks:
                if hasattr(s, "fence_key") and s.fence_key is None:
                    s.fence_key = f"tenant_fence:{tenant_id}"
            if self.quarantine_dir is not None:
                # per-tenant namespace: dynamic epoch-partition overwrite
                # would let two tenant controllers sharing one dir clobber
                # each other's dead-letter rows
                self.quarantine_dir = os.path.join(
                    self.quarantine_dir, f"tenant={tenant_id}"
                )

    # ------------------------------------------------- tenant-aware fencing
    # In multi-tenant mode several controllers (one per tenant log) share
    # ONE state table, so the snapshot's single manifest/epoch fence would
    # collide: tenant A committing epoch 7 must not make tenant B skip its
    # own epochs 0..7. Each tenant therefore keeps its manifest (offsets,
    # lineage, hash tails, epoch fence) in a NAMESPACED table property,
    # committed atomically with the data in the same snapshot flip — the
    # exact mechanism StructuredIngest uses for its per-checkpoint stream
    # HWM. Single-tenant mode keeps the plain snapshot manifest.
    @property
    def _tenant_man_key(self) -> str:
        return f"tenant_manifest:{self.tenant_id}"

    def _state_manifest(self) -> dict:
        if self.tenant_col is None:
            return self.table.snapshot["manifest"]
        raw = self.table.snapshot["properties"].get(self._tenant_man_key)
        if raw:
            return json.loads(raw)
        return {"epoch_id": -1, "offsets": {}, "lineage": []}

    def _state_committed_epoch(self) -> int:
        return self._state_manifest()["epoch_id"]

    def _state_offsets(self) -> dict[int, int]:
        return {
            int(k): v for k, v in self._state_manifest()["offsets"].items()
        }

    # ------------------------------------------------------------- discovery
    def available_epochs(self) -> list[int]:
        out = []
        for d in sorted(os.listdir(self.log_dir)):
            if d.startswith("epoch="):
                out.append(int(d.split("=")[1]))
        return sorted(out)

    def _epoch_files(self, epoch: int) -> list[str]:
        pat = os.path.join(self.log_dir, f"epoch={epoch:05d}", "partition=*", "*.parquet")
        return sorted(glob.glob(pat))

    # ------------------------------------------------------- epoch metadata
    def _epoch_event_schema(self, files: list[str]) -> T.StructType:
        """Union of the declared event schema and any evolved columns found
        in the epoch's file footers."""
        return self._epoch_meta(files)["schema"]

    def _epoch_meta(self, files: list[str]) -> dict:
        """ONE threaded pass over the epoch files' Parquet footers yields
        everything the driver needs to plan the batch — no Spark job:

        - the evolved event schema (footer schemas),
        - per-partition lineage: row counts + min/max(seq) (footer column
          stats; the partition id comes from the directory name),
        - whether any rollback event can exist (``rollback_to_seq`` is
          non-null exactly on rollback events, so a file whose footer says
          null_count == num_rows provably has none; a footer with missing
          stats conservatively counts as 'maybe').

        Falls back to a Spark scan only for the rare epochs that do contain
        rollbacks (handled by the caller)."""
        base = CHANGE_EVENT_SCHEMA
        known = set(base.fieldNames())

        def one(f: str) -> dict:
            md = pq.read_metadata(f)
            sch = md.schema.to_arrow_schema()
            extra = {
                n: _spark_type(sch.field(n).type)
                for n in sch.names
                if n not in known
            }
            names = sch.names
            seq_i = names.index("seq")
            rb_i = names.index("rollback_to_seq")
            id_cols = [
                names.index(c) for c in ("seq", "doc_id", "op") if c in names
            ]
            mn, mx, rb_nulls, rb_unknown = None, None, 0, False
            # a file missing an identity column entirely reads as all-NULL
            # under the declared schema — malformed by construction
            maybe_malformed = len(id_cols) < 3
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(seq_i).statistics
                if st is not None and st.has_min_max:
                    mx = st.max if mx is None else max(mx, st.max)
                    mn = st.min if mn is None else min(mn, st.min)
                rst = md.row_group(rg).column(rb_i).statistics
                nc = rst.null_count if rst is not None else None
                if nc is None:
                    rb_unknown = True  # missing stat: assume rollback possible
                else:
                    rb_nulls += nc
                # identity columns (key/seq/op): a null_count of exactly 0
                # PROVES the row group has no null-identity event; anything
                # else (nulls present, or the stat missing) flags the epoch
                # for the quarantine scan.
                for ci in id_cols:
                    cst = md.row_group(rg).column(ci).statistics
                    if (
                        cst is None
                        or not cst.has_null_count
                        or cst.null_count > 0
                    ):
                        maybe_malformed = True
                        break
            part = int(os.path.basename(os.path.dirname(f)).split("=")[1])
            return {
                "partition": part,
                "rows": md.num_rows,
                "min_seq": mn,
                "max_seq": mx,
                "maybe_rollback": rb_unknown or rb_nulls < md.num_rows,
                "maybe_malformed": maybe_malformed,
                "extra": extra,
                "has_hash_chain": consensus.has_hash_chain(names),
            }

        with ThreadPoolExecutor(max_workers=8) as ex:
            infos = list(ex.map(one, files))
        extra: dict[str, T.DataType] = {}
        per_part: dict[int, dict] = {}
        maybe_rollback = False
        maybe_malformed = False
        has_hash_chain = bool(infos)
        for i in infos:
            extra.update(i["extra"])
            maybe_malformed = maybe_malformed or i["maybe_malformed"]
            p = per_part.setdefault(
                i["partition"],
                {"partition": i["partition"], "cnt": 0, "mx": None, "mn": None},
            )
            p["cnt"] += i["rows"]
            if i["max_seq"] is not None:
                p["mx"] = i["max_seq"] if p["mx"] is None else max(p["mx"], i["max_seq"])
            if i["min_seq"] is not None:
                p["mn"] = i["min_seq"] if p["mn"] is None else min(p["mn"], i["min_seq"])
            maybe_rollback = maybe_rollback or i["maybe_rollback"]
            has_hash_chain = has_hash_chain and i["has_hash_chain"]
        fields = list(base.fields) + [
            T.StructField(n, t, True) for n, t in sorted(extra.items())
        ]
        return {
            "schema": T.StructType(fields),
            "lineage": list(per_part.values()),
            "maybe_rollback": maybe_rollback,
            "maybe_malformed": maybe_malformed,
            "has_hash_chain": has_hash_chain,
        }

    # ------------------------------------------------------------------- run
    def run(self, max_epochs: int | None = None) -> RunStats:
        stats = RunStats()
        done = self._committed_floor()
        avail = self.available_epochs()
        if self.confirmation_lag and avail:
            head = avail[-1]
            avail = [e for e in avail if e <= head - self.confirmation_lag]
        todo = [e for e in avail if e > done]
        if max_epochs is not None:
            todo = todo[:max_epochs]
        if not todo:
            return stats

        # prefetch footer metadata for upcoming epochs on background threads
        # while the cluster is busy with the current group's merge
        prefetch = ThreadPoolExecutor(max_workers=2)
        window = 2 * self.max_batch_epochs
        futures = {
            e: prefetch.submit(self._epoch_meta, self._epoch_files(e))
            for e in todo[:window]
        }
        try:
            i = 0
            while i < len(todo):
                # top up the prefetch window
                for e in todo[i : i + window]:
                    if e not in futures:
                        futures[e] = prefetch.submit(
                            self._epoch_meta, self._epoch_files(e)
                        )
                # greedy group: maximal run of rollback-free epochs (capped);
                # a rollback-suspect epoch always runs alone.
                group, metas, rows = [], [], 0
                while i < len(todo) and len(group) < self.max_batch_epochs:
                    e = todo[i]
                    meta = futures.pop(e).result()
                    n_rows = sum(r["cnt"] for r in meta["lineage"])
                    if group and (
                        meta["maybe_rollback"]
                        or (self.max_batch_rows and rows + n_rows > self.max_batch_rows)
                    ):
                        futures[e] = prefetch.submit(lambda m=meta: m)
                        break
                    group.append(e)
                    metas.append(meta)
                    rows += n_rows
                    i += 1
                    if meta["maybe_rollback"]:
                        break
                group_stats = self._process_group(group, metas)
                stats.epochs.extend(group_stats)
                if self.metrics_dir:
                    self._record_metrics(group_stats)
        finally:
            prefetch.shutdown(wait=False)
        return stats

    def _metrics(self) -> LakeTable:
        """Lazy-open (or create) the metrics journal fact table. A
        creation race between tenant controllers sharing one journal
        degrades to load-after-lose."""
        if self._metrics_table is None:
            version_file = os.path.join(
                self.metrics_dir, "meta", VERSION_FILE
            )
            if os.path.exists(version_file):
                self._metrics_table = LakeTable.load(
                    self.spark, self.metrics_dir
                )
            else:
                try:
                    self._metrics_table = LakeTable.create(
                        self.spark,
                        self.metrics_dir,
                        METRICS_SCHEMA,
                        num_buckets=1,
                        key_col="metric_id",
                        properties={"table_type": "fact"},
                    )
                except (ConcurrentCommitError, FileExistsError):
                    self._metrics_table = LakeTable.load(
                        self.spark, self.metrics_dir
                    )
        return self._metrics_table

    def _record_metrics(self, epoch_stats: list) -> None:
        """Append one journal row per PROCESSED epoch of a just-committed
        group (skipped/fenced epochs write nothing — they did no work).
        metric_id = ``epoch@state_version`` ties each row to the exact
        snapshot its group produced: normal replay journals each epoch
        once, a repair/restore re-drive journals a second attempt under
        the new version, and a crash-retried journal write dedups on the
        (key, seq) anti-join."""
        live = [s for s in epoch_stats if not s.skipped]
        if not live:
            return
        t = self._metrics()
        v = int(self.table.snapshot["version"])
        tenant = "" if self.tenant_id is None else str(self.tenant_id)
        rows = [
            (
                f"{s.epoch}@{v}",
                v,
                s.epoch,
                s.events,
                s.rollbacks,
                s.wall_ms,
                s.strategy,
                s.quarantined,
                tenant,
            )
            for s in live
        ]
        t.insert_if_absent(
            self.spark.createDataFrame(rows, METRICS_SCHEMA)
        )

    def process_epoch(self, epoch: int) -> EpochStats:
        """Single-epoch entry point (kept for fenced re-runs and tests);
        ``run`` prefers grouped processing."""
        if epoch <= self._committed_floor():
            return EpochStats(epoch, 0, 0, 0, skipped=True)
        meta = self._epoch_meta(self._epoch_files(epoch))
        out = self._process_group([epoch], [meta])[0]
        if self.metrics_dir:
            self._record_metrics([out])
        return out

    # ---------------------------------------------------------------- repair
    def repair_range(
        self,
        lo_epoch: int,
        hi_epoch: int | None = None,
        runner: str | None = None,
        lock_ttl_s: float = 3600.0,
    ) -> "RunStats":
        """Operator-initiated historical repair: re-verify and re-drive a
        COMMITTED epoch range (the reference's standalone ``hemera.py
        reorg`` command with its single-runner ``fix_record`` lock,
        /root/reference/indexer/controller/reorg_controller.py:28-93,
        168-179).

        Semantics: every state row whose winning seq falls inside the
        range's seq span is deleted, the epoch fence / offsets / chain
        tails are rewound to just before ``lo_epoch``, and the normal
        (idempotent, consensus-checked) replay loop re-drives from there
        to the log head — so after repair the state over the range IS the
        canonical replay of the log, whatever was wrong with it before
        (hand-edits, a since-fixed writer bug, partial manual deletes).
        Rows whose winner lies after the range survive the delete and win
        their LWW ties during the re-drive, so repair cost is
        O(range) + replay, not O(table history).

        The delete and the cursor rewind commit in ONE snapshot flip — a
        crash between them cannot strand deleted rows beyond the fence.

        Single-runner guard: a ``repair_lock`` table property acquired via
        the snapshot CAS; a live lock (younger than ``lock_ttl_s``) makes
        a second runner raise ``RepairLockHeld``; stale locks (crashed
        runner) are taken over. The lock is released in ``finally`` via a
        None-valued property update.

        Sinks already fenced past the range keep their per-destination
        done guards, so repair re-drives the STATE table only — re-point
        or rewind sink fences separately if a sink needs the same repair.
        """
        # refresh FIRST: validating against a stale cached snapshot could
        # silently clamp the repair below a fence another runner advanced
        # (epochs beyond the stale fence would never be re-verified)
        self.table.refresh()
        committed = self._state_committed_epoch()
        if lo_epoch < 0 or lo_epoch > committed:
            raise ValueError(
                f"repair range must start inside committed history "
                f"(lo_epoch={lo_epoch}, committed={committed}); for new "
                f"epochs just run()"
            )
        hi = committed if hi_epoch is None else min(hi_epoch, committed)
        if hi < lo_epoch:
            raise ValueError(f"empty repair range {lo_epoch}..{hi}")

        # Seq span of the range — computed from the IMMUTABLE log, so it
        # happens before the lock (a stats error can never strand a lock).
        #
        # seq_lo must follow the (epoch, seq) discipline, NOT epoch lo's
        # raw footer min: a later epoch may carry re-delivered DUPLICATES
        # of earlier events at their original (lower) seqs, which would
        # drag a min-of-epoch-lo bound into pre-range history — deleting
        # winners the replay (which starts at epoch lo) never restores.
        # Original deliveries are seq-monotone across epochs (the log
        # contract; only duplicates violate it), so the true range start
        # is 1 + max(seq over epochs < lo).
        if lo_epoch == 0:
            seq_lo = self._span_seq_bound(range(0, hi + 1), "min")
        else:
            seq_lo = self._span_seq_bound(range(0, lo_epoch), "max") + 1
        seq_hi = None if hi == committed else self._span_seq_bound(
            range(lo_epoch, hi + 1), "max"
        )

        lock_key = "repair_lock"
        me = runner or f"{os.uname().nodename}:{os.getpid()}"
        # Acquisition loop: the span computation above can take a while on
        # a long log, so an ordinary commit (live ingest, another tenant)
        # may land between our refresh and the CAS — that is routine
        # traffic, not a second repair runner. Re-refresh, re-check the
        # held lock, and retry the CAS; only a LIVE lock held by someone
        # else raises RepairLockHeld. Two concurrent acquirers still
        # serialize: exactly one CAS wins per snapshot, the loser re-reads
        # the winner's lock and raises.
        from hemera_indexer_spark.lake.table import ConcurrentCommitError

        for attempt in range(5):
            self.table.refresh()
            held = self.table.snapshot["properties"].get(lock_key)
            if held:
                h = json.loads(held)
                if h.get("runner") != me and time.time() - h["ts"] < lock_ttl_s:
                    raise RepairLockHeld(
                        f"repair already running ({h['runner']}, "
                        f"{time.time() - h['ts']:.0f}s ago); pass a smaller "
                        f"lock_ttl_s to take over a crashed runner"
                    )
            try:
                # CAS acquisition: a concurrent acquirer loses the race
                self.table.update_properties(
                    {lock_key: json.dumps({"runner": me, "ts": time.time()})}
                )
                break
            except ConcurrentCommitError:
                if attempt == 4:
                    raise
                time.sleep(0.1 * (attempt + 1))
        try:
            man = json.loads(json.dumps(self._state_manifest()))
            man["epoch_id"] = lo_epoch - 1
            man["offsets"] = {
                p: min(int(off), seq_lo - 1)
                for p, off in man.get("offsets", {}).items()
            }
            man["lineage"] = []
            # chain bookkeeping must rewind with the cursor: tails at or
            # beyond seq_lo describe history the re-drive will re-verify;
            # leaving them would make the first replayed batch look
            # divergent against its own future tip.
            tails = {
                p: [e for e in v if e[0] < seq_lo]
                for p, v in man.get("hash_tails", {}).items()
            }
            tails = {p: v for p, v in tails.items() if v}
            last_hashes = {p: v[-1][1] for p, v in tails.items()}
            man.pop("last_hashes", None)
            man.pop("hash_tails", None)
            if last_hashes:
                man["last_hashes"] = last_hashes
                man["hash_tails"] = tails

            seqc = F.col(self.table.seq_col)
            cond = seqc >= F.lit(seq_lo)
            if seq_hi is not None:
                # partial range: rows whose winner lies beyond hi survive
                # the delete and win their LWW ties during the re-drive
                cond = cond & (seqc <= F.lit(seq_hi))
            if self.tenant_col is not None:
                cond = cond & (
                    F.col(self.tenant_col)
                    == F.lit(self.tenant_id).cast(self._tenant_field.dataType)
                )
                self.table.delete_keys_where(
                    cond,
                    seq_at_least=seq_lo,
                    properties_update={self._tenant_man_key: json.dumps(man)},
                )
            else:
                self.table.delete_keys_where(
                    cond, seq_at_least=seq_lo, manifest=man
                )
            return self.run()
        finally:
            # Release ONLY a lock we still own: if this run exceeded
            # lock_ttl_s another runner may have legitimately taken over,
            # and unconditionally deleting would unlock THEIR live lock
            # (letting a third runner race two concurrent repairs).
            # Release must also not be lost to a CAS race with a
            # concurrent commit — retry a few times; a still-stuck lock
            # degrades to the TTL takeover path, never a deadlock.
            for attempt in range(5):
                try:
                    self.table.refresh()
                    cur = self.table.snapshot["properties"].get(lock_key)
                    if cur is not None and json.loads(cur).get("runner") != me:
                        break  # taken over; not ours to release
                    if cur is not None:
                        self.table.update_properties({lock_key: None})
                    break
                except ConcurrentCommitError:
                    if attempt == 4:
                        raise
                    time.sleep(0.1 * (attempt + 1))

    def _check_reason_expr(self, checks: dict[str, str]) -> F.Column:
        """'check:<name>' of the FIRST (name-ordered) declared check the
        row violates, NULL if none. SQL three-valued semantics (only
        FALSE violates); op 'delete'/'rollback' rows are control events
        and never match. Columns the predicates reference must exist —
        use ``_fill_schema_cols`` on pre-evolution event frames first."""
        expr = F.lit(None).cast("string")
        for name in sorted(checks, reverse=True):
            viol = (
                F.coalesce(F.expr(checks[name]), F.lit(True)) == F.lit(False)
            )
            applies = (~F.col("op").isin("delete", "rollback")) & viol
            expr = F.when(applies, F.lit(f"check:{name}")).otherwise(expr)
        return expr

    def _fill_schema_cols(self, df):
        """NULL-fill table-schema columns absent from an event frame
        (pre-evolution epochs) so check predicates analyze; returns
        (filled_df, added_column_names) — callers drop the added columns
        before writing so dead-letter rows keep their original shape."""
        missing = [
            f for f in self.table.schema.fields if f.name not in df.columns
        ]
        for f_ in missing:
            df = df.withColumn(f_.name, F.lit(None).cast(f_.dataType))
        return df, [f.name for f in missing]

    def replay_quarantined(
        self,
        fix=None,
        epochs: list[int] | None = None,
    ) -> dict:
        """Re-ingest corrected dead-letter events — the verb that closes
        the quarantine loop: divert (ingest) → inspect → ``fix`` →
        replay. ``fix`` is an optional ``DataFrame -> DataFrame``
        correction (it sees the original event columns plus
        ``quarantine_reason`` and the ``_src_epoch`` partition column for
        context); rows that are STILL malformed after it stay
        dead-lettered. Valid upsert/delete events merge UNFENCED with
        their ORIGINAL seqs — safe by the LWW law (a replayed old seq
        loses to any newer committed winner, which is the correct
        late-arrival semantics) and idempotent under retry. Rollback
        events are NEVER replayed (counted in the report instead):
        applying a reorg long after later epochs committed is a repair,
        not a merge — use ``repair_range`` for the affected span.

        Dead-letter rewrite is crash-safe via a staging dir: remaining
        rows land in ``_replay_tmp`` first, covered partitions clear,
        then the staged partitions move into place — and every call
        COMPLETES a predecessor's interrupted move before reading, so
        the only non-idempotent window (cleared-but-not-moved) heals on
        the next invocation. Returns {"replayed", "still_quarantined",
        "rollbacks_skipped"}."""
        if self.quarantine_dir is None:
            raise ValueError("controller has no quarantine_dir")
        qdir = self.quarantine_dir
        tmp = os.path.join(qdir, "_replay_tmp")
        # recovery: a predecessor cleared partitions but crashed before
        # moving its staged remainder in — finish that move first
        if os.path.isdir(tmp):
            for d in os.listdir(tmp):
                if d.startswith("_src_epoch="):
                    dst = os.path.join(qdir, d)
                    if os.path.isdir(dst):
                        shutil.rmtree(os.path.join(tmp, d))
                    else:
                        os.rename(os.path.join(tmp, d), dst)
            shutil.rmtree(tmp, ignore_errors=True)
        parts = sorted(
            d for d in os.listdir(qdir) if d.startswith("_src_epoch=")
        ) if os.path.isdir(qdir) else []
        if epochs is not None:
            want = {f"_src_epoch={e}" for e in epochs}
            parts = [d for d in parts if d in want]
        if not parts:
            return {"replayed": 0, "still_quarantined": 0,
                    "rollbacks_skipped": 0}
        df = (
            self.spark.read.option("mergeSchema", "true")
            .option("basePath", qdir)
            .parquet(*[os.path.join(qdir, d) for d in parts])
        )
        if fix is not None:
            df = fix(df)
        # A replayed row must never crash the merge: re-evaluate the
        # table's CURRENT check set (regardless of check_policy — the
        # abort policy guards ingest, but here the row is already
        # dead-lettered and "still violating" is the honest disposition).
        cur_checks = self.table.checks()
        added: list[str] = []
        if cur_checks:
            df, added = self._fill_schema_cols(df)
            reason = F.coalesce(
                _malformed_reason(), self._check_reason_expr(cur_checks)
            )
        else:
            reason = _malformed_reason()
        df = df.withColumn("_still", reason).persist()
        try:
            is_rb = F.col("_still").isNull() & (F.col("op") == "rollback")
            good = df.where(F.col("_still").isNull() & (F.col("op") != "rollback"))
            keep = df.where(F.col("_still").isNotNull() | is_rb)
            n_good = good.count()
            n_rb = df.where(is_rb).count()
            n_still = keep.count() - n_rb
            if n_good:
                drop = ["_still", "_src_epoch", "quarantine_reason"]
                self.table.merge_upsert(
                    good.drop(*drop), epoch_id=None,
                    strategy=self._auto_pick
                    if self.merge_strategy == "auto" else self.merge_strategy,
                    # _still already re-evaluated the current check set
                    enforce_checks=not cur_checks,
                )
            # rewrite the dead-letter dir: stage remaining rows, clear the
            # covered partitions, move the stage in (see docstring order)
            if keep.count():
                (
                    keep.withColumn(
                        "quarantine_reason",
                        F.when(is_rb, F.lit("rollback_replay_refused"))
                        .otherwise(
                            F.coalesce(
                                F.col("_still"), F.col("quarantine_reason")
                            )
                        ),
                    )
                    .drop("_still", *added)
                    .write.partitionBy("_src_epoch")
                    .mode("overwrite")
                    .parquet(tmp)
                )
            for d in parts:
                shutil.rmtree(os.path.join(qdir, d), ignore_errors=True)
            if os.path.isdir(tmp):
                for d in os.listdir(tmp):
                    if d.startswith("_src_epoch="):
                        os.rename(
                            os.path.join(tmp, d), os.path.join(qdir, d)
                        )
                shutil.rmtree(tmp, ignore_errors=True)
            return {
                "replayed": n_good,
                "still_quarantined": n_still,
                "rollbacks_skipped": n_rb,
            }
        finally:
            df.unpersist()

    def _epoch_file_seq_stats(self, epoch: int) -> tuple[int | None, int | None]:
        """(min, max) event seq of one epoch, FILE-granular: every file's
        footer is inspected individually, and files whose writer emitted no
        seq stats (on any row group) fall back to ONE Spark aggregate over
        exactly those files. Per-file granularity matters: a partition
        holding one stats-bearing and one stats-less file must not let the
        stats-bearing one mask the other — a masked file could silently
        shrink a repair delete span onto pre-range winners."""
        files = self._epoch_files(epoch)

        def one(f: str):
            md = pq.read_metadata(f)
            if md.num_rows == 0:
                return (None, None, False)
            names = md.schema.to_arrow_schema().names
            idx = names.index("seq")
            mn, mx, incomplete = None, None, False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    incomplete = True
                    continue
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            return (mn, mx, incomplete)

        with ThreadPoolExecutor(max_workers=8) as ex:
            stats = list(ex.map(one, files))
        mn = min((s[0] for s in stats if s[0] is not None), default=None)
        mx = max((s[1] for s in stats if s[1] is not None), default=None)
        missing = [f for f, s in zip(files, stats) if s[2]]
        if missing:
            row = (
                self.spark.read.parquet(*missing)
                .agg(F.min("seq").alias("mn"), F.max("seq").alias("mx"))
                .first()
            )
            if row["mn"] is not None:
                v = int(row["mn"])
                mn = v if mn is None else min(mn, v)
            if row["mx"] is not None:
                v = int(row["mx"])
                mx = v if mx is None else max(mx, v)
        return mn, mx

    def _span_seq_bound(
        self, epochs, kind: str, walk_tolerance: int | None = 8
    ) -> int:
        """Min/max event seq across the given log epochs (footer
        metadata; file-granular stats with Spark fallback, see
        ``_epoch_file_seq_stats``).

        ``kind='max'`` walks the epochs BACKWARD with early stop: because
        original deliveries are seq-monotone across epochs, any epoch
        containing at least one original dominates every earlier epoch,
        so the running max stabilizes after the newest original-bearing
        epoch — repair of a recent range costs O(few epochs) of footer
        reads, not O(log history). The walk is exact unless MORE THAN
        ``walk_tolerance`` consecutive epochs contain only re-delivered
        duplicates (a pathological log; pass ``walk_tolerance=None`` to
        force the exact full scan)."""
        eps = list(epochs)
        if kind == "min":
            best = None
            for e in eps:
                mn, _ = self._epoch_file_seq_stats(e)
                if mn is not None:
                    best = mn if best is None else min(best, mn)
        else:
            best = None
            streak = 0
            for e in reversed(eps):
                _, mx = self._epoch_file_seq_stats(e)
                if mx is not None and (best is None or mx > best):
                    best = mx
                    streak = 0
                else:
                    streak += 1
                    if (
                        walk_tolerance is not None
                        and best is not None
                        and streak >= walk_tolerance
                    ):
                        break
        if best is None:
            raise ValueError(
                f"no events found in epochs {eps}; cannot derive "
                f"the repair seq span"
            )
        return int(best)

    def _committed_floor(self) -> int:
        """The epoch up to which the WHOLE output set is durably committed:
        min over the state table's fence and every sink that exposes
        ``committed_epoch()``. Sink actions overlap the state merge, so a
        crash (or a sink failure surfacing after the state fence landed) can
        leave a sink behind the state table; resuming/skipping by the state
        fence alone would then silently drop that sink's data for the group
        forever. Re-driving from the floor is safe: every sink apply and
        every unfenced state re-merge is idempotent."""
        floor = self._state_committed_epoch()
        for s in self.sinks:
            fn = getattr(s, "committed_epoch", None)
            if fn is not None:
                floor = min(floor, fn())
        return floor

    # ------------------------------------------------------------ internals
    def _process_group(self, group: list[int], metas: list[dict]) -> list[EpochStats]:
        """Merge a batch of consecutive epochs (one commit), with bounded
        retries for transient failures. Safe to retry: every commit inside is
        either fenced by epoch id or an idempotent LWW re-merge."""
        from hemera_indexer_spark.lake.table import ConcurrentCommitError

        attempt = 0
        cas_attempt = 0
        while True:
            try:
                out = self._process_group_once(group, metas)
                for s in out:
                    s.retries = attempt + cas_attempt
                return out
            except Exception as exc:
                # In tenant mode several controllers legitimately share one
                # table, so a snapshot CAS race (another tenant committing
                # between our refresh and our commit) is EXPECTED traffic,
                # not an accidental double-runner: refresh and re-drive
                # (idempotent by contract). Single-tenant keeps the loud
                # failure — there the CAS exists to catch exactly that
                # accident. Expected contention gets its OWN budget
                # (tenant_cas_retries, sized for N-way tenant fan-in),
                # never the small transient-failure budget: with 3+ tenant
                # controllers every commit attempt can legitimately lose
                # the race, and 2 transient retries would crash a healthy
                # run mid-backlog.
                tenant_cas = (
                    self.tenant_col is not None
                    and isinstance(exc, ConcurrentCommitError)
                )
                if tenant_cas:
                    if cas_attempt >= self.tenant_cas_retries:
                        raise
                    cas_attempt += 1
                    # short linear backoff with a deterministic per-tenant
                    # phase offset so N contending tenants fan out instead
                    # of re-colliding in lockstep
                    phase = (
                        zlib.crc32(str(self.tenant_id).encode()) % 7
                    ) / 100.0
                    time.sleep(0.05 * cas_attempt + phase)
                elif attempt >= self.max_retries or not is_retriable(exc):
                    raise
                else:
                    attempt += 1
                    time.sleep(self.retry_backoff_s * attempt)
                self.table.refresh()  # partial commits may have landed

    def _process_group_once(
        self, group: list[int], metas: list[dict]
    ) -> list[EpochStats]:
        t0 = time.monotonic()
        last_epoch = group[-1]
        if last_epoch <= self._committed_floor():
            return [EpochStats(e, 0, 0, 0, skipped=True) for e in group]
        strategy = (
            self._auto_pick
            if self.merge_strategy == "auto"
            else self.merge_strategy
        )
        files = [f for e in group for f in self._epoch_files(e)]

        # union schema + merged lineage across the group
        extra_fields: dict[str, T.StructField] = {}
        base_names = set(CHANGE_EVENT_SCHEMA.fieldNames())
        for m in metas:
            for fld in m["schema"].fields:
                if fld.name not in base_names:
                    extra_fields[fld.name] = fld
        ev_schema = T.StructType(
            list(CHANGE_EVENT_SCHEMA.fields)
            + [extra_fields[n] for n in sorted(extra_fields)]
        )
        maybe_rollback = any(m["maybe_rollback"] for m in metas)
        has_hash_chain = all(m["has_hash_chain"] for m in metas) and bool(metas)

        # additive evolution of the state table: any event column that is not
        # engine bookkeeping and not yet in the table becomes a new payload
        # column.
        bookkeeping = {
            "seq", "epoch", "partition", "op", "rollback_to_seq",
            # chain-consensus columns are log bookkeeping, not payload
            consensus.HASH_COL, consensus.PARENT_COL,
        }
        state_names = set(self.table.schema.fieldNames())
        # old-writer name mapping: an event column the table RENAMED away
        # still flows into its successor (resolve != name), and a column
        # the table DROPPED is discarded (resolve is None) — neither may
        # be re-ADDed here, or the rename/drop would silently undo itself
        # on the next batch. Only genuinely-new names (resolve == name)
        # are additive-evolution candidates.
        resolve = getattr(
            self.table, "resolve_writer_column", lambda n: n
        )
        new_cols = [
            f
            for f in ev_schema.fields
            if f.name not in bookkeeping
            and f.name not in state_names
            and resolve(f.name) == f.name
        ]
        if new_cols:
            self.table.evolve_schema(new_cols)
            for s in self.sinks:
                fn = getattr(s, "evolve_schema", None)
                if fn is not None:
                    fn(new_cols)

        df = self.spark.read.schema(ev_schema).parquet(*files)

        # Dead-letter quarantine (see __init__): divert malformed events
        # BEFORE rollback segmentation / consensus / merge ever see them.
        # Footer null-count stats prove most groups clean, so the extra
        # scan is skipped entirely in the common case ('footer' mode).
        n_quarantined = 0
        # Domain-check diversion shares the envelope divert's write (one
        # pass, one reason column, same idempotent pre-clear): checks are
        # not footer-provable, so an active 'quarantine' policy forces the
        # scan every group.
        q_checks = (
            self.table.checks()
            if self.check_policy == "quarantine" else {}
        )
        if self.quarantine_dir is not None and (
            self.quarantine_scan == "always"
            or q_checks
            or any(m.get("maybe_malformed") for m in metas)
        ):
            # The dead-letter layout is partitioned by the SOURCE epoch
            # (parsed from the file path — grouping- and row-content-
            # independent), with dynamic partition overwrite: a re-drive
            # under a DIFFERENT epoch grouping (changed max_batch_epochs
            # after a crash) rewrites exactly the epoch partitions it
            # covers instead of duplicating rows under a new group-keyed
            # dir. Keying by the row's own `epoch` column would trust the
            # very writer that produced the malformed row.
            src_epoch = F.regexp_extract(
                F.input_file_name(), r"epoch=(\d+)", 1
            ).cast("long")
            # Pre-clear THIS group's epoch partitions: the dead-letter
            # state for an epoch must be exactly what the CURRENT log
            # yields for it — dynamic overwrite alone writes (and cleans)
            # nothing when the repaired log diverts zero rows, so a stale
            # partition from a pre-repair run would be recounted forever
            # (with a hash-chained log that re-raises the corruption
            # error even after the operator followed its own recovery
            # instructions). A crash between clear and write loses
            # nothing durable: the rows re-derive from the immutable log
            # on the next re-drive.
            for e in group:
                d = os.path.join(self.quarantine_dir, f"_src_epoch={e}")
                if os.path.isdir(d):
                    shutil.rmtree(d)
            if q_checks:
                qdf, added = self._fill_schema_cols(df)
                reason_col = F.coalesce(
                    _malformed_reason(), self._check_reason_expr(q_checks)
                )
            else:
                qdf, added = df, []
                reason_col = _malformed_reason()
            (
                qdf.withColumn("quarantine_reason", reason_col)
                .where(F.col("quarantine_reason").isNotNull())
                .drop(*added)
                .withColumn("_src_epoch", src_epoch)
                .write.partitionBy("_src_epoch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(self.quarantine_dir)
            )
            # count THIS group's rows from the written files' footers —
            # no second scan, and other groups' partitions don't count
            n_quarantined = sum(
                pq.read_metadata(f).num_rows
                for e in group
                for f in glob.glob(
                    os.path.join(
                        self.quarantine_dir, f"_src_epoch={e}", "*.parquet"
                    )
                )
            )
            if n_quarantined and has_hash_chain:
                # A hash-chained log guarantees per-partition continuity;
                # a diverted event breaks the chain BY CONSTRUCTION, and
                # letting consensus run over the gap would flag a false
                # divergence whose fork-point lookup fails (the matching
                # ancestor hash was quarantined) — degrading to a
                # destructive partition-wide synthetic rollback. That is
                # chain corruption, not skippable garbage: crash loudly,
                # with the evidence already on disk in the dead-letter
                # dir. Deterministic error — never retried.
                raise ValueError(
                    f"{n_quarantined} diverted event(s) inside a "
                    f"hash-chained log (dead-lettered under "
                    f"{self.quarantine_dir}): a missing event — whether "
                    f"malformed or check-violating — breaks chain "
                    f"continuity, so this is upstream chain corruption "
                    f"the quarantine cannot skip; repair the log (or "
                    f"drop the consensus columns) and re-run"
                )
            if n_quarantined:
                if q_checks:
                    fdf, added = self._fill_schema_cols(df)
                    df = fdf.where(
                        F.coalesce(
                            _malformed_reason(),
                            self._check_reason_expr(q_checks),
                        ).isNull()
                    ).drop(*added)
                else:
                    df = df.where(_malformed_reason().isNull())

        # rollback events are rare and tiny; the footer pass proves their
        # absence for most epochs (rollback_to_seq all-null), so this scan —
        # pushed down to parquet row-group stats — only runs when one may
        # exist (the reference spawns a whole reorg subprocess here; we just
        # split the batch).
        rollbacks: list[dict] = []
        if maybe_rollback:
            rollbacks = [
                {
                    "seq": r["seq"],
                    "partition": r["partition"],
                    "rollback_to_seq": r["rollback_to_seq"],
                    "inclusive_lo": False,
                }
                for r in df.where(F.col("rollback_to_seq").isNotNull())
                .select("seq", "partition", "rollback_to_seq")
                .collect()
            ]
        if has_hash_chain:
            man = self._state_manifest()
            prev_hashes = {
                int(p): h for p, h in man.get("last_hashes", {}).items()
            }
            prev_tails = {
                int(p): v for p, v in man.get("hash_tails", {}).items()
            }
            # explicit rollbacks in the same batch bound the synthetic
            # fallback: never wipe below a floor the upstream declared
            # canonical (most conservative floor per partition wins).
            floors: dict[int, int] = {}
            for r in rollbacks:
                p, s = r["partition"], r["rollback_to_seq"]
                floors[p] = min(floors.get(p, s), s)
            rollbacks.extend(
                consensus.detect_divergence(df, prev_hashes, prev_tails, floors)
            )
        rollbacks.sort(key=lambda r: r["seq"])

        lineage_rows = self._merged_lineage(metas)
        n_events = sum(r["cnt"] for r in lineage_rows)

        updates = df.where(F.col("op") != "rollback")
        if self.tenant_col is not None:
            updates = updates.withColumn(
                self.tenant_col,
                F.lit(self.tenant_id).cast(self._tenant_field.dataType),
            )
        min_seq = min(
            (r["mn"] for r in lineage_rows if r["mn"] is not None), default=None
        )
        # Sink fan-out: each segment is persisted ONCE and consumed by every
        # sink plus the primary merge — one scan/parquet-decode per segment
        # instead of one per destination — and sink actions run on a small
        # thread pool CONCURRENTLY with the state merge (independent tables,
        # no snapshot contention; Spark interleaves the jobs onto idle
        # cores). AQE is toggled off ONCE here for the whole fan-out:
        # _write_data's per-write toggle of the session-global flag would
        # race between concurrently-writing sinks (a thread could read the
        # other's 'false' as the restore value and leave AQE off for the
        # session).
        pool = ThreadPoolExecutor(max_workers=len(self.sinks)) if self.sinks else None
        aqe_prev = None
        persisted: list = []
        if self.sinks:
            aqe_prev = self.spark.conf.get("spark.sql.adaptive.enabled")
            self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        # Per-destination done guards for committed-floor re-drives. A group
        # re-runs whenever ANY destination's fence is behind (the floor is a
        # MIN), but a destination whose own fence already covers the group
        # must not re-run its STATE MUTATIONS: a rollback-segmented group
        # re-drive would re-apply the destructive rollback delete while the
        # fence-guarded final-segment upsert skips — permanently losing the
        # re-applied rows (caught by the IVM crash-window test). Destinations
        # without a fence (no committed_epoch) re-run everything; their
        # apply/rollback are idempotent under full re-drives by contract.
        state_done = last_epoch <= self._state_committed_epoch()

        def _done(s) -> bool:
            fn = getattr(s, "committed_epoch", None)
            return fn is not None and fn() >= last_epoch

        sink_done = [_done(s) for s in self.sinks]
        try:
            lo: dict | None = None
            for idx in range(len(rollbacks) + 1):
                rb = rollbacks[idx] if idx < len(rollbacks) else None
                seg = updates
                if lo is not None:
                    seg = (
                        seg.where(F.col("seq") >= lo["seq"])
                        if lo["inclusive_lo"]
                        else seg.where(F.col("seq") > lo["seq"])
                    )
                if rb is not None:
                    seg = seg.where(F.col("seq") < rb["seq"])
                is_last = rb is None
                if self.sinks:
                    seg = seg.persist()
                    persisted.append(seg)
                manifest = None
                if is_last:
                    manifest = self._build_manifest(
                        last_epoch, lineage_rows, t0, df,
                        with_hashes=has_hash_chain, rollbacks=rollbacks,
                    )
                futures = [
                    pool.submit(
                        s.apply, seg, last_epoch, idx, is_last, manifest, min_seq
                    )
                    for s, done in zip(self.sinks, sink_done)
                    if not done
                ]
                if is_last:
                    before_paths = {
                        f["path"] for f in self.table.snapshot["files"]
                    }
                if not state_done:
                    if self.tenant_col is None:
                        self.table.merge_upsert(
                            seg,
                            epoch_id=last_epoch if is_last else None,
                            manifest=manifest,
                            strategy=strategy,
                            # quarantine policy already diverted violators
                            enforce_checks=not q_checks,
                        )
                    else:
                        # tenant mode: the fence + manifest live in a
                        # namespaced property, committed atomically with
                        # the data in the same snapshot flip; the shared
                        # snapshot manifest stays untouched (another
                        # tenant's cursor). Unfenced merge is safe — the
                        # controller-level state_done/committed-floor
                        # guards do the skipping, and re-merges are
                        # idempotent LWW.
                        self.table.merge_upsert(
                            seg,
                            strategy=strategy,
                            properties_update=(
                                {self._tenant_man_key: json.dumps(manifest)}
                                if is_last
                                else None
                            ),
                            enforce_checks=not q_checks,
                        )
                # the winners/events ratio only means "in-batch dedup" for a
                # clean merge-on-read commit: cow rewrites whole buckets
                # (written >> winners) and a rollback-segmented group applies
                # several partial segments — skip the update in both cases.
                if (
                    is_last
                    and not state_done
                    and self.merge_strategy == "auto"
                    and n_events
                    and not rollbacks
                    and self.table.snapshot["properties"].get("write_mode", "mor")
                    == "mor"
                ):
                    written = sum(
                        f["rows"]
                        for f in self.table.snapshot["files"]
                        if f["path"] not in before_paths
                    )
                    ratio = written / n_events
                    self._auto_pick = "sql" if ratio <= 0.5 else "jvm"
                for f in futures:
                    f.result()
                # post-commit hooks (e.g. incremental view maintenance) run
                # on the main thread AFTER both the state merge and every
                # concurrent sink apply landed — they may read the table.
                for s, done in zip(self.sinks, sink_done):
                    if done:
                        continue
                    cb = getattr(s, "after_commit", None)
                    if cb is not None:
                        cb(last_epoch, is_last)
                if self.sinks:
                    seg.unpersist()
                    persisted.remove(seg)
                if not is_last:
                    cond = (
                        log_partition_col(F.col("doc_id"), self.n_partitions)
                        == F.lit(rb["partition"])
                    ) & (F.col("seq") >= F.lit(rb["rollback_to_seq"]))
                    if self.tenant_col is not None:
                        # a tenant's reorg only invalidates its own rows —
                        # another tenant's doc hashing into the same log
                        # partition number must survive
                        cond = cond & (
                            F.col(self.tenant_col)
                            == F.lit(self.tenant_id).cast(
                                self._tenant_field.dataType
                            )
                        )
                    rb_futures = [
                        pool.submit(s.rollback, cond, rb["rollback_to_seq"])
                        for s, done in zip(self.sinks, sink_done)
                        if not done
                    ]
                    if not state_done:
                        self.table.delete_keys_where(
                            cond, seq_at_least=rb["rollback_to_seq"]
                        )
                    for f in rb_futures:
                        f.result()
                    lo = rb
        finally:
            if pool is not None:
                pool.shutdown(wait=True)
            for df_ in persisted:  # exception path: drop leaked cache blocks
                df_.unpersist()
            if aqe_prev is not None:
                self.spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
        self.table.maybe_compact(
            max_deltas=self.compact_max_deltas, strategy=strategy
        )
        if self.rebucket_target_rows is not None:
            # layout maintenance rides the same post-group slot as
            # compaction: changes_since is NET-empty across a rebucket, so
            # change-feed consumers (IVM view, signature index) see nothing;
            # the policy itself is a metadata check unless it fires
            self.table.maybe_rebucket(
                self.rebucket_target_rows, strategy=strategy
            )
        if self.catalog is not None:
            # AFTER state commit, sink syncs and layout maintenance: the
            # group's full effect becomes one catalog step. advance() is a
            # no-op commit-wise when nothing moved (empty groups); expiry
            # keeps the one-json-per-group catalog metadata bounded.
            self.catalog.advance(self.catalog_tables)
            self.catalog.expire()
        wall = int((time.monotonic() - t0) * 1000)

        # per-epoch stats: events from the per-epoch footer metas; the wall
        # time of the group commit is split evenly (it is one shared action)
        per_epoch_events = [sum(r["cnt"] for r in m["lineage"]) for m in metas]
        n_rb = len(rollbacks)
        return [
            EpochStats(
                e,
                per_epoch_events[j],
                n_rb if j == len(group) - 1 else 0,
                max(wall // len(group), 1),
                strategy=strategy,
                quarantined=n_quarantined if j == len(group) - 1 else 0,
            )
            for j, e in enumerate(group)
        ]

    @staticmethod
    def _merged_lineage(metas: list[dict]) -> list[dict]:
        per_part: dict[int, dict] = {}
        for m in metas:
            for r in m["lineage"]:
                p = per_part.setdefault(
                    r["partition"],
                    {"partition": r["partition"], "cnt": 0, "mx": None, "mn": None},
                )
                p["cnt"] += r["cnt"]
                if r["mx"] is not None:
                    p["mx"] = r["mx"] if p["mx"] is None else max(p["mx"], r["mx"])
                if r.get("mn") is not None:
                    p["mn"] = r["mn"] if p["mn"] is None else min(p["mn"], r["mn"])
        return list(per_part.values())

    def _build_manifest(
        self, epoch: int, lineage_rows, t0: float, df=None, with_hashes=False,
        rollbacks: list[dict] | None = None,
    ) -> dict:
        prev = self._state_offsets()
        offsets = dict(prev)
        wall = int((time.monotonic() - t0) * 1000)
        # footer stats can be missing (writer without column stats): fall
        # back to ONE Spark aggregate for exactly the partitions that need it
        need_scan = [r["partition"] for r in lineage_rows if r["mx"] is None and r["cnt"]]
        if need_scan and df is not None:
            scanned = {
                row["partition"]: row["mx"]
                for row in df.where(F.col("partition").isin(need_scan))
                .groupBy("partition")
                .agg(F.max("seq").alias("mx"))
                .collect()
            }
            for r in lineage_rows:
                if r["mx"] is None and r["partition"] in scanned:
                    r["mx"] = scanned[r["partition"]]
        lineage = []
        for r in lineage_rows:
            p = int(r["partition"])
            if r["mx"] is not None:
                offsets[p] = max(offsets.get(p, -1), int(r["mx"]))
            lineage.append(
                {
                    "partition": p,
                    "offset": offsets.get(p, -1),
                    "epoch_id": epoch,
                    "rows_applied": int(r["cnt"]),
                    "wall_ms": wall,
                }
            )
        manifest = {
            "epoch_id": epoch,
            "offsets": {str(k): v for k, v in offsets.items()},
            "lineage": lineage,
        }
        # chain bookkeeping ALWAYS carries forward: a group without the hash
        # columns (or an empty one) must not drop previously recorded tips —
        # the next hash-chained batch still checks its first events against
        # them (dropping them would let a fork at the batch boundary pass
        # undetected).
        prev_man = self._state_manifest()
        last_hashes = dict(prev_man.get("last_hashes", {}))
        hash_tails = {p: list(v) for p, v in prev_man.get("hash_tails", {}).items()}
        # evict previously committed tail entries orphaned by this batch's
        # rollbacks (seq in [rollback_to, fork point)): they are no longer
        # canonical chain and must never match a future fork's parent hash
        for rb in rollbacks or []:
            p = str(int(rb["partition"]))
            if p in hash_tails:
                hash_tails[p] = [
                    e
                    for e in hash_tails[p]
                    if not (rb["rollback_to_seq"] <= e[0] < rb["seq"])
                ]
                # the recorded tip may itself be orphaned (e.g. a batch
                # whose only event for this partition is the rollback):
                # repoint it at the newest surviving tail entry so the next
                # batch is not falsely flagged divergent against a wiped
                # hash. new_tails below overwrites this for partitions with
                # canonical events in THIS batch.
                if hash_tails[p]:
                    last_hashes[p] = hash_tails[p][-1][1]
                else:
                    last_hashes.pop(p, None)
        if with_hashes and df is not None:
            # per-partition tail of the newest K canonical (seq, chain_hash)
            # pairs — the tip (K=1) lets the NEXT batch's consensus check
            # span the batch boundary (the analog of the reference comparing
            # fetched parents against stored blocks); the rest lets a fork
            # whose ancestor is 1+ batches back roll back to the matched
            # ancestor instead of a full partition re-sync. One narrow
            # window action, only on hash-chained logs.
            from pyspark.sql import Window

            wnd = Window.partitionBy("partition").orderBy(F.col("seq").desc())
            canonical = df.where(F.col("op") != "rollback")
            # events invalidated by a rollback in this batch are ORPHANED
            # chain — a later fork must never match their hashes (it would
            # roll back to a wiped point). The divergent event itself
            # (seq == rb.seq) is canonical repair and stays.
            for rb in rollbacks or []:
                canonical = canonical.where(
                    ~(
                        (F.col("partition") == F.lit(rb["partition"]))
                        & (F.col("seq") >= F.lit(rb["rollback_to_seq"]))
                        & (F.col("seq") < F.lit(rb["seq"]))
                    )
                )
            rows = (
                canonical.select("partition", "seq", consensus.HASH_COL)
                .withColumn("_rn", F.row_number().over(wnd))
                .where(F.col("_rn") <= self.hash_tail_len)
                .collect()
            )
            new_tails: dict[str, list] = {}
            for r in rows:
                new_tails.setdefault(str(int(r["partition"])), []).append(
                    [int(r["seq"]), r[consensus.HASH_COL]]
                )
            for p, t in new_tails.items():
                t.sort(key=lambda x: x[0])
                kept = [e for e in hash_tails.get(p, []) if e[0] < t[0][0]]
                hash_tails[p] = (kept + t)[-self.hash_tail_len:]
                last_hashes[p] = t[-1][1]
        if last_hashes:
            manifest["last_hashes"] = last_hashes
            manifest["hash_tails"] = hash_tails
        return manifest
