"""Item-exporter fan-out — N sinks driven from ONE scanned batch.

Analog of the reference's ``create_item_exporters`` (/root/reference/
indexer/exporters/item_exporter.py:14-45), which turns a list of exporter
specs (postgres / csvfile / jsonfile / console ...) into simultaneous
destinations for each batch. Here every sink consumes the SAME cached
segment DataFrame (one scan, one parquet decode), and sinks run
CONCURRENTLY with the primary state merge — each sink commits to its own
table/directory so there is no snapshot contention, and Spark schedules the
independent actions onto idle cores.

Sink contract (both methods must be idempotent under retry — the
controller's transient-failure retry loop re-invokes them with identical
arguments):

- ``apply(seg, group_epoch, seg_idx, fence, manifest, min_seq)`` — consume
  one rollback-free segment of the batch. ``group_epoch`` is the epoch id
  of the group's last epoch, ``seg_idx`` the deterministic segment ordinal
  within the group, ``fence`` is True only on the group's final segment
  (the fencing commit, where ``manifest`` is also passed).
- ``rollback(cond, seq_at_least)`` — a reorg invalidated rows matching
  ``cond``; remove/mark them as the sink's semantics require.
- ``committed_epoch()`` (optional) — the last epoch this sink durably
  fenced. The controller resumes/skips from the MINIMUM over the state
  table and all sinks exposing this, so a sink that fell behind (crash
  between the overlapped commits, or a sink failure surfacing after the
  state fence landed) gets re-driven instead of silently losing the group.
- ``after_commit(group_epoch, is_last)`` (optional) — invoked on the main
  thread after the segment's state merge AND every concurrent sink apply
  have landed; the only hook from which reading the state table is
  race-free (``apply`` overlaps the merge). Must also be idempotent.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.functions import bucket_col
from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.sources.files import write_range_files


class FactSink:
    """Append-only history table (ON CONFLICT DO NOTHING analog,
    /root/reference/indexer/exporters/postgres_item_exporter.py:126-130).

    ``fence_key``: when several controllers (multi-tenant, one per tenant
    log) share ONE fact table, the snapshot's single epoch fence would
    collide across tenants — a namespaced table property holds this
    tenant's fence instead, committed atomically with the fencing insert.
    A tenant-mode StreamController fills it in automatically.

    ``compact_max_files``: small-file maintenance — after each group
    commit, buckets holding more than this many files are bin-packed
    (``LakeTable.compact_files``; pure reorganization, ``changes_since``
    stays net-empty). Without it a history table accumulates one file
    per bucket per micro-batch forever. Best-effort: on a shared
    (multi-tenant) fact table a CAS race with another tenant's insert
    skips the pack — the next group retries."""

    def __init__(
        self,
        table: LakeTable,
        fence_key: str | None = None,
        compact_max_files: int | None = None,
        compact_small_rows: int | None = 1_000_000,
        retention_lag_seqs: int | None = None,
    ):
        self.table = table
        self.fence_key = fence_key
        # rolling retention: after each group, history below
        # (max_seq - lag) truncates — but ONLY once whole files fall
        # below the cutoff (metadata check), so steady-state groups pay
        # nothing and the floor advances in file-sized steps
        self.retention_lag_seqs = retention_lag_seqs
        self.compact_max_files = compact_max_files
        # size-tiered by default: only sub-tier files are pack candidates,
        # so per-group maintenance rewrites O(recent appends), never the
        # whole history (LakeTable.compact_files docstring has the law);
        # None = full rewrite each time (one-shot backfill packing only)
        self.compact_small_rows = compact_small_rows

    def after_commit(self, group_epoch: int, is_last: bool):
        if not is_last or (
            self.compact_max_files is None
            and self.retention_lag_seqs is None
        ):
            return
        from hemera_indexer_spark.lake import ConcurrentCommitError

        try:
            self.table.refresh()
            if self.retention_lag_seqs is not None:
                files = self.table.snapshot["files"]
                seqs = [
                    f["max_seq"] for f in files
                    if f.get("max_seq") is not None
                ]
                if seqs:
                    cutoff = max(seqs) - self.retention_lag_seqs
                    if any(s_ < cutoff for s_ in seqs):
                        self.table.truncate_before(cutoff)
                        self.table.refresh()
            if self.compact_max_files is not None:
                self.table.compact_files(
                    max_files=self.compact_max_files,
                    small_rows=self.compact_small_rows,
                )
        except ConcurrentCommitError:
            # retriable ONLY on a SHARED (tenant-mode) table, where another
            # tenant's legitimate insert can race this maintenance commit —
            # single-tenant keeps the loud CAS failure so an accidental
            # double runner surfaces here, not at some later insert
            # (the engine-wide ConcurrentCommitError discipline)
            if self.fence_key is None:
                raise
            # shared-table race: maintenance defers to the next group

    def apply(self, seg: DataFrame, group_epoch, seg_idx, fence, manifest, min_seq):
        if self.fence_key is None:
            self.table.insert_if_absent(
                seg,
                epoch_id=group_epoch if fence else None,
                manifest=manifest if fence else None,
                min_seq=min_seq,
            )
        else:
            self.table.insert_if_absent(
                seg,
                min_seq=min_seq,
                properties_update=(
                    {self.fence_key: int(group_epoch)} if fence else None
                ),
            )

    def evolve_schema(self, new_fields) -> None:
        # additive evolution propagates to the HISTORY table too: without
        # this, a column evolving mid-stream (lang at epoch k) would be
        # silently dropped from fact rows — insert_if_absent selects the
        # fact schema's columns — while the state table kept it.
        self.table.evolve_schema(new_fields)

    def rollback(self, cond: Column, seq_at_least: int):
        # facts are append-only history: a plain row-level delete suffices
        # (nothing to resurrect)
        self.table.delete_where(cond, seq_at_least=seq_at_least)

    def committed_epoch(self) -> int:
        self.table.refresh()
        if self.fence_key is not None:
            return int(self.table.snapshot["properties"].get(self.fence_key, -1))
        return self.table.committed_epoch()


class RangeFileSink:
    """Range-file export stream (csv/json_file_item_exporter analog,
    /root/reference/indexer/exporters/csv_file_item_exporter.py:45-112).

    Each applied segment lands under ``out_dir/epoch=<id>/seg=<k>/`` as
    seq-range files — deterministic names, overwritten on retry
    (idempotent). The export is an append-only LOG of applied changes: a
    rollback emits nothing (downstream consumers see the original rollback
    records in the change stream itself)."""

    def __init__(self, out_dir: str, fmt: str = "json", seqs_per_file: int = 1000):
        self.out_dir = out_dir
        self.fmt = fmt
        self.seqs_per_file = seqs_per_file

    def apply(self, seg: DataFrame, group_epoch, seg_idx, fence, manifest, min_seq):
        dest = os.path.join(
            self.out_dir, f"epoch={group_epoch:05d}", f"seg={seg_idx:03d}"
        )
        write_range_files(
            seg, dest, seqs_per_file=self.seqs_per_file, fmt=self.fmt
        )
        if fence:
            # durability marker: the epoch's segments are all written.
            # Written AFTER the fence segment, so a crash mid-epoch leaves
            # no marker and the controller re-drives the group (directories
            # are deterministic and overwritten — idempotent).
            with open(
                os.path.join(self.out_dir, f"epoch={group_epoch:05d}", "_COMMITTED"),
                "w",
            ) as f:
                f.write(str(group_epoch))

    def rollback(self, cond: Column, seq_at_least: int):
        pass

    def committed_epoch(self) -> int:
        best = -1
        if os.path.isdir(self.out_dir):
            for d in os.listdir(self.out_dir):
                if d.startswith("epoch=") and os.path.exists(
                    os.path.join(self.out_dir, d, "_COMMITTED")
                ):
                    best = max(best, int(d.split("=")[1]))
        return best


class IncrementalAggSink:
    """Incrementally-maintained materialized aggregate over the state
    table (the Spark shape of the reference's period-accumulator layer,
    /root/reference/indexer/aggr_jobs/order_jobs/*.sql — but maintained BY
    the CDC engine at commit granularity instead of a nightly batch).

    The view is ``GROUP BY group_cols`` over the table's live rows, stored
    as per-storage-bucket PARTIAL aggregates. Refresh is driven purely by
    snapshot METADATA: each refresh fingerprints every bucket's file list;
    only buckets whose fingerprint changed since the last refresh are
    re-aggregated (one bucket-pruned ``current_state`` scan), and their
    partial rows replace the stored ones. Updates, deletes, rollbacks and
    compactions all rewrite files, so the fingerprint diff catches every
    state change with zero hot-path work — ``apply`` is a no-op; the
    controller invokes ``after_commit`` once the group's merge landed.

    Cost per refresh: O(rows in touched buckets) + O(num_buckets) metadata
    — the standard incremental-view-maintenance trade with the bucket as
    the recomputation granule. Crash-safe: the partials directory is
    versioned and the meta pointer flips via ``os.replace``; a crash
    between the state fence and the view flip leaves ``committed_epoch``
    behind, the controller re-drives the group from the committed floor,
    and the recompute-and-replace refresh is idempotent."""

    #: partial-aggregate functions combinable ACROSS buckets — the
    #: bucket-decomposability requirement; avg = derive from sum + count.
    #: Each entry is (partial_fn(col) for the per-bucket store,
    #: merge_fn(stored_col) for the view). ``approx_distinct`` stores a
    #: binary HLL sketch per (bucket, group) — sketches UNION losslessly,
    #: so the view merges them with hll_union_agg and estimates (~2%
    #: default error). Deletes need no sketch subtraction (HLL can't):
    #: the refresh recomputes each TOUCHED bucket's sketch from its live
    #: rows, which is exactly why bucket-granular recompute is the right
    #: IVM granule for sketch aggregates.
    _MERGEABLE = {
        "sum": (F.sum, F.sum),
        "min": (F.min, F.min),
        "max": (F.max, F.max),
        "approx_distinct": (
            F.hll_sketch_agg,
            lambda n: F.hll_sketch_estimate(F.hll_union_agg(n)),
        ),
    }

    def __init__(
        self,
        table: LakeTable,
        out_dir: str,
        group_cols: tuple[str, ...] = ("source",),
        sum_cols: tuple[str, ...] = ("n_tok",),
        aggs: dict[str, tuple[str, str]] | None = None,
    ):
        # sum_cols is the common case (long sums); ``aggs`` adds arbitrary
        # bucket-decomposable aggregates, e.g.
        # {"max_tok": ("max", "n_tok"), "first_seq": ("min", "seq")}
        self.table = table
        self.out_dir = out_dir
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.aggs = dict(aggs or {})
        for name, (fn, _) in self.aggs.items():
            if fn not in self._MERGEABLE:
                raise ValueError(
                    f"agg {name!r}: {fn!r} is not bucket-decomposable; "
                    f"supported: {sorted(self._MERGEABLE)}"
                )
        self.last_refresh_buckets: int = 0  # introspection for tests/metrics
        os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------- storage
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.out_dir, "_current")

    def _load_meta(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as f:
            return json.load(f)

    def _partials_dir(self, version: int) -> str:
        return os.path.join(self.out_dir, f"v{version:06d}")

    # ------------------------------------------------------ sink contract
    def apply(self, seg: DataFrame, group_epoch, seg_idx, fence, manifest, min_seq):
        pass  # maintenance is metadata-driven, after the state commit

    def rollback(self, cond: Column, seq_at_least: int):
        pass  # rollback rewrites state files -> the fingerprint diff catches it

    def committed_epoch(self) -> int:
        meta = self._load_meta()
        return meta["epoch"] if meta else -1

    def after_commit(self, group_epoch: int, is_last: bool):
        if is_last:
            self.refresh(group_epoch)

    # ------------------------------------------------------------ refresh
    def _bucket_fingerprints(self) -> dict[int, str]:
        per_bucket: dict[int, list[str]] = {}
        for f in self.table.snapshot["files"]:
            per_bucket.setdefault(f["bucket"], []).append(f["path"])
        return {
            b: hashlib.md5(",".join(sorted(ps)).encode()).hexdigest()
            for b, ps in per_bucket.items()
        }

    def refresh(self, epoch: int) -> None:
        spark = self.table.spark
        fps = self._bucket_fingerprints()
        meta = self._load_meta()
        # The fence is MONOTONE: a replayed batch (or a caller in a different
        # counter domain handing us a lower number) must never move it
        # backwards — committed_epoch() feeds the controller's commit floor,
        # and a regressed fence would re-drive (harmless) or, worse, a
        # forward-jumped one would mark groups done that never refreshed.
        if meta is not None:
            epoch = max(epoch, meta["epoch"])
        prev_fp = {int(b): v for b, v in (meta or {}).get("bucket_fp", {}).items()}
        touched = {b for b, v in fps.items() if prev_fp.get(b) != v}
        touched |= set(prev_fp) - set(fps)  # buckets whose files all vanished
        self.last_refresh_buckets = len(touched)
        if meta is not None and not touched:
            if meta["epoch"] < epoch:  # nothing changed; just advance fence
                self._write_meta(meta["version"], epoch, fps)
            return
        key, nb = self.table.key_col, self.table.num_buckets
        fresh = (
            self.table.current_state(buckets=touched)
            .withColumn("_bucket", bucket_col(F.col(key), nb))
            .groupBy("_bucket", *self.group_cols)
            .agg(
                F.count("*").alias("n_rows"),
                *[F.sum(c).cast("long").alias(f"sum_{c}") for c in self.sum_cols],
                *[
                    self._MERGEABLE[fn][0](c).alias(name)
                    for name, (fn, c) in self.aggs.items()
                ],
            )
        )
        version = (meta["version"] + 1) if meta else 0
        dest = self._partials_dir(version)
        shutil.rmtree(dest, ignore_errors=True)  # leftover of a crashed attempt
        if meta is not None:
            old = spark.read.parquet(self._partials_dir(meta["version"]))
            keep = old.where(
                ~F.col("_bucket").isin([int(b) for b in touched])
            )
            fresh = keep.unionByName(fresh)
        # partials are tiny (<= buckets x groups rows): one file
        fresh.coalesce(1).write.parquet(dest)
        self._write_meta(version, epoch, fps)
        # retire versions older than the previous one (kept as the rollback
        # target of a mid-flip crash)
        for d in os.listdir(self.out_dir):
            if d.startswith("v") and d not in (
                f"v{version:06d}",
                f"v{max(version - 1, 0):06d}",
            ):
                shutil.rmtree(os.path.join(self.out_dir, d), ignore_errors=True)

    def _write_meta(self, version: int, epoch: int, fps: dict[int, str]) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "epoch": epoch,
                    "bucket_fp": {str(b): v for b, v in fps.items()},
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._meta_path)

    # -------------------------------------------------------------- reads
    def partials(self) -> DataFrame:
        meta = self._load_meta()
        if meta is None:
            raise FileNotFoundError("view has no committed version yet")
        return self.table.spark.read.parquet(self._partials_dir(meta["version"]))

    def view(self) -> DataFrame:
        """The materialized aggregate: group_cols -> (n_rows, sum_*,
        custom aggs) — partials merge with the same decomposable fn."""
        p = self.partials()
        return p.groupBy(*self.group_cols).agg(
            F.sum("n_rows").alias("n_rows"),
            *[
                F.sum(f"sum_{c}").cast("long").alias(f"sum_{c}")
                for c in self.sum_cols
            ],
            *[
                self._MERGEABLE[fn][1](name).alias(name)
                for name, (fn, _) in self.aggs.items()
            ],
        )


class ConsoleSink:
    """Debug sink (console_item_exporter analog); delegates to the shared
    ``console_sink`` pretty-printer."""

    def __init__(self, n: int = 20):
        self.n = n

    def apply(self, seg: DataFrame, group_epoch, seg_idx, fence, manifest, min_seq):
        from hemera_indexer_spark.sources.files import console_sink

        console_sink(seg, self.n)

    def rollback(self, cond: Column, seq_at_least: int):
        pass


class SignatureIndexSink:
    """Near-dup signature index maintained as part of the exporter fan-out:
    after each committed group, the :class:`~hemera_indexer_spark.operators.
    dedup_index.SignatureIndex` syncs from the STATE table's net change feed
    — so the ingest loop keeps a queryable "is this incoming doc a near-dup
    of anything committed?" structure current at commit granularity, the
    reference's derived-cache discipline (token caches refreshed as jobs
    discover rows) applied to dedup.

    Shape mirrors IncrementalAggSink: ``apply``/``rollback`` are no-ops
    (the index derives from the MERGED state, where LWW ties, deletes and
    rollbacks are already resolved; re-signing raw segments would re-apply
    rows a rollback later retracts), and maintenance runs in ``after_commit``
    on the main thread, where reading the state table is race-free.

    Epoch domains are kept separate by construction — the trap ADVICE.md
    round 3 flagged on IncrementalAggSink: the index's own manifest fence
    stays in the SOURCE-SNAPSHOT-VERSION domain (its sync cursor), while the
    controller-facing ``committed_epoch()`` reads a LOG-epoch table property
    stamped atomically with each maintenance merge. Both are monotone."""

    FENCE_PROP = "source_log_epoch"

    def __init__(
        self,
        table: LakeTable,
        index,
        text_col: str = "tokens",
        report_dir: str | None = None,
        report_threshold: float = 0.5,
        fence_key: str | None = None,
    ):
        # ``index``: a SignatureIndex built over ``table`` (typically
        # build_from_table on the state table before the run, or a fresh
        # empty-corpus build). text_col may be an array column — token-id
        # n-grams (the north-rule tokens:array<int> case).
        #
        # ``report_dir``: opt-in near-dup ADMISSION report — before each
        # sync, the group's inserted/updated docs are checked against the
        # PREVIOUSLY committed corpus (the index as of the last sync) and
        # verified pairs land under ``report_dir/epoch=<N>/`` as parquet
        # (new_id, base_id, jaccard). Deterministic path, overwritten on
        # re-drive — idempotent. Pairs against a doc deleted in the same
        # group verify against nothing (its text is gone) and drop out.
        #
        # ``fence_key``: REQUIRED when several tenant controllers share ONE
        # index over a shared state table (pass the tenant id). Each
        # controller's log-epoch sequence is independent, and the fence is
        # monotone-max — one shared property would let tenant A's epoch 7
        # fence out tenant B's epochs 0..7 in B's committed-floor check.
        # The index CONTENT needs no namespacing (its sync cursor lives in
        # the shared source-version domain and every sync covers all
        # tenants' changes); only this log-epoch fence is per-controller.
        # Give each tenant its own ``report_dir`` too — report partitions
        # are keyed by log epoch.
        self.table = table
        self.index = index
        self.text_col = text_col
        self.report_dir = report_dir
        self.report_threshold = report_threshold
        self.fence_prop = (
            self.FENCE_PROP if fence_key is None
            else f"{self.FENCE_PROP}:{fence_key}"
        )

    def apply(self, seg: DataFrame, group_epoch, seg_idx, fence, manifest, min_seq):
        pass  # maintenance is change-feed-driven, after the state commit

    def rollback(self, cond: Column, seq_at_least: int):
        pass  # the rollback rewrites state files -> changes_since reports the net effect

    def committed_epoch(self) -> int:
        self.index.table.refresh()
        return int(
            self.index.table.snapshot["properties"].get(self.fence_prop, -1)
        )

    def after_commit(self, group_epoch: int, is_last: bool):
        if not is_last:
            return
        self.table.refresh()
        fence = max(int(group_epoch), self.committed_epoch())  # monotone
        if self.report_dir is not None:
            self._write_report(fence)
        synced = self.index.update_from_changes(
            self.table,
            id_col=self.table.key_col,
            text_col=self.text_col,
            properties_update={self.fence_prop: fence},
        )
        if not synced and self.committed_epoch() < fence:
            # state version unchanged (an all-fenced re-driven group) but the
            # log fence lags: advance it alone so the controller's committed
            # floor can't livelock on a group that will never change state
            self.index.table.update_properties({self.fence_prop: fence})

    def _write_report(self, fence: int) -> None:
        """Admission report for the group: its inserted/updated docs checked
        against the PREVIOUSLY committed corpus (candidates from the index
        as of the last sync — two near-dups arriving in the SAME group are
        by design not flagged against each other; they meet at the next
        group). Runs before the sync so the feed and the candidate set share
        the same cut. Deterministic per-epoch dir, overwritten on re-drive."""
        key = self.table.key_col
        since = self.index.synced_version()
        if self.table.snapshot["version"] <= since:
            return  # nothing new; keep the prior epoch's report untouched
        fresh = (
            self.table.changes_since(since)
            .where(F.col("change_op") != "delete")
            .select(F.col(key), F.col(self.text_col))
        )
        caches: list = []
        pairs = self.index.check(
            fresh,
            self.table.current_state(),
            id_col=key,
            text_col=self.text_col,
            threshold=self.report_threshold,
            caches=caches,
        )
        dest = os.path.join(self.report_dir, f"epoch={fence:05d}")
        try:
            pairs.withColumn("epoch", F.lit(fence)).write.mode("overwrite").parquet(dest)
        finally:
            # this runs once per committed group for the life of the ingest
            # loop — leaked caches here accumulate executor storage forever
            for c in caches:
                c.unpersist()


class IVFIndexSink:
    """ANN-index maintenance as part of the exporter fan-out: after each
    committed group, the :class:`~hemera_indexer_spark.operators.ivf_index.
    IVFIndex` syncs from the state table's net change feed — the
    SignatureIndexSink discipline applied to the IVF quantizer, so the
    ingest loop keeps a queryable vector index current at commit
    granularity, assignments O(changed vectors) per group.

    ``max_drift``: when set, the sink runs the index's ``maybe_retrain``
    policy instead of a plain sync — the quantizer retrains in-line when
    the corpus has drifted past the threshold since training (retraining is
    a full-corpus pass; leave it to an offline ``lake_admin.py
    ivf-maintain`` run by passing None, the default).

    Epoch-domain and tenancy rules are SignatureIndexSink's: the index's
    manifest fence stays in the source-snapshot-version domain; the
    controller-facing ``committed_epoch()`` reads a log-epoch property
    stamped with each sync (namespaced via ``fence_key`` when several
    tenant controllers share one index)."""

    FENCE_PROP = "source_log_epoch"

    def __init__(
        self,
        table: LakeTable,
        index,
        id_col: str = "doc_id",
        vec_col: str = "embedding",
        max_drift: float | None = None,
        fence_key: str | None = None,
    ):
        self.table = table
        self.index = index
        self.id_col = id_col
        self.vec_col = vec_col
        self.max_drift = max_drift
        self.fence_prop = (
            self.FENCE_PROP if fence_key is None
            else f"{self.FENCE_PROP}:{fence_key}"
        )

    def apply(self, seg, group_epoch, seg_idx, fence, manifest, min_seq):
        pass  # maintenance is change-feed-driven, after the state commit

    def rollback(self, cond, seq_at_least: int):
        pass  # the rollback rewrites state files -> changes_since nets it

    def committed_epoch(self) -> int:
        self.index.table.refresh()
        return int(
            self.index.table.snapshot["properties"].get(self.fence_prop, -1)
        )

    def after_commit(self, group_epoch: int, is_last: bool):
        if not is_last:
            return
        self.table.refresh()
        fence = max(int(group_epoch), self.committed_epoch())  # monotone
        moved = False
        if (
            self.max_drift is not None
            and self.index.drift(self.table, id_col=self.id_col)
            >= self.max_drift
        ):
            moved = self.index.retrain(
                self.table, id_col=self.id_col, vec_col=self.vec_col
            )
            if moved:
                self.index.table.update_properties({self.fence_prop: fence})
        else:
            moved = self.index.update_from_changes(
                self.table,
                id_col=self.id_col,
                vec_col=self.vec_col,
                properties_update={self.fence_prop: fence},
            )
        if not moved and self.committed_epoch() < fence:
            # state version unchanged (an all-fenced re-driven group) but
            # the log fence lags: advance it alone so the controller's
            # committed floor can't livelock
            self.index.table.update_properties({self.fence_prop: fence})


# IVFIndexSink is written against the vector-index maintenance PROTOCOL
# (drift / retrain / update_from_changes / synced_version, all keyed by
# id_col/vec_col), not the IVF class: PQIndex (operators/pq_index.py)
# implements the same verbs and drives through it unchanged. The alias
# names that contract at call sites.
VectorIndexSink = IVFIndexSink


class SecondaryIndexSink:
    """Secondary-index maintenance as part of the exporter fan-out: after
    each committed group the :class:`~hemera_indexer_spark.operators.
    secondary_index.SecondaryIndex` syncs from the state table's change
    feed (O(changed rows)); the value-sorted projection is refreshed when
    its staleness crosses ``maintain_after`` sync rounds — between
    refreshes lookups stay correct through the index's narrow-scan path,
    so projection rewrites are a cost knob, never a correctness one.
    Epoch-domain and tenancy rules are the index-sink family's
    (SignatureIndexSink docstring)."""

    FENCE_PROP = "source_log_epoch"

    def __init__(
        self,
        table: LakeTable,
        index,
        maintain_after: int | None = None,
        fence_key: str | None = None,
    ):
        self.table = table
        self.index = index
        self.maintain_after = maintain_after
        self.fence_prop = (
            self.FENCE_PROP if fence_key is None
            else f"{self.FENCE_PROP}:{fence_key}"
        )

    def apply(self, seg, group_epoch, seg_idx, fence, manifest, min_seq):
        pass  # maintenance is change-feed-driven, after the state commit

    def rollback(self, cond, seq_at_least: int):
        pass  # the rollback rewrites state files -> changes_since nets it

    def committed_epoch(self) -> int:
        self.index.table.refresh()
        return int(
            self.index.table.snapshot["properties"].get(self.fence_prop, -1)
        )

    def after_commit(self, group_epoch: int, is_last: bool):
        if not is_last:
            return
        self.table.refresh()
        fence = max(int(group_epoch), self.committed_epoch())  # monotone
        moved = self.index.update_from_changes(
            self.table, properties_update={self.fence_prop: fence}
        )
        if not moved and self.committed_epoch() < fence:
            # all-fenced re-driven group: advance the log fence alone so
            # the controller's committed floor can't livelock
            self.index.table.update_properties({self.fence_prop: fence})
        if (
            self.maintain_after is not None
            and self.index.synced_version() - self.index.projection_synced()
            >= self.maintain_after
        ):
            self.index.maintain()


class ChangelogExportSink:
    """Debezium-shaped changelog EGRESS: after each committed group, the
    state table's net change feed is exported as envelope rows

        (<key>, op ∈ c|u|d, before: struct, after: struct,
         version_from, version_to, epoch)

    — ``c`` carries only ``after``, ``d`` only ``before``, ``u`` both
    images (from ``changes_since(cdf=True)``), so a downstream system
    (search cluster, replica, feature store, audit trail) tails the lake
    the way Debezium consumers tail a database binlog, without ever
    scanning the table. This closes the engine's WAL loop: changelog in
    (StreamController) → lake state → changelog out.

    NET-feed semantics, by design: the images are the resolved states at
    the two snapshot versions — a key upserted then rolled back inside
    one sync window exports nothing, and intermediate hops within a
    window collapse (Iceberg-changelog/Delta-CDF semantics, not a
    physical binlog replay). Consumers needing every hop should tail the
    SOURCE changelog; consumers needing consistent state transitions —
    the common case — want exactly this feed.

    Scale shape: each sync costs O(changed buckets) (the
    ``changes_since`` bucket-diff prune) + one parquet write of the net
    rows; nothing is collected. Idempotence: each sync writes a
    DETERMINISTIC ``chg_v<from>_<to>`` directory with mode=overwrite and
    flips the ``_cursor`` JSON last (fsync + rename) — a re-driven group
    overwrites the identical directory byte-range and re-flips the same
    cursor. Provenance is the (version_from, version_to, epoch) triple;
    no wall-clock field, so re-drives are byte-stable.

    ``rollback`` is a no-op: a reorg rewrites state files, and the next
    sync's net diff reports the retractions as ``d``/``u`` envelopes —
    the same discipline as the other change-feed-driven sinks."""

    def __init__(self, table: LakeTable, out_dir: str,
                 initial_version: int | None = None):
        # ``initial_version``: export changes AFTER this snapshot version
        # (default: the table version at sink construction — attach-time
        # semantics; pass 0 to backfill the full current state as ``c``
        # envelopes on the first sync).
        if table.is_fact_table:
            # The envelope shape and every consumer fold (LakeMirror's
            # per-key LWW) assume state semantics; a fact table has no
            # per-key uniqueness, so a mirrored fold would silently
            # collapse its history. Append-only history replicates by
            # file copy (clone_to / object-store replication), not by
            # row envelopes.
            raise ValueError(
                "ChangelogExportSink exports STATE tables only; "
                "replicate fact tables with clone_to or file-level copy"
            )
        self.table = table
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        if self._load_cursor() is None:
            v0 = (
                table.snapshot["version"]
                if initial_version is None
                else int(initial_version)
            )
            self._write_cursor(v0, -1)

    # ------------------------------------------------------------- cursor
    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.out_dir, "_cursor")

    def _load_cursor(self) -> dict | None:
        if not os.path.exists(self._cursor_path):
            return None
        with open(self._cursor_path) as f:
            return json.load(f)

    def _write_cursor(self, version: int, epoch: int) -> None:
        tmp = self._cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": int(version), "epoch": int(epoch)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._cursor_path)

    # ------------------------------------------------------ sink contract
    def apply(self, seg: DataFrame, group_epoch, seg_idx, fence, manifest, min_seq):
        pass  # egress is change-feed-driven, after the state commit

    def rollback(self, cond: Column, seq_at_least: int):
        pass  # the next sync's net diff exports the retraction envelopes

    def committed_epoch(self) -> int:
        cur = self._load_cursor()
        return cur["epoch"] if cur else -1

    def after_commit(self, group_epoch: int, is_last: bool):
        if not is_last:
            return
        self.table.refresh()
        cur = self._load_cursor()
        epoch = max(int(group_epoch), cur["epoch"])  # monotone
        self.sync(epoch)

    # -------------------------------------------------------------- sync
    def sync(self, epoch: int) -> bool:
        """Export the net changes since the cursor version; returns True
        if a new envelope directory was written. Always advances the
        epoch fence (an all-fenced re-driven group moves the fence even
        when the state version is unchanged — the committed-floor
        livelock guard every change-feed sink in this module applies)."""
        cur = self._load_cursor()
        since, to = cur["version"], self.table.snapshot["version"]
        if to <= since:
            if epoch > cur["epoch"]:
                self._write_cursor(since, epoch)
            return False
        # The envelope pivot reads the feed FOUR ways (c / d / update
        # pre-join / update post-join); without one materialization the
        # whole changes_since fold (two snapshot resolves + a full-outer
        # join) re-runs per branch (scripts/probe_mirror.py, BENCH.md).
        feed = self.table.changes_since(since, cdf=True).persist()
        try:
            # materialize the cache with ONE action before the pivot: the
            # four branches run inside a single write job, and partitions
            # not yet cached when concurrent branch tasks hit them would
            # re-run the fold per branch anyway
            feed.count()
            env = self._envelope_of(feed, self.table.key_col)
            dest = os.path.join(
                self.out_dir, f"chg_v{since:06d}_{to:06d}"
            )
            (
                env.withColumn("version_from", F.lit(since))
                .withColumn("version_to", F.lit(to))
                .withColumn("epoch", F.lit(epoch))
                .write.mode("overwrite")
                .parquet(dest)
            )
            self._write_schema_sidecar(dest)
        finally:
            feed.unpersist()
        self._write_cursor(to, epoch)
        return True

    def _write_schema_sidecar(self, dest: str) -> None:
        """Ship the source's schema log with the envelope directory
        (``_schema_log.json`` — the underscore keeps it invisible to
        Spark's directory scan). Envelope images always carry HEAD-time
        column names, so a consumer replaying the feed must apply the
        source's renames/drops to its replica BEFORE merging a directory
        exported after them; each directory carrying the log as of its
        own export time makes a from-scratch replay converge through
        every historical schema change (LakeMirror._apply_schema_log)."""
        log = self.table.snapshot.get("schema_log", [])
        if not log:
            return
        tmp = os.path.join(dest, "_schema_log.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"schema_log": log}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(dest, "_schema_log.json"))

    def apply_purge(self, purged_keys: list) -> bool:
        """Fast-forward the export across a source ``purge_keys`` (RTBF).

        The purge expires the pre-purge snapshots, so ``sync()``'s
        ``changes_since`` from the cursor is impossible BY DESIGN — the
        same situation ``apply_purge`` solves for the derived indexes
        (operators/dedup_index.py:468). Only the purged keys changed, so
        the export writes one PURGE DIRECTORY: a keys-only 'd' envelope
        per purged key with NULL images — deliberately imageless, a
        right-to-be-forgotten feed must not re-export the payload it is
        deleting — plus a ``purge=true`` marker column consumers
        (LakeMirror) use to run a physical purge on their side instead of
        a plain tombstone. Cursor advances to the post-purge head.

        Contract (sync-then-purge, same as the indexes): the export must
        have been synced to the head at the moment of the purge; any
        other change since the old cursor would be silently missed —
        re-export from scratch instead."""
        from pyspark.sql.types import StructType

        self.table.refresh()
        cur = self._load_cursor()
        since, to = cur["version"], self.table.snapshot["version"]
        if to <= since:
            return False
        if not purged_keys:
            raise ValueError("apply_purge requires the purged key list")
        key = self.table.key_col
        key_type = next(
            f.dataType for f in self.table.schema.fields if f.name == key
        )
        img_type = StructType(
            [f for f in self.table.schema.fields if f.name != key]
        )
        spark = self.table.spark
        ids = spark.createDataFrame(
            [(k,) for k in purged_keys],
            StructType([T.StructField(key, key_type)]),
        )
        null_img = F.lit(None).cast(img_type)
        env = ids.select(
            F.col(key),
            F.lit("d").alias("op"),
            null_img.alias("before"),
            null_img.alias("after"),
            F.lit(True).alias("purge"),
            F.lit(since).alias("version_from"),
            F.lit(to).alias("version_to"),
            F.lit(cur["epoch"]).alias("epoch"),
        )
        dest = os.path.join(self.out_dir, f"chg_v{since:06d}_{to:06d}")
        env.write.mode("overwrite").parquet(dest)
        self._write_schema_sidecar(dest)
        self._write_cursor(to, cur["epoch"])
        return True

    # ---------------------------------------------------------- envelope
    @staticmethod
    def envelope(table: LakeTable, since: int) -> DataFrame:
        """The Debezium reshape of ``changes_since(since, cdf=True)``:
        one row per changed key with before/after images as structs.
        Convenience wrapper; ``sync`` persists the feed first (the pivot
        reads it four ways)."""
        return ChangelogExportSink._envelope_of(
            table.changes_since(since, cdf=True), table.key_col
        )

    @staticmethod
    def _envelope_of(feed: DataFrame, key: str) -> DataFrame:
        """Pivot a cdf feed into envelopes. The pre/post pivot is an
        equi-join on the key BETWEEN the two update halves of the same
        feed, and updates are a subset of changed keys, so the join is
        bounded by the net change size, never the table."""
        from pyspark.sql.types import StructType

        cols = [c for c in feed.columns if c != "change_op"]
        img_fields = [f for f in feed.schema.fields if f.name in cols and f.name != key]
        img_type = StructType(img_fields)
        row = F.struct(*[F.col(c) for c in cols if c != key])
        null_img = F.lit(None).cast(img_type)
        ins = feed.where(F.col("change_op") == "insert").select(
            F.col(key),
            F.lit("c").alias("op"),
            null_img.alias("before"),
            row.alias("after"),
        )
        dels = feed.where(F.col("change_op") == "delete").select(
            F.col(key),
            F.lit("d").alias("op"),
            row.alias("before"),
            null_img.alias("after"),
        )
        pre = feed.where(
            F.col("change_op") == "update_preimage"
        ).select(F.col(key), row.alias("before"))
        post = feed.where(
            F.col("change_op") == "update_postimage"
        ).select(F.col(key), row.alias("after"))
        upd = pre.join(post, key).select(
            F.col(key), F.lit("u").alias("op"), "before", "after"
        )
        return ins.unionByName(dels).unionByName(upd)

    # ------------------------------------------------------------- reads
    def feed(self) -> DataFrame:
        """Every exported envelope ≤ the cursor version, in one frame —
        order by (version_to, <key>) for a replayable stream."""
        cur = self._load_cursor()
        dirs = sorted(
            os.path.join(self.out_dir, d)
            for d in os.listdir(self.out_dir)
            if d.startswith("chg_v")
            and int(d.split("_")[-1]) <= cur["version"]
        )
        if not dirs:
            raise FileNotFoundError("no envelopes exported yet")
        # mergeSchema: envelopes written before a mid-stream schema
        # evolution carry narrower image structs than later ones
        return (
            self.table.spark.read.option("mergeSchema", "true")
            .parquet(*dirs)
        )
