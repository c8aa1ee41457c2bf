"""Policy-driven table maintenance: ONE verb that reads the metadata-only
health report and runs exactly the upkeep a table needs — the scheduler
glue an operator otherwise scripts by hand around compact / pack /
rebucket / expire / vacuum.

The reference runs its upkeep as separate hand-invoked commands
(/root/reference/hemera.py reorg / aggregates); at the 10^10-event design
point the decision inputs (delta depth, small-file count, bucket skew,
retained-snapshot pressure) all live in the snapshot metadata already
(``table_health`` — zero data scan), so the policy loop costs nothing
until it decides to act, and every action it takes is one of the
table's existing atomic, CAS-guarded commits. Safe to run from cron
next to a live single-writer ingest ONLY in the gaps the controller's
own maintenance slot leaves — the same single-writer rule every verb
here already enforces loudly via ``ConcurrentCommitError``.

Decision order matters and is fixed:

1. rewrite layout first (compact state deltas / pack fact small files /
   rebucket on sustained skew) — rewrites create the garbage that steps
   2-3 collect;
2. expire old snapshot metadata (bounded history);
3. vacuum orphaned data files (now-unreferenced pre-rewrite files age
   out of the retained window expired in step 2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .table import LakeTable


@dataclass(frozen=True)
class MaintenancePolicy:
    """Thresholds; ``None`` disables the corresponding action.

    ``compact_delta_depth``: state tables — compact every bucket whose
    merge-on-read delta chain is at least this deep (read amplification
    bound). ``pack_max_files``/``pack_small_rows``: fact tables — the
    size-tiered small-file pack (see ``compact_files``).
    ``fact_truncate_before_seq``: fact retention — drop history below
    this seq (metadata-only file drops + boundary rewrite, see
    ``truncate_before``). ``rebucket_rows_per_bucket``: grow the bucket count (next power of
    two that brings mean rows/bucket under the target) once the table
    outgrows its layout — the expensive, rare rewrite, so it triggers on
    MEAN occupancy, not transient skew. ``expire_keep_last`` /
    ``vacuum_grace_seconds``: retention. ``analyze_lag``: re-run column
    ANALYZE once ``colstats_lag`` reaches this many commits (or if the
    table was never analyzed) — the only policy step that scans data, so
    it runs LAST and only when stale. ``strategy``: compact/rebucket
    merge strategy (sql | jvm | arrow | pandas)."""

    compact_delta_depth: int | None = 8
    fact_truncate_before_seq: int | None = None
    pack_max_files: int | None = 4
    pack_small_rows: int | None = None
    rebucket_rows_per_bucket: int | None = None
    expire_keep_last: int | None = 10
    vacuum_grace_seconds: float | None = 0.0
    analyze_lag: int | None = None
    strategy: str = "jvm"
    cluster_by: tuple[str, ...] = field(default=())


def run_maintenance(
    t: LakeTable, policy: MaintenancePolicy | None = None
) -> dict:
    """Run the policy against one table; returns what was done (plus the
    before/after health headline numbers). Idempotent at the fixpoint: a
    healthy table yields an all-no-op report and ZERO new commits."""
    p = policy or MaintenancePolicy()
    before = t.table_health(
        compact_threshold=p.compact_delta_depth or 2**30
    )
    report: dict = {
        "before": {
            k: before[k]
            for k in ("version", "files", "delta_files", "rows_total",
                      "snapshots_retained", "row_skew")
        }
    }
    # 1a. retention first (fewer rows for the pack to move), then layout
    if t.is_fact_table:
        if p.fact_truncate_before_seq is not None:
            report["truncated"] = t.truncate_before(
                p.fact_truncate_before_seq
            )
            t.refresh()
        if p.pack_max_files is not None:
            report["packed"] = t.compact_files(
                max_files=p.pack_max_files,
                small_rows=p.pack_small_rows,
                cluster_by=p.cluster_by,
            )
            if report["packed"]:
                t.refresh()
    elif p.compact_delta_depth is not None and before["compact_candidates"]:
        report["compacted_buckets"] = before["compact_candidates"]
        t.compact(
            buckets=set(before["compact_candidates"]),
            strategy=p.strategy,
            cluster_by=p.cluster_by,
        )
        t.refresh()
    # 1b. layout: bucket-count evolution on sustained overgrowth — the
    # table's own grow-only policy (next power of two, <= 4x per call)
    if p.rebucket_rows_per_bucket:
        if t.maybe_rebucket(
            p.rebucket_rows_per_bucket, strategy=p.strategy
        ):
            t.refresh()
            report["rebucketed_to"] = t.num_buckets
    # 2. retention: metadata first, then data
    if p.expire_keep_last is not None:
        report["snapshots_expired"] = t.expire_snapshots(
            keep_last=p.expire_keep_last
        )
    if p.vacuum_grace_seconds is not None:
        report["files_vacuumed"] = t.vacuum_orphans(
            grace_seconds=p.vacuum_grace_seconds
        )
    # 3. statistics: the one data-scanning step, only when stale — and
    # AFTER the rewrites above, so the stats describe the new layout's
    # live state and their version stamp postdates the layout commits
    if p.analyze_lag is not None:
        if p.analyze_lag < 2:
            # the analyze commit itself leaves colstats_lag == 1; a
            # threshold below 2 would re-analyze on every run and the
            # policy loop would never reach its zero-commit fixpoint
            raise ValueError("analyze_lag must be >= 2 (see docstring)")
        t.refresh()
        lag = t.table_health()["colstats_lag"]
        if lag is None or lag >= p.analyze_lag:
            report["analyzed"] = sorted(t.analyze())
            t.refresh()
    after = t.table_health(compact_threshold=p.compact_delta_depth or 2**30)
    report["after"] = {
        k: after[k]
        for k in ("version", "files", "delta_files", "rows_total",
                  "snapshots_retained", "row_skew")
    }
    return report
