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
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.sources.files import write_range_files


class FactSink:
    """Append-only history table (ON CONFLICT DO NOTHING analog,
    /root/reference/indexer/exporters/postgres_item_exporter.py:126-130)."""

    def __init__(self, table: LakeTable):
        self.table = table

    def apply(self, seg: DataFrame, group_epoch, seg_idx, fence, manifest, min_seq):
        self.table.insert_if_absent(
            seg,
            epoch_id=group_epoch if fence else None,
            manifest=manifest if fence else None,
            min_seq=min_seq,
        )

    def rollback(self, cond: Column, seq_at_least: int):
        # facts are append-only history: a plain row-level delete suffices
        # (nothing to resurrect)
        self.table.delete_where(cond, seq_at_least=seq_at_least)

    def committed_epoch(self) -> int:
        self.table.refresh()
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
