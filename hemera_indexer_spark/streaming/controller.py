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

Reorg-rollback (/root/reference/indexer/controller/reorg_controller.py:28-93):
a ``rollback`` event with ``rollback_to_seq=S`` on log partition ``p``
invalidates every state row on ``p`` with ``seq >= S``; corrected events that
follow re-insert repaired rows. The epoch's events are segmented at rollback
sequence numbers (comparison is on ``seq``, never file order, so shuffled
delivery is harmless) and applied segment → rollback → segment.

Additive schema evolution: new columns appearing in epoch files (detected
from Parquet footers, no data scan) are ALTER-ADDed to the table before the
merge; rows last written earlier read as NULL.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.functions import log_partition_col
from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import CHANGE_EVENT_SCHEMA

_ARROW_TO_SPARK = {
    pa.string(): T.StringType(),
    pa.large_string(): T.StringType(),
    pa.int64(): T.LongType(),
    pa.int32(): T.IntegerType(),
    pa.float64(): T.DoubleType(),
    pa.float32(): T.FloatType(),
    pa.bool_(): T.BooleanType(),
}


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
        merge_strategy: str = "arrow",
        compact_max_deltas: int = 8,
    ):
        self.spark = spark
        self.table = table
        self.log_dir = log_dir
        self.n_partitions = n_partitions
        self.merge_strategy = merge_strategy
        # merge-on-read: fold a bucket back to base once this many delta
        # files accumulate (bounds read amplification)
        self.compact_max_deltas = compact_max_deltas

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
        - per-partition lineage: row counts + max(seq) (footer column stats;
          the partition id comes from the directory name),
        - whether any rollback event can exist (``rollback_to_seq`` is
          non-null exactly on rollback events, so a file whose footer says
          null_count == num_rows provably has none).

        Falls back to a Spark scan only for the rare epochs that do contain
        rollbacks (handled by the caller)."""
        from concurrent.futures import ThreadPoolExecutor

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
            mx, rb_nulls = None, 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(seq_i).statistics
                if st is not None and st.has_min_max:
                    mx = st.max if mx is None else max(mx, st.max)
                rst = md.row_group(rg).column(rb_i).statistics
                rb_nulls += rst.null_count if rst is not None else 0
            part = int(os.path.basename(os.path.dirname(f)).split("=")[1])
            return {
                "partition": part,
                "rows": md.num_rows,
                "max_seq": mx,
                "maybe_rollback": rb_nulls < md.num_rows,
                "extra": extra,
            }

        with ThreadPoolExecutor(max_workers=8) as ex:
            infos = list(ex.map(one, files))
        extra: dict[str, T.DataType] = {}
        per_part: dict[int, dict] = {}
        maybe_rollback = False
        for i in infos:
            extra.update(i["extra"])
            p = per_part.setdefault(
                i["partition"], {"partition": i["partition"], "cnt": 0, "mx": None}
            )
            p["cnt"] += i["rows"]
            if i["max_seq"] is not None:
                p["mx"] = i["max_seq"] if p["mx"] is None else max(p["mx"], i["max_seq"])
            maybe_rollback = maybe_rollback or i["maybe_rollback"]
        fields = list(base.fields) + [
            T.StructField(n, t, True) for n, t in sorted(extra.items())
        ]
        return {
            "schema": T.StructType(fields),
            "lineage": list(per_part.values()),
            "maybe_rollback": maybe_rollback,
        }

    # ------------------------------------------------------------------- run
    def run(self, max_epochs: int | None = None) -> RunStats:
        stats = RunStats()
        done = self.table.committed_epoch()
        todo = [e for e in self.available_epochs() if e > done]
        if max_epochs is not None:
            todo = todo[:max_epochs]
        for e in todo:
            stats.epochs.append(self.process_epoch(e))
        return stats

    def process_epoch(self, epoch: int) -> EpochStats:
        t0 = time.monotonic()
        if epoch <= self.table.committed_epoch():
            return EpochStats(epoch, 0, 0, 0, skipped=True)
        files = self._epoch_files(epoch)
        meta = self._epoch_meta(files)
        ev_schema = meta["schema"]

        # additive evolution of the state table: any event column that is not
        # engine bookkeeping and not yet in the table becomes a new payload
        # column.
        bookkeeping = {"seq", "epoch", "partition", "op", "rollback_to_seq"}
        state_names = set(self.table.schema.fieldNames())
        new_cols = [
            f
            for f in ev_schema.fields
            if f.name not in bookkeeping and f.name not in state_names
        ]
        if new_cols:
            self.table.evolve_schema(new_cols)

        df = self.spark.read.schema(ev_schema).parquet(*files)

        # rollback events are rare and tiny; the footer pass proves their
        # absence for most epochs (rollback_to_seq all-null), so this scan —
        # pushed down to parquet row-group stats — only runs when one may
        # exist (the reference spawns a whole reorg subprocess here; we just
        # split the batch).
        rollbacks = []
        if meta["maybe_rollback"]:
            rollbacks = sorted(
                df.where(F.col("rollback_to_seq").isNotNull())
                .select("seq", "partition", "rollback_to_seq")
                .collect(),
                key=lambda r: r["seq"],
            )
        lineage_rows = meta["lineage"]
        n_events = sum(r["cnt"] for r in lineage_rows)

        updates = df.where(F.col("op") != "rollback")
        bounds = [r["seq"] for r in rollbacks] + [None]
        lo = None
        for i, rb_seq in enumerate(bounds):
            seg = updates
            if lo is not None:
                seg = seg.where(F.col("seq") > lo)
            if rb_seq is not None:
                seg = seg.where(F.col("seq") < rb_seq)
            is_last = rb_seq is None
            if is_last:
                manifest = self._build_manifest(epoch, lineage_rows, t0)
                self.table.merge_upsert(
                    seg,
                    epoch_id=epoch,
                    manifest=manifest,
                    strategy=self.merge_strategy,
                )
            else:
                self.table.merge_upsert(
                    seg,
                    strategy=self.merge_strategy,
                )
                rb = rollbacks[i]
                self.table.delete_keys_where(
                    (
                        log_partition_col(F.col("doc_id"), self.n_partitions)
                        == F.lit(rb["partition"])
                    )
                    & (F.col("seq") >= F.lit(rb["rollback_to_seq"])),
                    seq_at_least=rb["rollback_to_seq"],
                )
                lo = rb_seq
        self.table.maybe_compact(
            max_deltas=self.compact_max_deltas, strategy=self.merge_strategy
        )
        wall = int((time.monotonic() - t0) * 1000)
        return EpochStats(epoch, n_events, len(rollbacks), wall)

    def _build_manifest(self, epoch: int, lineage_rows, t0: float) -> dict:
        prev = self.table.committed_offsets()
        offsets = dict(prev)
        wall = int((time.monotonic() - t0) * 1000)
        lineage = []
        for r in lineage_rows:
            p = int(r["partition"])
            offsets[p] = max(offsets.get(p, -1), int(r["mx"]))
            lineage.append(
                {
                    "partition": p,
                    "offset": offsets[p],
                    "epoch_id": epoch,
                    "rows_applied": int(r["cnt"]),
                    "wall_ms": wall,
                }
            )
        return {
            "epoch_id": epoch,
            "offsets": {str(k): v for k, v in offsets.items()},
            "lineage": lineage,
        }
