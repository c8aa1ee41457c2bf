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
        merge_strategy: str = "pandas",
    ):
        self.spark = spark
        self.table = table
        self.log_dir = log_dir
        self.n_partitions = n_partitions
        self.merge_strategy = merge_strategy

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

    # ------------------------------------------------------- schema evolution
    def _epoch_event_schema(self, files: list[str]) -> T.StructType:
        """Union of the declared event schema and any evolved columns found
        in the epoch's file footers."""
        base = CHANGE_EVENT_SCHEMA
        known = set(base.fieldNames())
        extra: dict[str, T.DataType] = {}
        for f in files:
            sch = pq.read_schema(f)
            for name in sch.names:
                if name not in known and name not in extra:
                    extra[name] = _spark_type(sch.field(name).type)
        fields = list(base.fields) + [
            T.StructField(n, t, True) for n, t in sorted(extra.items())
        ]
        return T.StructType(fields)

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
        ev_schema = self._epoch_event_schema(files)

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

        # rollback events are rare and tiny — collect them to the driver to
        # plan segmentation (the reference spawns a whole reorg subprocess
        # here; we just split the batch).
        rollbacks = sorted(
            df.where(F.col("op") == "rollback")
            .select("seq", "partition", "rollback_to_seq")
            .collect(),
            key=lambda r: r["seq"],
        )

        # lineage: per-partition applied counts + new offsets (one cheap agg)
        lineage_rows = (
            df.groupBy("partition")
            .agg(F.max("seq").alias("mx"), F.count("*").alias("cnt"))
            .collect()
        )
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
                self.table.merge_upsert(seg, strategy=self.merge_strategy)
                rb = rollbacks[i]
                self.table.delete_where(
                    (
                        log_partition_col(F.col("doc_id"), self.n_partitions)
                        == F.lit(rb["partition"])
                    )
                    & (F.col("seq") >= F.lit(rb["rollback_to_seq"])),
                    seq_at_least=rb["rollback_to_seq"],
                )
                lo = rb_seq
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
