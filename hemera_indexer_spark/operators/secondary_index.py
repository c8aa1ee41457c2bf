"""CDC-maintained SECONDARY INDEX over a payload column of a state table:
value/range lookups without scanning the corpus.

The reference leans on Postgres secondary indexes for every non-key
predicate (/root/reference/indexer/modules and the explorer's filtered
endpoints assume DB indexes); a lake has to build the equivalent itself.
Two layers, because the two jobs want opposite physical layouts:

- **Maintenance layer** — a narrow LakeTable, one LWW row per key:
  (key, seq, is_deleted, <value_col>). Bucketed by KEY like every state
  table, so ``update_from_changes`` is the standard fenced O(changed-rows)
  merge and inherits exactly-once, deletes, time travel and rollback
  discipline. This layout merges cheaply but its per-file value ranges
  all overlap (hash buckets sample the whole domain) — fine for
  maintenance, useless for range pruning.

- **Lookup layer** — a VALUE-SORTED PROJECTION of the current index state
  (``projection/v=<synced_version>/``): ``repartitionByRange`` on the
  value column, sorted within files, so per-file min/max are DISJOINT by
  construction and a range lookup opens only the overlapping files (file
  skipping enforced here from parquet footers, not left to chance). This
  is the lake analog of an index's sorted runs; ``maintain()`` refreshes
  it after syncs (compact + rewrite, O(index) — the index is two narrow
  columns, tiny next to its corpus).

``lookup()`` picks automatically: the projection when it is in sync with
the maintenance table (exact — the projection IS the current state), else
a narrow full-index scan with the predicate pushed (correct at any
staleness; still never touches the corpus). ``fetch()`` joins surviving
keys back to the source state.

Freshness bookkeeping lives in the SYNC-CURSOR domain (the index
manifest's source-snapshot version), not the index table's own version:
properties-only and compaction commits bump the version without changing
the indexed data, and must not invalidate the projection.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.functions import bucket_col
from hemera_indexer_spark.lake.table import LakeTable, _validate_stats_cols
from hemera_indexer_spark.operators.dedup_index import IndexFamilyError

_PROJ = "projection"
_PROP_VALUE_COL = "secidx_value_col"
_PROP_PROJ_SYNCED = "secidx_proj_synced"


class SecondaryIndex:
    """Value->keys secondary index (see module docstring)."""

    def __init__(self, table: LakeTable):
        self.table = table
        p = table.snapshot["properties"]
        try:
            self.value_col = p[_PROP_VALUE_COL]
        except KeyError:
            raise IndexFamilyError(
                f"table at {table.root} has no {_PROP_VALUE_COL} property — "
                "not a SecondaryIndex table"
            ) from None

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def build_from_table(
        cls,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        value_col: str,
        num_buckets: int = 16,
    ) -> "SecondaryIndex":
        """Index the source's current state and record the sync point (the
        source snapshot version is the index manifest epoch — the shared
        cursor discipline of SignatureIndex/IVFIndex). Call ``maintain()``
        afterwards to materialize the first sorted projection."""
        key = source.key_col
        vfield = source.schema[value_col]
        schema = T.StructType(
            [
                T.StructField(key, source.schema[key].dataType),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField(value_col, vfield.dataType),
            ]
        )
        _validate_stats_cols(schema, (value_col,))
        v = source.snapshot["version"]
        table = LakeTable.create(
            spark,
            root,
            schema,
            num_buckets=num_buckets,
            key_col=key,
            seq_col="seq",
            stats_cols=(value_col,),
            properties={_PROP_VALUE_COL: value_col},
        )
        idx = cls(table)
        rows = source.current_state().select(
            F.col(key),
            F.lit(v).cast("long").alias("seq"),
            F.lit("update").alias("op"),
            F.col(value_col),
        )
        table.merge_upsert(rows, epoch_id=v)
        return idx

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "SecondaryIndex":
        return cls(LakeTable.load(spark, root))

    # ---------------------------------------------------------------- state
    @property
    def key_col(self) -> str:
        return self.table.key_col

    def synced_version(self) -> int:
        return self.table.committed_epoch()

    def projection_synced(self) -> int:
        """Sync-cursor value the current projection was built at (-1 =
        no projection yet)."""
        return int(
            self.table.snapshot["properties"].get(_PROP_PROJ_SYNCED, -1)
        )

    def is_projection_fresh(self) -> bool:
        return self.projection_synced() == self.synced_version()

    # ---------------------------------------------------------- maintenance
    def update_from_changes(
        self,
        source: LakeTable,
        since_version: int | None = None,
        properties_update: dict | None = None,
    ) -> bool:
        """Standard net-feed maintenance: O(changed rows), fenced on the
        source's current snapshot version. The projection goes stale (its
        cursor lags) until the next ``maintain()``; lookups stay correct
        through the narrow-scan path meanwhile."""
        since = self.synced_version() if since_version is None else since_version
        if since < 0:
            raise ValueError(
                "index has never synced: build it with build_from_table()"
            )
        target = source.snapshot["version"]
        if target <= since:
            return False
        ch = source.changes_since(since)
        key, vc = self.key_col, self.value_col
        # the index's own column name stays stable even if the SOURCE
        # renamed the indexed column — resolve the feed-side name through
        # the source's schema log (drop = loud rebuild-me error)
        from hemera_indexer_spark.lake.table import resolve_source_column

        src_vc = resolve_source_column(source, vc, "SecondaryIndex sync")
        seq_lit = F.lit(target).cast("long").alias("seq")
        ups = ch.where(F.col("change_op") != "delete").select(
            F.col(key), seq_lit, F.lit("update").alias("op"),
            F.col(src_vc).alias(vc),
        )
        dels = ch.where(F.col("change_op") == "delete").select(
            F.col(key),
            seq_lit,
            F.lit("delete").alias("op"),
            F.lit(None).cast(self.table.schema[vc].dataType.simpleString()).alias(vc),
        )
        return self.table.merge_upsert(
            ups.unionByName(dels),
            epoch_id=target,
            properties_update=properties_update,
        )

    def apply_purge(
        self,
        purged_ids: list,
        source: LakeTable,
        physical: bool = True,
        keep_last: int = 1,
    ) -> dict:
        """Fast-forward across a source ``purge_keys`` (RTBF) in
        O(purged keys) — same contract as
        ``SignatureIndex.apply_purge``: the purge's aggressive snapshot
        expire breaks ``changes_since`` by design, but only the purged
        keys changed, so tombstoning them at the post-purge head version
        (one fenced commit) is complete maintenance. Requires the index
        to have been in sync at the purge (sync-then-purge discipline).

        ``physical=True`` finishes the RTBF: ``maintain()`` compacts the
        maintenance table AND rewrites the sorted projection (which
        holds the purged key's value — it must go too), then expires all
        but ``keep_last`` index snapshots and vacuums."""
        if self.synced_version() < 0:
            raise ValueError(
                "index has never synced; apply_purge fast-forwards an "
                "in-sync cursor — build_from_table() first"
            )
        target = source.snapshot["version"]
        if self.synced_version() >= target:
            return {"applied": False,
                    "synced_version": self.synced_version()}
        key, vc = self.key_col, self.value_col
        kt = next(
            f.dataType for f in self.table.schema.fields if f.name == key
        )
        ids = self.table.spark.createDataFrame(
            [(i,) for i in purged_ids],
            T.StructType([T.StructField(key, kt)]),
        )
        rows = ids.select(
            F.col(key),
            F.lit(target).cast("long").alias("seq"),
            F.lit("delete").alias("op"),
            F.lit(None).cast(
                self.table.schema[vc].dataType.simpleString()
            ).alias(vc),
        )
        applied = self.table.merge_upsert(rows, epoch_id=target)
        out = {"applied": applied, "synced_version": self.synced_version()}
        if physical and applied:
            self.maintain()
            out["snapshots_expired"] = self.table.expire_snapshots(
                keep_last=keep_last
            )
            out["files_vacuumed"] = self.table.vacuum_orphans()
        return out

    def maintain(self, n_files: int | None = None) -> None:
        """Compact the maintenance table (value-clustered for row-group
        locality) and rewrite the sorted projection: ``n_files`` range
        partitions (default: the table's bucket count), per-file value
        ranges disjoint. Old projection generations are removed. Idempotent
        — re-running after a crash converges (the property flips last, and
        a projection dir for the same cursor value is deterministic)."""
        self.table.compact(cluster_by=(self.value_col,))
        synced = self.synced_version()
        dest = os.path.join(self.table.root, _PROJ, f"v={synced:010d}")
        cur = self.table.current_state().select(self.key_col, self.value_col)
        (
            cur.repartitionByRange(
                n_files or self.table.num_buckets, F.col(self.value_col)
            )
            .sortWithinPartitions(self.value_col)
            .write.mode("overwrite")
            .parquet(dest)
        )
        self.table.update_properties({_PROP_PROJ_SYNCED: str(synced)})
        proj_root = os.path.join(self.table.root, _PROJ)
        for d in os.listdir(proj_root):
            if d.startswith("v=") and d != f"v={synced:010d}":
                shutil.rmtree(os.path.join(proj_root, d), ignore_errors=True)

    # --------------------------------------------------------------- lookup
    def _proj_files(self, lo, hi) -> tuple[list[str], int]:
        """(kept files, total files) of the current projection for a value
        range — file skipping proved from parquet footer min/max (missing
        stats keep the file; pruning is never a correctness dependency)."""
        import pyarrow.parquet as pq

        d = os.path.join(
            self.table.root, _PROJ, f"v={self.projection_synced():010d}"
        )
        files = sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        kept = []
        for f in files:
            md = pq.read_metadata(f)
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ci = names[self.value_col]
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mn = mx = None
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            if mn is None:
                kept.append(f)  # unprovable -> keep
                continue
            if lo is not None and mx < lo:
                continue
            if hi is not None and mn > hi:
                continue
            kept.append(f)
        return kept, len(files)

    def _pred(self, lo, hi):
        c = F.col(self.value_col)
        pred = c.isNotNull()
        if lo is not None:
            pred = pred & (c >= F.lit(lo))
        if hi is not None:
            pred = pred & (c <= F.lit(hi))
        return pred

    def lookup(self, lo=None, hi=None) -> DataFrame:
        """Keys whose CURRENT value lies in [lo, hi] (either bound may be
        None), as (key, value). Fast path: the sorted projection, opening
        only footer-overlapping files. Stale-projection path: a narrow
        full-index scan of the LWW state with the predicate pushed —
        correct at any staleness, still corpus-free."""
        if self.is_projection_fresh():
            kept, _total = self._proj_files(lo, hi)
            if not kept:
                return (
                    self.table.current_state()
                    .select(self.key_col, self.value_col)
                    .limit(0)
                )
            return (
                self.table.spark.read.parquet(*kept).where(self._pred(lo, hi))
            )
        return (
            self.table.current_state()
            .where(self._pred(lo, hi))
            .select(self.key_col, self.value_col)
        )

    def fetch(
        self,
        source: LakeTable,
        lo=None,
        hi=None,
        prune_buckets: bool = False,
    ) -> DataFrame:
        """Source-state rows whose indexed value lies in the range. With
        ``prune_buckets`` the matching keys' buckets are computed first
        (one action over the index result — bounded by lookup selectivity)
        and the source resolve reads ONLY those buckets; otherwise one
        corpus-wide semi-join."""
        keys = self.lookup(lo, hi).select(self.key_col)
        if prune_buckets:
            bset = {
                r["b"]
                for r in keys.select(
                    bucket_col(
                        F.col(self.key_col), source.num_buckets
                    ).alias("b")
                )
                .distinct()
                .collect()
            }
            state = source.current_state(buckets=bset)
        else:
            state = source.current_state()
        return state.join(keys, self.key_col, "left_semi")
