"""Persisted PQ (product-quantization) index: the compressed-codes
counterpart to :class:`~hemera_indexer_spark.operators.ivf_index.IVFIndex`,
closing the gap that ``pq_adc_topk`` re-trains its codebook (iters+1
corpus passes) and re-encodes the corpus on every call. At 100 TB the
codebook is trained ONCE, persisted, and reused; only CHANGED vectors
re-encode, and a query batch touches NOTHING but the codes table — the
m-byte codes are the whole search-time footprint (the point of PQ: the
fp32 corpus never needs to be read to answer a query).

Layout (one LakeTable, one atomic commit domain — the IVFIndex pattern):

- Code rows — (vec_id, seq, is_deleted, codes: array<int>), LWW by
  vec_id, so maintenance inherits the lake's exactly-once epoch fencing,
  deletes, time travel and rollback discipline for free.
- The codebook — m×ks×(dim/m) doubles — rides the SAME snapshot as a
  JSON table property (``pq_codebook``): codebook + codes flip together,
  a reader can never score one generation's codes against another
  generation's codebook.

Family/param pinning follows the SignatureIndex/IVFIndex contract
(``pq.PQ_FAMILY_VERSION`` + m/ks/dim pinned at create; ``load`` refuses
a mismatch loudly). Seqs live in the same WIDENED maintenance-round
domain as IVFIndex (2*version for syncs, 2*version+1 for retrains) so a
retrain at the sync's source version out-sequences it instead of tying
and losing under target-wins-on-tie.

Equality law (tested): on a freshly built/retrained index,
``index.topk(...)`` equals the inline ``pq_adc_topk(...)`` — both run
the ONE shared ``pq_train``/``pq_encode``/``adc_topk_from_codes`` path.
After incremental syncs results are approximate in the usual PQ sense
(new vectors encode against the FROZEN codebook); ``drift()`` measures
how far, ``maybe_retrain()`` is the policy knob.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hemera_indexer_spark.lake.table import LakeTable
from hemera_indexer_spark.operators.dedup_index import IndexFamilyError
from hemera_indexer_spark.operators.pq import (
    PQ_FAMILY_VERSION,
    adc_topk_from_codes,
    _query_cells,
    pq_encode,
    pq_train,
)


class PQIndex:
    """Persisted PQ codebook + per-vector compressed codes."""

    def __init__(self, table: LakeTable):
        self.table = table
        p = table.snapshot["properties"]
        try:
            self.family = int(p["pq_family"])
            self.m = int(p["pq_m"])
            self.ks = int(p["pq_ks"])
            self.in_dim = int(p["pq_dim"])
        except KeyError as e:
            raise IndexFamilyError(
                f"table at {table.root} has no {e.args[0]} property — "
                "not a PQIndex table"
            ) from None
        if self.family != PQ_FAMILY_VERSION:
            raise IndexFamilyError(
                f"persisted codes are PQ family v{self.family}, engine "
                f"is v{PQ_FAMILY_VERSION}: rebuild the index (codes from "
                "mixed families decode incompatibly)"
            )

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def build_from_table(
        cls,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        in_dim: int,
        m: int = 4,
        ks: int = 16,
        iters: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        num_buckets: int = 16,
    ) -> "PQIndex":
        v = source.snapshot["version"]
        schema = T.StructType(
            [
                T.StructField("vec_id", source.schema[id_col].dataType),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("codes", T.ArrayType(T.IntegerType())),
            ]
        )
        table = LakeTable.create(
            spark,
            root,
            schema,
            num_buckets=num_buckets,
            key_col="vec_id",
            seq_col="seq",
            properties={
                "pq_family": str(PQ_FAMILY_VERSION),
                "pq_m": str(m),
                "pq_ks": str(ks),
                "pq_dim": str(in_dim),
                "pq_iters": str(iters),
            },
        )
        idx = cls(table)
        idx._train_and_encode(source, v, id_col, vec_col, epoch_id=v)
        return idx

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "PQIndex":
        return cls(LakeTable.load(spark, root))

    # ---------------------------------------------------------------- state
    def codebook(self) -> dict:
        """The persisted codebook {sub: {code: centroid}}. json
        round-trips doubles exactly (repr-based) — the equality law
        depends on that; keys come back as ints."""
        raw = json.loads(self.table.snapshot["properties"]["pq_codebook"])
        return {
            int(s): {int(c): [float(x) for x in v] for c, v in subs.items()}
            for s, subs in raw.items()
        }

    def trained_version(self) -> int:
        return int(self.table.snapshot["properties"]["pq_trained_version"])

    def rows_at_train(self) -> int:
        return int(self.table.snapshot["properties"]["pq_rows_at_train"])

    def synced_version(self) -> int:
        return self.table.committed_epoch()

    def codes(self) -> DataFrame:
        return self.table.current_state().select("vec_id", "codes")

    # ---------------------------------------------------------- maintenance
    @staticmethod
    def _seq_for(version: int, trained: bool) -> int:
        # the IVFIndex widened-domain rule (ivf_index.py:154) — see module
        # docstring for why a retrain must out-sequence a same-version sync
        return 2 * version + (1 if trained else 0)

    def _valid(self, df: DataFrame, vec_col: str) -> DataFrame:
        # NULL and wrong-dimension vectors are unencodable (subspace
        # slices would be ragged); they drop out of the index like
        # IVFIndex's empties. Zero vectors are FINE here — ADC is L2,
        # not cosine, so no 0/0.
        return df.where(
            F.col(vec_col).isNotNull()
            & (F.size(F.col(vec_col)) == self.in_dim)
        )

    def _train_and_encode(
        self,
        source: LakeTable,
        target: int,
        id_col: str,
        vec_col: str,
        epoch_id: int | None,
    ) -> bool:
        iters = int(self.table.snapshot["properties"]["pq_iters"])
        from hemera_indexer_spark.lake.table import resolve_source_column

        src_vec = resolve_source_column(source, vec_col, "PQIndex train")
        emb = self._valid(
            source.current_state().select(
                F.col(id_col), F.col(src_vec).alias(vec_col)
            ),
            vec_col,
        ).persist()  # training passes + encode + count re-read it
        try:
            book = pq_train(
                emb, self.in_dim, m=self.m, ks=self.ks, iters=iters,
                id_col=id_col, vec_col=vec_col,
            )
            seq_lit = (
                F.lit(self._seq_for(target, trained=True))
                .cast("long")
                .alias("seq")
            )
            rows = pq_encode(
                emb, book, self.in_dim, id_col=id_col, vec_col=vec_col
            ).select(
                F.col(id_col).alias("vec_id"),
                seq_lit,
                F.lit("update").alias("op"),
                "codes",
            )
            stale = (
                self.table.current_state()
                .select("vec_id")
                .join(
                    emb.select(F.col(id_col).alias("vec_id")),
                    "vec_id",
                    "left_anti",
                )
                .select(
                    "vec_id",
                    seq_lit,
                    F.lit("delete").alias("op"),
                    F.lit(None).cast("array<int>").alias("codes"),
                )
            )
            n = emb.count()
            return self.table.merge_upsert(
                rows.unionByName(stale),
                epoch_id=epoch_id,
                properties_update={
                    "pq_codebook": json.dumps(book),
                    "pq_trained_version": str(target),
                    "pq_rows_at_train": str(n),
                },
            )
        finally:
            emb.unpersist()

    def update_from_changes(
        self,
        source: LakeTable,
        since_version: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        properties_update: dict | None = None,
    ) -> bool:
        """Encode CHANGED vectors against the FROZEN persisted codebook —
        O(changed rows), never O(corpus). Fenced on the source's snapshot
        version; re-driven retries are no-ops."""
        since = self.synced_version() if since_version is None else since_version
        if since < 0:
            raise ValueError(
                "index has never synced: build it with build_from_table() "
                "(which records the sync point) or pass since_version"
            )
        target = source.snapshot["version"]
        if target <= since:
            return False
        ch = source.changes_since(since).persist()
        try:
            from hemera_indexer_spark.lake.table import resolve_source_column

            src_vec = resolve_source_column(source, vec_col, "PQIndex sync")
            ups = ch.where(F.col("change_op") != "delete").select(
                F.col(id_col), F.col(src_vec).alias(vec_col)
            )
            seq_lit = (
                F.lit(self._seq_for(target, trained=False))
                .cast("long")
                .alias("seq")
            )
            rows = pq_encode(
                self._valid(ups, vec_col), self.codebook(), self.in_dim,
                id_col=id_col, vec_col=vec_col,
            ).select(
                F.col(id_col).alias("vec_id"),
                seq_lit,
                F.lit("update").alias("op"),
                "codes",
            )
            null_codes = F.lit(None).cast("array<int>").alias("codes")
            # an update that NULLs/reshapes the vector produces no code
            # row — tombstone it or the stale codes surface forever (the
            # IVFIndex emptied-vector discipline)
            emptied = (
                ups.select(F.col(id_col).alias("vec_id"))
                .join(rows.select("vec_id"), "vec_id", "left_anti")
                .select(
                    "vec_id", seq_lit, F.lit("delete").alias("op"), null_codes
                )
            )
            dels = ch.where(F.col("change_op") == "delete").select(
                F.col(id_col).alias("vec_id"),
                seq_lit,
                F.lit("delete").alias("op"),
                null_codes,
            )
            return self.table.merge_upsert(
                rows.unionByName(emptied).unionByName(dels),
                epoch_id=target,
                properties_update=properties_update,
            )
        finally:
            ch.unpersist()

    def drift(self, source: LakeTable, id_col: str = "vec_id") -> float:
        trained = self.trained_version()
        if source.snapshot["version"] <= trained:
            return 0.0
        changed = (
            source.changes_since(trained)
            .select(F.col(id_col))
            .distinct()
            .count()
        )
        return changed / max(self.rows_at_train(), 1)

    def apply_purge(
        self,
        purged_ids: list,
        source: LakeTable,
        physical: bool = True,
        keep_last: int = 1,
    ) -> dict:
        """Fast-forward across a source ``purge_keys`` (RTBF) in
        O(purged keys) — same contract as ``SignatureIndex.apply_purge``:
        tombstone the purged keys' code rows (PQ codes are a lossy
        ENCODING of the purged embedding and must be forgotten) at the
        post-purge head, fenced in one commit. Requires sync-at-purge;
        rebuild otherwise. Physical mode compacts + expires + vacuums so
        no retained index file holds the purged codes."""
        if self.synced_version() < 0:
            raise ValueError(
                "index has never synced; apply_purge fast-forwards an "
                "in-sync cursor — build_from_table() first"
            )
        target = source.snapshot["version"]
        if self.synced_version() >= target:
            return {"applied": False,
                    "synced_version": self.synced_version()}
        kt = next(
            f.dataType for f in self.table.schema.fields
            if f.name == "vec_id"
        )
        ids = self.table.spark.createDataFrame(
            [(i,) for i in purged_ids],
            T.StructType([T.StructField("vec_id", kt)]),
        )
        rows = ids.select(
            "vec_id",
            F.lit(self._seq_for(target, trained=False))
            .cast("long").alias("seq"),
            F.lit("delete").alias("op"),
            F.lit(None).cast("array<int>").alias("codes"),
        )
        applied = self.table.merge_upsert(rows, epoch_id=target)
        out = {"applied": applied, "synced_version": self.synced_version()}
        if physical and applied:
            self.table.compact()
            out["snapshots_expired"] = self.table.expire_snapshots(
                keep_last=keep_last
            )
            out["files_vacuumed"] = self.table.vacuum_orphans()
        return out

    def retrain(
        self,
        source: LakeTable,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> bool:
        target = source.snapshot["version"]
        epoch = target if target > self.synced_version() else None
        return self._train_and_encode(source, target, id_col, vec_col, epoch)

    def maybe_retrain(
        self,
        source: LakeTable,
        max_drift: float = 0.25,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> str:
        if self.drift(source, id_col) >= max_drift:
            self.retrain(source, id_col, vec_col)
            return "retrain"
        return (
            "sync"
            if self.update_from_changes(source, id_col=id_col, vec_col=vec_col)
            else "noop"
        )

    # --------------------------------------------------------------- lookup
    def topk(
        self,
        source: LakeTable,
        query_ids: list,
        k: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ADC top-k against the persisted codes: the only source-table
        touch is reading the FEW query vectors (bucket-pruned point reads
        on a vec_id-bucketed source); the corpus pass scans codes only —
        m ints per vector instead of dim floats, the PQ memory story."""
        q = self._valid(
            source.current_state()
            .where(F.col(id_col).isin(query_ids))
            .select(F.col(id_col), F.col(vec_col)),
            vec_col,
        )
        cells = _query_cells(
            q, self.codebook(), self.in_dim, query_ids, id_col, vec_col
        )
        return adc_topk_from_codes(
            self.codes(), cells, self.m, k, id_col="vec_id"
        )
