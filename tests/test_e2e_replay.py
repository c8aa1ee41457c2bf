"""End-to-end: replay the synthetic change log through the Spark engine and
assert the final lake state row-for-row against the single-threaded oracle
fold under token-array equality (the north-star correctness gate)."""

import pytest

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.oracle import expected_live_rows
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.streaming import StreamController


def test_rollback_to_then_redrive_converges(spark, tiny_log, tmp_path):
    """Bad-batch recovery law: rollback_to(v) + controller re-drive ends at
    the same oracle state a clean full replay produces — through the log's
    own reorg epoch AND a second pass over mid-stream schema evolution
    (the restore target predates the lang column, so the re-drive must
    ALTER-add it again)."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake_rb"), SEQUENCES_SCHEMA, num_buckets=8
    )
    # one epoch per commit so a snapshot exists at every epoch boundary
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        max_batch_epochs=1,
    ).run()
    _assert_state_matches_oracle(
        table, tiny_log.out_dir, tiny_log.spec.n_partitions
    )
    # restore to the commit that fenced epoch 3 (pre-evolution, pre-reorg)
    target = next(
        s["version"] for s in table.snapshots() if s["epoch_id"] == 3
    )
    table.rollback_to(target)
    assert table.committed_epoch() == 3
    assert "lang" not in table.schema.fieldNames()
    # fresh controller re-drives epochs 4.. from the restored cursor
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions
    ).run()
    assert "lang" in table.schema.fieldNames()
    _assert_state_matches_oracle(
        table, tiny_log.out_dir, tiny_log.spec.n_partitions
    )


def test_rollback_to_tenant_mode_redrive_converges(spark, tmp_path):
    """rollback_to on a SHARED tenant table rolls every tenant's
    namespaced fence back coherently with the data (properties come from
    the target snapshot wholesale): after the restore, BOTH tenant
    controllers re-drive from their restored cursors and every tenant
    converges to its own log's oracle."""
    from hemera_indexer_spark.oracle import expected_live_rows
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from pyspark.sql import functions as F

    table = LakeTable.create(
        spark, str(tmp_path / "lake_trb"), SEQUENCES_SCHEMA, num_buckets=8
    )
    logs = {}
    for tenant in (1, 2):
        spec = ChangelogSpec(
            n_docs=150, n_epochs=5, events_per_epoch=250, n_partitions=4,
            seed=300 + tenant, rollback_epochs=(3,),
            doc_prefix=f"t{tenant}_doc",
        )
        logs[tenant] = generate_changelog(
            str(tmp_path / f"log_trb{tenant}"), spec
        )

    def ctl(tenant):
        return StreamController(
            spark, table, logs[tenant].out_dir, 4,
            tenant_col="chain_id", tenant_id=tenant,
        )

    ctl(1).run(max_epochs=2)
    v_mid = table.snapshot["version"]  # t1 partial, t2 absent
    ctl(1).run()
    ctl(2).run()

    def tenant_state(tenant):
        return sorted(
            (r.asDict(recursive=True) for r in table.current_state()
             .where(F.col("chain_id") == tenant).collect()),
            key=lambda d: d["doc_id"],
        )

    full = {t: tenant_state(t) for t in (1, 2)}
    table.rollback_to(v_mid)
    assert tenant_state(2) == []  # t2's world rolled back to nothing
    # both tenants re-drive from their RESTORED namespaced cursors
    ctl(2).run()
    ctl(1).run()
    for tenant in (1, 2):
        got = tenant_state(tenant)
        assert got == full[tenant], f"tenant {tenant} diverged"
        exp = expected_live_rows(logs[tenant].out_dir, 4)
        assert len(got) == len(exp)
        assert all(
            g["tokens"] == e["tokens"] for g, e in zip(got, exp)
        ), f"tenant {tenant} oracle"


def _assert_state_matches_oracle(table, log_dir, n_partitions):
    expected = expected_live_rows(log_dir, n_partitions)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(expected), (len(got), len(expected))
    for g, e in zip(got, expected):
        assert g["doc_id"] == e["doc_id"]
        assert g["seq"] == e["seq"], (g["doc_id"], g["seq"], e["seq"])
        assert g["tokens"] == e["tokens"], g["doc_id"]  # token-array equality
        assert g["n_tok"] == e["n_tok"]
        assert g["source"] == e["source"]
        if "lang" in e:
            assert g.get("lang") == e["lang"], g["doc_id"]


@pytest.mark.parametrize(
    "strategy,mode",
    [
        ("jvm", "mor"),
        ("arrow", "mor"),
        ("pandas", "mor"),
        ("sql", "mor"),
        ("jvm", "cow"),
        ("arrow", "cow"),
        ("pandas", "cow"),
        ("sql", "cow"),
    ],
)
def test_full_replay_matches_oracle(spark, tiny_log, tmp_path, strategy, mode):
    table = LakeTable.create(
        spark,
        str(tmp_path / f"lake_{strategy}_{mode}"),
        SEQUENCES_SCHEMA,
        num_buckets=8,
        properties={"write_mode": mode},
    )
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        merge_strategy=strategy, compact_max_deltas=3,
    )
    stats = ctl.run()
    assert len(stats.epochs) == tiny_log.spec.n_epochs
    assert stats.total_events > 0
    _assert_state_matches_oracle(table, tiny_log.out_dir, tiny_log.spec.n_partitions)

    # manifest: per-partition lineage exists and offsets cover every partition
    mdf = table.manifest_df()
    rows = {r["partition"]: r for r in mdf.collect()}
    assert set(rows) <= set(range(tiny_log.spec.n_partitions))
    assert table.committed_epoch() == tiny_log.spec.n_epochs - 1
    offs = table.committed_offsets()
    assert all(v > 0 for v in offs.values())


def test_replay_epoch_twice_is_noop(spark, tiny_log, tmp_path):
    """Exactly-once: re-running an already-committed epoch changes nothing
    (epoch fencing), and even a forced re-merge of the same batch is a no-op
    (LWW target-wins-on-tie)."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ctl = StreamController(spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions)
    ctl.run(max_epochs=3)
    v_before = table.snapshot["version"]
    state_before = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )

    # fenced re-run: skipped entirely, no new snapshot
    st = ctl.process_epoch(2)
    assert st.skipped
    assert table.snapshot["version"] == v_before

    # continue to completion and verify convergence
    ctl.run()
    _assert_state_matches_oracle(table, tiny_log.out_dir, tiny_log.spec.n_partitions)
    assert state_before  # sanity


def test_resume_after_partial_run(spark, tiny_log, tmp_path):
    """Kill/resume: run 4 epochs with one controller, resume with a fresh
    controller+table handle (reads checkpoint manifest), converge to oracle."""
    root = str(tmp_path / "lake")
    table = LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=8)
    StreamController(spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions).run(
        max_epochs=4
    )
    # fresh handles = process restart
    table2 = LakeTable.load(spark, root)
    assert table2.committed_epoch() == 3
    StreamController(spark, table2, tiny_log.out_dir, tiny_log.spec.n_partitions).run()
    _assert_state_matches_oracle(table2, tiny_log.out_dir, tiny_log.spec.n_partitions)


def test_crash_between_data_write_and_commit(spark, tiny_log, tmp_path):
    """Orphan data files from a crashed commit are invisible; resume
    converges (the snapshot flip is the single atomic commit point)."""
    import os

    root = str(tmp_path / "lake")
    table = LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=8)
    ctl = StreamController(spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions)
    ctl.run(max_epochs=2)
    v = table.snapshot["version"]

    # simulate a crash: write data files for a bogus future commit, never
    # flip VERSION
    orphan = os.path.join(root, "data", f"commit-{v + 99:010d}")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "_bucket=0"), "w") as f:
        f.write("junk")

    table2 = LakeTable.load(spark, root)
    assert table2.snapshot["version"] == v
    StreamController(spark, table2, tiny_log.out_dir, tiny_log.spec.n_partitions).run()
    _assert_state_matches_oracle(table2, tiny_log.out_dir, tiny_log.spec.n_partitions)


def test_schema_evolution_mid_stream(spark, tiny_log, tmp_path):
    """`lang` appears at epoch 5: rows last written before -> NULL, rows
    written from epoch 5 on -> populated (additive ALTER semantics)."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ctl = StreamController(spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions)
    ctl.run(max_epochs=5)  # epochs 0..4, pre-evolution
    assert "lang" not in table.schema.fieldNames()
    ctl.run()
    assert "lang" in table.schema.fieldNames()
    state = table.current_state()
    # some populated, some NULL
    n_lang = state.where(state.lang.isNotNull()).count()
    n_null = state.where(state.lang.isNull()).count()
    assert n_lang > 0 and n_null > 0
    _assert_state_matches_oracle(table, tiny_log.out_dir, tiny_log.spec.n_partitions)


def test_mor_compaction_preserves_state(spark, tiny_log, tmp_path):
    """Merge-on-read: deltas accumulate; compaction folds them to base
    without changing the resolved state."""
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8,
        properties={"write_mode": "mor"},
    )
    # huge threshold -> no auto-compaction during the run
    ctl = StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        compact_max_deltas=10_000,
    )
    ctl.run()
    assert table.delta_counts(), "expected uncompacted delta files"
    before = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert table.compact() is True
    assert not table.delta_counts()
    after = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert before == after
    _assert_state_matches_oracle(table, tiny_log.out_dir, tiny_log.spec.n_partitions)


def test_compaction_writes_key_sorted_base_files(spark, tiny_log, tmp_path):
    """Compacted base files are sorted by key within each bucket (the
    Iceberg sort-order analog), so parquet row-group min/max(key) stats are
    tight and a point lookup's pushed predicate can skip row groups."""
    import os

    import pyarrow.parquet as pq

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4,
        properties={"write_mode": "mor"},
    )
    StreamController(
        spark, table, tiny_log.out_dir, tiny_log.spec.n_partitions,
        compact_max_deltas=10_000,
    ).run()
    assert table.compact() is True
    checked = 0
    for f in table.snapshot["files"]:
        if f.get("kind", "base") != "base":
            continue
        keys = pq.read_table(
            os.path.join(table.root, f["path"]), columns=[table.key_col]
        ).column(0).to_pylist()
        assert keys == sorted(keys), f["path"]
        checked += 1
    assert checked > 0
    # lookup still resolves correctly on the sorted layout
    any_key = table.current_state().select(table.key_col).first()[0]
    got = table.lookup(any_key).collect()
    assert len(got) == 1 and got[0][table.key_col] == any_key


def test_multi_tenant_column(spark, tmp_path):
    """Multi-tenant sink analog (the reference's address exporter appends a
    chain_id column): a tenant literal becomes an evolved payload column;
    rows from different tenants coexist keyed by tenant-scoped doc_ids."""
    import pyspark.sql.functions as F

    from hemera_indexer_spark.schemas import CHANGE_EVENT_SCHEMA

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    table.evolve_schema(
        [__import__("pyspark.sql.types", fromlist=["T"]).StructField(
            "chain_id", __import__("pyspark.sql.types", fromlist=["T"]).LongType(), True
        )]
    )
    base = spark.createDataFrame(
        [(1, "doc_1_00000001", "insert", [1, 2], 2, "web"),
         (2, "doc_2_00000001", "insert", [3], 1, "web")],
        "seq long, doc_id string, op string, tokens array<int>, n_tok int, source string",
    )
    for chain in (1, 2):
        upd = base.where(F.col("doc_id").startswith(f"doc_{chain}")).withColumn(
            "chain_id", F.lit(chain).cast("long")
        )
        table.merge_upsert(upd)
    rows = {r["doc_id"]: r for r in table.current_state().collect()}
    assert rows["doc_1_00000001"]["chain_id"] == 1
    assert rows["doc_2_00000001"]["chain_id"] == 2
