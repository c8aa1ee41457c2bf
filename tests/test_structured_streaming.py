"""Structured Streaming front-end: drain the change log with
availableNow, converge to the oracle, and survive a restart without
double-applying (checkpoint + idempotent fenced sink = exactly-once)."""

import os

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.oracle import expected_live_rows
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.sources.generator import ChangelogSpec, generate_changelog
from hemera_indexer_spark.streaming.structured import (
    StructuredIngest,
    hourly_event_counts_stream,
)


def test_structured_ingest_matches_oracle(spark, tmp_path):
    # no schema evolution: a running streaming query has a fixed source
    # schema (evolution is the batch controller's job)
    spec = ChangelogSpec(
        n_docs=300,
        n_epochs=5,
        events_per_epoch=600,
        n_partitions=4,
        seed=7,
        schema_evolution_epoch=None,
        rollback_epochs=(3,),
    )
    log_dir = str(tmp_path / "log")
    gen = generate_changelog(log_dir, spec)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    ingest = StructuredIngest(
        spark, table, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=6,
    )
    q = ingest.start(available_now=True)
    q.awaitTermination(300)

    expected = expected_live_rows(log_dir, spec.n_partitions)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(expected)
    assert all(
        g["tokens"] == e["tokens"] and g["seq"] == e["seq"]
        for g, e in zip(got, expected)
    )

    # restart: nothing new to process; state must be unchanged
    v = table.snapshot["version"]
    q2 = ingest.start(available_now=True)
    q2.awaitTermination(120)
    table.refresh()
    got2 = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert got2 == got


def test_streaming_windowed_aggregation(spark, tmp_path):
    """Watermarked hourly window agg over the events fixture (streaming
    analog of the hourly block-ts mapper)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    import shutil

    events_dir = str(tmp_path / "events_stream")
    os.makedirs(events_dir, exist_ok=True)
    shutil.copy("/root/testdata/sf0.001/events.parquet", events_dir)
    agg = hourly_event_counts_stream(spark, events_dir, schema)
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM hourly_out").collect()
    assert len(rows) > 0
    assert all(r["n"] > 0 for r in rows)


def test_structured_ingest_maintains_view(spark, tmp_path):
    """The streaming front-end refreshes an IncrementalAggSink after each
    fenced micro-batch; at drain the view equals a full GROUP BY."""
    import pyspark.sql.functions as F

    from hemera_indexer_spark.streaming.sinks import IncrementalAggSink

    spec = ChangelogSpec(
        n_docs=200, n_epochs=4, events_per_epoch=400, n_partitions=4,
        seed=11, schema_evolution_epoch=None, rollback_epochs=(2,),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    sink = IncrementalAggSink(table, str(tmp_path / "view"))
    q = StructuredIngest(
        spark, table, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=6,
        view_sink=sink,
    ).start(available_now=True)
    q.awaitTermination(300)
    got = sorted(tuple(r) for r in sink.view().collect())
    exp = sorted(
        tuple(r)
        for r in table.current_state()
        .groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_tok").cast("long").alias("sum_n_tok"),
        )
        .collect()
    )
    assert got == exp


def test_streaming_rollback_with_cross_epoch_redelivery(spark, tmp_path):
    """Regression: a single streaming batch spans several epochs, and a
    rolled-back event is re-delivered (same seq) in a LATER epoch — the
    replay order is (epoch, seq), so the duplicate must re-apply AFTER the
    rollback, exactly as the batch controller's per-epoch commits order
    it. Seq-only segmentation filed the duplicate before the rollback and
    lost the row (one-row oracle divergence)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hemera_indexer_spark.functions import log_partition_py
    from hemera_indexer_spark.oracle import expected_live_rows

    doc = "doc_00000007"
    part = log_partition_py(doc, 2)
    log_dir = tmp_path / "log"

    def write(epoch, rows):
        d = log_dir / f"epoch={epoch:05d}" / f"partition={part:03d}"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table(
                {
                    "seq": pa.array([r[0] for r in rows], pa.int64()),
                    "epoch": pa.array([epoch] * len(rows), pa.int64()),
                    "partition": pa.array([part] * len(rows), pa.int32()),
                    "doc_id": pa.array([doc] * len(rows)),
                    "op": pa.array([r[1] for r in rows]),
                    "tokens": pa.array(
                        [r[2] for r in rows], pa.list_(pa.int32())
                    ),
                    "n_tok": pa.array(
                        [len(r[2]) if r[2] is not None else None for r in rows],
                        pa.int32(),
                    ),
                    "source": pa.array(["web"] * len(rows)),
                    "rollback_to_seq": pa.array(
                        [r[3] for r in rows], pa.int64()
                    ),
                }
            ),
            d / "events.parquet",
        )

    write(0, [(10, "insert", [1, 2], None)])
    # epoch 1: orphan overwrite, then the rollback to seq 15
    write(1, [(20, "update", [3, 4], None), (30, "rollback", None, 15)])
    # epoch 2: the SAME seq-20 event re-delivered after the repair
    write(2, [(20, "update", [3, 4], None)])

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    q = StructuredIngest(
        spark, table, str(log_dir), 2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start(available_now=True)  # everything in ONE batch
    q.awaitTermination(240)
    exp = expected_live_rows(str(log_dir), 2)
    got = sorted(
        (r.asDict(recursive=True) for r in table.current_state().collect()),
        key=lambda d: d["doc_id"],
    )
    assert len(got) == len(exp) == 1
    assert got[0]["tokens"] == exp[0]["tokens"] == [3, 4]


def test_structured_ingest_with_fact_table(spark, tmp_path):
    """Streaming state+history dual output: the fact table driven by
    StructuredIngest must equal the batch controller's FactSink result on
    the same log (including the rollback delete), and a restart must not
    duplicate history rows."""
    import pyspark.sql.functions as F

    from hemera_indexer_spark.schemas import FACTS_SCHEMA
    from hemera_indexer_spark.streaming import StreamController

    spec = ChangelogSpec(
        n_docs=200,
        n_epochs=4,
        events_per_epoch=400,
        n_partitions=4,
        seed=19,
        schema_evolution_epoch=None,
        rollback_epochs=(2,),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)

    # reference result: batch controller with FactSink
    b_state = LakeTable.create(
        spark, str(tmp_path / "b_state"), SEQUENCES_SCHEMA, num_buckets=8
    )
    b_facts = LakeTable.create(
        spark, str(tmp_path / "b_facts"), FACTS_SCHEMA, num_buckets=8,
        properties={"table_type": "fact"},
    )
    StreamController(
        spark, b_state, log_dir, spec.n_partitions, fact_table=b_facts
    ).run()

    s_state = LakeTable.create(
        spark, str(tmp_path / "s_state"), SEQUENCES_SCHEMA, num_buckets=8
    )
    s_facts = LakeTable.create(
        spark, str(tmp_path / "s_facts"), FACTS_SCHEMA, num_buckets=8,
        properties={"table_type": "fact"},
    )
    ingest = StructuredIngest(
        spark, s_state, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=5,
        fact_table=s_facts,
    )
    ingest.start(available_now=True).awaitTermination(300)

    def fact_rows(t):
        t.refresh()
        return sorted(
            (r["doc_id"], r["seq"], r["op"], tuple(r["tokens"] or []))
            for r in t.read().collect()
        )

    assert fact_rows(s_facts) == fact_rows(b_facts)

    # restart with nothing new: replayed batches must not duplicate facts
    before = fact_rows(s_facts)
    ingest.start(available_now=True).awaitTermination(300)
    assert fact_rows(s_facts) == before


def test_fenced_replay_does_not_resurrect_rolled_back_facts(spark, tmp_path):
    """Regression for the crash-replay branch: a micro-batch whose state
    merge committed the stream HWM but whose streaming checkpoint was LOST
    (crash between the fenced merge and the checkpoint commit) is replayed
    by foreachBatch with ``batch_id <= stream_hwm()``. The replay must
    re-run the FULL segmented loop for the fact table — inserts AND
    rollback deletes. An earlier version flat-re-inserted every
    non-rollback event, resurrecting history whose rollback invalidated
    seqs that were never re-delivered. A clean availableNow restart replays
    zero batches, so this invokes ``_apply_batch`` twice by hand, exactly
    what the engine does on that crash window."""
    from hemera_indexer_spark.schemas import CHANGE_EVENT_SCHEMA, FACTS_SCHEMA

    state = LakeTable.create(
        spark, str(tmp_path / "state"), SEQUENCES_SCHEMA, num_buckets=4
    )
    facts = LakeTable.create(
        spark, str(tmp_path / "facts"), FACTS_SCHEMA, num_buckets=4,
        properties={"table_type": "fact"},
    )
    ingest = StructuredIngest(
        spark, state, str(tmp_path / "log"), 1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        fact_table=facts,
    )
    rows = [
        # survives: below the rollback floor
        {"seq": 3, "epoch": 0, "partition": 0, "doc_id": "doc_1",
         "op": "insert", "tokens": [1], "n_tok": 1, "source": "web",
         "rollback_to_seq": None},
        # invalidated by the rollback, never re-delivered
        {"seq": 5, "epoch": 0, "partition": 0, "doc_id": "doc_2",
         "op": "insert", "tokens": [2], "n_tok": 1, "source": "web",
         "rollback_to_seq": None},
        {"seq": 7, "epoch": 0, "partition": 0, "doc_id": "doc_1",
         "op": "update", "tokens": [9, 9], "n_tok": 2, "source": "web",
         "rollback_to_seq": None},
        {"seq": 11, "epoch": 0, "partition": 0, "doc_id": "doc_1",
         "op": "rollback", "tokens": None, "n_tok": None, "source": "web",
         "rollback_to_seq": 5},
    ]
    batch = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)

    def snap():
        state.refresh()
        facts.refresh()
        st = sorted(
            (r["doc_id"], r["seq"], tuple(r["tokens"] or []))
            for r in state.current_state().collect()
        )
        fc = sorted(
            (r["doc_id"], r["seq"], r["op"])
            for r in facts.read().collect()
        )
        return st, fc

    ingest._apply_batch(batch, 0)
    st1, fc1 = snap()
    # state: doc_1's winner (seq 7) and doc_2 (seq 5) are invalidated by
    # the rollback and never re-delivered, so no live rows remain (doc_1's
    # seq-3 version was LWW-superseded before the rollback; only a
    # re-delivery restores it — the engine's reorg contract). History:
    # exactly the pre-rollback-floor facts survive.
    assert st1 == []
    assert fc1 == [("doc_1", 3, "insert")]
    assert ingest.stream_hwm() == 0

    # crash-window replay: state fenced, facts must converge (not resurrect)
    ingest._apply_batch(batch, 0)
    assert snap() == (st1, fc1)


def test_structured_ingest_maintains_signature_index(spark, tmp_path):
    """Streaming parity for the dedup index: after draining the log (with a
    rollback), the CDC-maintained index equals a fresh build from the final
    state, and a restarted query over the same checkpoint replays nothing
    (the index's source-version cursor absorbs fenced batches)."""
    from hemera_indexer_spark.operators.dedup_index import SignatureIndex
    from hemera_indexer_spark.streaming.sinks import SignatureIndexSink

    spec = ChangelogSpec(
        n_docs=200, n_epochs=4, events_per_epoch=400, n_partitions=2,
        seed=11, schema_evolution_epoch=None, rollback_epochs=(2,),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    idx = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx"), table, text_col="tokens", k=8, bands=2
    )
    sink = SignatureIndexSink(table, idx, text_col="tokens")
    StructuredIngest(
        spark, table, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=3,
        index_sink=sink,
    ).start(available_now=True).awaitTermination(300)

    fresh = SignatureIndex.build_from_table(
        spark, str(tmp_path / "idx2"), table, text_col="tokens", k=8, bands=2
    )
    cols = ["doc_id", "b0", "b1"]
    got = sorted(map(tuple, idx.table.current_state().select(*cols).collect()))
    want = sorted(map(tuple, fresh.table.current_state().select(*cols).collect()))
    assert got == want and got
    assert sink.committed_epoch() == table.committed_epoch()

    # restart over the drained checkpoint: all batches fenced, index untouched
    v = idx.table.snapshot["version"]
    StructuredIngest(
        spark, table, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_sink=SignatureIndexSink(table, idx, text_col="tokens"),
    ).start(available_now=True).awaitTermination(300)
    idx.table.refresh()
    assert idx.table.snapshot["version"] == v


def test_structured_ingest_advances_catalog(spark, tmp_path):
    """Streaming parity for the catalog advance: after each fenced
    micro-batch the catalog re-pins state (and would-be index tables) at
    a consistent point; end state pins equal the live heads, and the
    replayed/no-op restart leaves the catalog version unchanged."""
    from hemera_indexer_spark.lake import LakeCatalog

    spec = ChangelogSpec(
        n_docs=150, n_epochs=3, events_per_epoch=300, n_partitions=2,
        seed=9, schema_evolution_epoch=None, rollback_epochs=(),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4
    )
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.register("state", table.root)
    cv0 = cat.snapshot["version"]
    ingest = StructuredIngest(
        spark, table, log_dir, spec.n_partitions,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        catalog=cat, catalog_tables=["state"],
    )
    ingest.start(available_now=True).awaitTermination(300)
    cat2 = LakeCatalog.load(spark, cat.root)
    assert cat2.snapshot["version"] > cv0
    table.refresh()
    assert cat2.versions()["state"] == table.snapshot["version"]
    # restart drains nothing: the advance is a no-op, catalog unmoved
    cv1 = cat2.snapshot["version"]
    ingest.start(available_now=True).awaitTermination(120)
    assert LakeCatalog.load(spark, cat.root).snapshot["version"] == cv1
