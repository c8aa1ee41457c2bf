"""Physical-plan assertions: the optimizations SURVEY.md §4 claims are
'free from Catalyst' must actually appear in the plans."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_pushed_to_scan(spark):
    import __spark_entry__ as entry

    df = entry.q_filter_pushdown(spark, SF)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]
    # column pruning: scan schema carries only the 3 referenced columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
    assert "l_quantity" in read_schema


def test_dimension_join_is_broadcast(spark):
    import __spark_entry__ as entry

    plan = _plan(entry.q_broadcast_dim_join(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_semi_and_anti_joins_planned(spark):
    import __spark_entry__ as entry

    assert "LeftSemi" in _plan(entry.q_semi_join(spark, SF))
    assert "LeftAnti" in _plan(entry.q_anti_join(spark, SF))


def test_lww_maxby_uses_partial_aggregation(spark):
    """The max_by LWW must show a two-phase hash aggregate (partial
    map-side combine = built-in skew resistance)."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_lww_current_state(spark, SF))
    assert "partial_max_by" in plan  # map-side combine before the shuffle
    assert "max_by" in plan


def test_whole_stage_codegen_in_agg(spark):
    import __spark_entry__ as entry

    df = entry.q_pricing_summary(spark, SF)
    plan = _plan(df)
    assert "HashAggregate" in plan and "partial" in plan
    df.collect()  # AQE finalizes the plan; codegen ids appear post-exec
    assert "codegen id" in _plan(df)


def test_lake_scan_prunes_by_footer_stats(spark, tmp_path):
    """Stat-based file skipping: a seq_at_least above every file's max
    selects no files at all (the scan never reaches Spark)."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.streaming import StreamController

    spec = ChangelogSpec(
        n_docs=50, n_epochs=2, events_per_epoch=100, n_partitions=2,
        schema_evolution_epoch=None, rollback_epochs=(),
    )
    log = str(tmp_path / "log")
    generate_changelog(log, spec)
    t = LakeTable.create(spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=4)
    # one commit per epoch (no catch-up grouping) so files have distinct
    # seq ranges for the pruning assertion
    StreamController(spark, t, log, 2, max_batch_epochs=1).run()
    assert len(t._select_files(seq_at_least=10 ** 12)) == 0
    some = t._select_files(seq_at_least=150)
    assert 0 < len(some) < len(t.snapshot["files"])


def test_jvm_merge_plan_single_exchange(spark, tmp_path):
    """The jvm LWW reduce must plan as ONE exchange (on the storage bucket)
    followed by a sort+window — Catalyst must recognize the window's
    clustering is already satisfied and add no second shuffle, and nothing
    in the path may touch Python."""
    from pyspark.sql import functions as F2

    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "lake"), SEQUENCES_SCHEMA, num_buckets=8
    )
    upd = spark.createDataFrame(
        [("doc_1", [1], 1, "web", "insert", 1), ("doc_1", [2], 1, "web", "update", 2)],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, seq long",
    )
    from hemera_indexer_spark.functions import bucket_col

    shaped = (
        upd.withColumn("is_deleted", F2.col("op") == "delete")
        .select("doc_id", "tokens", "n_tok", "source", "seq", "is_deleted")
        .withColumn("_bucket", bucket_col(F2.col("doc_id"), 8))
    )
    reduced = t._lww_reduce(
        None, shaped.withColumn("_prio", F2.lit(0)),
        t.schema.fieldNames(), "jvm",
    )
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(reduced)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    # exactly one exchange node in the tree rendering
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "Window" in tree and "Sort" in tree
    for python_op in ("ArrowEvalPython", "MapInPandas", "PythonMapInArrow", "BatchEvalPython"):
        assert python_op not in plan


def test_asof_join_is_single_exchange_no_nested_loop(spark):
    """The merge-based as-of join must plan as ONE hash exchange on the key
    + window — never a BroadcastNestedLoopJoin/CartesianProduct (what an
    inequality-join formulation would produce)."""
    import __spark_entry__ as entry

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(entry.q_asof_enrich(spark, SF))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # union feeds one hashpartitioning exchange on the key, then the
    # window. The scan-side round-robin fan-out (_t's one-row-group
    # parallelizer) is NOT a key shuffle — count hash exchanges only.
    assert plan.count("hashpartitioning") == 1, plan
    assert "Window" in plan


def test_range_join_avoids_nested_loop(spark):
    """The bucketed range join must be an equi (hash/sort-merge) join on
    (key, bucket) — the inequality survives only as a post-join filter."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_range_window_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_bloom_decontaminate_plan_no_cartesian(spark):
    """The Bloom-surrogate probe must plan as equi-joins on (i, pos) — a
    nested-loop/cartesian anywhere would defeat the bounded-surrogate
    design at corpus-vs-corpus scale."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_bloom_decontaminate(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan  # the (i, pos) surrogate probe


def test_secidx_projection_lookup_pushes_predicate(spark):
    """The secondary-index fast path must scan ONLY footer-overlapping
    projection files AND push the range predicate into that scan (row-group
    pruning inside the kept files)."""
    import tempfile

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    base = tempfile.mkdtemp()
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    src = LakeTable.create(
        spark, f"{base}/src", schema, num_buckets=4, key_col="doc_id",
        seq_col="seq",
    )
    src.bulk_load(
        spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "n_chars"
        )
    )
    idx = SecondaryIndex.build_from_table(
        spark, f"{base}/idx", src, "n_chars", num_buckets=4
    )
    idx.maintain(n_files=8)
    df = idx.lookup(200, 260)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "n_chars" in pushed
    kept, total = idx._proj_files(200, 260)
    assert 0 < len(kept) < total


def test_topk_per_group_plan_has_no_window_sort(spark):
    """The k-bounded top-k must plan as two aggregates (partial per
    (group, task), final merge) — never a whole-group Window sort."""
    from hemera_indexer_spark.operators.lww import topk_per_group

    df = spark.read.parquet(f"{SF}/orders.parquet")
    out = topk_per_group(
        df,
        keys=["o_orderpriority"],
        order_cols=["o_totalprice"],
        tiebreak="o_orderkey",
        k=3,
    )
    plan = _plan(out)
    assert "Window" not in plan
    assert plan.count("ObjectHashAggregate") + plan.count("SortAggregate") >= 2
