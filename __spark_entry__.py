"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: replay a deterministic CDC change log through
the engine (LakeTable + StreamController) and return the final state table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
from SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal). Every float aggregate goes
through decimal(18,6) so results are order-independent and hash-identical
to the DuckDB oracle; every computed column is aliased identically on both
sides.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hemera_indexer_spark.functions.rounding import round_double as _round_dd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


_META_CACHE: dict[str, tuple[int, int]] = {}


def _t_meta(sf_dir: str, name: str) -> tuple[int, int]:
    """(num_rows, num_row_groups) from the parquet footer — metadata
    only, cached per file."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if path not in _META_CACHE:
        m = pq.read_metadata(path)
        _META_CACHE[path] = (m.num_rows, m.num_row_groups)
    return _META_CACHE[path]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _t_fan(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``_t`` plus a scale-adaptive scan fan-out — for queries whose MAP
    side is genuinely CPU-heavy (the window-8 span pipelines: O(len *
    window) slice+concat plus an md5 per position). Parquet scans split
    at ROW-GROUP granularity, and a fixture file written as one row
    group scans as ONE task, so those passes run single-threaded no
    matter the core count. The round-robin repartition costs a measured
    ~1s (single-task sort+serialize of the input plus a 32-task stage),
    which only pays for itself on the span-hash queries (decontaminate
    6.0->4.1s, bloom 6.7->4.8s best-of-3 warm); every lighter query
    measured FLAT TO SLOWER with a blanket fan-out, so ``_t`` stays
    plain. The guard is scale-adaptive, not a local[32] constant: at
    larger scale factors the generator writes 50k-row groups, at
    production scale there are thousands, and the condition goes false
    (guide §2.5 "input skew: unsplittable file -> repartition after the
    read")."""
    df = _t(spark, sf_dir, name)
    rows, groups = _t_meta(sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    if groups < cores and rows >= 4 * cores:
        df = df.repartition(cores)
    return df


def _t_rows(sf_dir: str, name: str) -> int:
    """Metadata-only row count from the parquet footer — scalar query
    config (max_df thresholds, IDF N) must not cost a table scan per
    query build (the LakeTable.stats_row_count analog for raw files)."""
    return _t_meta(sf_dir, name)[0]


def _dec(c, scale: int = 6):
    return F.col(c).cast(f"decimal(18,{scale})") if isinstance(c, str) else c.cast(
        f"decimal(18,{scale})"
    )


def _dbl(df: DataFrame, *cols: str) -> DataFrame:
    """Driver-canonical final projection: cast the named columns to double
    in place (order and names preserved). The per-round driver hashes
    pandas frames — Spark decimals arrive as object-dtype Decimals while
    DuckDB's .df() yields float64, so a decimal FINAL column can never
    hash-match even when every value is numerically identical (22 round-5
    rows proved this). Decimal stays the INTERNAL fold type (that is what
    makes the aggregates order-independent); only the last projection
    changes representation. decimal(18,6) -> double is exact (53-bit
    mantissa ≫ 6dp values here), so the oracle values are untouched."""
    return df.select(
        *[
            F.col(c).cast("double").alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


# --------------------------------------------------------------------------
# flagship: the CDC replay itself
# --------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Replay a small deterministic change log (generated once under /tmp)
    through the lake engine; return the final visible state."""
    from hemera_indexer_spark.lake import LakeTable
    from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )
    from hemera_indexer_spark.streaming import StreamController

    spec = ChangelogSpec(
        n_docs=200,
        n_epochs=4,
        events_per_epoch=400,
        n_partitions=4,
        seed=42,
        schema_evolution_epoch=2,
        rollback_epochs=(3,),
    )
    log_dir = os.path.join(tempfile.gettempdir(), "hemera_entry_log_v1")
    if not os.path.exists(os.path.join(log_dir, "_DONE")):
        generate_changelog(log_dir, spec)
        with open(os.path.join(log_dir, "_DONE"), "w") as f:
            f.write("ok")
    lake_dir = tempfile.mkdtemp(prefix="hemera_entry_lake_")
    table = LakeTable.create(
        spark, os.path.join(lake_dir, "t"), SEQUENCES_SCHEMA, num_buckets=8
    )
    StreamController(spark, table, log_dir, spec.n_partitions).run()
    return table.current_state().orderBy("doc_id")


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------
def q_pricing_summary(spark, sf):
    """TPC-H Q1 shape: scan+filter+groupBy+8 aggregates (SURVEY §2.4)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


def q_filter_pushdown(spark, sf):
    """Projection+predicate pushed to the parquet scan (SURVEY §2.2)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.select("l_orderkey", "l_quantity", "l_shipdate")
        .where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_quantity") > 45)
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


def q_specification_filter(spark, sf):
    """Predicate-combinator algebra (specification.py analog, SURVEY §2.2)."""
    from hemera_indexer_spark.plans import specification as S

    ev = _t(spark, sf, "events")
    pred = S.and_(
        S.or_(
            S.field_equals("event_type", "click"),
            S.field_equals("event_type", "view"),
        ),
        S.not_(F.col("value") < 10),
        S.member_of("user_id", list(range(0, 120))),
    )
    return ev.where(pred).groupBy("event_type").agg(F.count("*").alias("n"))


def q_case_routing(spark, sf):
    """Topic-based routing: CASE WHEN dispatch by type (SURVEY §2.2)."""
    ev = _t(spark, sf, "events")
    route = (
        F.when(F.col("event_type").isin("click", "view"), F.lit("engagement"))
        .when(F.col("event_type") == "purchase", F.lit("revenue"))
        .otherwise(F.lit("ops"))
    )
    return ev.groupBy(route.alias("route")).agg(
        F.count("*").alias("n"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


def q_join_enrich(spark, sf):
    """Hash-join enrichment: orders ⋈ customer (SURVEY §2.3)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


def q_broadcast_dim_join(spark, sf):
    """Broadcast dimension join: lineitem ⋈ part (token-cache analog)."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    rev = (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n"))
    )


def q_anti_join(spark, sf):
    """left_anti: customers with no orders (new-vs-known analog)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_inactive"))
    )


def q_semi_join(spark, sf):
    """left_semi: orders with a high-discount lineitem."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").where(F.col("l_discount") >= 0.09)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def q_accumulator_merge(spark, sf):
    """FULL OUTER JOIN + COALESCE sums — the period-accumulator merge
    (period_wallet_addresses_aggregates.sql:79 analog)."""
    from hemera_indexer_spark.plans.aggregates import merge_period_accumulators

    ev = _t(spark, sf, "events")
    base = ev.withColumn("_day_odd", F.dayofmonth("ts") % 2)
    mk = lambda flag: (
        base.where(F.col("_day_odd") == flag)
        .groupBy("user_id")
        .agg(
            F.sum(_dec("value")).cast("double").alias("sum_value"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    merged = merge_period_accumulators(
        mk(0), mk(1), keys=["user_id"], sum_cols=["sum_value", "n_events"]
    )
    return merged.select(
        "user_id",
        F.round("sum_value", 4).alias("sum_value"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def q_lww_current_state(spark, sf):
    """THE core operator: LWW current state per key (collection_utils.py:8-19
    analog) via groupBy+max_by."""
    from hemera_indexer_spark.operators.lww import lww_latest

    ev = _t(spark, sf, "events")
    out = lww_latest(
        ev,
        keys=["user_id"],
        version=F.struct(F.col("ts"), F.col("event_id")),
        payload=["event_id", "event_type", "value"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def q_lww_window(spark, sf):
    """Same LWW via row_number window (export_token_id_infos_job analog)."""
    from hemera_indexer_spark.operators.lww import lww_latest_window

    ev = _t(spark, sf, "events")
    out = lww_latest_window(
        ev, keys=["user_id"], order_cols=[F.col("ts"), F.col("event_id")]
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def q_lww_salted(spark, sf):
    """Two-phase salted LWW (skew mitigation, SURVEY §4 custom work #2) —
    result must equal the unsalted LWW."""
    from hemera_indexer_spark.operators.lww import lww_latest_salted

    ev = _t(spark, sf, "events")
    out = lww_latest_salted(
        ev,
        keys=["user_id"],
        version=F.struct(F.col("ts"), F.col("event_id")),
        payload=["event_id", "event_type", "value"],
        num_salts=8,
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def q_patch_fold(spark, sf):
    """Column-wise partial-update fold (operators/patch.py): CDC events
    that carry only the changed columns (NULL = unchanged, Debezium
    minimal-row-image style); deletes reset the row so earlier columns
    never resurrect. The stream is derived deterministically from events
    by modular arithmetic (portable to the DuckDB oracle verbatim)."""
    from hemera_indexer_spark.operators.patch import patch_fold

    ev = _t(spark, sf, "events")
    stream = ev.select(
        (F.col("user_id") % 100).alias("k"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 11 == 0, F.lit("delete"))
        .otherwise(F.lit("patch"))
        .alias("op"),
        F.when(F.col("event_id") % 3 == 0, F.col("value")).alias("val_a"),
        F.when(F.col("event_id") % 5 <= 1, F.col("event_type")).alias("val_b"),
        F.when(F.col("event_id") % 7 == 2, F.col("event_id") * 10).alias(
            "val_c"
        ),
    )
    return patch_fold(stream, "k", "seq", ["val_a", "val_b", "val_c"])


def q_daily_aggregates(spark, sf):
    """daily_wallet_addresses_aggregates.sql analog."""
    from hemera_indexer_spark.plans.aggregates import daily_user_aggregates

    return daily_user_aggregates(_t(spark, sf, "events"))


def q_count_distinct(spark, sf):
    """count(distinct ...) per group (period SQL :21-28 analog)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def q_hourly_bucket(spark, sf):
    """Hourly block-ts mapper analog: min id + count per hour bucket."""
    ev = _t(spark, sf, "events")
    return ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.min("event_id").alias("min_event_id"), F.count("*").alias("n")
    )


def q_json_extract(spark, sf):
    """JSONB column handling analog: extract props.k, aggregate."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_k")
    )


def q_window_latest_per_supp(spark, sf):
    """row_number()==1 per partition (uniswap price SQL :50-57 analog)."""
    from hemera_indexer_spark.operators.lww import lww_latest_window

    li = _t(spark, sf, "lineitem")
    out = lww_latest_window(
        li,
        keys=["l_suppkey"],
        order_cols=[
            F.col("l_shipdate"),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate")


def q_lag_gap_sessions(spark, sf):
    """lag() walk (check_block_consensus parent-hash analog): count session
    starts per user where the gap to the previous event exceeds 1 hour."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    is_start = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 3600),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("_s", is_start)
        .groupBy("user_id")
        .agg(F.sum("_s").cast("long").alias("n_sessions"), F.count("*").alias("n_events"))
    )


def q_topk_orders(spark, sf):
    """Top-N with deterministic tie-break (API keyset pagination analog)."""
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


def q_grouped_topk(spark, sf):
    """Top-3 orders per priority class by total price — via the
    k-bounded two-stage aggregate (operators/lww.py ``topk_per_group``),
    never a whole-group window sort: a dominant group reduces across all
    tasks and at most partitions*k rows reach any final buffer. The
    plain-window SQL oracle attests exactness."""
    from hemera_indexer_spark.operators.lww import topk_per_group

    o = _t(spark, sf, "orders")
    return topk_per_group(
        o,
        keys=["o_orderpriority"],
        order_cols=["o_totalprice"],
        tiebreak="o_orderkey",
        k=3,
        payload=["o_orderstatus"],
    )


def q_union_dedup(spark, sf):
    """union + dropDuplicates by key (transfer-type union analog)."""
    ev = _t(spark, sf, "events")
    a = ev.where(F.col("value") >= 100)
    b = ev.where(F.col("value") >= 50)
    return (
        a.unionByName(b)
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def q_hex_codec(spark, sf):
    """hex/bytes codec analog (format_utils hex_str_to_bytes)."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower(F.hex(F.col("p_partkey"))).alias("key_hex"),
        F.md5(F.col("p_name")).alias("name_md5"),
    )


def q_month_bucketing(spark, sf):
    """date_trunc month rollup (DATE(block_timestamp) analog)."""
    o = _t(spark, sf, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
    )


def q_fww_first_state(spark, sf):
    """Insert-if-absent per-key law (fact tables / ON CONFLICT DO NOTHING,
    postgres_item_exporter.py:126-130 analog): the FIRST writer wins —
    min_by per key, the dual of the LWW state law."""
    from hemera_indexer_spark.operators.lww import lww_latest

    ev = _t(spark, sf, "events")
    # first-writer-wins = LWW under a negated version; microsecond-precision
    # negation (unix_micros) so the order matches the oracle's ORDER BY ts
    # exactly even for sub-second timestamps (unix_timestamp truncates to
    # seconds, which would break event_id ties across distinct times)
    out = lww_latest(
        ev,
        keys=["user_id"],
        version=F.struct(
            (-F.unix_micros(F.col("ts").cast("timestamp"))).alias("nts"),
            (-F.col("event_id")).alias("nid"),
        ),
        payload=["event_id", "event_type", "value"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("first_event_id"),
        F.col("event_type").alias("first_event_type"),
        F.col("value").alias("first_value"),
    )


def q_dag_daily_routes(spark, sf):
    """Two-job DAG chain (the job_scheduler.py:117-150 extension surface):
    enrich -> aggregate, resolved and ordered by the JobGraph; the whole
    chain collapses into one Catalyst plan."""
    from hemera_indexer_spark.plans.dag import JobGraph

    graph = JobGraph()

    @graph.register("enriched", inputs=["events"])
    def enriched(spark_, ins):
        return ins["events"].withColumn(
            "route",
            F.when(F.col("event_type").isin("click", "view"), F.lit("engagement"))
            .when(F.col("event_type") == "purchase", F.lit("revenue"))
            .otherwise(F.lit("ops")),
        )

    @graph.register("daily_routes", inputs=["enriched"])
    def daily_routes(spark_, ins):
        return ins["enriched"].groupBy(
            F.col("ts").cast("date").alias("day"), "route"
        ).agg(
            F.count("*").alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )

    out = graph.run(
        spark, {"events": _t(spark, sf, "events")}, targets=["daily_routes"]
    )
    return out["daily_routes"]


# ----------------------------------------------------------- dedup suite
def q_word_freq_explode(spark, sf):
    """explode + groupBy aggregate (ERC1155 in-log batch-sum analog,
    token_transfer.py:221-224): word frequencies over documents."""
    d = _t(spark, sf, "documents")
    w = F.explode(F.split(F.trim(F.lower(F.col("text"))), "\\s+")).alias("word")
    return (
        d.select(w)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def q_prefix_match(spark, sf):
    """Calldata-prefix predicate analog (specification.py:85-92):
    startswith filter + grouped counts."""
    from hemera_indexer_spark.plans.specification import prefix_match

    ev = _t(spark, sf, "events")
    return (
        ev.where(prefix_match("props", '{"k": 1'))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def q_dedup_exact(spark, sf):
    from hemera_indexer_spark.operators.dedup import exact_duplicate_clusters

    return exact_duplicate_clusters(_t(spark, sf, "documents"), "doc_id", "text")


def q_dedup_jaccard(spark, sf):
    """Exact n-gram Jaccard with the document-frequency skew guard applied:
    shingles appearing in more than max(5, 1% of docs) documents are the hot
    join keys that make the inverted-index self-join quadratic, and the
    pairs they generate fail verification anyway. The oracle applies the
    identical cut."""
    from hemera_indexer_spark.operators.dedup import jaccard_pairs

    docs = _t(spark, sf, "documents")
    max_df = max(5, _t_rows(sf, "documents") // 100)
    return jaccard_pairs(
        docs, "doc_id", "text", n=2, threshold=0.6, max_df=max_df
    )


def q_dedup_minhash_lsh(spark, sf):
    from hemera_indexer_spark.operators.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(
        _t(spark, sf, "documents"), "doc_id", "text", n=2, k=16, bands=4,
        threshold=0.5,
    )


def q_dedup_incremental(spark, sf):
    """Incremental near-dup check (operators/dedup_index.py): the md5-split
    'train' partition plays the committed corpus, the val/test remainder
    plays the incoming CDC batch; MinHash-band both sides and join NEW
    buckets against BASE buckets only — base x base pairs are never
    generated, which is what makes checking a micro-batch O(batch), the
    reference's incremental-per-block-range discipline applied to dedup."""
    from hemera_indexer_spark.operators.dedup import dataset_split
    from hemera_indexer_spark.operators.dedup_index import incremental_lsh_pairs

    s = dataset_split(_t(spark, sf, "documents"), "doc_id")
    new = s.where(F.col("split") != "train")
    base = s.where(F.col("split") == "train")
    return incremental_lsh_pairs(
        new, base, "doc_id", "text", n=2, k=16, bands=4, threshold=0.5
    )


def q_pii_scrub(spark, sf):
    """Regex PII redaction (operators/text.py::scrub_pii — the standard
    pre-training scrub stage). The fixture corpus is synthetic words, so the
    query deterministically embeds one email / IPv4 / phone per doc derived
    from doc_id before scrubbing — the redaction itself is what the hash
    gate checks. Pure codegen'd Column chain, zero shuffles."""
    from hemera_indexer_spark.operators.text import scrub_pii

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 415 555 01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("text"),
    )
    out = scrub_pii(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.md5("scrubbed").alias("scrub_md5"),
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
    )


def q_dedup_simhash(spark, sf):
    from hemera_indexer_spark.operators.dedup import simhash16

    return simhash16(_t(spark, sf, "documents"), "doc_id", "text")


def q_dedup_clusters_cc(spark, sf):
    """Cluster resolution: near-dup PAIRS (jaccard) -> connected components
    -> keep/drop sets. Uses the scale-adaptive CC (driver union-find below
    an explicit edge threshold — the broadcast-small-side rule; distributed
    min-label propagation above it); the oracle mirrors the semantics with
    a recursive transitive-closure CTE."""
    from hemera_indexer_spark.operators.dedup import (
        connected_components_auto,
        jaccard_pairs,
        keep_drop_from_cc,
    )

    docs = _t(spark, sf, "documents")
    max_df = max(5, _t_rows(sf, "documents") // 100)
    pairs = jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.6, max_df=max_df)
    return keep_drop_from_cc(connected_components_auto(pairs))


def q_dedup_embedding(spark, sf):
    """Embedding-space near-dup (SemDeDup shape): LSH-bucketed candidate
    pairs, exact cosine filter."""
    from hemera_indexer_spark.operators.similarity import embedding_dup_pairs

    return embedding_dup_pairs(
        _t(spark, sf, "embeddings"), threshold=0.2, n_anchors=4
    )


# ------------------------------------------------------ similarity suite
def q_cosine_topk(spark, sf):
    from hemera_indexer_spark.operators.similarity import brute_force_topk

    return brute_force_topk(
        _t(spark, sf, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5
    )


def q_ann_lsh_topk(spark, sf):
    from hemera_indexer_spark.operators.similarity import anchor_lsh_topk

    return anchor_lsh_topk(
        _t(spark, sf, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5, n_anchors=8
    )


def q_ivf_topk(spark, sf):
    """IVF cell-probe ANN (the brief's 'IVF variant as the scale path'):
    seeded coarse quantizer + one Lloyd refinement, queries probe their
    nprobe nearest cells, exact cosine re-rank inside the probed cells.
    See operators/similarity.py::ivf_topk for the scale/determinism
    notes."""
    from hemera_indexer_spark.operators.similarity import ivf_topk

    return ivf_topk(
        _t(spark, sf, "embeddings"),
        query_ids=[0, 1, 2, 3, 4],
        k=5,
        ncells=16,
        nprobe=4,
    )


def q_secidx_lookup(spark, sf):
    """Secondary-index range lookup (operators/secondary_index.py): a
    value band answered from the CDC-maintained narrow index's VALUE-
    SORTED projection — per-file ranges disjoint by construction, so the
    lookup opens only footer-overlapping files (asserted in-query) and
    never scans the corpus. Built once per sf dir under /tmp; the oracle
    states the same filter over the raw fixture."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable
    from hemera_indexer_spark.operators.secondary_index import SecondaryIndex

    tag = _h.md5(f"{sf}|secidx".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_secidx_{tag}")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("n_chars", T.LongType()),
            ]
        )
        src = LakeTable.create(
            spark, os.path.join(root, "src"), schema, num_buckets=8,
            key_col="doc_id", seq_col="seq",
        )
        src.bulk_load(
            _t(spark, sf, "documents").select("doc_id", "n_chars")
        )
        idx = SecondaryIndex.build_from_table(
            spark, os.path.join(root, "idx"), src, "n_chars", num_buckets=8
        )
        idx.maintain(n_files=8)
        with open(done, "w") as f:
            f.write("ok")
    idx = SecondaryIndex.load(spark, os.path.join(root, "idx"))
    kept, total = idx._proj_files(200, 260)
    if not (0 < len(kept) < total):
        raise AssertionError(
            f"projection pruned nothing: kept {len(kept)} of {total} files"
        )
    return idx.lookup(200, 260)


def q_cdc_mirror(spark, sf):
    """The full replication loop (streaming/mirror.py): a deterministic
    CDC stream derived from ``events`` merges into a SOURCE LakeTable in
    two epochs; a ChangelogExportSink exports Debezium-shaped envelope
    directories after each; LakeMirror applies the feed to a REPLICA
    table. The query returns the REPLICA's state — so a green row proves
    merge -> net-change export -> fenced apply end-to-end equals the
    plain LWW fold the oracle states (deletes drop, latest seq wins).
    Built once per sf dir under /tmp (the q_secidx pattern)."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable
    from hemera_indexer_spark.streaming.mirror import LakeMirror
    from hemera_indexer_spark.streaming.sinks import ChangelogExportSink

    tag = _h.md5(f"{sf}|cdcmirror".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_mirror_{tag}")
    feed, replica = os.path.join(root, "feed"), os.path.join(root, "replica")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("val", T.DoubleType()),
                T.StructField("typ", T.StringType()),
            ]
        )
        src = LakeTable.create(
            spark, os.path.join(root, "src"), schema, num_buckets=8,
            key_col="k", seq_col="seq",
        )
        sink = ChangelogExportSink(src, feed)  # cursor at v0: full feed
        stream = _t(spark, sf, "events").select(
            (F.col("user_id") % 200).alias("k"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_id") % 13 == 0, F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
            F.col("value").alias("val"),
            F.col("event_type").alias("typ"),
        )
        # two commits -> two envelope directories -> multi-dir apply
        src.merge_upsert(stream.where(F.col("seq") % 2 == 0), epoch_id=0)
        sink.sync(epoch=0)
        src.merge_upsert(stream.where(F.col("seq") % 2 == 1), epoch_id=1)
        sink.sync(epoch=1)
        LakeMirror(spark, feed, replica).sync()
        with open(done, "w") as f:
            f.write("ok")
    m = LakeMirror(spark, feed, replica)
    return m.state().select("k", "seq", "val", "typ")


def q_ivf_index_topk(spark, sf):
    """The PERSISTED IVF path (operators/ivf_index.py): quantizer trained
    ONCE into a LakeTable-backed index (centroids ride the snapshot as a
    property, assignments as LWW rows), every query batch after that skips
    the iters+1 training passes. Built once per sf dir under /tmp and
    reused — the 100 TB posture, where the corpus is never re-quantized
    per query. Oracle: identical to ivf_topk (the equality law on a synced
    index, shared train/probe code path)."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable
    from hemera_indexer_spark.operators.ivf_index import IVFIndex

    tag = _h.md5(f"{sf}|ivf16".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_ivflake_{tag}")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        src = LakeTable.create(
            spark, os.path.join(root, "emb"), schema, num_buckets=8,
            key_col="vec_id", seq_col="seq",
        )
        src.bulk_load(
            _t(spark, sf, "embeddings").select("vec_id", "embedding")
        )
        IVFIndex.build_from_table(
            spark, os.path.join(root, "idx"), src, ncells=16
        )
        with open(done, "w") as f:
            f.write("ok")
    src = LakeTable.load(spark, os.path.join(root, "emb"))
    idx = IVFIndex.load(spark, os.path.join(root, "idx"))
    return idx.topk(src, query_ids=[0, 1, 2, 3, 4], k=5, nprobe=4)


# ------------------------------------------------------------ text suite
def q_text_stats(spark, sf):
    from hemera_indexer_spark.operators.text import with_text_stats

    return with_text_stats(_t(spark, sf, "documents")).select(
        "doc_id",
        "n_tok_ws",
        "n_tok_bpe",
        "stop_ratio",
        "punct_ratio",
        "avg_word_len",
        "quality",
        "lang_pred",
        "fp",
    )


# ------------------------------------------------------ multimodal suite
def q_multimodal_meta(spark, sf):
    from hemera_indexer_spark.operators.multimodal import (
        attach_blob_metadata,
        blobs_from_documents,
    )

    blobs = blobs_from_documents(_t(spark, sf, "documents"))
    return attach_blob_metadata(blobs).select(
        "blob_id", "media_type", "n_bytes", "sha"
    )


def q_multimodal_features(spark, sf):
    """mapInPandas feature extraction over binary blobs (decode stubbed to a
    deterministic sha256-derived vector); the stub math is exact-integer
    based so the DuckDB oracle hash-matches."""
    from hemera_indexer_spark.operators.multimodal import (
        blobs_from_documents,
        extract_features,
    )

    return extract_features(blobs_from_documents(_t(spark, sf, "documents")))


def _zonelake(spark, sf, chunks: int = 4):
    """Build (once per sf dir, cached under /tmp) a FACT LakeTable over the
    events fixture with zone maps on event_id: rows are inserted in
    ``chunks`` seq-range chunks, so each file's event_id footer range is
    tight and a mid-range ``read(ranges=)`` provably skips the other
    chunks' files. Fact table (append-only, no LWW fold), so range pruning
    carries no mutable-column caveat."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable

    tag = _h.md5(f"{sf}|{chunks}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_zonelake_{tag}")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        ev = _t(spark, sf, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("user_id", T.LongType(), True),
                T.StructField("event_type", T.StringType(), True),
                T.StructField("value", T.DoubleType(), True),
            ]
        )
        t = LakeTable.create(
            spark,
            os.path.join(root, "t"),
            schema,
            num_buckets=8,
            key_col="user_id",
            seq_col="event_id",
            stats_cols=("event_id",),
            properties={"table_type": "fact"},
        )
        n = _t_rows(sf, "events")
        for i in range(chunks):
            lo, hi = i * n // chunks, (i + 1) * n // chunks
            t.insert_if_absent(
                ev.where(
                    (F.col("event_id") >= lo) & (F.col("event_id") < hi)
                ),
                epoch_id=i + 1,
            )
        with open(done, "w") as f:
            f.write(str(n))
    return LakeTable.load(spark, os.path.join(root, "t"))


def q_schema_rename(spark, sf):
    """Metadata-only schema evolution end-to-end (lake/table.py::
    rename_column/drop_column + the schema-log name mapping): a
    deterministic CDC stream from ``events`` merges into a state table in
    two halves; between them the table RENAMES val->score and DROPS aux,
    while the second half keeps writing the OLD names (old-writer
    mapping steers val into score and discards aux); aux is then
    re-ADDED. A green row proves: renamed old files serve through the
    per-file-generation mapping, stale writer columns land in their
    successor, and the re-added column resurrects NOTHING (NULL for
    every row — pre-drop bytes stay dead, discarded post-drop writes
    stay discarded). Built once per sf dir under /tmp (the q_secidx
    pattern)."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable

    tag = _h.md5(f"{sf}|schemarename".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_rename_{tag}")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("val", T.DoubleType()),
                T.StructField("typ", T.StringType()),
                T.StructField("aux", T.LongType()),
            ]
        )
        t = LakeTable.create(
            spark, os.path.join(root, "t"), schema, num_buckets=8,
            key_col="k", seq_col="seq",
        )
        stream = _t(spark, sf, "events").select(
            (F.col("user_id") % 200).alias("k"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_id") % 13 == 0, F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
            F.col("value").alias("val"),
            F.col("event_type").alias("typ"),
            F.col("user_id").alias("aux"),
        )
        t.merge_upsert(stream.where(F.col("seq") % 2 == 0), epoch_id=0)
        t.rename_column("val", "score")
        t.drop_column("aux")
        # the second half still speaks the PRE-rename schema
        t.merge_upsert(stream.where(F.col("seq") % 2 == 1), epoch_id=1)
        t.evolve_schema([T.StructField("aux", T.LongType(), True)])
        with open(done, "w") as f:
            f.write("ok")
    t = LakeTable.load(spark, os.path.join(root, "t"))
    return t.current_state().select("k", "seq", "score", "typ", "aux")


def q_cdc_changefeed(spark, sf):
    """The raw CDF surface (lake/table.py::changes_since(cdf=True), the
    one-pass snapshot diff): two committed epochs, then the Delta-CDF-
    shaped NET feed from the first commit — inserts, deletes carrying
    the OLD row, and update pre/post image pairs. The oracle replays the
    diff as two LWW folds full-outer-joined in DuckDB."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable

    tag = _h.md5(f"{sf}|cdcfeed".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_cdf_{tag}")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("val", T.DoubleType()),
            ]
        )
        t = LakeTable.create(
            spark, os.path.join(root, "t"), schema, num_buckets=8,
            key_col="k", seq_col="seq",
        )
        stream = _t(spark, sf, "events").select(
            (F.col("user_id") % 200).alias("k"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_id") % 13 == 0, F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
            F.col("value").alias("val"),
        )
        t.merge_upsert(stream.where(F.col("seq") % 2 == 0), epoch_id=0)
        v0 = t.snapshot["version"]
        t.merge_upsert(stream.where(F.col("seq") % 2 == 1), epoch_id=1)
        with open(done, "w") as f:
            f.write(str(v0))
    with open(done) as f:
        v0 = int(f.read().strip())
    t = LakeTable.load(spark, os.path.join(root, "t"))
    return t.changes_since(v0, cdf=True).select(
        "change_op", "k", "seq", "val"
    )


def q_schema_defaults(spark, sf):
    """Column DEFAULT values end-to-end (lake/table.py::evolve_schema
    defaults=): merge half the stream, ADD a defaulted column, merge the
    rest WITHOUT the column (write default) plus a final explicit batch.
    Green proves: pre-add rows read the INITIAL default through the
    per-generation mapping, omitted-column writers get the WRITE
    default, and an explicit value beats both."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable

    tag = _h.md5(f"{sf}|schemadefaults".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_dflt_{tag}")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("val", T.DoubleType()),
            ]
        )
        t = LakeTable.create(
            spark, os.path.join(root, "t"), schema, num_buckets=8,
            key_col="k", seq_col="seq",
        )
        stream = _t(spark, sf, "events").select(
            (F.col("user_id") % 200).alias("k"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_id") % 13 == 0, F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
            F.col("value").alias("val"),
        )
        t.merge_upsert(stream.where(F.col("seq") % 2 == 0), epoch_id=0)
        t.evolve_schema(
            [T.StructField("tier", T.StringType(), True)],
            defaults={"tier": "std"},
        )
        # second half omits `tier` entirely -> write default
        t.merge_upsert(stream.where(F.col("seq") % 2 == 1), epoch_id=1)
        # explicit batch: keys 0..9 upgraded at a seq above the stream
        top = stream.groupBy().agg(F.max("seq").alias("m")).collect()[0]["m"]
        t.merge_upsert(
            spark.range(10).select(
                F.col("id").alias("k"),
                (F.lit(top) + 1 + F.col("id")).alias("seq"),
                F.lit("update").alias("op"),
                F.lit(-1.0).alias("val"),
                F.lit("vip").alias("tier"),
            ),
            epoch_id=2,
        )
        with open(done, "w") as f:
            f.write("ok")
    t = LakeTable.load(spark, os.path.join(root, "t"))
    return t.current_state().select("k", "seq", "val", "tier")


def q_zonemap_range_scan(spark, sf):
    """Zone-map pruned range scan (lake/table.py read(ranges=)): the
    middle-quintile event_id window over a chunk-loaded fact lake. The
    footer min/max PROVE most files disjoint — the query asserts pruning
    actually dropped files, then applies the real predicate on the kept
    ones (pruning is performance, never correctness). Oracle states the
    same window over the raw events fixture."""
    t = _zonelake(spark, sf)
    n = t.stats_row_count()  # exact for fact tables, metadata-only
    lo, hi = n * 2 // 5, n * 3 // 5 - 1
    ranges = {"event_id": (lo, hi)}
    kept = t._select_files(ranges=ranges)
    if len(kept) >= len(t.snapshot["files"]):
        raise AssertionError(
            f"zone maps pruned nothing: kept {len(kept)} of "
            f"{len(t.snapshot['files'])} files"
        )
    return (
        t.read(ranges=ranges)
        .where(F.col("event_id").between(lo, hi))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


def _zorderlake(spark, sf, splits: int = 16):
    """Build (once per sf dir, cached under /tmp) a STATE LakeTable over
    the events fixture, z-order-compacted on (user_id, event_id) with
    zone maps on both. Keys are immutable after the bulk load (one
    version per event_id), so the state-table zone-map caveat is
    satisfied. The z-split rewrite yields per-bucket files whose footer
    min/max are tight in BOTH dimensions."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable

    tag = _h.md5(f"{sf}|z{splits}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_zorderlake_{tag}")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("seq", T.LongType(), False),
                T.StructField("user_id", T.LongType(), True),
                T.StructField("event_type", T.StringType(), True),
                T.StructField("value", T.DoubleType(), True),
                T.StructField("is_deleted", T.BooleanType(), False),
            ]
        )
        t = LakeTable.create(
            spark,
            os.path.join(root, "t"),
            schema,
            num_buckets=4,
            key_col="event_id",
            stats_cols=("user_id", "event_id"),
        )
        t.bulk_load(
            _t(spark, sf, "events").select(
                "event_id", "user_id", "event_type", "value"
            )
        )
        t.compact(
            buckets=set(range(t.num_buckets)),
            zorder=("user_id", "event_id"),
            zorder_splits=splits,
        )
        with open(done, "w") as f:
            f.write("ok")
    return LakeTable.load(spark, os.path.join(root, "t"))


def q_zorder_box_scan(spark, sf):
    """Z-order clustered 2-D box scan (lake/table.py compact(zorder=) +
    functions/zorder.py): the lake is Morton-clustered on
    (user_id, event_id), so a box constraining BOTH dimensions skips
    files at the zone-map layer in both at once — a lexicographic sort
    can only be tight in its leading column. Bounds derive from footer
    stats (metadata-only) with integer arithmetic so the oracle states
    the identical box from SQL min/max. Asserts pruning actually dropped
    files, then applies the real predicate on the kept ones."""
    t = _zorderlake(spark, sf)
    files = t.snapshot["files"]
    umin = min(f["stats"]["user_id"][0] for f in files)
    umax = max(f["stats"]["user_id"][1] for f in files)
    emin = min(f["stats"]["event_id"][0] for f in files)
    emax = max(f["stats"]["event_id"][1] for f in files)
    ulo, uhi = umin + (umax - umin) * 3 // 10, umin + (umax - umin) * 45 // 100
    elo, ehi = emin + (emax - emin) * 5 // 10, emin + (emax - emin) * 7 // 10
    box = {"user_id": (ulo, uhi), "event_id": (elo, ehi)}
    kept = t._select_files(ranges=box)
    if len(kept) >= len(files):
        raise AssertionError(
            f"z-order box pruned nothing: kept {len(kept)} of {len(files)}"
        )
    return (
        t.read(ranges=box)
        .where(
            F.col("user_id").between(ulo, uhi)
            & F.col("event_id").between(elo, ehi)
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


def q_image_decode_stats(spark, sf):
    """REAL image decode end-to-end across THREE containers: encode one
    genuine image per doc — 24-bit BMP, binary PPM, or PNG (DEFLATE via
    stdlib zlib, CRC-verified chunks, per-row cycling scanline filters)
    chosen by doc_id % 3 — then magic-sniff, parse it back and emit
    width/height/per-channel means. The fixture pattern is closed-form
    ((c*id + i) % 251 at pixel i, multimodal.py::_fixture_pixels), so the
    oracle reproduces every statistic without running any codec — any
    decoder bug (BMP padding/row order/BGR swap, PPM header walk, PNG
    unfilter/inflate/CRC) breaks the hash match."""
    from hemera_indexer_spark.operators.multimodal import (
        image_stats,
        synthesize_image_blobs,
    )

    docs = _t(spark, sf, "documents").select("doc_id")
    return image_stats(synthesize_image_blobs(docs, "doc_id", fmt="mixed"))


# ------------------------------------------------- typed decode dispatch
def q_decode_dispatch(spark, sf):
    """Topic0-dispatched multi-type decode (token_transfer.py:245-260
    dispatch, :106-242 typed decoders): events are JVM-encoded into two
    tagged binary record layouts (fixed transfer / variable-length batch),
    the dispatcher routes by tag byte to per-type vectorized decoders with
    different output shapes, and the union projects the superset schema."""
    from hemera_indexer_spark.operators.decode import (
        decode_dispatch,
        encode_batch_records,
        encode_transfer_records,
    )

    ev = _t(spark, sf, "events")
    transfers = encode_transfer_records(
        ev.where(F.col("event_type").isin("click", "view")).select(
            F.col("event_id").alias("seq"),
            F.concat(
                F.lit("0x"), F.lower(F.lpad(F.hex("user_id"), 40, "0"))
            ).alias("addr"),
            F.floor(F.col("value") * 1000).cast("long").alias("amount"),
        ),
        "seq", "addr", "amount",
    )
    batches = encode_batch_records(
        ev.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("seq"),
            F.transform(
                F.sequence(F.lit(0), F.pmod(F.col("event_id"), F.lit(4))),
                lambda j: F.col("user_id") + j * F.lit(7),
            ).alias("vals"),
        ),
        "seq", "vals",
    )
    # one mixed "raw log" stream of tagged records, as the RPC would yield
    raw = transfers.select("record").unionByName(batches.select("record"))
    typed = decode_dispatch(raw, "record")
    # sentinel values (not NULL) for the non-applicable columns: the
    # correctness gate sorts row tuples, and None is not orderable vs str
    t = typed["transfer"].select(
        F.lit("transfer").alias("rec_type"),
        "seq", "address", "amount",
        F.lit(0).cast("int").alias("n_items"),
        F.lit("").alias("total"),
    )
    b = typed["batch"].select(
        F.lit("batch").alias("rec_type"),
        "seq",
        F.lit("").alias("address"),
        F.lit("").alias("amount"),
        "n_items", "total",
    )
    return t.unionByName(b)


def q_trace_flatten(spark, sf):
    """Recursive call-tree flatten (export_traces_job.py:88-120): JSON call
    trees of row-dependent depth/fan-out are flattened to one row per call
    with path-encoded trace_address — the mapInPandas DFS handles arbitrary
    depth (a depth-60 tree is exercised in tests/)."""
    from hemera_indexer_spark.operators.traces import flatten_call_tree

    ev = _t(spark, sf, "events").where(F.col("event_id") < 500)
    leaf = lambda j: F.concat(  # noqa: E731
        F.lit('{"op":"leaf","value":'),
        (F.col("user_id") + j).cast("string"),
        F.lit(",\"calls\":[]}"),
    )
    mid = F.concat(
        F.lit('{"op":"mid","value":'),
        (F.col("user_id") + 10).cast("string"),
        F.lit(',"calls":['), leaf(100), F.lit("]}"),
    )
    # depth d = 1 + event_id % 3: root / root+2 leaves / root+(mid->leaf)+leaf
    d = F.pmod(F.col("event_id"), F.lit(3))
    kids = (
        F.when(d == 0, F.lit(""))
        .when(d == 1, F.concat(leaf(1), F.lit(","), leaf(2)))
        .otherwise(F.concat(mid, F.lit(","), leaf(2)))
    )
    tree = F.concat(
        F.lit('{"op":"'), F.col("event_type"), F.lit('","value":'),
        F.col("user_id").cast("string"),
        F.lit(',"calls":['), kids, F.lit("]}"),
    )
    src = ev.select(F.col("event_id").alias("id"), tree.alias("trace"))
    return flatten_call_tree(src, "trace", "id")


def q_keyset_page(spark, sf):
    """Keyset pagination (transactions.py:150-162 seek analog): page 2 of
    orders by (o_totalprice DESC, o_orderkey), fetched with a seek
    predicate from page 1's last key — never OFFSET."""
    from hemera_indexer_spark.plans.pagination import keyset_page

    orders = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cols = [("o_totalprice", True), ("o_orderkey", False)]
    last = keyset_page(orders, cols, None, 20).collect()[-1]
    return keyset_page(
        orders, cols, (last["o_totalprice"], last["o_orderkey"]), 20
    )


def q_duplicated_spans(spark, sf):
    """Substring-level dedup (Lee et al. 2022 shape): every 8-word span
    occurring verbatim more than once across the corpus, with positions —
    span-hash groupBy + broadcast semi-join back to occurrences (never a
    self-join)."""
    from hemera_indexer_spark.operators.dedup import duplicated_spans

    return duplicated_spans(
        _t_fan(spark, sf, "documents"), "doc_id", "text", window=8
    )


def q_decontaminate(spark, sf):
    """Benchmark decontamination (GPT-3-style n-gram overlap): training
    docs holding a verbatim 8-word span from the benchmark slice; the
    benchmark's distinct span-hash set broadcasts, training stays
    map-only."""
    from hemera_indexer_spark.operators.dedup import cross_corpus_span_overlap

    # fan-out the TRAIN side only: the bench branch ends in a distinct
    # shuffle anyway, so its share of the round-robin repartition was
    # pure cost (same filters, identical results)
    train = _t_fan(spark, sf, "documents").where(
        F.pmod(F.col("doc_id"), F.lit(10)) != 0
    )
    bench = _t(spark, sf, "documents").where(
        F.pmod(F.col("doc_id"), F.lit(10)) == 0
    )
    return cross_corpus_span_overlap(train, bench, "doc_id", "text", window=8)


def q_bloom_decontaminate(spark, sf):
    """Decontamination through the BLOOM SURROGATE of the benchmark span
    set (operators/dedup.py::bloom_span_decontaminate): k md5-prefix
    positions per span, bench reduced to distinct (i, pos) pairs bounded
    by k*16^prefix regardless of bench size, training span positive iff
    all k positions hit. Same split as q_decontaminate; the oracle
    replicates the position derivation exactly (no-false-negatives law vs
    cross_corpus_span_overlap is property-tested separately)."""
    from hemera_indexer_spark.operators.dedup import bloom_span_decontaminate

    # fan-out the TRAIN side only (see q_decontaminate)
    train = _t_fan(spark, sf, "documents").where(
        F.pmod(F.col("doc_id"), F.lit(10)) != 0
    )
    bench = _t(spark, sf, "documents").where(
        F.pmod(F.col("doc_id"), F.lit(10)) == 0
    )
    return bloom_span_decontaminate(
        train, bench, "doc_id", "text", window=8, k=3, prefix_len=6
    )


def q_pack_sequences(spark, sf):
    """Sequence packing (concat-and-chunk): variable-length docs packed
    into fixed 64-token training rows per language group — the step between
    this engine's token-array table and a training loader. Toy tokenizer
    (word lengths) keeps the oracle engine-portable; the packing plan
    (window offset cumsum -> posexplode -> chunk groupBy) is the real
    operator. Rows are compared by md5 of the packed token stream."""
    from hemera_indexer_spark.operators.packing import pack_sequences

    docs = _t(spark, sf, "documents")
    toks = F.transform(
        F.split(F.trim(F.col("text")), "\\s+"), lambda w: F.length(w)
    )
    packed = pack_sequences(
        docs.select("doc_id", "lang", toks.alias("tokens")),
        tokens_col="tokens", group_col="lang", order_col="doc_id",
        seq_len=64,
    )
    return packed.select(
        "lang", "chunk_id", "n_tokens",
        F.md5(F.concat_ws(",", "tokens")).alias("tokens_md5"),
    )


def q_dataset_split(spark, sf):
    """Deterministic engine-portable train/val/test assignment (md5-bucket
    mod 100 — stable across engines and cluster sizes, pure projection)."""
    from hemera_indexer_spark.operators.dedup import dataset_split

    out = dataset_split(_t(spark, sf, "documents"), "doc_id")
    return out.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


# ------------------------------------------------- temporal operators
def q_asof_enrich(spark, sf):
    """Backward as-of join (merge-based union + running last(ignorenulls)
    window — one shuffle, never an inequality join): each click gets the
    same user's latest purchase at-or-before its timestamp; unmatched
    clicks keep sentinel values (the correctness gate sorts row tuples, so
    no NULLs in orderable columns)."""
    from hemera_indexer_spark.operators.temporal import asof_join

    ev = _t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        probe_ts="ts",
        dim_ts="p_ts",
        dim_cols=["p_event_id", "p_value"],
        dim_tiebreak="p_event_id",
    )
    return out.select(
        "click_id",
        "user_id",
        F.coalesce(F.col("p_event_id"), F.lit(-1)).alias("p_event_id"),
        F.coalesce(F.col("p_value"), F.lit(-1.0)).alias("p_value"),
    )


def q_scd2_intervals(spark, sf):
    """SCD Type-2 validity intervals reconstructed from the event log:
    consecutive same-value runs of each user's event_type compress into
    (valid_from, valid_to) version intervals — the warehouse-dimension dual
    of the engine's LWW current-state collapse (two narrow windows over one
    key shuffle)."""
    from hemera_indexer_spark.operators.temporal import scd2_intervals

    ev = _t(spark, sf, "events").select("user_id", "event_id", "event_type")
    out = scd2_intervals(ev, key="user_id", version="event_id", attr="event_type")
    return out.select(
        "user_id",
        "event_type",
        "valid_from",
        F.coalesce(F.col("valid_to"), F.lit(-1)).alias("valid_to"),
        "is_current",
    )


def q_range_window_join(spark, sf):
    """Time-window range join via interval bucketing (equi-join on hour
    slots + exact range filter — no broadcast-nested-loop): clicks landing
    in the hour before each purchase by the same user."""
    from hemera_indexer_spark.operators.temporal import range_join_buckets

    ev = _t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
        F.col("event_id").alias("p_id"),
    )
    pairs = range_join_buckets(
        clicks,
        purchases,
        key="user_id",
        point_ts="c_ts",
        start_ts="w_start",
        end_ts="w_end",
    )
    return pairs.groupBy("p_id").agg(
        F.count("*").alias("n_clicks"), F.min("c_id").alias("first_click_id")
    )


def q_moving_avg(spark, sf):
    """Window-frame aggregation (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW):
    7-day moving average of daily order revenue. The frame runs over the
    PRE-AGGREGATED one-row-per-date table, so the unpartitioned ordering is
    O(days), not O(orders); sums stay decimal until the final division."""
    from pyspark.sql import Window

    orders = _t(spark, sf, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.sum(_dec("o_totalprice")).alias("_rev"))
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        "d",
        F.col("_rev").cast("double").alias("revenue"),
        _round_dd(
            F.sum("_rev").over(w).cast("double") / F.count("*").over(w), 6
        ).alias("ma7"),
        F.count("*").over(w).alias("n7"),
    )


def q_rollup_agg(spark, sf):
    """ROLLUP grouping-set aggregation (subtotals + grand total) — beyond
    the reference, which has no grouping sets (SURVEY §2.4); NULL subtotal
    markers project to '(all)' so row tuples stay orderable."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


def q_quantile_stats(spark, sf):
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`): document-length quartiles per source — the
    distribution-sanity stats a data pipeline reports per shard. Exact
    `percentile` materializes each group's values (the oracle-comparable
    mode); at corpus scale use the built-in `percentile_approx`
    (Greenwald-Khanna sketch, map-side mergeable, rank error <= n/accuracy
    — property-tested in tests/test_operators.py)."""
    docs = _t(spark, sf, "documents")
    pct = F.expr("percentile(n_chars, array(0.25D, 0.5D, 0.9D))")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(pct.getItem(0), 6).alias("p25"),
        F.round(pct.getItem(1), 6).alias("p50"),
        F.round(pct.getItem(2), 6).alias("p90"),
    )


def q_tfidf_topk(spark, sf):
    """TF-IDF scoring + per-doc top-k terms: term frequency per doc joined
    against corpus document frequency (broadcast — vocabulary ≪ corpus),
    idf = ln(N/df), top-3 by (score desc, term asc) via row_number."""
    from pyspark.sql import Window

    docs = _t(spark, sf, "documents")
    n_docs = _t_rows(sf, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), "\\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "term", "tfidf", "rk")
    )


def q_mixture_sample(spark, sf):
    """Deterministic mixture downsampling: every source is hash-sampled to
    the SMALLEST source's char budget (rate_s = min_chars/chars_s), using
    the same engine-portable md5 bucket as dataset_split — so the kept set
    is stable across engines, runs and cluster sizes. Output: per-source
    audit (rate, kept docs, kept chars)."""
    docs = _t(spark, sf, "documents")
    totals = docs.groupBy("source").agg(F.sum("n_chars").alias("chars_s"))
    min_chars = totals.agg(F.min("chars_s")).collect()[0][0]
    rates = totals.select(
        "source", (F.lit(float(min_chars)) / F.col("chars_s")).alias("rate")
    )
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("mix"), F.col("doc_id"))), 1, 4),
        16,
        10,
    ).cast("int")
    kept = (
        docs.join(F.broadcast(rates), "source")
        .where(bucket / F.lit(65536.0) < F.col("rate"))
    )
    return kept.groupBy("source").agg(
        F.round(F.first("rate"), 6).alias("rate"),
        F.count("*").alias("n_kept"),
        # double: the oracle's SUM(int) is a DuckDB HUGEINT -> float64 in
        # the driver's pandas canon; bigint vs float64 hash-mismatched in
        # round 5. Sums here are far below 2^53, so double is exact.
        F.sum("n_chars").cast("double").alias("kept_chars"),
    )


def q_temperature_mixture(spark, sf):
    """Temperature-based mixture sampling (the mT5/multilingual-LM
    alpha-sampling rule, Xue et al. 2021: sample probability
    q_s ∝ p_s^alpha with alpha=0.3): boosts rare sources, damps dominant
    ones. Realized as a deterministic per-source KEEP RATE
    min(1, q_s/p_s) over the engine-portable md5 bucket (select-only:
    rate capped at 1 — physical upsampling is a repeat-read at training
    time, not a data-curation concern). The source dimension is tiny, so
    the normalizer is a documented bounded driver-side scalar (the
    broadcast-small-side rule). Output: per-source audit."""
    alpha = 0.3
    docs = _t(spark, sf, "documents")
    totals = docs.groupBy("source").agg(F.sum("n_chars").alias("chars_s"))
    rows = totals.collect()  # bounded: one row per source
    total = float(sum(r["chars_s"] for r in rows))
    z = sum((r["chars_s"] / total) ** alpha for r in sorted(
        rows, key=lambda r: r["source"]
    ))
    rates = totals.select(
        "source",
        "chars_s",
        F.least(
            F.lit(1.0),
            F.pow(F.col("chars_s") / F.lit(total), F.lit(alpha - 1.0))
            / F.lit(z),
        ).alias("rate"),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit("temp"), F.col("doc_id"))), 1, 4
        ),
        16,
        10,
    ).cast("int")
    # integer keep threshold: the float rate (libm pow + fold-order z) can
    # differ between engines in the last ulp, and a raw `bucket/65536 <
    # rate` comparison would flip membership at the boundary. Rounding the
    # threshold to the bucket grid once makes the comparison exact-integer
    # on both sides (residual risk only if rate*65536 sits within an ulp
    # of a .5 — per-source, not per-doc).
    kept = docs.join(F.broadcast(rates.drop("chars_s")), "source").where(
        bucket < F.round(F.col("rate") * 65536).cast("int")
    )
    return (
        kept.groupBy("source")
        .agg(
            F.round(F.first("rate"), 6).alias("rate"),
            F.count("*").alias("n_kept"),
            # double to match the oracle HUGEINT -> float64 (see
            # q_mixture_sample); exact below 2^53
            F.sum("n_chars").cast("double").alias("kept_chars"),
        )
    )


def q_vocab_histogram(spark, sf):
    """Token-frequency histogram over the corpus's token arrays (toy
    tokenizer = word lengths, engine-portable): one map-only explode +
    map-side-combined groupBy, top-50 deterministic."""
    from hemera_indexer_spark.operators.tokens import vocab_histogram

    docs = _t(spark, sf, "documents")
    # strip ALL boundary whitespace (trim() strips spaces only — a leading
    # tab would yield a phantom empty token the oracle's regexp-normalized
    # split never produces)
    clean = F.regexp_replace(F.col("text"), r"^\s+|\s+$", "")
    toks = F.transform(F.split(clean, r"\s+"), lambda w: F.length(w))
    return vocab_histogram(
        docs.select("doc_id", toks.alias("tokens")),
        id_col="doc_id",
        top_k=50,
    )


def q_token_budget(spark, sf):
    """Per-group token accounting (mixture-weight input): docs, token
    totals and corpus share per language — array sizes only, no explode."""
    from hemera_indexer_spark.operators.tokens import token_budget

    docs = _t(spark, sf, "documents")
    clean = F.regexp_replace(F.col("text"), r"^\s+|\s+$", "")
    toks = F.transform(F.split(clean, r"\s+"), lambda w: F.length(w))
    return token_budget(
        docs.select("lang", toks.alias("tokens")), group_col="lang"
    )


def q_repetition_ratio(spark, sf):
    """Intra-doc repeated-bigram fraction (the Gopher/MassiveText
    repetition quality signal): 1 - distinct/total word bigrams per doc.
    One map-only shingle explode + one groupBy(doc)."""
    from hemera_indexer_spark.operators.text import repetition_stats

    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 200)
    out = repetition_stats(docs, "doc_id", "text", n=2)
    # driver-canonical dtype: quantize through decimal(18,6) as before,
    # then REPRESENT as double (see _dbl) — values unchanged
    return out.select(
        "doc_id", "n_ngrams", "n_uniq",
        F.col("rep_ratio").cast("decimal(18,6)").cast("double").alias("rep_ratio"),
    )


def q_gopher_filter(spark, sf):
    """Gopher-rule document quality filter (word-count bounds, mean word
    length band, >=2 stopwords, punctuation ratio cap) — per-rule flags
    plus the keep conjunction, as 0/1 ints for the hash gate. All Column
    algebra fused into the scan stage."""
    from hemera_indexer_spark.operators.text import with_gopher_flags

    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 300)
    out = with_gopher_flags(docs.select("doc_id", "text"))
    return out.select(
        "doc_id", "n_words", "stop_hits",
        *[
            F.col(c).cast("int").alias(c)
            for c in ("ok_word_count", "ok_avg_word_len", "ok_stopwords",
                      "ok_punct", "keep")
        ],
    )


def q_length_band(spark, sf):
    """Per-source length-percentile band filter (drop the tails, a standard
    pretraining length cut): keep docs whose percent_rank by n_chars within
    their source lies in [0.05, 0.95]; report per-source kept stats. One
    window shuffle on source."""
    from pyspark.sql import Window

    docs = _t(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy("n_chars")
    pr = F.percent_rank().over(w)
    kept = docs.withColumn("_pr", pr).where(
        (F.col("_pr") >= 0.05) & (F.col("_pr") <= 0.95)
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def q_source_lang_matrix(spark, sf):
    """Source × language composition matrix (mixture audit): per-source
    doc counts pivoted over the language set. groupBy+pivot = ONE shuffle;
    the pivot values are declared, so no discovery pass."""
    docs = _t(spark, sf, "documents")
    out = (
        docs.groupBy("source")
        .pivot("lang", ["de", "en", "es", "fr", "zh"])
        .agg(F.count(F.lit(1)))
    )
    for lang in ("de", "en", "es", "fr", "zh"):
        out = out.withColumn(
            f"n_{lang}", F.coalesce(F.col(lang), F.lit(0)).cast("long")
        ).drop(lang)
    return out.withColumn(
        "n_total",
        sum(F.col(f"n_{lang}") for lang in ("de", "en", "es", "fr", "zh")),
    )


def q_dedup_keep_best(spark, sf):
    """Quality-aware cluster resolution: near-dup clusters (jaccard -> CC)
    keep their HIGHEST-quality member (ties -> min doc_id) instead of the
    min id — the keep rule a training-data curation pipeline actually
    wants. Shares the pair/CC machinery with dedup_clusters_cc; adds one
    broadcast-sized join + a per-cluster window."""
    from hemera_indexer_spark.operators.dedup import (
        connected_components_auto,
        jaccard_pairs,
        keep_best_from_cc,
    )
    from hemera_indexer_spark.operators.text import quality_score

    docs = _t(spark, sf, "documents")
    max_df = max(5, _t_rows(sf, "documents") // 100)
    pairs = jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.6, max_df=max_df)
    cc = connected_components_auto(pairs)
    scores = docs.select("doc_id", quality_score(F.col("text")).alias("q"))
    out = keep_best_from_cc(cc, scores, "q")
    # driver-canonical dtype: quantize through decimal(18,6) as before,
    # then REPRESENT as double (see _dbl) — values unchanged
    return out.select(
        "doc_id", "cluster_id",
        F.col("q").cast("decimal(18,6)").cast("double").alias("q"), "keep",
    )


def q_unigram_logprob(spark, sf):
    """CCNet-shape LM quality scoring: each doc scored by its average
    unigram log10-probability under the corpus's own word distribution —
    low scores = rare-word/gibberish docs, the standard perplexity-filter
    proxy. The vocabulary (distinct words ≪ corpus) broadcasts onto the
    map-only exploded word stream; per-token scores round to 6dp and sum
    as decimal(18,6) so the fold is order-independent (bit-identical to
    any oracle regardless of partitioning)."""
    docs = _t(spark, sf, "documents")
    # the word stream feeds THREE consumers (corpus total, frequency
    # build, per-doc scoring join) — cache the shared branch once, same
    # rule as the dedup pipeline's shared shingle branch
    words = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), "\\s+")
            ).alias("w"),
        )
        .where(F.col("w") != "")
        .cache()
    )
    freqs = words.groupBy("w").agg(F.count("*").alias("n"))
    total = words.count()
    scored = words.join(F.broadcast(freqs), "w").select(
        "doc_id",
        F.round(F.log10(F.col("n") / F.lit(float(total))), 6)
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            # decimal quantization kept; double is the driver-canonical
            # final representation (see _dbl)
            # duck divides the decimal sum by the count in the DOUBLE
            # domain and rounds the BINARY value; replicate both (the
            # sf0.001 tie row -26.624889/18 = -1.4791605 exposed the
            # repr-based F.round divergence — functions/rounding.py)
            _round_dd(F.sum("lp").cast("double") / F.count("*"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("avg_logprob"),
        )
        .where(F.col("doc_id") < 200)
    )


def q_label_centroids(spark, sf):
    """Per-label embedding centroids (classifier prototypes / cluster
    means): element-wise mean via posexplode + groupBy(label, dim) — ONE
    shuffle keyed by (label, dim), embarrassingly parallel, no vector
    ever assembled driver-side. Emits the EXACT decimal component sum +
    count (mean = sum/n downstream) — order-independent and free of the
    fixed-precision half-boundary rounding a mean would hit."""
    emb = _t(spark, sf, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding")).alias("dim", "v")
        )
        .groupBy("label", "dim")
        .agg(
            F.count("*").alias("n_vecs"),
            # EXACT decimal sum — the mean (sum/n) is a half-boundary
            # trap at fixed precision (one cell of this very dataset
            # lands exactly on .0000005 and Spark/DuckDB round it in
            # opposite directions); exact sums sidestep rounding entirely
            F.sum(F.col("v").cast("double").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            # double final representation (driver-canonical, see _dbl);
            # the exact-decimal fold above is unchanged
            .cast("double")
            .alias("sum_v"),
        )
        .where(F.col("dim") < 8)
    )


def q_chunk_dedup_clean(spark, sf):
    """C4-style chunk dedup, transform half: drop repeated 8-word chunks
    (global first occurrence wins) and reassemble surviving text per doc;
    fully-emptied docs are dropped (operators/dedup.py
    ``remove_duplicate_chunks``)."""
    from hemera_indexer_spark.operators.dedup import remove_duplicate_chunks

    docs = _t(spark, sf, "documents")
    return remove_duplicate_chunks(docs, "doc_id", "text", chunk_words=8).where(
        F.col("doc_id") < 300
    )


def q_chunk_dedup(spark, sf):
    """C4-style chunk-level (line) dedup accounting: global
    first-occurrence wins over 8-word chunks; per-doc survival counts.
    One window shuffle keyed by chunk text (operators/dedup.py
    ``chunk_dedup_counts``)."""
    from hemera_indexer_spark.operators.dedup import chunk_dedup_counts

    docs = _t(spark, sf, "documents")
    return chunk_dedup_counts(docs, "doc_id", "text", chunk_words=8).where(
        F.col("doc_id") < 300
    )


def q_bigram_pmi(spark, sf):
    """Collocation mining: top-40 adjacent-word pairs by PMI with a
    min-count floor (operators/corpus.py ``bigram_pmi``) — bigram zip is
    codegen, vocabulary side broadcast, totals ride a window over the
    aggregate."""
    from hemera_indexer_spark.operators.corpus import bigram_pmi

    docs = _t(spark, sf, "documents")
    return _dbl(bigram_pmi(docs, "text", min_count=5, top_k=40), "pmi")


def q_vocab_coverage(spark, sf):
    """Tokenizer-sizing curve: smallest vocab rank covering 50/90/99% of
    token occurrences (operators/corpus.py ``vocab_coverage``)."""
    from hemera_indexer_spark.operators.corpus import vocab_coverage

    docs = _t(spark, sf, "documents")
    return _dbl(
        vocab_coverage(docs, "text", thresholds=(0.5, 0.9, 0.99)), "threshold"
    )


def q_source_kl(spark, sf):
    """Mixture skew: KL(source unigram dist ‖ corpus dist) per source,
    one occurrence-stream shuffle, per-term decimal rounding so the fold
    is order-independent (operators/corpus.py ``source_kl``)."""
    from hemera_indexer_spark.operators.corpus import source_kl

    docs = _t(spark, sf, "documents")
    return _dbl(source_kl(docs, "source", "text"), "kl")


def q_zipf_slope(spark, sf):
    """Distribution health: least-squares Zipf slope of log10(freq) vs
    log10(rank) per language, computed from exact decimal sums
    (operators/corpus.py ``zipf_slope``)."""
    from hemera_indexer_spark.operators.corpus import zipf_slope

    docs = _t(spark, sf, "documents")
    return _dbl(zipf_slope(docs, "text", group_col="lang"), "slope")


def q_source_sample(spark, sf):
    """Deterministic inspection panel: 10 docs per source by md5(doc_id)
    rank — same rows on every engine/cluster size/retry. Runs the
    skew-safe two-phase form (hash-threshold prefilter + short-group
    guard) so the oracle's plain-window SQL attests its exactness
    (operators/corpus.py ``per_group_sample``)."""
    from hemera_indexer_spark.operators.corpus import per_group_sample

    docs = _t(spark, sf, "documents")
    return per_group_sample(docs, "source", "doc_id", k=10, prefilter_factor=4)


def q_bigram_logprob(spark, sf):
    """Bigram-LM doc scoring (perplexity-proxy one step up from
    unigram): avg ln(c(x,y)/c(x·)) per doc; model tables broadcast,
    bigram stream cached once (operators/corpus.py ``bigram_logprob``)."""
    from hemera_indexer_spark.operators.corpus import bigram_logprob

    docs = _t(spark, sf, "documents")
    return _dbl(
        bigram_logprob(docs, "doc_id", "text").where(F.col("doc_id") < 200),
        "avg_logprob",
    )


def q_source_overlap(spark, sf):
    """Cross-source 3-gram contamination matrix: distinct shingles at
    SOURCE granularity first, so the shingle self-join is bounded by
    |sources|^2 per shingle (operators/corpus.py ``source_overlap``)."""
    from hemera_indexer_spark.operators.corpus import source_overlap

    # fan-out: the n=3 shingle construction feeding the distinct is the
    # map-heavy side of this query and a one-row-group fixture scans as
    # one task (measured 1.24 -> 0.81s best-of-3 with the fan-out)
    docs = _t_fan(spark, sf, "documents")
    return _dbl(source_overlap(docs, "source", "text", n=3), "jaccard")


def q_dim_stats(spark, sf):
    """Per-dimension embedding stats (whitening/PCA prep): exact decimal
    sums + sum-of-squares, exact min/max (operators/embeddings.py
    ``dim_stats``)."""
    from hemera_indexer_spark.operators.embeddings import dim_stats

    emb = _t(spark, sf, "embeddings")
    return _dbl(dim_stats(emb, "embedding"), "sum_v", "sum_sq", "min_v", "max_v")


def q_quantize_embeddings(spark, sf):
    """SQ8 scalar quantization: per-dim min/max params (dim-sized,
    collected = broadcast-small-side rule) shipped as literal arrays
    into an O(dim) map-only transform; floor, never round-half
    (operators/embeddings.py ``quantize_embeddings``)."""
    from hemera_indexer_spark.operators.embeddings import quantize_embeddings

    emb = _t(spark, sf, "embeddings")
    return quantize_embeddings(emb, "vec_id", "embedding", bits=8).where(
        F.col("vec_id") < 200
    )


def q_funnel(spark, sf):
    """Ordered funnel view→click→purchase (cascaded-min law: each step
    strictly after the previous step's completion): ONE user shuffle,
    cascade as array expressions (plans/aggregates.py ``funnel_counts``)."""
    from hemera_indexer_spark.plans.aggregates import funnel_counts

    ev = _t(spark, sf, "events")
    return funnel_counts(ev, ("view", "click", "purchase"))


def q_retention_cohorts(spark, sf):
    """Cohort retention: first-activity-day cohorts × day offsets 0..7 —
    one user groupBy, one dim join, one combined count-distinct
    (plans/aggregates.py ``retention_cohorts``)."""
    from hemera_indexer_spark.plans.aggregates import retention_cohorts

    ev = _t(spark, sf, "events")
    return retention_cohorts(ev, max_offset_days=7)


def q_event_transitions(spark, sf):
    """First-order Markov transition matrix over per-user event streams
    ((ts, event_id)-ordered lag pairs, row-normalized 6dp probs): one
    user-window shuffle + one combined pair count
    (plans/aggregates.py ``event_transitions``)."""
    from hemera_indexer_spark.plans.aggregates import event_transitions

    return _dbl(event_transitions(_t(spark, sf, "events")), "prob")


def q_jl_projection(spark, sf):
    """Johnson–Lindenstrauss ±1 random projection 64→8 dims (the pre-ANN
    shrink): map-only, sign matrix shipped as literals, exact decimal
    folds; exploded long-form for the oracle compare
    (operators/embeddings.py ``jl_project``)."""
    from hemera_indexer_spark.operators.embeddings import jl_project

    emb = _t(spark, sf, "embeddings")
    out = jl_project(emb, in_dim=64, out_dim=8)
    return _dbl(
        out.select("vec_id", F.posexplode("proj").alias("j", "val")), "val"
    )


def q_chunk_tokens(spark, sf):
    """Per-doc overlapping token windows (RAG / long-context chunking,
    size=32 stride=24): map-only sequence+slice inside codegen, no
    shuffle, boundary never crosses a document
    (operators/packing.py ``chunk_tokens``)."""
    from hemera_indexer_spark.operators.packing import chunk_tokens

    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 200)
    clean = F.regexp_replace(F.col("text"), r"^\s+|\s+$", "")
    toks = F.transform(F.split(clean, r"\s+"), lambda w: F.length(w))
    return chunk_tokens(
        docs.select("doc_id", toks.alias("tokens")),
        size=32,
        stride=24,
    )


def q_kmeans_clusters(spark, sf):
    """Deterministic Lloyd's k-means (k=4, 2 rounds) over the embedding
    corpus: exact-decimal distances, 6dp-quantized centroid updates,
    first-k-ids init — every step engine-reproducible; iters+1 corpus
    passes, centroids ship as literals
    (operators/embeddings.py ``kmeans_lloyd``)."""
    from hemera_indexer_spark.operators.embeddings import kmeans_lloyd

    emb = _t(spark, sf, "embeddings")
    return kmeans_lloyd(emb, in_dim=64, k=4, iters=2)


def q_feature_hashing(spark, sf):
    """Hashing-trick sparse text features (signed, 64 buckets): map-only
    explode + ONE map-side-combined (doc, feature) groupBy — shuffle rows
    bounded by docs × n_features, no vocabulary pass
    (operators/text.py ``feature_hashing``)."""
    from hemera_indexer_spark.operators.text import feature_hashing

    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 300)
    return feature_hashing(docs, "doc_id", "text", n_features=64)


def q_doc_entropy(spark, sf):
    """Per-doc unigram Shannon entropy (lexical diversity / boilerplate
    signal): one (doc, word) shuffle, per-doc total rides a window over
    the aggregate, per-term decimal rounding before the fold
    (operators/corpus.py ``doc_entropy``)."""
    from hemera_indexer_spark.operators.corpus import doc_entropy

    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 300)
    return _dbl(doc_entropy(docs, "doc_id", "text"), "entropy")


def q_hapax_ratio(spark, sf):
    """Hapax-legomena fraction per source (second lexical-diversity lens:
    template farms collapse it, OCR noise inflates it) — one
    occurrence-stream shuffle (operators/corpus.py ``hapax_ratio``)."""
    from hemera_indexer_spark.operators.corpus import hapax_ratio

    docs = _t(spark, sf, "documents")
    return _dbl(hapax_ratio(docs, "source", "text"), "hapax_ratio")


def q_source_exclusivity(spark, sf):
    """Per-source trigram exclusivity — the summary dual of the pairwise
    ``source_overlap`` matrix: what fraction of a source's distinct
    3-grams no other source has (near-zero = mirror/re-scrape)
    (operators/corpus.py ``source_exclusivity``)."""
    from hemera_indexer_spark.operators.corpus import source_exclusivity

    docs = _t(spark, sf, "documents")
    return _dbl(source_exclusivity(docs, "source", "text", n=3), "excl_ratio")


def q_dist_drift(spark, sf):
    """Unigram distribution drift (L1 distance over the union vocabulary)
    between two document populations per language — the alarm statistic
    an incremental pipeline compares across ingest epochs; here the
    populations are the even/odd doc_id halves (stable at every sf)
    (operators/corpus.py ``dist_drift``)."""
    from hemera_indexer_spark.operators.corpus import dist_drift

    docs = _t(spark, sf, "documents")
    return _dbl(
        dist_drift(docs, (F.col("doc_id") % 2) == 0, "text", "lang"), "l1_dist"
    )


def q_dedup_containment(spark, sf):
    """Asymmetric n-gram containment pairs (|S(a)∩S(b)|/|S(a)| — catches
    excerpt-inside-page duplication that symmetric Jaccard misses), same
    hot-shingle cut as dedup_jaccard (operators/dedup.py
    ``containment_pairs``)."""
    from hemera_indexer_spark.operators.dedup import containment_pairs

    docs = _t(spark, sf, "documents")
    max_df = max(5, _t_rows(sf, "documents") // 100)
    return _dbl(
        containment_pairs(
            docs, "doc_id", "text", n=2, threshold=0.5, max_df=max_df
        ),
        "containment",
    )


def q_winnow_dedup(spark, sf):
    """Winnowing shared-passage pairs (Schleimer/Wilkes/Aiken SIGMOD'03,
    the MOSS fingerprinting algorithm): k-gram rolling hashes, per-window
    minima (density ~2/(w+1)), inverted-index equi-join on the fingerprint
    key, hot-fingerprint cut before the join (operators/dedup.py
    ``winnow_pairs``). Unlike MinHash-LSH (whole-doc Jaccard bound) the
    guarantee is LOCAL: any shared run of >= w+k-1 tokens shares a
    fingerprint."""
    from hemera_indexer_spark.operators.dedup import winnow_pairs

    docs = _t(spark, sf, "documents")
    max_df = max(5, _t_rows(sf, "documents") // 100)
    return winnow_pairs(
        docs, "doc_id", "text", k=5, w=4, min_shared=2, max_df=max_df
    )


def q_heavy_hitters(spark, sf):
    """Top-20 frequent words via the bounded-memory Misra-Gries sketch
    (operators/sketches.py): mapInPandas partial summaries (<= capacity
    counters per task), tiny groupBy-sum merge, deterministic top-k. At
    this scale capacity (4096) exceeds the vocabulary, so the sketch is
    provably EXACT and the DuckDB oracle checks it against plain
    count(*) — the approximate regime is property-tested against the
    N/(capacity+1) bound instead."""
    from hemera_indexer_spark.operators.corpus import word_stream
    from hemera_indexer_spark.operators.sketches import heavy_hitters

    docs = _t(spark, sf, "documents")
    return heavy_hitters(word_stream(docs), "w", capacity=4096, k=20)


def q_shard_ntile(spark, sf):
    """Deterministic balanced shard assignment audit: ntile(8) per source
    over the engine-portable md5(doc_id) hash order — equal-count,
    unbiased output shards for a writer (operators/packing.py
    ``ntile_shards``)."""
    from hemera_indexer_spark.operators.packing import ntile_shards

    docs = _t(spark, sf, "documents")
    return ntile_shards(
        docs, "source", "doc_id", n_shards=8, weight_col="n_chars"
    )


def q_bpe_pairs(spark, sf):
    """BPE tokenizer training, iteration-0 statistics: top-50 adjacent
    character pairs weighted by word frequency (operators/bpe.py
    ``pair_counts`` over ``word_frequencies``). One corpus-sized explode
    + two map-side-combined groupBys; the full trainer (``learn_bpe``)
    iterates this aggregate over the vocab only — pytest-verified
    against a pure-Python reference in tests/test_bpe.py."""
    from hemera_indexer_spark.operators.bpe import (
        pair_counts,
        with_symbols,
        word_frequencies,
    )

    docs = _t(spark, sf, "documents")
    vocab = with_symbols(word_frequencies(docs, "text"))
    return (
        pair_counts(vocab)
        .orderBy(F.desc("cnt"), F.asc("x"), F.asc("y"))
        .limit(50)
    )


def q_audio_decode_stats(spark, sf):
    """REAL audio decode end-to-end: encode one genuine RIFF/WAVE PCM16
    blob per doc (pure-Python codec with a JUNK chunk the decoder must
    walk over — multimodal.py::_fixture_samples), then parse it back
    (chunk walk, fmt validation, interleaved int16 frames) and emit
    rate/channels/frames/duration/mean/rms. The fixture samples are
    closed-form (((id*(c+1) + 13*f) % 4001) - 2000), so the oracle
    reproduces every statistic without running the codec — any decoder
    bug (chunk offsets, channel deinterleave, sign) breaks the hash."""
    from hemera_indexer_spark.operators.multimodal import (
        audio_stats,
        synthesize_audio_blobs,
    )

    docs = _t(spark, sf, "documents").select("doc_id")
    return audio_stats(synthesize_audio_blobs(docs, "doc_id"))


def q_video_frame_stats(spark, sf):
    """REAL video decode + frame sampling: encode one genuine YUV4MPEG2
    stream per doc (pure-Python codec, C420 chroma, closed-form luma
    (id + 31*f + i) % 251 — multimodal.py::_fixture_frames), parse the
    stream back (tagged header, FRAME markers, plane sizing) and keep
    every 2nd frame with its exact-int mean luma — the frame-sample step
    of a video training pipeline. One output row per sampled frame."""
    from hemera_indexer_spark.operators.multimodal import (
        synthesize_video_blobs,
        video_frame_stats,
    )

    docs = _t(spark, sf, "documents").select("doc_id")
    return video_frame_stats(synthesize_video_blobs(docs, "doc_id"), every=2)


def q_semantic_dedup(spark, sf):
    """SemDeDup (Abbas et al. 2023): deterministic k-means clustering
    turns all-pairs cosine into within-cluster pairs (O(Σ cluster²), the
    method's scale trick), 4dp exact-cosine threshold, keep-first drop
    rule (operators/embeddings.py ``semantic_dedup``). The oracle replays
    the shared Lloyd CTE chain plus the identical pair filter."""
    from hemera_indexer_spark.operators.embeddings import semantic_dedup

    emb = _t(spark, sf, "embeddings")
    return semantic_dedup(emb, in_dim=64, k=4, iters=2, threshold=0.35)


def q_quantile_sketch(spark, sf):
    """Deterministic mergeable quantile sketch (Munro-Paterson multi-level
    buffer collapse — no KLL coin flips, so retries reproduce exactly):
    one map-only mapInPandas summary pass, then a single-partition window
    + broadcast range-join against the probs table over the TINY merged
    summary (operators/sketches.py ``quantile_sketch``). Exact regime at
    test scale (per-task counts < buffer), so the oracle states the
    quantile_disc rank rule (rank = max(ceil(p*n), 1)) on the raw data;
    the approximate regime's rank-error bound is property-tested."""
    from hemera_indexer_spark.operators.sketches import quantile_sketch

    ev = _t(spark, sf, "events")
    return quantile_sketch(
        ev, "value",
        probs=[0.05, 0.25, 0.5, 0.75, 0.95, 0.99],
        buffer_size=1 << 17,
    )


def q_bm25_topk(spark, sf):
    """Okapi BM25 relevance against a fixed term set (Lucene idf
    variant), top-20 docs — the IR scorer for query-focused carve-outs
    (operators/corpus.py ``bm25_scores``). Per-term contributions round
    to 6dp and sum as decimal (order-independent fold); avgdl/N are two
    bounded driver actions; the df/idf table is a 3-row broadcast."""
    from hemera_indexer_spark.operators.corpus import bm25_scores

    docs = _t(spark, sf, "documents")
    scored = bm25_scores(docs, ["hash", "join", "vector"])
    return scored.orderBy(
        F.desc("bm25"), F.asc("doc_id")
    ).limit(20)


def q_pagerank(spark, sf):
    """Deterministic PageRank (operators/graph.py) over the bipartite
    customer->supplier graph induced by orders x lineitem: 2 rounds of
    quantized power iteration (6dp ranks, 9dp-decimal edge contributions
    — the kmeans_lloyd fixpoint trick in graph shape), top-50 by rank.
    One src-keyed join + one dst-keyed aggregate per round, rank vector
    never collected."""
    from hemera_indexer_spark.operators.graph import pagerank

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    e = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    pr = pagerank(e, iters=2)
    return pr.orderBy(F.desc("rank"), F.asc("v")).limit(50)


def q_pq_adc_topk(spark, sf):
    """Product-quantization ADC top-k (operators/pq.py, Jégou TPAMI'11):
    m=4 subspace codebooks of ks=4 codes Lloyd-trained in iters+1 shared
    corpus passes, map-only encode (codebook as literals), per-query
    m×ks distance tables, score = m table lookups per candidate — the
    compressed-index ANN form that fits a 100 TB corpus in RAM.
    Self-matches kept (quantization distance to self is the
    reconstruction-error signal)."""
    from hemera_indexer_spark.operators.pq import pq_adc_topk

    return pq_adc_topk(
        _t(spark, sf, "embeddings"),
        in_dim=64,
        query_ids=[0, 1, 2],
        k=5,
        m=4,
        ks=4,
        iters=2,
    )


def q_pq_index_topk(spark, sf):
    """The PERSISTED PQ path (operators/pq_index.py): codebook trained
    ONCE into a LakeTable-backed index (codebook rides the snapshot as a
    property, m-byte codes as LWW rows); a query batch reads codes only —
    the source vectors are touched just for the few query rows. Built
    once per sf dir under /tmp and reused. Oracle: identical to
    pq_adc_topk (the fresh-index equality law, shared
    train/encode/ADC code path)."""
    import hashlib as _h
    import shutil

    from pyspark.sql import types as T

    from hemera_indexer_spark.lake.table import LakeTable
    from hemera_indexer_spark.operators.pq_index import PQIndex

    tag = _h.md5(f"{sf}|pq4x4".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"hemera_q_pqlake_{tag}")
    done = os.path.join(root, "_BUILT")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("is_deleted", T.BooleanType(), False),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        src = LakeTable.create(
            spark, os.path.join(root, "emb"), schema, num_buckets=8,
            key_col="vec_id", seq_col="seq",
        )
        src.bulk_load(
            _t(spark, sf, "embeddings").select("vec_id", "embedding")
        )
        PQIndex.build_from_table(
            spark, os.path.join(root, "idx"), src,
            in_dim=64, m=4, ks=4, iters=2,
        )
        with open(done, "w") as f:
            f.write("ok")
    src = LakeTable.load(spark, os.path.join(root, "emb"))
    idx = PQIndex.load(spark, os.path.join(root, "idx"))
    return idx.topk(src, query_ids=[0, 1, 2], k=5)


def q_dsir_topk(spark, sf):
    """DSIR importance-resampling selection (operators/dsir.py, Xie et
    al. NeurIPS'23): hashed uni+bigram bag models over target (src0) vs
    the raw pool, per-doc importance log-weights (9dp-decimal routed),
    top-20 most target-like docs. Two map-side-combined 64-bucket count
    passes + one O(docs×64)-bounded scoring pass; the log-ratio table
    ships as literals."""
    from hemera_indexer_spark.operators.dsir import dsir_topk

    docs = _t(spark, sf, "documents")
    target = docs.where(F.col("source") == "src0")
    raw = docs.where(F.col("source") != "src0")
    return _dbl(dsir_topk(raw, target, k=20, n_features=64), "log_weight")


def q_quality_classifier(spark, sf):
    """Trained CCNet-style in-domain filter (operators/classifier.py):
    hashed-presence linear classifier with exact-decimal hard-sigmoid GD
    (2 rounds, 32 buckets + bias, lr=0.05 — every weight 9dp-quantized
    by definition, so DuckDB replays the whole training loop), fit to
    separate in-domain text (documents) from out-of-domain (part names),
    then scoring the training pool. 2 bounded shuffles per round over a
    persisted (doc, bucket) presence table; weights ship as literals."""
    from hemera_indexer_spark.operators.classifier import quality_filter

    docs = (
        _t(spark, sf, "documents")
        .where(F.col("doc_id") < 300)
        .select("doc_id", "text", F.lit(True).alias("y"))
    )
    parts = (
        _t(spark, sf, "part")
        .where(F.col("p_partkey") < 300)
        .select(
            (F.col("p_partkey") + 100000).alias("doc_id"),
            F.col("p_name").alias("text"),
            F.lit(False).alias("y"),
        )
    )
    return _dbl(
        quality_filter(
            docs.unionByName(parts), "y", n_features=32, iters=2, lr="0.05"
        ),
        "score",
    )


def q_leakage_split(spark, sf):
    """Dedup-aware train/val/test split (operators/dedup.py
    ``leakage_safe_split``): the split key is the doc's near-dup cluster
    representative (CC min over the jaccard pair graph), so duplicate
    clusters never straddle a boundary — the Lee et al. (2022) train/test
    contamination guard. One CC over the O(duplicates) pair graph + one
    bounded left join + the map-only md5-bucket projection."""
    from hemera_indexer_spark.operators.dedup import (
        jaccard_pairs,
        leakage_safe_split,
    )

    docs = _t(spark, sf, "documents")
    max_df = max(5, _t_rows(sf, "documents") // 100)
    pairs = jaccard_pairs(
        docs, "doc_id", "text", n=2, threshold=0.6, max_df=max_df
    )
    return leakage_safe_split(docs, pairs, "doc_id").select(
        "doc_id", "split"
    )


def q_span_corruption(spark, sf):
    """T5 span-corruption denoising pairs (operators/packing.py
    ``span_corruption``): md5-seeded span starts (gap=5, span_len=3,
    overlaps merge), masked runs collapse to negative sentinels in
    inputs, targets list (sentinel, tokens...) per run. Toy word-length
    tokens (the chunk_tokens convention); one doc-keyed window chain +
    one reassembling groupBy."""
    from hemera_indexer_spark.operators.packing import span_corruption

    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 200)
    clean = F.regexp_replace(F.col("text"), r"^\s+|\s+$", "")
    toks = F.transform(F.split(clean, r"\s+"), lambda w: F.length(w))
    return span_corruption(
        docs.select("doc_id", toks.alias("tokens")), span_len=3, gap=5
    )


def q_fim_transform(spark, sf):
    """Fill-in-the-middle reordering (operators/packing.py
    ``fim_transform``, Bavarian et al. 2022): md5-seeded double cut into
    prefix/middle/suffix, PSM layout with negative sentinel markers —
    a PURE PROJECTION (size/slice/concat in codegen, no shuffle). Toy
    word-length tokens (the chunk_tokens convention)."""
    from hemera_indexer_spark.operators.packing import fim_transform

    docs = _t(spark, sf, "documents").where(F.col("doc_id") < 200)
    clean = F.regexp_replace(F.col("text"), r"^\s+|\s+$", "")
    toks = F.transform(F.split(clean, r"\s+"), lambda w: F.length(w))
    return fim_transform(docs.select("doc_id", toks.alias("tokens")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the per-round driver CORRECTNESS check covers only
    # the FIRST 50 entries in insertion order. Rounds 1-4 attested the block
    # starting at "pricing_summary" (all green in CORRECTNESS_r04.json);
    # round 5 rotates never-driver-checked queries to the front so the union
    # of per-round driver artifacts covers as much of the registry as the
    # 50-row window allows. With 114 entries and 103 attested across rounds
    # 1-4, the round-5 window holds 50 never-checked entries (moving_avg /
    # rollup_agg / quantile_stats were already attested in round 3 and moved
    # to the attested block below, making room for semantic_dedup /
    # pq_index_topk / leakage_split). Union after round 5 = 103/114; the
    # eleven past slot 50 (video_frame_stats, quantile_sketch, bm25_topk,
    # pagerank_top, pq_adc_topk, dsir_topk, quality_classifier,
    # span_corruption, fim_transform, cdc_mirror, grouped_topk) would
    # rotate to the front
    # in any future window. The local oracle gate
    # (tests/test_queries_oracle.py) runs ALL 114 entries regardless, and
    # every one is green there.
    return {
        "schema_rename": q_schema_rename,
        "schema_defaults": q_schema_defaults,
        "cdc_changefeed": q_cdc_changefeed,
        "zonemap_range_scan": q_zonemap_range_scan,
        "zorder_box_scan": q_zorder_box_scan,
        "image_decode_stats": q_image_decode_stats,
        "ivf_index_topk": q_ivf_index_topk,
        "bloom_decontaminate": q_bloom_decontaminate,
        "secidx_lookup": q_secidx_lookup,
        "semantic_dedup": q_semantic_dedup,
        "pq_index_topk": q_pq_index_topk,
        "leakage_split": q_leakage_split,
        "tfidf_topk": q_tfidf_topk,
        "mixture_sample": q_mixture_sample,
        "temperature_mixture": q_temperature_mixture,
        "vocab_histogram": q_vocab_histogram,
        "token_budget": q_token_budget,
        "repetition_ratio": q_repetition_ratio,
        "gopher_filter": q_gopher_filter,
        "length_band": q_length_band,
        "source_lang_matrix": q_source_lang_matrix,
        "dedup_keep_best": q_dedup_keep_best,
        "unigram_logprob": q_unigram_logprob,
        "chunk_dedup": q_chunk_dedup,
        "chunk_dedup_clean": q_chunk_dedup_clean,
        "bigram_pmi": q_bigram_pmi,
        "vocab_coverage": q_vocab_coverage,
        "source_kl": q_source_kl,
        "zipf_slope": q_zipf_slope,
        "source_sample": q_source_sample,
        "bigram_logprob": q_bigram_logprob,
        "source_overlap": q_source_overlap,
        "dim_stats": q_dim_stats,
        "quantize_embeddings": q_quantize_embeddings,
        "jl_projection": q_jl_projection,
        "feature_hashing": q_feature_hashing,
        "kmeans_clusters": q_kmeans_clusters,
        "chunk_tokens": q_chunk_tokens,
        "funnel": q_funnel,
        "retention_cohorts": q_retention_cohorts,
        "event_transitions": q_event_transitions,
        "label_centroids": q_label_centroids,
        "ivf_topk": q_ivf_topk,
        "doc_entropy": q_doc_entropy,
        "hapax_ratio": q_hapax_ratio,
        "source_exclusivity": q_source_exclusivity,
        "dist_drift": q_dist_drift,
        "dedup_containment": q_dedup_containment,
        "winnow_dedup": q_winnow_dedup,
        "heavy_hitters": q_heavy_hitters,
        "shard_ntile": q_shard_ntile,
        "bpe_pairs": q_bpe_pairs,
        "audio_decode_stats": q_audio_decode_stats,
        "video_frame_stats": q_video_frame_stats,
        "quantile_sketch": q_quantile_sketch,
        "bm25_topk": q_bm25_topk,
        "pagerank_top": q_pagerank,
        "pq_adc_topk": q_pq_adc_topk,
        "dsir_topk": q_dsir_topk,
        "quality_classifier": q_quality_classifier,
        "span_corruption": q_span_corruption,
        "fim_transform": q_fim_transform,
        "cdc_mirror": q_cdc_mirror,
        "grouped_topk": q_grouped_topk,
        # --- driver-attested in rounds 1-4 (CORRECTNESS_r01..r04) ---
        "moving_avg": q_moving_avg,
        "rollup_agg": q_rollup_agg,
        "quantile_stats": q_quantile_stats,
        "pricing_summary": q_pricing_summary,
        "filter_pushdown": q_filter_pushdown,
        "specification_filter": q_specification_filter,
        "case_routing": q_case_routing,
        "join_enrich": q_join_enrich,
        "broadcast_dim_join": q_broadcast_dim_join,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "accumulator_merge": q_accumulator_merge,
        "lww_current_state": q_lww_current_state,
        "patch_fold": q_patch_fold,
        "lww_window": q_lww_window,
        "lww_salted": q_lww_salted,
        "daily_aggregates": q_daily_aggregates,
        "count_distinct": q_count_distinct,
        "hourly_bucket": q_hourly_bucket,
        "json_extract": q_json_extract,
        "window_latest_per_supp": q_window_latest_per_supp,
        "lag_gap_sessions": q_lag_gap_sessions,
        "topk_orders": q_topk_orders,
        "union_dedup": q_union_dedup,
        "hex_codec": q_hex_codec,
        "month_bucketing": q_month_bucketing,
        "fww_first_state": q_fww_first_state,
        "dag_daily_routes": q_dag_daily_routes,
        "word_freq_explode": q_word_freq_explode,
        "prefix_match": q_prefix_match,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_incremental": q_dedup_incremental,
        "pii_scrub": q_pii_scrub,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters_cc": q_dedup_clusters_cc,
        "dedup_embedding": q_dedup_embedding,
        "cosine_topk": q_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "text_stats": q_text_stats,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_features": q_multimodal_features,
        "decode_dispatch": q_decode_dispatch,
        "trace_flatten": q_trace_flatten,
        "keyset_page": q_keyset_page,
        "duplicated_spans": q_duplicated_spans,
        "dataset_split": q_dataset_split,
        "decontaminate": q_decontaminate,
        "pack_sequences": q_pack_sequences,
        "asof_enrich": q_asof_enrich,
        "scd2_intervals": q_scd2_intervals,
        "range_window_join": q_range_window_join,
    }


def _cos_sql(a: str, b: str) -> str:
    """DuckDB cosine-similarity expression between two list columns — the
    same sequential double fold the Spark ``dot``/``norm`` helpers compute
    (identical inputs + identical fold order = bit-identical doubles)."""
    return f"""(
        list_reduce(list_transform(generate_series(1, len({a})),
                    i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE),
                    (acc, x) -> acc + x)
        / (sqrt(list_reduce(list_transform(generate_series(1, len({a})),
                    i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE),
                    (acc, x) -> acc + x))
         * sqrt(list_reduce(list_transform(generate_series(1, len({b})),
                    i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE),
                    (acc, x) -> acc + x))))"""


# --------------------------------------------------------------------------
# oracle SQL (DuckDB) — same table names, same aliases, same rounding
# --------------------------------------------------------------------------
_SHINGLES_CTE = """
shingles AS (
    SELECT DISTINCT doc_id, shingle
    FROM (
        SELECT doc_id,
               unnest([w[i] || '_' || w[i+1] for i in range(1, len(w))]) AS shingle
        FROM (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
            FROM documents
        )
    )
    WHERE shingle <> ''
)
"""


# jaccard pairs with the max_df hot-shingle cut (mirrors
# operators/dedup.py::jaccard_pairs with max_df = max(5, 1% of docs));
# expects `shingles` from _SHINGLES_CTE in scope, yields `jscored`.
_JACCARD_SCORED_CTES = """
            hot AS (
                SELECT shingle FROM shingles GROUP BY shingle
                HAVING COUNT(*) > (SELECT GREATEST(5, COUNT(*) // 100) FROM documents)
            ),
            sh AS (
                SELECT s.doc_id, s.shingle FROM shingles s
                ANTI JOIN hot h USING (shingle)
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            jscored AS (
                SELECT doc_a, doc_b,
                       ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
                FROM common
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.6
            )
"""


def _jl_oracle() -> str:
    """DuckDB side of ``jl_projection``: the SAME Python-generated ±1
    sign matrix inlined as a VALUES literal (512 rows for 64→8) — both
    engines share one matrix by construction, no cross-engine hash
    needed."""
    from hemera_indexer_spark.operators.embeddings import jl_signs

    signs = jl_signs(64, 8)
    rows = ",".join(
        f"({i},{j},{signs[j][i]})" for j in range(8) for i in range(64)
    )
    return f"""
        WITH ex AS (
            SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(CAST(unnest(embedding) AS DOUBLE)
                        AS DECIMAL(18,6)) AS v
            FROM embeddings
        ),
        s(i, j, sg) AS (VALUES {rows})
        SELECT ex.vec_id, s.j AS j,
               CAST(SUM(CASE WHEN s.sg > 0 THEN ex.v ELSE -ex.v END)
                    AS DECIMAL(18,6)) AS val
        FROM ex JOIN s ON s.i = ex.i
        GROUP BY ex.vec_id, s.j
    """


def _kmeans_ctes(k: int = 4, iters: int = 2) -> tuple[str, str]:
    """The Lloyd chain unrolled as CTEs — c0 (first-k init) → a0
    (exact-decimal argmin) → c1 (6dp-rounded means) → a1 → ... — the same
    quantized-centroid definition the Spark operator implements,
    recomputed from scratch. Returns (cte_body, final_assignment_name) so
    both the plain k-means oracle and consumers that build ON the
    assignment (semantic_dedup) share one definition."""
    assign = """
        a{n} AS (
            SELECT ex.vec_id, c.cid,
                   SUM(CAST(ex.v - c.c AS DECIMAL(15,6))
                       * CAST(ex.v - c.c AS DECIMAL(15,6))) AS d2
            FROM ex JOIN c{n} c ON c.i = ex.i
            GROUP BY ex.vec_id, c.cid
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY ex.vec_id ORDER BY d2, c.cid) = 1
        )"""
    update = """
        c{m} AS (
            SELECT a.cid, ex.i,
                   CAST(ROUND(CAST(SUM(ex.v) AS DOUBLE) / COUNT(*), 6)
                        AS DECIMAL(18,6)) AS c
            FROM a{n} a JOIN ex ON ex.vec_id = a.vec_id
            GROUP BY a.cid, ex.i
        )"""
    ctes = [
        """
        ex AS (
            SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(CAST(unnest(embedding) AS DOUBLE)
                        AS DECIMAL(18,6)) AS v
            FROM embeddings
        )""",
        f"""
        c0 AS (
            SELECT DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS cid, i, v AS c
            FROM ex
            WHERE vec_id IN (
                SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
        )""",
    ]
    for n in range(iters):
        ctes.append(assign.format(n=n))
        ctes.append(update.format(n=n, m=n + 1))
    ctes.append(assign.format(n=iters))
    return ",".join(ctes), f"a{iters}"


def _pq_oracle(
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    dim: int = 64,
    qids: tuple = (0, 1, 2),
    k: int = 5,
) -> str:
    """DuckDB side of ``pq_adc_topk``: per-subspace Lloyd unrolled as
    CTEs (the ``_kmeans_ctes`` chain with the subspace id ``s`` added to
    every key), then ADC — per-query (s, cid) distance tables joined to
    the final assignment, summed per (qid, vec_id). Same 6dp-element /
    exact-decimal-distance / 6dp-centroid discipline, ties (d2, cid) in
    assignment and (d2, vec_id) in the top-k."""
    dsub = dim // m
    assign = """
        a{n} AS (
            SELECT ex.vec_id, ex.s, c.cid,
                   SUM(CAST(ex.v - c.c AS DECIMAL(15,6))
                       * CAST(ex.v - c.c AS DECIMAL(15,6))) AS d2
            FROM ex JOIN c{n} c ON c.s = ex.s AND c.i = ex.i
            GROUP BY ex.vec_id, ex.s, c.cid
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY ex.vec_id, ex.s ORDER BY d2, c.cid) = 1
        )"""
    update = """
        c{m2} AS (
            SELECT a.s, a.cid, ex.i,
                   CAST(ROUND(CAST(SUM(ex.v) AS DOUBLE) / COUNT(*), 6)
                        AS DECIMAL(18,6)) AS c
            FROM a{n} a JOIN ex ON ex.vec_id = a.vec_id AND ex.s = a.s
            GROUP BY a.s, a.cid, ex.i
        )"""
    ctes = [
        f"""
        ex AS (
            SELECT vec_id,
                   (generate_subscripts(embedding, 1) - 1) // {dsub} AS s,
                   (generate_subscripts(embedding, 1) - 1) % {dsub} AS i,
                   CAST(CAST(unnest(embedding) AS DOUBLE)
                        AS DECIMAL(18,6)) AS v
            FROM embeddings
        )""",
        f"""
        c0 AS (
            SELECT DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS cid, s, i,
                   v AS c
            FROM ex
            WHERE vec_id IN (
                SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {ks})
        )""",
    ]
    for n in range(iters):
        ctes.append(assign.format(n=n))
        ctes.append(update.format(n=n, m2=n + 1))
    ctes.append(assign.format(n=iters))
    qlist = ",".join(str(q) for q in qids)
    return f"""
        WITH {",".join(ctes)},
        qd AS (
            SELECT q.vec_id AS qid, c.s, c.cid,
                   SUM(CAST(q.v - c.c AS DECIMAL(15,6))
                       * CAST(q.v - c.c AS DECIMAL(15,6))) AS d2
            FROM ex q JOIN c{iters} c ON c.s = q.s AND c.i = q.i
            WHERE q.vec_id IN ({qlist})
            GROUP BY q.vec_id, c.s, c.cid
        ),
        scored AS (
            SELECT qd.qid, a.vec_id, SUM(qd.d2) AS d2
            FROM a{iters} a JOIN qd ON qd.s = a.s AND qd.cid = a.cid
            GROUP BY qd.qid, a.vec_id
        )
        SELECT qid, vec_id,
               CAST(ROUND(CAST(d2 AS DOUBLE), 6) AS DECIMAL(18,6))
                   AS adc_d2
        FROM scored
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY d2, vec_id) <= {k}
    """


def _dsir_oracle(
    n_features: int = 64, k: int = 20, target_src: str = "src0"
) -> str:
    """DuckDB side of ``dsir_topk``: the same hashed uni+bigram streams
    (feature_hashing's md5-prefix bucket, bigram_pmi's zip), Laplace-
    smoothed bucket models, 9dp-decimal log-ratio table over ALL buckets,
    exact-decimal per-doc multiply-sum, (weight desc, doc_id) head."""
    B = n_features
    bucket = """(((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1)) % {B})"""

    def grams(pred: str, with_id: bool) -> str:
        idc = "d.doc_id, " if with_id else ""
        return f"""(
            SELECT {idc}u.w AS gram
            FROM (SELECT doc_id,
                         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                  FROM documents WHERE {pred}) d, UNNEST(d.ws) AS u(w)
            WHERE u.w <> ''
            UNION ALL
            SELECT {idc}ws[t.i] || ' ' || ws[t.i+1] AS gram
            FROM (SELECT doc_id,
                         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                  FROM documents WHERE {pred}) d, UNNEST(range(1, len(ws))) AS t(i)
            WHERE len(ws) >= 2 AND ws[t.i] <> '' AND ws[t.i+1] <> ''
        )"""

    b = bucket.format(B=B)
    return f"""
        WITH tstream AS (
            SELECT {b} AS b
            FROM (SELECT md5(gram) AS m
                  FROM {grams(f"source = '{target_src}'", False)})
        ),
        rstream AS (
            SELECT doc_id, {b} AS b
            FROM (SELECT doc_id, md5(gram) AS m
                  FROM {grams(f"source <> '{target_src}'", True)})
        ),
        tb AS (SELECT b, COUNT(*) AS c FROM tstream GROUP BY b),
        rb AS (SELECT b, COUNT(*) AS c FROM rstream GROUP BY b),
        tot AS (SELECT (SELECT COALESCE(SUM(c), 0) FROM tb) AS tt,
                       (SELECT COALESCE(SUM(c), 0) FROM rb) AS tr),
        lr AS (
            SELECT gs.b,
                   CAST(ROUND(
                       ln((COALESCE(tb.c, 0) + 1)
                          / CAST(tot.tt + {B} AS DOUBLE))
                     - ln((COALESCE(rb.c, 0) + 1)
                          / CAST(tot.tr + {B} AS DOUBLE)), 9)
                       AS DECIMAL(19,9)) AS lrv
            FROM (SELECT UNNEST(range(0, {B})) AS b) gs
            LEFT JOIN tb ON tb.b = gs.b
            LEFT JOIN rb ON rb.b = gs.b
            CROSS JOIN tot
        ),
        docb AS (
            SELECT doc_id, b, COUNT(*) AS c FROM rstream GROUP BY doc_id, b
        ),
        wts AS (
            SELECT doc_id,
                   CAST(SUM(CAST(c AS DECIMAL(9,0)) * lr.lrv)
                        AS DECIMAL(28,9)) AS log_weight
            FROM docb JOIN lr USING (b) GROUP BY doc_id
        )
        SELECT doc_id, CAST(rn AS INT) AS sel_rank, log_weight FROM (
            SELECT doc_id, log_weight, ROW_NUMBER() OVER (
                ORDER BY log_weight DESC, doc_id) AS rn
            FROM wts
        ) WHERE rn <= {k}
    """


def _classifier_oracle(
    n_features: int = 32, iters: int = 2, lr: str = "0.05"
) -> str:
    """DuckDB side of ``quality_classifier``: the full hard-sigmoid GD
    loop unrolled as CTEs — presence buckets (feature_hashing's md5
    rule), per-round z/residual/gradient in exact decimal, 9dp
    ROUND-half-away weight updates (bias = bucket ``n_features``), then
    the final scoring pass. Bit-identical to the Spark/Python-Decimal
    chain because every number is a decimal with a defined scale."""
    B = n_features
    bucket = f"""(((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1)) % {B})"""
    sigma = (
        "LEAST(CAST(1 AS DECIMAL(30,11)), GREATEST("
        "CAST(0 AS DECIMAL(30,11)), "
        "CAST((z + 2) * 0.25 AS DECIMAL(30,11))))"
    )
    ctes = [
        """
        corpus AS (
            SELECT doc_id, text, 1 AS y FROM documents WHERE doc_id < 300
            UNION ALL
            SELECT p_partkey + 100000 AS doc_id, p_name AS text, 0 AS y
            FROM part WHERE p_partkey < 300
        )""",
        f"""
        db AS (
            SELECT DISTINCT doc_id, {bucket} AS b
            FROM (
                SELECT d.doc_id, md5(u.w) AS m
                FROM (SELECT doc_id,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                      FROM corpus) d, UNNEST(d.ws) AS u(w)
                WHERE u.w <> ''
            )
        )""",
        """
        lbl AS (SELECT doc_id, CAST(y AS DECIMAL(1,0)) AS y FROM corpus)""",
        f"""
        w0 AS (
            SELECT UNNEST(range(0, {B + 1})) AS b,
                   CAST(0 AS DECIMAL(20,9)) AS w
        )""",
    ]
    z_t = """
        z{n} AS (
            SELECT lbl.doc_id, lbl.y,
                   CAST(COALESCE(SUM(w.w), 0)
                        + (SELECT w FROM w{n} WHERE b = {B})
                        AS DECIMAL(28,9)) AS z
            FROM lbl
            LEFT JOIN db ON db.doc_id = lbl.doc_id
            LEFT JOIN w{n} w ON w.b = db.b
            GROUP BY lbl.doc_id, lbl.y
        )"""
    r_t = """
        r{n} AS (
            SELECT doc_id, CAST(y AS DECIMAL(30,11)) - {sigma} AS r
            FROM z{n}
        )"""
    w_t = """
        w{n1} AS (
            SELECT wb.b,
                   CAST(ROUND(wb.w + {lr} * COALESCE(g.g, 0), 9)
                        AS DECIMAL(20,9)) AS w
            FROM w{n} wb LEFT JOIN (
                SELECT b, CAST(SUM(r) AS DECIMAL(30,11)) AS g
                FROM (
                    SELECT db.b AS b, r.r FROM db JOIN r{n} r USING (doc_id)
                    UNION ALL
                    SELECT {B} AS b, r FROM r{n}
                )
                GROUP BY b
            ) g ON g.b = wb.b
        )"""
    for n in range(iters):
        ctes.append(z_t.format(n=n, B=B))
        ctes.append(r_t.format(n=n, sigma=sigma))
        ctes.append(w_t.format(n=n, n1=n + 1, B=B, lr=lr))
    ctes.append(z_t.format(n=iters, B=B))
    return f"""
        WITH {",".join(ctes)}
        SELECT doc_id,
               CAST(ROUND(CAST({sigma} AS DOUBLE), 6) AS DECIMAL(18,6))
                   AS score,
               {sigma} >= 0.5 AS keep
        FROM z{iters}
    """


def _kmeans_oracle(k: int = 4, iters: int = 2) -> str:
    body, final = _kmeans_ctes(k, iters)
    return f"WITH {body} SELECT vec_id, cid AS cluster FROM {final}"


def _semantic_dedup_oracle(
    k: int = 4, iters: int = 2, threshold: float = 0.2
) -> str:
    """DuckDB side of ``semantic_dedup``: the shared k-means chain, then
    within-cluster pairs (a.vec_id < b.vec_id) filtered by the same
    4dp-rounded cosine, keep-first drop rule."""
    body, final = _kmeans_ctes(k, iters)
    cos = _cos_sql("pa.embedding", "pb.embedding")
    return f"""
        WITH {body},
        asg AS (SELECT vec_id, cid AS cluster FROM {final}),
        ev AS (
            SELECT e.vec_id, e.embedding, a.cluster
            FROM embeddings e JOIN asg a USING (vec_id)
        ),
        drops AS (
            SELECT DISTINCT pb.vec_id
            FROM ev pa JOIN ev pb
              ON pa.cluster = pb.cluster AND pa.vec_id < pb.vec_id
            WHERE round({cos}, 4) >= {threshold}
        )
        SELECT a.vec_id, a.cluster, d.vec_id IS NULL AS kept
        FROM asg a LEFT JOIN drops d ON a.vec_id = d.vec_id
    """


def _bm25_oracle(terms=("hash", "join", "vector"), k1=1.2, b=0.75):
    """DuckDB side of ``bm25_topk``: identical formula with every float
    constant spelled as the repr of the Python-computed double (k1+1,
    1-b), so both engines run the same IEEE ops; per-term contributions
    round to 6dp decimal before the sum, absorbing last-ulp ln()
    differences."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH w AS (
            SELECT d.doc_id, u.w
            FROM (SELECT doc_id, string_split(trim(regexp_replace(
                      lower(text), '\\s+', ' ', 'g')), ' ') AS arr
                  FROM documents) d, UNNEST(d.arr) AS u(w)
            WHERE u.w <> ''
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id),
        st AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                      (SELECT SUM(dl) FROM dl) AS sum_dl),
        tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w
               WHERE w IN ({tl}) GROUP BY doc_id, w),
        dfq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY w),
        idf AS (SELECT w, ln((st.n_docs - df + 0.5) / (df + 0.5) + 1.0)
                           AS idf
                FROM dfq, st)
        SELECT t.doc_id,
               COUNT(*) AS n_terms_hit,
               CAST(SUM(CAST(ROUND(
                   i.idf * (t.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                   / (t.tf + CAST({k1!r} AS DOUBLE)
                      * (CAST({1.0 - b!r} AS DOUBLE)
                         + CAST({b!r} AS DOUBLE)
                           * (d.dl / (CAST(st.sum_dl AS DOUBLE)
                                      / st.n_docs)))),
                   6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM tf t
        JOIN dl d USING (doc_id)
        JOIN idf i USING (w), st
        GROUP BY t.doc_id
        ORDER BY bm25 DESC, t.doc_id ASC
        LIMIT 20
    """


def _pagerank_oracle(iters=2, damping=0.85, top_k=50):
    """DuckDB side of ``pagerank_top``: the power iteration unrolled as
    CTEs with the identical quantization law (6dp ranks per round,
    9dp-decimal per-edge contributions) and every float constant spelled
    as the repr of the Python-computed double."""
    d = repr(damping)
    omd = repr(1.0 - damping)
    ctes = [
        """
        e AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                            's' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        )""",
        "nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e)",
        "st AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "r0 AS (SELECT v, ROUND(CAST(1.0 AS DOUBLE)/st.n, 6) AS r "
        "FROM nodes CROSS JOIN st)",
    ]
    step = """
        r{m} AS (
            SELECT nn.v,
                   ROUND(CAST({omd} AS DOUBLE)/st.n
                         + CAST({d} AS DOUBLE)
                           * CAST(COALESCE(c.s, 0) AS DOUBLE), 6) AS r
            FROM nodes nn CROSS JOIN st
            LEFT JOIN (
                SELECT e.dst AS v,
                       SUM(CAST(ROUND(p.r / deg.outdeg, 9)
                                AS DECIMAL(18,9))) AS s
                FROM e
                JOIN r{n} p ON e.src = p.v
                JOIN deg ON deg.src = e.src
                GROUP BY e.dst
            ) c ON c.v = nn.v
        )"""
    for n in range(iters):
        ctes.append(step.format(m=n + 1, n=n, d=d, omd=omd))
    return (
        "WITH " + ",".join(ctes)
        + f" SELECT v, r AS rank FROM r{iters} "
        f"ORDER BY rank DESC, v ASC LIMIT {top_k}"
    )


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_literal()
    # equality law (tested): the persisted IVFIndex path answers exactly
    # what the inline ivf_topk answers on a synced index — one shared
    # quantizer/probe code path, so ONE oracle statement serves both.
    d["ivf_index_topk"] = d["ivf_topk"]
    # same law for the persisted PQ path vs the inline pq_adc_topk
    # (fresh-index equality, shared train/encode/ADC code path)
    d["pq_index_topk"] = d["pq_adc_topk"]
    return d


def _oracle_sql_literal() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                   COUNT(*) AS count_order,
                   COUNT(DISTINCT l_orderkey) AS n_orders
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "filter_pushdown": """
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
            FROM lineitem
            WHERE l_shipdate >= DATE '1995-01-01' AND l_quantity > 45
        """,
        "specification_filter": """
            SELECT event_type, COUNT(*) AS n
            FROM events
            WHERE (event_type = 'click' OR event_type = 'view')
              AND NOT (value < 10)
              AND user_id BETWEEN 0 AND 119
            GROUP BY event_type
        """,
        "case_routing": """
            SELECT CASE WHEN event_type IN ('click','view') THEN 'engagement'
                        WHEN event_type = 'purchase' THEN 'revenue'
                        ELSE 'ops' END AS route,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1
        """,
        "join_enrich": """
            SELECT c.c_mktsegment, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "broadcast_dim_join": """
            SELECT p.p_brand,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l.l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
        """,
        "anti_join": """
            SELECT c_nationkey, COUNT(*) AS n_inactive
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_nationkey
        """,
        "semi_join": """
            SELECT o_orderpriority, COUNT(*) AS n
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09)
            GROUP BY o_orderpriority
        """,
        "accumulator_merge": """
            WITH base AS (SELECT *, (day(ts) % 2) AS day_odd FROM events),
            t AS (SELECT user_id,
                         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                         COUNT(*) AS n_events
                  FROM base WHERE day_odd = 0 GROUP BY user_id),
            p AS (SELECT user_id,
                         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                         COUNT(*) AS n_events
                  FROM base WHERE day_odd = 1 GROUP BY user_id)
            SELECT COALESCE(t.user_id, p.user_id) AS user_id,
                   ROUND(COALESCE(t.sum_value, 0) + COALESCE(p.sum_value, 0), 4) AS sum_value,
                   CAST(COALESCE(t.n_events, 0) + COALESCE(p.n_events, 0) AS BIGINT) AS n_events
            FROM t FULL OUTER JOIN p ON t.user_id = p.user_id
        """,
        "lww_current_state": """
            SELECT user_id, event_id AS last_event_id,
                   event_type AS last_event_type, value AS last_value
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "patch_fold": """
            WITH pstream AS (
                SELECT user_id % 100 AS k,
                       event_id AS seq,
                       CASE WHEN event_id % 11 = 0 THEN 'delete'
                            ELSE 'patch' END AS op,
                       CASE WHEN event_id % 3 = 0 THEN value END AS val_a,
                       CASE WHEN event_id % 5 <= 1 THEN event_type END AS val_b,
                       CASE WHEN event_id % 7 = 2 THEN event_id * 10 END AS val_c
                FROM events
            ),
            live AS (
                SELECT * FROM (
                    SELECT *, MAX(CASE WHEN op = 'delete' THEN seq END)
                                  OVER (PARTITION BY k) AS last_del
                    FROM pstream)
                WHERE op <> 'delete'
                  AND (last_del IS NULL OR seq > last_del)
            )
            SELECT k,
                   arg_max(val_a, seq) FILTER (WHERE val_a IS NOT NULL) AS val_a,
                   arg_max(val_b, seq) FILTER (WHERE val_b IS NOT NULL) AS val_b,
                   arg_max(val_c, seq) FILTER (WHERE val_c IS NOT NULL) AS val_c,
                   MAX(seq) AS seq
            FROM live GROUP BY k
        """,
        "lww_window": """
            SELECT user_id, event_id AS last_event_id,
                   event_type AS last_event_type, value AS last_value
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "lww_salted": """
            SELECT user_id, event_id AS last_event_id,
                   event_type AS last_event_type, value AS last_value
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "daily_aggregates": """
            SELECT user_id, CAST(ts AS DATE) AS day,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT event_type) AS n_event_types,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                   CAST(SUM(CASE WHEN value > 50 THEN CAST(value AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS sum_large_value
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        """,
        "count_distinct": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "hourly_bucket": """
            SELECT date_trunc('hour', ts) AS hour,
                   MIN(event_id) AS min_event_id, COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "json_extract": """
            SELECT event_type,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
            FROM events GROUP BY event_type
        """,
        "window_latest_per_supp": """
            SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY l_suppkey
                     ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
                  FROM lineitem)
            WHERE rn = 1
        """,
        "lag_gap_sessions": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN prev_ts IS NULL
                                 OR (epoch(ts) - epoch(prev_ts)) > 3600
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC) AS prev_ts
                  FROM events)
            GROUP BY user_id
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "union_dedup": """
            SELECT event_type, COUNT(*) AS n FROM (
                SELECT DISTINCT ON (event_id) * FROM (
                    SELECT * FROM events WHERE value >= 100
                    UNION ALL
                    SELECT * FROM events WHERE value >= 50
                )
            ) GROUP BY event_type
        """,
        "hex_codec": """
            SELECT p_partkey, lower(to_hex(p_partkey)) AS key_hex,
                   md5(p_name) AS name_md5
            FROM part
        """,
        "month_bucketing": """
            SELECT date_trunc('month', o_orderdate) AS month,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
            FROM orders GROUP BY 1
        """,
        "fww_first_state": """
            SELECT user_id, event_id AS first_event_id,
                   event_type AS first_event_type, value AS first_value
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "dag_daily_routes": """
            SELECT CAST(ts AS DATE) AS day,
                   CASE WHEN event_type IN ('click','view') THEN 'engagement'
                        WHEN event_type = 'purchase' THEN 'revenue'
                        ELSE 'ops' END AS route,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "word_freq_explode": """
            SELECT word, COUNT(*) AS n FROM (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
                FROM documents
            ) WHERE word <> '' GROUP BY word
        """,
        "prefix_match": """
            SELECT event_type, COUNT(*) AS n
            FROM events
            WHERE props LIKE '{"k": 1%'
            GROUP BY event_type
        """,
        "dedup_exact": """
            SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
                   COUNT(*) AS cluster_size,
                   MIN(doc_id) AS keep_doc_id
            FROM documents
            GROUP BY 1 HAVING COUNT(*) >= 2
        """,
        "dedup_jaccard": f"""
            WITH {_SHINGLES_CTE},
            {_JACCARD_SCORED_CTES}
            SELECT doc_a, doc_b, jaccard FROM jscored
        """,
        # pairs -> connected components -> keep/drop: transitive closure by
        # recursive CTE mirrors the engine's min-label propagation loop.
        "dedup_clusters_cc": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            {_JACCARD_SCORED_CTES},
            cedges AS (
                SELECT doc_a AS a, doc_b AS b FROM jscored
                UNION
                SELECT doc_b AS a, doc_a AS b FROM jscored
            ),
            reach(a, b) AS (
                SELECT a, b FROM cedges
                UNION
                SELECT r.a, e.b FROM reach r JOIN cedges e ON r.b = e.a
            )
            SELECT node AS doc_id, cluster_id, node = cluster_id AS keep FROM (
                SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id
                FROM reach GROUP BY a
            )
        """,
        "dedup_embedding": """
            WITH anchors AS (
                SELECT vec_id AS aid, embedding AS av,
                       row_number() OVER (ORDER BY vec_id ASC) - 1 AS bit
                FROM (SELECT * FROM embeddings ORDER BY vec_id ASC LIMIT 4)
            ),
            dots AS (
                SELECT e.vec_id, a.bit,
                       list_reduce(list_transform(generate_series(1, len(e.embedding)),
                                   i -> e.embedding[i]::DOUBLE * a.av[i]::DOUBLE),
                                   (acc, x) -> acc + x) AS d
                FROM embeddings e CROSS JOIN anchors a
            ),
            buckets AS (
                SELECT vec_id,
                       CAST(SUM(CASE WHEN d >= 0 THEN power(2.0, bit) ELSE 0 END) AS INT) AS bucket
                FROM dots GROUP BY vec_id
            ),
            emb AS (
                SELECT e.vec_id, e.embedding, b.bucket
                FROM embeddings e JOIN buckets b USING (vec_id)
            )
            SELECT vec_a, vec_b, cos_sim FROM (
                SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                       ROUND(
                         list_reduce(list_transform(generate_series(1, len(a.embedding)),
                                     i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE),
                                     (acc, x) -> acc + x)
                         / (sqrt(list_reduce(list_transform(generate_series(1, len(a.embedding)),
                                     i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE),
                                     (acc, x) -> acc + x))
                          * sqrt(list_reduce(list_transform(generate_series(1, len(b.embedding)),
                                     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE),
                                     (acc, x) -> acc + x)))
                       , 4) AS cos_sim
                FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            ) WHERE cos_sim >= 0.2
        """,
        "dedup_minhash_lsh": f"""
            WITH {_SHINGLES_CTE},
            seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
            sig AS (
                -- chunked minhash family (operators/dedup.py::_minhash_aggs):
                -- seed s = 32-bit hex chunk s%4 of md5((s//4) || '|' || shingle)
                SELECT doc_id, seed,
                       MIN(substr(md5((seed // 4) || '|' || shingle),
                                  (seed % 4) * 8 + 1, 8)) AS minhash
                FROM shingles CROSS JOIN seeds
                GROUP BY doc_id, seed
            ),
            bands AS (
                SELECT doc_id, CAST(seed // 4 AS INT) AS band,
                       string_agg(minhash, ',' ORDER BY seed) AS bucket
                FROM sig GROUP BY doc_id, CAST(seed // 4 AS INT)
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                WHERE a.doc_id < b.doc_id
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
            common AS (
                SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
                FROM cand c
                JOIN shingles sa ON sa.doc_id = c.doc_a
                JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
                GROUP BY c.doc_a, c.doc_b
            )
            SELECT doc_a, doc_b,
                   ROUND(n_common / (za.n_sh + zb.n_sh - n_common), 6) AS jaccard
            FROM common
            JOIN sizes za ON za.doc_id = doc_a
            JOIN sizes zb ON zb.doc_id = doc_b
            WHERE n_common / (za.n_sh + zb.n_sh - n_common) >= 0.5
        """,
        "dedup_incremental": f"""
            WITH {_SHINGLES_CTE},
            hsplit AS (
                SELECT doc_id,
                       (((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1)) % 100
                       ) AS bucket100
                FROM (SELECT doc_id, md5('split|' || doc_id) AS m FROM documents)
            ),
            newdocs AS (SELECT doc_id FROM hsplit WHERE bucket100 >= 90),
            basedocs AS (SELECT doc_id FROM hsplit WHERE bucket100 < 90),
            seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
            sig AS (
                SELECT doc_id, seed,
                       MIN(substr(md5((seed // 4) || '|' || shingle),
                                  (seed % 4) * 8 + 1, 8)) AS minhash
                FROM shingles CROSS JOIN seeds
                GROUP BY doc_id, seed
            ),
            bands AS (
                SELECT doc_id, CAST(seed // 4 AS INT) AS band,
                       string_agg(minhash, ',' ORDER BY seed) AS bucket
                FROM sig GROUP BY doc_id, CAST(seed // 4 AS INT)
            ),
            -- asymmetric candidate join: new-side bands vs base-side bands
            -- only (never base x base) — the incremental-check semantics
            cand AS (
                SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS base_id
                FROM bands a
                JOIN newdocs n ON n.doc_id = a.doc_id
                JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                JOIN basedocs s ON s.doc_id = b.doc_id
                WHERE a.doc_id <> b.doc_id
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
            common AS (
                SELECT c.new_id, c.base_id, COUNT(*) AS n_common
                FROM cand c
                JOIN shingles sa ON sa.doc_id = c.new_id
                JOIN shingles sb ON sb.doc_id = c.base_id AND sb.shingle = sa.shingle
                GROUP BY c.new_id, c.base_id
            )
            SELECT new_id, base_id,
                   ROUND(n_common / (za.n_sh + zb.n_sh - n_common), 6) AS jaccard
            FROM common
            JOIN sizes za ON za.doc_id = new_id
            JOIN sizes zb ON zb.doc_id = base_id
            WHERE n_common / (za.n_sh + zb.n_sh - n_common) >= 0.5
        """,
        "pii_scrub": r"""
            WITH t AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id
                            || '@mail.example.com from 10.0.'
                            || (doc_id % 256) || '.7 call +1 415 555 01'
                            || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                       AS text
                FROM documents
            )
            SELECT doc_id,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                       '\b\+?[0-9][0-9()\- ]{7,14}[0-9]\b', '<PHONE>', 'g')) AS scrub_md5,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                   len(regexp_extract_all(text,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\b\+?[0-9][0-9()\- ]{7,14}[0-9]\b')) AS n_phone
            FROM t
        """,
        "dedup_simhash": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
                FROM documents
            ),
            bits AS (
                SELECT doc_id, md5(word) AS h FROM tok WHERE word <> ''
            ),
            sums AS (
                SELECT doc_id,
                       {sums}
                FROM bits GROUP BY doc_id
            )
            SELECT doc_id,
                   CAST({sim} AS INT) AS simhash
            FROM sums
        """.format(
            sums=",\n                       ".join(
                f"SUM(((CAST(floor((strpos('0123456789abcdef', substr(h, {nib + 1}, 1)) - 1) / {2 ** b}) AS INT) % 2) * 2 - 1)) AS s_{nib * 4 + b}"
                for nib in range(4)
                for b in range(4)
            ),
            sim=" + ".join(
                f"(CASE WHEN s_{i} > 0 THEN {2 ** i} ELSE 0 END)" for i in range(16)
            ),
        ),
        "cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id IN (0,1,2,3,4)
            ),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       ROUND(
                         list_reduce(list_transform(generate_series(1, len(e.embedding)),
                                     i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE),
                                     (acc, x) -> acc + x)
                         / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)),
                                     i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE),
                                     (acc, x) -> acc + x))
                          * sqrt(list_reduce(list_transform(generate_series(1, len(q.qv)),
                                     i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE),
                                     (acc, x) -> acc + x)))
                       , 4) AS cos_sim
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, rank, neighbor_id, cos_sim FROM (
                SELECT *, row_number() OVER
                    (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        "text_stats": """
            WITH base AS (
                SELECT doc_id, text,
                       string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS wl
                FROM documents
            )
            SELECT doc_id,
                   len(w) AS n_tok_ws,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok_bpe,
                   ROUND(len(list_filter(wl, x -> x IN ('the','a','an','and','or','of','to','in','is','it')))
                         / greatest(len(wl), 1), 6) AS stop_ratio,
                   ROUND((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   ROUND(list_reduce(list_prepend(0, list_transform(w, x -> length(x))), (acc, x) -> acc + x)
                         / greatest(len(w), 1), 6) AS avg_word_len,
                   ROUND(0.4 * least(len(w) / 20.0, 1.0)
                       + 0.3 * (1.0 - ROUND(len(list_filter(wl, x -> x IN ('the','a','an','and','or','of','to','in','is','it')))
                                            / greatest(len(wl), 1), 6))
                       + 0.3 * (1.0 - ROUND((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                                            / greatest(length(text), 1), 6)), 6) AS quality,
                   CASE
                     WHEN greatest(
                            len(list_filter(wl, x -> x IN ('the','and','of','is'))),
                            len(list_filter(wl, x -> x IN ('der','die','und','ist'))),
                            len(list_filter(wl, x -> x IN ('le','la','et','est'))),
                            len(list_filter(wl, x -> x IN ('el','los','y','es')))) = 0 THEN 'und'
                     WHEN len(list_filter(wl, x -> x IN ('the','and','of','is'))) = greatest(
                            len(list_filter(wl, x -> x IN ('the','and','of','is'))),
                            len(list_filter(wl, x -> x IN ('der','die','und','ist'))),
                            len(list_filter(wl, x -> x IN ('le','la','et','est'))),
                            len(list_filter(wl, x -> x IN ('el','los','y','es')))) THEN 'en'
                     WHEN len(list_filter(wl, x -> x IN ('der','die','und','ist'))) = greatest(
                            len(list_filter(wl, x -> x IN ('the','and','of','is'))),
                            len(list_filter(wl, x -> x IN ('der','die','und','ist'))),
                            len(list_filter(wl, x -> x IN ('le','la','et','est'))),
                            len(list_filter(wl, x -> x IN ('el','los','y','es')))) THEN 'de'
                     WHEN len(list_filter(wl, x -> x IN ('le','la','et','est'))) = greatest(
                            len(list_filter(wl, x -> x IN ('the','and','of','is'))),
                            len(list_filter(wl, x -> x IN ('der','die','und','ist'))),
                            len(list_filter(wl, x -> x IN ('le','la','et','est'))),
                            len(list_filter(wl, x -> x IN ('el','los','y','es')))) THEN 'fr'
                     ELSE 'es'
                   END AS lang_pred,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
            FROM base
        """,
        "multimodal_meta": """
            SELECT doc_id AS blob_id,
                   ['image','audio','video'][(doc_id % 3) + 1] AS media_type,
                   CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                   sha256(text) AS sha
            FROM documents
        """,
        # ANN: anchor buckets are sign bits of sequential-double dot
        # products (deterministic), re-rank is the cosine_topk formula
        # restricted to the query's bucket — fully SQL-expressible.
        "ann_lsh_topk": """
            WITH anchors AS (
                SELECT vec_id AS aid, embedding AS av,
                       row_number() OVER (ORDER BY vec_id ASC) - 1 AS bit
                FROM (SELECT * FROM embeddings ORDER BY vec_id ASC LIMIT 8)
            ),
            dots AS (
                SELECT e.vec_id, a.bit,
                       list_reduce(list_transform(generate_series(1, len(e.embedding)),
                                   i -> e.embedding[i]::DOUBLE * a.av[i]::DOUBLE),
                                   (acc, x) -> acc + x) AS d
                FROM embeddings e CROSS JOIN anchors a
            ),
            buckets AS (
                SELECT vec_id,
                       CAST(SUM(CASE WHEN d >= 0 THEN power(2.0, bit) ELSE 0 END) AS INT) AS bucket
                FROM dots GROUP BY vec_id
            ),
            emb AS (
                SELECT e.vec_id, e.embedding, b.bucket
                FROM embeddings e JOIN buckets b USING (vec_id)
            ),
            q AS (
                SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
                FROM emb WHERE vec_id IN (0,1,2,3,4)
            ),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       ROUND(
                         list_reduce(list_transform(generate_series(1, len(e.embedding)),
                                     i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE),
                                     (acc, x) -> acc + x)
                         / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)),
                                     i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE),
                                     (acc, x) -> acc + x))
                          * sqrt(list_reduce(list_transform(generate_series(1, len(q.qv)),
                                     i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE),
                                     (acc, x) -> acc + x)))
                       , 4) AS cos_sim
                FROM emb e JOIN q ON e.bucket = q.qbucket
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, rank, neighbor_id, cos_sim FROM (
                SELECT *, row_number() OVER
                    (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        # IVF cell-probe ANN: seed quantizer = 16 smallest ids, one Lloyd
        # refinement with EXACT decimal(18,6) component sums (order-free,
        # so both engines build bit-identical refined centroids), probes =
        # 4 nearest cells per query, exact cosine re-rank inside probed
        # cells. Ties everywhere break on the smaller cell/neighbor id.
        "ivf_topk": f"""
            WITH seeds AS (
                SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell,
                       embedding AS sv
                FROM (SELECT * FROM embeddings ORDER BY vec_id ASC LIMIT 16)
            ),
            a1 AS (
                SELECT vec_id, cell FROM (
                    SELECT e.vec_id, s.cell,
                           row_number() OVER (PARTITION BY e.vec_id
                               ORDER BY {_cos_sql('e.embedding', 's.sv')} DESC,
                                        s.cell ASC) AS rn
                    FROM embeddings e CROSS JOIN seeds s
                ) WHERE rn = 1
            ),
            memb AS (
                SELECT a1.cell AS cell,
                       generate_subscripts(e.embedding, 1) - 1 AS dim,
                       unnest(e.embedding) AS v
                FROM embeddings e JOIN a1 USING (vec_id)
            ),
            comp AS (
                SELECT cell, dim,
                       CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6)))
                            AS DOUBLE) / COUNT(*) AS c
                FROM memb GROUP BY cell, dim
            ),
            refined AS (
                SELECT cell, list(c ORDER BY dim) AS rv FROM comp GROUP BY cell
            ),
            a2 AS (
                SELECT vec_id, cell FROM (
                    SELECT e.vec_id, r.cell,
                           row_number() OVER (PARTITION BY e.vec_id
                               ORDER BY {_cos_sql('e.embedding', 'r.rv')} DESC,
                                        r.cell ASC) AS rn
                    FROM embeddings e CROSS JOIN refined r
                ) WHERE rn = 1
            ),
            q AS (
                SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id IN (0,1,2,3,4)
            ),
            probes AS (
                SELECT query_id, qv, cell FROM (
                    SELECT q.query_id, q.qv, r.cell,
                           row_number() OVER (PARTITION BY q.query_id
                               ORDER BY {_cos_sql('q.qv', 'r.rv')} DESC,
                                        r.cell ASC) AS pr
                    FROM q CROSS JOIN refined r
                ) WHERE pr <= 4
            ),
            scored AS (
                SELECT p.query_id, e.vec_id AS neighbor_id,
                       ROUND({_cos_sql('e.embedding', 'p.qv')}, 4) AS cos_sim
                FROM embeddings e
                JOIN a2 ON e.vec_id = a2.vec_id
                JOIN probes p ON a2.cell = p.cell
                WHERE e.vec_id <> p.query_id
            )
            SELECT query_id, rank, neighbor_id, cos_sim FROM (
                SELECT *, row_number() OVER
                    (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        # The Spark side reads through the lake's zone-map pruning (and
        # asserts files were actually skipped); the oracle states the same
        # middle-quintile window over the raw fixture.
        "zonemap_range_scan": """
            WITH b AS (
                SELECT (COUNT(*) * 2) // 5 AS lo,
                       (COUNT(*) * 3) // 5 - 1 AS hi
                FROM events
            )
            SELECT event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS sum_value
            FROM events, b
            WHERE event_id BETWEEN b.lo AND b.hi
            GROUP BY event_type
        """,
        # The Spark side reads a z-order-compacted lake through 2-D zone-map
        # pruning (and asserts files were skipped in BOTH dimensions); the
        # oracle states the same integer-arithmetic box over the raw fixture.
        "zorder_box_scan": """
            WITH b AS (
                SELECT MIN(user_id) AS umin, MAX(user_id) AS umax,
                       MIN(event_id) AS emin, MAX(event_id) AS emax
                FROM events
            )
            SELECT event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS sum_value
            FROM events, b
            WHERE user_id BETWEEN b.umin + (b.umax - b.umin) * 3 // 10
                              AND b.umin + (b.umax - b.umin) * 45 // 100
              AND event_id BETWEEN b.emin + (b.emax - b.emin) * 5 // 10
                               AND b.emin + (b.emax - b.emin) * 7 // 10
            GROUP BY event_type
        """,
        # The Spark side round-trips REAL BMP bytes (encode -> parse header/
        # padding/bottom-up rows -> channel sums); the oracle states the
        # closed-form fixture pattern directly. Channel means are one
        # integer-sum / pixel-count double division on both engines.
        "image_decode_stats": """
            WITH px AS (
                SELECT d.doc_id,
                       CAST(4 + d.doc_id % 5 AS INT) AS width,
                       CAST(3 + d.doc_id % 4 AS INT) AS height,
                       t.i
                FROM documents d
                JOIN range(0, 48) t(i)
                  ON t.i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4)
            )
            SELECT doc_id AS blob_id, width, height,
                   SUM((doc_id + i) % 251)::DOUBLE / COUNT(*) AS mean_r,
                   SUM((2 * doc_id + i) % 251)::DOUBLE / COUNT(*) AS mean_g,
                   SUM((3 * doc_id + i) % 251)::DOUBLE / COUNT(*) AS mean_b
            FROM px
            GROUP BY doc_id, width, height
        """,
        # multimodal features: the stub decode derives 32 values h_i/255
        # from sha256(content); mean/std come from exact integer sums, so
        # the formula is the same fixed sequence of IEEE double ops on both
        # engines (see operators/multimodal.py::extract_features).
        "multimodal_features": """
            WITH blobs AS (
                SELECT doc_id AS blob_id,
                       ['image','audio','video'][(doc_id % 3) + 1] AS media_type,
                       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                       sha256(text) AS sha
                FROM documents
            ),
            b AS (
                SELECT blob_id, media_type, n_bytes,
                       list_transform(generate_series(0, 31), i ->
                           (strpos('0123456789abcdef', substr(sha, 2*i + 1, 1)) - 1) * 16
                         + (strpos('0123456789abcdef', substr(sha, 2*i + 2, 1)) - 1)) AS bytes
                FROM blobs
            ),
            s AS (
                SELECT blob_id, media_type, n_bytes,
                       list_reduce(bytes, (acc, x) -> acc + x) AS sh,
                       list_reduce(list_transform(bytes, x -> x * x), (acc, x) -> acc + x) AS sh2
                FROM b
            )
            SELECT blob_id, media_type, n_bytes,
                   sh / 8160.0 AS feat_mean,
                   sqrt(sh2 / 32.0 - (sh / 32.0) * (sh / 32.0)) / 255.0 AS feat_std,
                   32 AS feat_dim
            FROM s
        """,
        # encode∘decode == identity, so the oracle states the decoded
        # output DIRECTLY from the source columns — the Spark side actually
        # round-trips through the tagged binary layouts and the dispatcher.
        "decode_dispatch": """
            WITH t AS (
                SELECT 'transfer' AS rec_type, event_id AS seq,
                       '0x' || lower(lpad(to_hex(user_id), 40, '0')) AS address,
                       CAST(CAST(floor(value * 1000) AS BIGINT) AS VARCHAR) AS amount,
                       CAST(0 AS INTEGER) AS n_items,
                       '' AS total
                FROM events WHERE event_type IN ('click', 'view')
            ),
            b AS (
                SELECT 'batch' AS rec_type, event_id AS seq,
                       '' AS address,
                       '' AS amount,
                       CAST(1 + event_id % 4 AS INTEGER) AS n_items,
                       CAST(CAST(list_sum(list_transform(
                            generate_series(0, event_id % 4),
                            j -> user_id + j * 7)) AS BIGINT) AS VARCHAR) AS total
                FROM events WHERE event_type = 'purchase'
            )
            SELECT * FROM t UNION ALL SELECT * FROM b
        """,
        # the flattener's expected rows stated closed-form per depth class
        # (the Spark side builds the nested JSON and walks it recursively)
        "trace_flatten": """
            WITH e AS (
                SELECT event_id AS id, event_id % 3 AS d, event_type, user_id
                FROM events WHERE event_id < 500
            )
            SELECT id, '' AS trace_address, CAST(0 AS INTEGER) AS depth,
                   event_type AS op, CAST(user_id AS BIGINT) AS value FROM e
            UNION ALL
            SELECT id, '0', CAST(1 AS INTEGER), 'leaf',
                   CAST(user_id + 1 AS BIGINT) FROM e WHERE d = 1
            UNION ALL
            SELECT id, '1', CAST(1 AS INTEGER), 'leaf',
                   CAST(user_id + 2 AS BIGINT) FROM e WHERE d >= 1
            UNION ALL
            SELECT id, '0', CAST(1 AS INTEGER), 'mid',
                   CAST(user_id + 10 AS BIGINT) FROM e WHERE d = 2
            UNION ALL
            SELECT id, '0/0', CAST(2 AS INTEGER), 'leaf',
                   CAST(user_id + 100 AS BIGINT) FROM e WHERE d = 2
        """,
        "duplicated_spans": """
            WITH w AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS words
                FROM documents
            ),
            occ AS (
                SELECT doc_id, CAST(i AS INTEGER) AS pos,
                       md5(array_to_string(words[i + 1 : i + 8], ' ')) AS span_hash
                FROM w, LATERAL unnest(generate_series(0, len(words) - 8)) AS t(i)
                WHERE len(words) >= 8
            ),
            dup AS (
                SELECT span_hash, COUNT(*) AS n_occurrences,
                       COUNT(DISTINCT doc_id) AS n_docs
                FROM occ GROUP BY span_hash HAVING COUNT(*) >= 2
            )
            SELECT d.span_hash, d.n_occurrences, d.n_docs, o.doc_id, o.pos
            FROM dup d JOIN occ o USING (span_hash)
        """,
        "pack_sequences": """
            WITH t AS (
                SELECT doc_id, lang,
                       list_transform(
                           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                           w -> length(w)) AS toks
                FROM documents
            ),
            o AS (
                SELECT lang, doc_id, toks,
                       SUM(len(toks)) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - len(toks) AS off
                FROM t
            ),
            e AS (
                SELECT lang, off + i - 1 AS pos, toks[i] AS tok
                FROM o, LATERAL unnest(generate_series(1, len(toks))) AS g(i)
                WHERE len(toks) > 0
            ),
            c AS (
                SELECT lang, CAST(pos // 64 AS BIGINT) AS chunk_id,
                       COUNT(*) AS n_tokens,
                       md5(array_to_string(list(tok ORDER BY pos), ',')) AS tokens_md5
                FROM e GROUP BY 1, 2
            )
            SELECT lang, chunk_id, n_tokens, tokens_md5
            FROM c WHERE n_tokens = 64
        """,
        "decontaminate": """
            WITH w AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS words
                FROM documents
            ),
            occ AS (
                SELECT doc_id,
                       md5(array_to_string(words[i + 1 : i + 8], ' ')) AS span_hash
                FROM w, LATERAL unnest(generate_series(0, len(words) - 8)) AS t(i)
                WHERE len(words) >= 8
            ),
            bench AS (SELECT DISTINCT span_hash FROM occ WHERE doc_id % 10 = 0),
            tr AS (SELECT * FROM occ WHERE doc_id % 10 <> 0),
            per_doc AS (SELECT doc_id, COUNT(*) AS n_spans FROM tr GROUP BY doc_id),
            hits AS (
                SELECT doc_id, COUNT(*) AS n_hits
                FROM tr SEMI JOIN bench USING (span_hash)
                GROUP BY doc_id
            )
            SELECT h.doc_id, h.n_hits, p.n_spans,
                   ROUND(h.n_hits / p.n_spans, 6) AS contamination
            FROM hits h JOIN per_doc p USING (doc_id)
        """,
        # The Spark side answers from the secondary index's sorted
        # projection (file-skipping asserted in-query); the oracle states
        # the same band over the raw fixture.
        "secidx_lookup": """
            SELECT doc_id, n_chars FROM documents
            WHERE n_chars BETWEEN 200 AND 260
        """,
        # Bloom-surrogate decontamination: the oracle replicates the k
        # md5-prefix positions per span exactly, so the hash (including
        # any Bloom false positives) must match bit-for-bit.
        "bloom_decontaminate": """
            WITH w AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS words
                FROM documents
            ),
            occ AS (
                SELECT doc_id,
                       md5(array_to_string(words[i + 1 : i + 8], ' ')) AS span_hash
                FROM w, LATERAL unnest(generate_series(0, len(words) - 8)) AS t(i)
                WHERE len(words) >= 8
            ),
            bench AS (SELECT DISTINCT span_hash FROM occ WHERE doc_id % 10 = 0),
            tr AS (SELECT * FROM occ WHERE doc_id % 10 <> 0),
            per_doc AS (SELECT doc_id, COUNT(*) AS n_spans FROM tr GROUP BY doc_id),
            spans AS (
                SELECT doc_id, span_hash, COUNT(*) AS n_occ
                FROM tr GROUP BY doc_id, span_hash
            ),
            ks AS (SELECT unnest(generate_series(0, 2)) AS i),
            bench_pos AS (
                SELECT DISTINCT ks.i,
                       substr(md5(b.span_hash || '#' || CAST(ks.i AS VARCHAR)), 1, 6) AS pos
                FROM bench b CROSS JOIN ks
            ),
            tr_pos AS (
                SELECT s.doc_id, s.span_hash, s.n_occ, ks.i,
                       substr(md5(s.span_hash || '#' || CAST(ks.i AS VARCHAR)), 1, 6) AS pos
                FROM spans s CROSS JOIN ks
            ),
            positive AS (
                SELECT doc_id, span_hash, n_occ
                FROM tr_pos SEMI JOIN bench_pos USING (i, pos)
                GROUP BY doc_id, span_hash, n_occ
                HAVING COUNT(DISTINCT i) = 3
            ),
            hits AS (
                SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS n_hits
                FROM positive GROUP BY doc_id
            )
            SELECT h.doc_id, h.n_hits, p.n_spans,
                   ROUND(h.n_hits / p.n_spans, 6) AS contamination
            FROM hits h JOIN per_doc p USING (doc_id)
        """,
        "dataset_split": """
            WITH h AS (
                SELECT doc_id, md5('split|' || doc_id) AS m FROM documents
            ),
            b AS (
                SELECT doc_id,
                       (((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1)) % 100
                       ) AS bucket
                FROM h
            )
            SELECT CASE WHEN bucket < 90 THEN 'train'
                        WHEN bucket < 95 THEN 'val'
                        ELSE 'test' END AS split,
                   COUNT(*) AS n_docs,
                   MIN(doc_id) AS min_doc_id
            FROM b GROUP BY 1
        """,
        "keyset_page": """
            WITH b AS (
                SELECT o_totalprice AS bp, o_orderkey AS bk
                FROM orders
                ORDER BY o_totalprice DESC, o_orderkey
                LIMIT 1 OFFSET 19
            )
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders, b
            WHERE o_totalprice < bp OR (o_totalprice = bp AND o_orderkey > bk)
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 20
        """,
        "asof_enrich": """
            WITH clicks AS (
                SELECT event_id AS click_id, user_id, ts
                FROM events WHERE event_type = 'click'
            ),
            purchases AS (
                -- DuckDB's ASOF JOIN picks an ARBITRARY row among purchases
                -- sharing (user_id, ts); the Spark side deterministically
                -- takes max p_event_id (dim_tiebreak). Pre-dedup here so
                -- both sides share the tie rule at any scale factor.
                SELECT user_id, ts AS p_ts, event_id AS p_event_id,
                       value AS p_value
                FROM events WHERE event_type = 'purchase'
                QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
            )
            SELECT c.click_id, c.user_id,
                   COALESCE(p.p_event_id, -1) AS p_event_id,
                   COALESCE(p.p_value, -1.0) AS p_value
            FROM clicks c
            ASOF LEFT JOIN purchases p
              ON c.user_id = p.user_id AND c.ts >= p.p_ts
        """,
        "scd2_intervals": """
            WITH m AS (
                SELECT user_id, event_id, event_type,
                       lag(event_type) OVER w AS prev,
                       (ROW_NUMBER() OVER w = 1) AS is_first
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
            ),
            chg AS (
                SELECT user_id, event_type, event_id AS valid_from
                FROM m
                WHERE is_first OR event_type IS DISTINCT FROM prev
            )
            SELECT user_id, event_type, valid_from,
                   COALESCE(
                       lead(valid_from) OVER (
                           PARTITION BY user_id ORDER BY valid_from), -1
                   ) AS valid_to,
                   (lead(valid_from) OVER (
                       PARTITION BY user_id ORDER BY valid_from) IS NULL
                   ) AS is_current
            FROM chg
        """,
        "range_window_join": """
            WITH clicks AS (
                SELECT user_id, ts AS c_ts, event_id AS c_id
                FROM events WHERE event_type = 'click'
            ),
            purchases AS (
                SELECT user_id, ts - INTERVAL 1 HOUR AS w_start,
                       ts AS w_end, event_id AS p_id
                FROM events WHERE event_type = 'purchase'
            )
            SELECT p.p_id, COUNT(*) AS n_clicks, MIN(c.c_id) AS first_click_id
            FROM clicks c
            JOIN purchases p
              ON c.user_id = p.user_id
             AND c.c_ts >= p.w_start AND c.c_ts <= p.w_end
            GROUP BY p.p_id
        """,
        "moving_avg": """
            WITH daily AS (
                SELECT CAST(o_orderdate AS DATE) AS d,
                       SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
                FROM orders GROUP BY 1
            )
            SELECT d,
                   CAST(rev AS DOUBLE) AS revenue,
                   ROUND(
                       CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w, 6
                   ) AS ma7,
                   COUNT(*) OVER w AS n7
            FROM daily
            WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        """,
        "rollup_agg": """
            SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
                   COALESCE(l_linestatus, '(all)') AS linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "quantile_stats": """
            SELECT source, COUNT(*) AS n_docs,
                   ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
                   ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
                   ROUND(quantile_cont(n_chars, 0.9), 6) AS p90
            FROM documents GROUP BY source
        """,
        "tfidf_topk": """
            WITH words AS (
                SELECT doc_id,
                       unnest(string_split(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')) AS term
                FROM documents
            ),
            w2 AS (SELECT * FROM words WHERE term <> ''),
            tf AS (
                SELECT doc_id, term, COUNT(*) AS tf
                FROM w2 GROUP BY 1, 2
            ),
            df AS (
                SELECT term, COUNT(DISTINCT doc_id) AS df FROM w2 GROUP BY 1
            ),
            n AS (SELECT COUNT(*) AS n_docs FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                           AS tfidf
                FROM tf JOIN df USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tfidf, rk FROM (
                SELECT doc_id, term, tfidf,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id ORDER BY tfidf DESC, term
                       ) AS rk
                FROM scored
            ) WHERE rk <= 3 AND doc_id < 100
        """,
        "temperature_mixture": """
            WITH totals AS (
                SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS chars_s
                FROM documents GROUP BY source
            ),
            tot AS (SELECT SUM(chars_s) AS total FROM totals),
            z AS (
                SELECT SUM(POW(chars_s / total, 0.3)) AS z
                FROM totals, tot
            ),
            rates AS (
                SELECT source,
                       LEAST(1.0, POW(chars_s / total, 0.3 - 1.0) / z) AS rate
                FROM totals, tot, z
            ),
            h AS (
                SELECT doc_id, source, n_chars,
                       md5('temp|' || doc_id) AS m
                FROM documents
            ),
            b AS (
                SELECT doc_id, source, n_chars,
                       (((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1))
                       ) AS bucket
                FROM h
            )
            SELECT b.source,
                   ROUND(ANY_VALUE(r.rate), 6) AS rate,
                   COUNT(*) AS n_kept,
                   SUM(b.n_chars) AS kept_chars
            FROM b JOIN rates r ON b.source = r.source
            WHERE b.bucket < CAST(ROUND(r.rate * 65536) AS INT)
            GROUP BY b.source
        """,
        "mixture_sample": """
            WITH totals AS (
                SELECT source, SUM(n_chars) AS chars_s
                FROM documents GROUP BY source
            ),
            rates AS (
                SELECT source,
                       CAST((SELECT MIN(chars_s) FROM totals) AS DOUBLE)
                           / chars_s AS rate
                FROM totals
            ),
            h AS (
                SELECT doc_id, source, n_chars,
                       md5('mix|' || doc_id) AS m
                FROM documents
            ),
            b AS (
                SELECT doc_id, source, n_chars,
                       (((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1))
                       ) AS bucket
                FROM h
            )
            SELECT b.source,
                   ROUND(ANY_VALUE(r.rate), 6) AS rate,
                   COUNT(*) AS n_kept,
                   SUM(b.n_chars) AS kept_chars
            FROM b JOIN rates r ON b.source = r.source
            WHERE b.bucket / 65536.0 < r.rate
            GROUP BY b.source
        """,
        "vocab_histogram": """
            WITH t AS (
                SELECT doc_id,
                       list_transform(
                           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                           w -> length(w)) AS toks
                FROM documents
            ),
            occ AS (
                SELECT doc_id, unnest(toks) AS token FROM t
            )
            SELECT token, COUNT(*) AS n_occurrences,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM occ GROUP BY token
            ORDER BY n_occurrences DESC, token ASC
            LIMIT 50
        """,
        "token_budget": """
            WITH t AS (
                SELECT lang,
                       len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
                           AS n_tok
                FROM documents
            ),
            g AS (
                SELECT lang, COUNT(*) AS n_docs,
                       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
                FROM t GROUP BY lang
            )
            SELECT lang, n_docs, n_tokens,
                   ROUND(n_tokens / SUM(n_tokens) OVER (), 6) AS share
            FROM g
        """,
        "repetition_ratio": """
            WITH sh AS (
                SELECT doc_id,
                       unnest([w[i] || '_' || w[i+1] for i in range(1, len(w))]) AS shingle
                FROM (
                    SELECT doc_id,
                           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                    FROM documents WHERE doc_id < 200
                )
            )
            SELECT doc_id, COUNT(*) AS n_ngrams,
                   COUNT(DISTINCT shingle) AS n_uniq,
                   CAST(ROUND(1.0 - COUNT(DISTINCT shingle)::DOUBLE / COUNT(*), 6)
                        AS DECIMAL(18,6)) AS rep_ratio
            FROM sh GROUP BY doc_id
        """,
        "gopher_filter": """
            WITH t AS (
                SELECT doc_id, text,
                       string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS wl
                FROM documents WHERE doc_id < 300
            ),
            m AS (
                SELECT doc_id,
                       len(w) AS n_words,
                       ROUND(list_sum(list_transform(w, x -> length(x)))::DOUBLE
                             / GREATEST(len(w), 1), 6) AS awl,
                       len(list_filter(wl, x -> list_contains(
                           ['the','a','an','and','or','of','to','in','is','it'], x)))
                           AS stop_hits,
                       ROUND((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
                             / GREATEST(length(text), 1), 6) AS pr
                FROM t
            )
            SELECT doc_id, n_words, stop_hits,
                   CAST(n_words >= 5 AND n_words <= 10000 AS INT) AS ok_word_count,
                   CAST(awl >= 2.0 AND awl <= 12.0 AS INT) AS ok_avg_word_len,
                   CAST(stop_hits >= 2 AS INT) AS ok_stopwords,
                   CAST(pr <= 0.3 AS INT) AS ok_punct,
                   CAST(n_words >= 5 AND n_words <= 10000
                        AND awl >= 2.0 AND awl <= 12.0
                        AND stop_hits >= 2 AND pr <= 0.3 AS INT) AS keep
            FROM m
        """,
        "length_band": """
            WITH r AS (
                SELECT source, n_chars,
                       percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS pr
                FROM documents
            )
            SELECT source, COUNT(*) AS n_kept,
                   MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
            FROM r WHERE pr >= 0.05 AND pr <= 0.95
            GROUP BY source
        """,
        "dedup_keep_best": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            {_JACCARD_SCORED_CTES},
            cedges AS (
                SELECT doc_a AS a, doc_b AS b FROM jscored
                UNION
                SELECT doc_b AS a, doc_a AS b FROM jscored
            ),
            reach(a, b) AS (
                SELECT a, b FROM cedges
                UNION
                SELECT r.a, e.b FROM reach r JOIN cedges e ON r.b = e.a
            ),
            labels AS (
                SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id
                FROM reach GROUP BY a
            ),
            q AS (
                SELECT doc_id,
                       ROUND(0.4 * least(len(w) / 20.0, 1.0)
                           + 0.3 * (1.0 - ROUND(len(list_filter(wl, x -> x IN ('the','a','an','and','or','of','to','in','is','it')))
                                                / greatest(len(wl), 1), 6))
                           + 0.3 * (1.0 - ROUND((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                                                / greatest(length(text), 1), 6)), 6) AS q
                FROM (
                    SELECT doc_id, text,
                           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w,
                           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS wl
                    FROM documents
                )
            )
            SELECT l.node AS doc_id, l.cluster_id,
                   CAST(q.q AS DECIMAL(18,6)) AS q,
                   row_number() OVER (PARTITION BY l.cluster_id
                                      ORDER BY q.q DESC, l.node ASC) = 1 AS keep
            FROM labels l JOIN q ON q.doc_id = l.node
        """,
        "source_lang_matrix": """
            SELECT source,
                   CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                   CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
                   CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
                   CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
                   CAST(SUM(CASE WHEN lang IN ('de','en','es','fr','zh') THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_total
            FROM documents GROUP BY source
        """,
        "unigram_logprob": """
            WITH w AS (
                SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
                FROM documents
            ),
            words AS (SELECT * FROM w WHERE w <> ''),
            freqs AS (SELECT w, COUNT(*) AS n FROM words GROUP BY w),
            total AS (SELECT COUNT(*) AS t FROM words),
            scored AS (
                SELECT words.doc_id,
                       CAST(ROUND(log10(freqs.n / (SELECT t::DOUBLE FROM total)), 6)
                            AS DECIMAL(18,6)) AS lp
                FROM words JOIN freqs USING (w)
            )
            SELECT doc_id, COUNT(*) AS n_words,
                   CAST(ROUND((SUM(lp) / COUNT(*))::DOUBLE, 6) AS DECIMAL(18,6))
                       AS avg_logprob
            FROM scored WHERE doc_id < 200 GROUP BY doc_id
        """,
        "chunk_dedup": """
            WITH d AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                FROM documents
            ),
            ch AS (
                SELECT doc_id, t.i AS chunk_idx,
                       array_to_string(ws[t.i*8+1 : t.i*8+8], ' ') AS chunk
                FROM d, UNNEST(range(0, CAST(ceil(len(ws)/8.0) AS BIGINT))) AS t(i)
                WHERE len(ws) > 0 AND ws[1] <> ''
            ),
            ranked AS (
                SELECT doc_id, chunk,
                       row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rk
                FROM ch
            )
            SELECT doc_id, COUNT(*) AS n_chunks,
                   CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
                   CAST(SUM(CASE WHEN rk = 1 THEN len(string_split(chunk, ' ')) ELSE 0 END)
                        AS BIGINT) AS kept_words
            FROM ranked WHERE doc_id < 300 GROUP BY doc_id
        """,
        "chunk_dedup_clean": """
            WITH d AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                FROM documents
            ),
            ch AS (
                SELECT doc_id, t.i AS chunk_idx,
                       array_to_string(ws[t.i*8+1 : t.i*8+8], ' ') AS chunk
                FROM d, UNNEST(range(0, CAST(ceil(len(ws)/8.0) AS BIGINT))) AS t(i)
                WHERE len(ws) > 0 AND ws[1] <> ''
            ),
            ranked AS (
                SELECT doc_id, chunk_idx, chunk,
                       row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rk
                FROM ch
            )
            SELECT doc_id,
                   string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text,
                   CAST(COUNT(*) AS BIGINT) AS kept_chunks
            FROM ranked WHERE rk = 1 AND doc_id < 300 GROUP BY doc_id
        """,
        "bigram_pmi": """
            WITH d AS (
                SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                FROM documents
            ),
            bg AS (
                SELECT ws[t.i] AS x, ws[t.i+1] AS y
                FROM d, UNNEST(range(1, len(ws))) AS t(i)
                WHERE len(ws) >= 2
            ),
            big0 AS (
                SELECT x, y, COUNT(*) AS c_xy FROM bg
                WHERE x <> '' AND y <> '' GROUP BY x, y
            ),
            big AS (
                SELECT x, y, c_xy, SUM(c_xy) OVER () AS n_big FROM big0
            ),
            uni0 AS (
                SELECT u.w AS w, COUNT(*) AS c
                FROM d, UNNEST(d.ws) AS u(w) WHERE u.w <> '' GROUP BY u.w
            ),
            uni AS (SELECT w, c, SUM(c) OVER () AS n_uni FROM uni0)
            SELECT big.x, big.y, big.c_xy,
                   CAST(ROUND(ln((big.c_xy / big.n_big)
                                 / ((ux.c / ux.n_uni) * (uy.c / uy.n_uni))), 6)
                        AS DECIMAL(18,6)) AS pmi
            FROM big
            JOIN uni ux ON ux.w = big.x
            JOIN uni uy ON uy.w = big.y
            WHERE big.c_xy >= 5
            ORDER BY pmi DESC, big.x, big.y LIMIT 40
        """,
        "vocab_coverage": """
            WITH d AS (
                SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                FROM documents
            ),
            uni AS (
                SELECT u.w AS w, COUNT(*) AS c
                FROM d, UNNEST(d.ws) AS u(w) WHERE u.w <> '' GROUP BY u.w
            ),
            r AS (
                SELECT row_number() OVER (ORDER BY c DESC, w) AS rank,
                       SUM(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS cum,
                       SUM(c) OVER () AS total
                FROM uni
            )
            SELECT CAST(t.threshold AS DECIMAL(18,6)) AS threshold,
                   CAST(MIN(rank) AS INT) AS vocab_rank
            FROM r, (VALUES (0.5), (0.9), (0.99)) AS t(threshold)
            WHERE cum / total >= t.threshold - 1e-12
            GROUP BY t.threshold
        """,
        "source_kl": """
            WITH ws AS (
                SELECT d.source, u.w AS w
                FROM (SELECT source,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
                      FROM documents) d, UNNEST(d.arr) AS u(w)
                WHERE u.w <> ''
            ),
            sc AS (SELECT source, w, COUNT(*) AS c_sw FROM ws GROUP BY source, w),
            gc AS (SELECT w, SUM(c_sw) AS c_w FROM sc GROUP BY w),
            gt AS (SELECT SUM(c_w) AS n_tot FROM gc),
            st AS (SELECT source, SUM(c_sw) AS n_src FROM sc GROUP BY source),
            term AS (
                SELECT sc.source, st.n_src,
                       CAST(ROUND((sc.c_sw / st.n_src)
                                  * ln((sc.c_sw / st.n_src)
                                       / (gc.c_w / (SELECT n_tot FROM gt))), 6)
                            AS DECIMAL(18,6)) AS t
                FROM sc JOIN gc USING (w) JOIN st USING (source)
            )
            SELECT source, CAST(MAX(n_src) AS BIGINT) AS n_words,
                   CAST(SUM(t) AS DECIMAL(18,6)) AS kl
            FROM term GROUP BY source
        """,
        "zipf_slope": """
            WITH ws AS (
                SELECT d.lang, u.w AS w
                FROM (SELECT lang,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
                      FROM documents) d, UNNEST(d.arr) AS u(w)
                WHERE u.w <> ''
            ),
            uni AS (SELECT lang, w, COUNT(*) AS c FROM ws GROUP BY lang, w),
            xy AS (
                SELECT lang,
                       CAST(ROUND(log10(CAST(row_number() OVER
                                (PARTITION BY lang ORDER BY c DESC, w) AS DOUBLE)), 6)
                            AS DECIMAL(18,6)) AS x,
                       CAST(ROUND(log10(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
                FROM uni
            ),
            agg AS (
                SELECT lang, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                       SUM(x*y) AS sxy, SUM(x*x) AS sxx
                FROM xy GROUP BY lang
            )
            SELECT lang, CAST(n AS BIGINT) AS n_types,
                   CAST(ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                              / CAST(n*sxx - sx*sx AS DOUBLE), 6)
                        AS DECIMAL(18,6)) AS slope
            FROM agg
        """,
        "source_sample": """
            SELECT source, doc_id, CAST(rk AS INT) AS rk FROM (
                SELECT source, doc_id,
                       row_number() OVER (PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                FROM documents
            ) WHERE rk <= 10
        """,
        "bigram_logprob": """
            WITH d AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                FROM documents
            ),
            bgf AS (
                SELECT doc_id, ws[t.i] AS x, ws[t.i+1] AS y
                FROM d, UNNEST(range(1, len(ws))) AS t(i)
                WHERE len(ws) >= 2 AND ws[t.i] <> '' AND ws[t.i+1] <> ''
            ),
            big AS (SELECT x, y, COUNT(*) AS c_xy FROM bgf GROUP BY x, y),
            pre AS (SELECT x, SUM(c_xy) AS c_x FROM big GROUP BY x),
            scored AS (
                SELECT bgf.doc_id,
                       CAST(ROUND(ln(big.c_xy / pre.c_x), 6) AS DECIMAL(18,6)) AS lp
                FROM bgf JOIN big USING (x, y) JOIN pre USING (x)
            )
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   CAST(ROUND((SUM(lp) / COUNT(*))::DOUBLE, 6) AS DECIMAL(18,6))
                       AS avg_logprob
            FROM scored WHERE doc_id < 200 GROUP BY doc_id
        """,
        "source_overlap": """
            WITH d AS (
                SELECT source,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT source,
                       ws[t.i] || '_' || ws[t.i+1] || '_' || ws[t.i+2] AS shingle
                FROM d, UNNEST(range(1, len(ws) - 1)) AS t(i)
                WHERE len(ws) >= 3
            ),
            shf AS (SELECT * FROM sh WHERE shingle <> ''),
            sizes AS (SELECT source, COUNT(*) AS n_sh FROM shf GROUP BY source),
            common AS (
                SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
                FROM shf a JOIN shf b
                  ON a.shingle = b.shingle AND a.source < b.source
                GROUP BY 1, 2
            )
            SELECT src_a, src_b, n_common,
                   CAST(ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6)
                        AS DECIMAL(18,6)) AS jaccard
            FROM common
            JOIN sizes sa ON sa.source = common.src_a
            JOIN sizes sb ON sb.source = common.src_b
        """,
        "dim_stats": """
            WITH ex AS (
                SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ),
            dec AS (SELECT dim, v, CAST(v AS DECIMAL(18,6)) AS dv FROM ex)
            SELECT dim, COUNT(*) AS n,
                   CAST(SUM(dv) AS DECIMAL(18,6)) AS sum_v,
                   CAST(SUM(dv * dv) AS DECIMAL(28,12)) AS sum_sq,
                   CAST(ROUND(MIN(v), 6) AS DECIMAL(18,6)) AS min_v,
                   CAST(ROUND(MAX(v), 6) AS DECIMAL(18,6)) AS max_v
            FROM dec GROUP BY dim
        """,
        "quantize_embeddings": """
            WITH ex AS (
                SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ),
            p AS (
                SELECT dim, MIN(v) AS lo, MAX(v) - MIN(v) AS span
                FROM ex GROUP BY dim
            ),
            q AS (
                SELECT ex.vec_id, ex.dim,
                       CASE WHEN p.span = 0 THEN 0
                            ELSE LEAST(255, CAST(FLOOR((ex.v - p.lo) / p.span * 256)
                                                 AS INT)) END AS qv
                FROM ex JOIN p USING (dim)
            )
            SELECT vec_id, list(qv ORDER BY dim) AS qvec
            FROM q WHERE vec_id < 200 GROUP BY vec_id
        """,
        "jl_projection": _jl_oracle(),
        "kmeans_clusters": _kmeans_oracle(),
        # exact-regime quantile sketch vs the quantile_disc rank rule; the
        # probs are CAST to DOUBLE so ceil(p*n) is the same IEEE multiply
        # on both engines (DuckDB VALUES literals default to DECIMAL)
        "bm25_topk": _bm25_oracle(),
        "pagerank_top": _pagerank_oracle(),
        "pq_adc_topk": _pq_oracle(),
        "dsir_topk": _dsir_oracle(),
        "quality_classifier": _classifier_oracle(),
        "grouped_topk": """
            SELECT o_orderpriority, CAST(rank AS INT) AS rank,
                   o_totalprice, o_orderkey, o_orderstatus
            FROM (
                SELECT o_orderpriority, o_totalprice, o_orderkey,
                       o_orderstatus,
                       row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey DESC
                       ) AS rank
                FROM orders
            ) WHERE rank <= 3
        """,
        "cdc_changefeed": """
            WITH s AS (
                SELECT user_id % 200 AS k,
                       event_id AS seq,
                       (event_id % 13 = 0) AS is_del,
                       value AS val
                FROM events
            ),
            old_w AS (
                SELECT *, row_number() OVER
                         (PARTITION BY k ORDER BY seq DESC) AS rn
                FROM s WHERE seq % 2 = 0
            ),
            old_live AS (
                SELECT k, seq, val FROM old_w WHERE rn = 1 AND NOT is_del
            ),
            new_w AS (
                SELECT *, row_number() OVER
                         (PARTITION BY k ORDER BY seq DESC) AS rn
                FROM s
            ),
            new_live AS (
                SELECT k, seq, val FROM new_w WHERE rn = 1 AND NOT is_del
            ),
            j AS (
                SELECT coalesce(o.k, n.k) AS k,
                       o.seq AS oseq, o.val AS oval,
                       n.seq AS nseq, n.val AS nval
                FROM old_live o FULL OUTER JOIN new_live n ON o.k = n.k
            )
            SELECT 'insert' AS change_op, k, nseq AS seq, nval AS val
            FROM j WHERE oseq IS NULL
            UNION ALL
            SELECT 'delete', k, oseq, oval FROM j WHERE nseq IS NULL
            UNION ALL
            SELECT 'update_preimage', k, oseq, oval
            FROM j WHERE oseq IS NOT NULL AND nseq IS NOT NULL
                    AND oseq != nseq
            UNION ALL
            SELECT 'update_postimage', k, nseq, nval
            FROM j WHERE oseq IS NOT NULL AND nseq IS NOT NULL
                    AND oseq != nseq
        """,
        "schema_defaults": """
            WITH s AS (
                SELECT user_id % 200 AS k,
                       event_id AS seq,
                       (event_id % 13 = 0) AS is_del,
                       value AS val
                FROM events
            ),
            mx AS (SELECT max(seq) AS m FROM s),
            vip AS (
                SELECT range AS k,
                       (SELECT m FROM mx) + 1 + range AS seq,
                       CAST(-1.0 AS DOUBLE) AS val
                FROM range(10)
            ),
            base AS (
                SELECT k, seq, is_del, val, 'std' AS tier FROM s
                UNION ALL
                SELECT k, seq, FALSE, val, 'vip' FROM vip
            ),
            w AS (
                SELECT *, row_number() OVER
                         (PARTITION BY k ORDER BY seq DESC) AS rn
                FROM base
            )
            SELECT k, seq, val, tier FROM w WHERE rn = 1 AND NOT is_del
        """,
        "schema_rename": """
            WITH s AS (
                SELECT user_id % 200 AS k,
                       event_id AS seq,
                       (event_id % 13 = 0) AS is_del,
                       value AS score,
                       event_type AS typ
                FROM events
            ),
            w AS (
                SELECT *, row_number() OVER
                         (PARTITION BY k ORDER BY seq DESC) AS rn
                FROM s
            )
            SELECT k, seq, score, typ, CAST(NULL AS BIGINT) AS aux
            FROM w WHERE rn = 1 AND NOT is_del
        """,
        "cdc_mirror": """
            WITH s AS (
                SELECT user_id % 200 AS k,
                       event_id AS seq,
                       (event_id % 13 = 0) AS is_del,
                       value AS val,
                       event_type AS typ
                FROM events
            ),
            w AS (
                SELECT *, row_number() OVER
                         (PARTITION BY k ORDER BY seq DESC) AS rn
                FROM s
            )
            SELECT k, seq, val, typ FROM w WHERE rn = 1 AND NOT is_del
        """,
        "fim_transform": """
            WITH t AS (
                SELECT doc_id,
                       list_transform(
                           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                           w -> CAST(length(w) AS INT)) AS toks
                FROM documents WHERE doc_id < 200
            ),
            cuts AS (
                SELECT doc_id, toks, len(toks) AS n,
                       (((strpos('0123456789abcdef', substr(m1, 1, 1)) - 1) * 268435456
                        + (strpos('0123456789abcdef', substr(m1, 2, 1)) - 1) * 16777216
                        + (strpos('0123456789abcdef', substr(m1, 3, 1)) - 1) * 1048576
                        + (strpos('0123456789abcdef', substr(m1, 4, 1)) - 1) * 65536
                        + (strpos('0123456789abcdef', substr(m1, 5, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(m1, 6, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(m1, 7, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(m1, 8, 1)) - 1))
                        % (len(toks) + 1)) AS c1,
                       (((strpos('0123456789abcdef', substr(m2, 1, 1)) - 1) * 268435456
                        + (strpos('0123456789abcdef', substr(m2, 2, 1)) - 1) * 16777216
                        + (strpos('0123456789abcdef', substr(m2, 3, 1)) - 1) * 1048576
                        + (strpos('0123456789abcdef', substr(m2, 4, 1)) - 1) * 65536
                        + (strpos('0123456789abcdef', substr(m2, 5, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(m2, 6, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(m2, 7, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(m2, 8, 1)) - 1))
                        % (len(toks) + 1)) AS c2
                FROM (SELECT doc_id, toks,
                             md5('fim|' || doc_id || '|1') AS m1,
                             md5('fim|' || doc_id || '|2') AS m2
                      FROM t)
            ),
            seg AS (
                SELECT doc_id, toks, n,
                       CAST(LEAST(c1, c2) AS INT) AS lo,
                       CAST(GREATEST(c1, c2) AS INT) AS hi
                FROM cuts
            )
            SELECT doc_id,
                   toks[1:lo] AS prefix,
                   toks[lo+1:hi] AS middle,
                   toks[hi+1:n] AS suffix,
                   [CAST(-1 AS INT)] || toks[1:lo]
                   || [CAST(-2 AS INT)] || toks[hi+1:n]
                   || [CAST(-3 AS INT)] || toks[lo+1:hi] AS fim
            FROM seg
        """,
        "span_corruption": """
            WITH t AS (
                SELECT doc_id,
                       list_transform(
                           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                           w -> length(w)) AS toks
                FROM documents WHERE doc_id < 200
            ),
            ex AS (
                SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
                       unnest(toks) AS tok
                FROM t
            ),
            s AS (
                SELECT doc_id, pos, tok,
                       CASE WHEN (((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                             + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                             + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                             + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1)) % 5) = 0
                            THEN 1 ELSE 0 END AS st
                FROM (SELECT doc_id, pos, tok,
                             md5('t5|' || doc_id || '|' || pos) AS m
                      FROM ex)
            ),
            mk AS (
                SELECT *, MAX(st) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1
                          AS masked
                FROM s
            ),
            rs AS (
                SELECT *, masked AND NOT COALESCE(
                           LAG(masked) OVER (PARTITION BY doc_id ORDER BY pos),
                           FALSE) AS runstart
                FROM mk
            ),
            rid AS (
                SELECT *, SUM(CASE WHEN runstart THEN 1 ELSE 0 END) OVER
                          (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS runid
                FROM rs
            ),
            ins AS (
                SELECT doc_id,
                       list(CASE WHEN runstart THEN -CAST(runid AS INT)
                                 ELSE CAST(tok AS INT) END ORDER BY pos)
                           AS inputs
                FROM rid WHERE NOT masked OR runstart GROUP BY doc_id
            ),
            tgt AS (
                SELECT doc_id,
                       flatten(list(
                           CASE WHEN runstart
                                THEN [-CAST(runid AS INT), CAST(tok AS INT)]
                                ELSE [CAST(tok AS INT)] END ORDER BY pos))
                           AS targets
                FROM rid WHERE masked GROUP BY doc_id
            )
            SELECT i.doc_id, i.inputs,
                   COALESCE(g.targets, CAST([] AS INT[])) AS targets
            FROM ins i LEFT JOIN tgt g ON g.doc_id = i.doc_id
        """,
        "leakage_split": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            {_JACCARD_SCORED_CTES},
            cedges AS (
                SELECT doc_a AS a, doc_b AS b FROM jscored
                UNION
                SELECT doc_b AS a, doc_a AS b FROM jscored
            ),
            reach(a, b) AS (
                SELECT a, b FROM cedges
                UNION
                SELECT r.a, e.b FROM reach r JOIN cedges e ON r.b = e.a
            ),
            cc AS (
                SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id
                FROM reach GROUP BY a
            ),
            keyed AS (
                SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS key
                FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
            ),
            h AS (SELECT doc_id, md5('split|' || key) AS m FROM keyed),
            b AS (
                SELECT doc_id,
                       (((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1)) % 100
                       ) AS bucket
                FROM h
            )
            SELECT doc_id, CASE WHEN bucket < 90 THEN 'train'
                                WHEN bucket < 95 THEN 'val'
                                ELSE 'test' END AS split
            FROM b
        """,
        "quantile_sketch": """
            WITH s AS (
                SELECT CAST(value AS DOUBLE) AS v,
                       ROW_NUMBER() OVER (ORDER BY CAST(value AS DOUBLE)) AS rn,
                       COUNT(*) OVER () AS n
                FROM events WHERE value IS NOT NULL
            ),
            probs AS (
                SELECT CAST(x AS DOUBLE) AS p
                FROM (VALUES (0.05),(0.25),(0.5),(0.75),(0.95),(0.99)) t(x)
            )
            SELECT p, MIN(v) AS v
            FROM probs, s
            WHERE rn >= GREATEST(CAST(CEIL(p * n) AS BIGINT), 1)
            GROUP BY p
        """,
        "semantic_dedup": _semantic_dedup_oracle(threshold=0.35),
        "funnel": """
            WITH t1 AS (
                SELECT user_id, MIN(ts) AS ts FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ),
            t2 AS (
                SELECT e.user_id, MIN(e.ts) AS ts
                FROM events e JOIN t1 ON t1.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts > t1.ts
                GROUP BY e.user_id
            ),
            t3 AS (
                SELECT e.user_id, MIN(e.ts) AS ts
                FROM events e JOIN t2 ON t2.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts > t2.ts
                GROUP BY e.user_id
            )
            SELECT 1 AS step, 'view' AS step_name,
                   (SELECT COUNT(*) FROM t1) AS users
            UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM t2)
            UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM t3)
        """,
        "event_transitions": """
            WITH p AS (
                SELECT lag(event_type) OVER w AS from_type,
                       event_type AS to_type
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            c AS (
                SELECT from_type, to_type, COUNT(*) AS n
                FROM p WHERE from_type IS NOT NULL
                GROUP BY from_type, to_type
            )
            SELECT from_type, to_type, n,
                   CAST(ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type)
                                       AS DOUBLE), 6)
                        AS DECIMAL(18,6)) AS prob
            FROM c
        """,
        "retention_cohorts": """
            WITH f AS (
                SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
                FROM events GROUP BY user_id
            ),
            a AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            )
            SELECT f.cohort_day,
                   CAST(a.day - f.cohort_day AS INT) AS offset_days,
                   COUNT(DISTINCT a.user_id) AS users
            FROM a JOIN f USING (user_id)
            WHERE a.day - f.cohort_day <= 7
            GROUP BY 1, 2
        """,
        "chunk_tokens": """
            WITH t AS (
                SELECT doc_id,
                       list_transform(
                           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                           w -> length(w)) AS toks
                FROM documents WHERE doc_id < 200
            ),
            c AS (
                SELECT doc_id, toks,
                       1 + GREATEST(0, CAST(CEIL((len(toks) - 32) / 24.0)
                                            AS INT)) AS n_chunks
                FROM t
            ),
            w0 AS (
                SELECT doc_id, toks,
                       unnest(range(0, CAST(n_chunks AS BIGINT))) AS chunk_idx
                FROM c
            ),
            w AS (
                SELECT doc_id, chunk_idx,
                       toks[(chunk_idx * 24 + 1):(chunk_idx * 24 + 32)] AS chunk
                FROM w0
            )
            SELECT doc_id, chunk_idx, chunk, len(chunk) AS n_tokens FROM w
        """,
        "feature_hashing": """
            WITH ws AS (
                SELECT d.doc_id, u.w AS w
                FROM (SELECT doc_id,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
                      FROM documents WHERE doc_id < 300) d, UNNEST(d.arr) AS u(w)
                WHERE u.w <> ''
            ),
            h AS (SELECT doc_id, md5(w) AS m FROM ws),
            f AS (
                SELECT doc_id,
                       (((strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1)) % 64
                       ) AS feature,
                       CASE WHEN (strpos('0123456789abcdef', substr(m, 5, 1)) - 1) % 2 = 0
                            THEN 1 ELSE -1 END AS s
                FROM h
            )
            SELECT doc_id, CAST(feature AS INT) AS feature,
                   CAST(SUM(s) AS BIGINT) AS val
            FROM f GROUP BY doc_id, feature
        """,
        "label_centroids": """
            WITH ex AS (
                SELECT label,
                       generate_subscripts(embedding, 1) - 1 AS dim,
                       unnest(embedding) AS v
                FROM embeddings
            )
            SELECT label, dim, COUNT(*) AS n_vecs,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6)))
                        AS DECIMAL(18,6)) AS sum_v
            FROM ex WHERE dim < 8 GROUP BY label, dim
        """,
        "doc_entropy": """
            WITH ws AS (
                SELECT d.doc_id, u.w AS w
                FROM (SELECT doc_id,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
                      FROM documents WHERE doc_id < 300) d, UNNEST(d.arr) AS u(w)
                WHERE u.w <> ''
            ),
            tf AS (SELECT doc_id, w, COUNT(*) AS c FROM ws GROUP BY doc_id, w),
            tot AS (SELECT doc_id, SUM(c) AS n FROM tf GROUP BY doc_id),
            term AS (
                SELECT tf.doc_id, tot.n,
                       CAST(ROUND(-(tf.c / CAST(tot.n AS DOUBLE))
                                  * ln(tf.c / CAST(tot.n AS DOUBLE)), 6)
                            AS DECIMAL(18,6)) AS t
                FROM tf JOIN tot USING (doc_id)
            )
            SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_words,
                   COUNT(*) AS n_types,
                   CAST(SUM(t) AS DECIMAL(18,6)) AS entropy
            FROM term GROUP BY doc_id
        """,
        "hapax_ratio": """
            WITH ws AS (
                SELECT d.source, u.w AS w
                FROM (SELECT source,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
                      FROM documents) d, UNNEST(d.arr) AS u(w)
                WHERE u.w <> ''
            ),
            uni AS (SELECT source, w, COUNT(*) AS c FROM ws GROUP BY source, w)
            SELECT source, COUNT(*) AS n_types,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
                   CAST(ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                              / CAST(COUNT(*) AS DOUBLE), 6)
                        AS DECIMAL(18,6)) AS hapax_ratio
            FROM uni GROUP BY source
        """,
        "source_exclusivity": """
            WITH sh3 AS (
                SELECT DISTINCT source, shingle
                FROM (
                    SELECT source,
                           unnest([w[i] || '_' || w[i+1] || '_' || w[i+2]
                                   for i in range(1, len(w) - 1)]) AS shingle
                    FROM (SELECT source,
                                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                          FROM documents)
                ) WHERE shingle <> ''
            ),
            ns AS (SELECT shingle, COUNT(*) AS n_src FROM sh3 GROUP BY shingle)
            SELECT source, COUNT(*) AS n_shingles,
                   CAST(SUM(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive,
                   CAST(ROUND(SUM(CASE WHEN n_src = 1 THEN 1 ELSE 0 END)
                              / CAST(COUNT(*) AS DOUBLE), 6)
                        AS DECIMAL(18,6)) AS excl_ratio
            FROM sh3 JOIN ns USING (shingle) GROUP BY source
        """,
        "dist_drift": """
            WITH ws AS (
                SELECT d.lang, d.fa, u.w AS w
                FROM (SELECT lang, (doc_id % 2 = 0) AS fa,
                             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
                      FROM documents) d, UNNEST(d.arr) AS u(w)
                WHERE u.w <> ''
            ),
            cnt AS (SELECT lang, w,
                           SUM(CASE WHEN fa THEN 1 ELSE 0 END) AS c_a,
                           SUM(CASE WHEN NOT fa THEN 1 ELSE 0 END) AS c_b
                    FROM ws GROUP BY lang, w),
            tot AS (SELECT lang, SUM(c_a) AS na, SUM(c_b) AS nb FROM cnt GROUP BY lang),
            term AS (
                -- empty-population guard mirrors the operator: an empty
                -- side is the zero measure, never a division by zero
                SELECT cnt.lang, tot.na, tot.nb,
                       CAST(ROUND(ABS(
                           CASE WHEN tot.na > 0
                                THEN cnt.c_a / CAST(tot.na AS DOUBLE)
                                ELSE 0.0 END
                         - CASE WHEN tot.nb > 0
                                THEN cnt.c_b / CAST(tot.nb AS DOUBLE)
                                ELSE 0.0 END), 6)
                            AS DECIMAL(18,6)) AS t
                FROM cnt JOIN tot USING (lang)
            )
            SELECT lang, COUNT(*) AS n_types,
                   CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
                   CAST(SUM(t) AS DECIMAL(18,6)) AS l1_dist
            FROM term GROUP BY lang
        """,
        # ordered (asymmetric) pairs: same shingle/hot-cut CTEs as
        # dedup_jaccard but a <> b and |S(a)|-normalized
        "dedup_containment": f"""
            WITH {_SHINGLES_CTE},
            hot AS (
                SELECT shingle FROM shingles GROUP BY shingle
                HAVING COUNT(*) > (SELECT GREATEST(5, COUNT(*) // 100) FROM documents)
            ),
            sh AS (
                SELECT s.doc_id, s.shingle FROM shingles s
                ANTI JOIN hot h USING (shingle)
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                WHERE a.doc_id <> b.doc_id
                GROUP BY 1, 2
            ),
            scored AS (
                SELECT doc_a, doc_b, n_common,
                       CAST(ROUND(n_common / CAST(sa.n_sh AS DOUBLE), 6)
                            AS DECIMAL(18,6)) AS containment
                FROM common JOIN sizes sa ON sa.doc_id = doc_a
            )
            SELECT doc_a, doc_b, n_common, containment
            FROM scored WHERE containment >= 0.5
        """,
        "heavy_hitters": """
            SELECT item, est FROM (
                SELECT w AS item, COUNT(*) AS est,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rk
                FROM (
                    SELECT unnest(string_split(
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                        ' ')) AS w
                    FROM documents
                )
                WHERE w <> ''
                GROUP BY w
            ) WHERE rk <= 20
        """,
        "winnow_dedup": """
            WITH base AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                FROM documents
            ),
            sized AS (
                SELECT doc_id, w, len(w) AS n FROM base WHERE len(w) >= 5 + 4 - 1
            ),
            hashed AS (
                SELECT doc_id,
                       list_transform(range(1, n - 5 + 2),
                                      i -> md5(array_to_string(w[i:i+4], ' '))) AS h,
                       n - 5 + 1 AS m
                FROM sized
            ),
            fp AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(range(1, m - 4 + 2),
                              j -> list_aggregate(h[j:j+3], 'min')))) AS fp
                FROM hashed
            ),
            hot AS (
                SELECT fp FROM fp GROUP BY fp
                HAVING COUNT(*) > (SELECT GREATEST(5, COUNT(*) // 100) FROM documents)
            ),
            kept AS (SELECT f.doc_id, f.fp FROM fp f ANTI JOIN hot h USING (fp))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
            FROM kept a JOIN kept b ON a.fp = b.fp
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 2
        """,
        "shard_ntile": """
            SELECT source, CAST(shard AS INT) AS shard, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_weight
            FROM (SELECT source, n_chars,
                         ntile(8) OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS shard
                  FROM documents)
            GROUP BY source, shard
        """,
        "bpe_pairs": """
            WITH w AS (
                SELECT u.w AS word
                FROM (SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
                      FROM documents) d, UNNEST(d.arr) AS u(w)
                WHERE u.w <> ''
            ),
            wf AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
            p AS (
                SELECT substr(word, t.i, 1) AS x, substr(word, t.i + 1, 1) AS y, freq
                FROM wf, UNNEST(range(1, length(word))) AS t(i)
                WHERE length(word) >= 2
            )
            SELECT x, y, CAST(SUM(freq) AS BIGINT) AS cnt
            FROM p GROUP BY x, y
            ORDER BY cnt DESC, x, y LIMIT 50
        """,
        # The Spark side round-trips REAL RIFF/WAVE bytes (encode with a
        # JUNK chunk -> chunk-walk parse -> int16 deinterleave); the
        # oracle states the closed-form fixture samples directly. mean is
        # one exact-int-sum double division; rms is division + sqrt —
        # the same IEEE op sequence on both engines.
        "audio_decode_stats": """
            WITH s AS (
                SELECT d.doc_id,
                       CAST(8000 * (1 + d.doc_id % 3) AS INT) AS sample_rate,
                       CAST(1 + d.doc_id % 2 AS INT) AS n_channels,
                       CAST(24 + d.doc_id % 9 AS INT) AS n_frames,
                       ((d.doc_id * ((t.i % (1 + d.doc_id % 2)) + 1)
                         + 13 * (t.i // (1 + d.doc_id % 2))) % 4001) - 2000 AS v
                FROM documents d
                JOIN range(0, 64) t(i)
                  ON t.i < (24 + d.doc_id % 9) * (1 + d.doc_id % 2)
            )
            SELECT doc_id AS blob_id, sample_rate, n_channels, n_frames,
                   CAST(n_frames AS DOUBLE) / sample_rate AS duration_sec,
                   SUM(v)::DOUBLE / COUNT(*) AS mean_amp,
                   sqrt(SUM(v * v)::DOUBLE / COUNT(*)) AS rms
            FROM s
            GROUP BY doc_id, sample_rate, n_channels, n_frames
        """,
        # Spark round-trips REAL Y4M bytes (header tags, FRAME markers,
        # C420 plane sizing) and samples every 2nd frame; the oracle
        # states the closed-form luma pattern per sampled frame.
        "video_frame_stats": """
            WITH f AS (
                SELECT d.doc_id,
                       CAST(4 + 2 * (d.doc_id % 3) AS INT) AS width,
                       CAST(4 + 2 * (d.doc_id % 2) AS INT) AS height,
                       CAST(6 + d.doc_id % 5 AS INT) AS n_frames,
                       CAST(fr.f AS INT) AS frame_idx
                FROM documents d
                JOIN range(0, 10) fr(f)
                  ON fr.f < 6 + d.doc_id % 5 AND fr.f % 2 = 0
            )
            SELECT f.doc_id AS blob_id, width, height, n_frames, frame_idx,
                   SUM((f.doc_id + 31 * frame_idx + t.i) % 251)::DOUBLE
                       / (width * height) AS mean_y
            FROM f
            JOIN range(0, 48) t(i) ON t.i < width * height
            GROUP BY f.doc_id, width, height, n_frames, frame_idx
        """,
    }


if __name__ == "__main__":
    from hemera_indexer_spark.session import get_spark

    spark = get_spark("entry-smoke", cores=4, shuffle_partitions=8)
    df = entry(spark)
    print("entry rows:", df.count())
    df.show(5)
