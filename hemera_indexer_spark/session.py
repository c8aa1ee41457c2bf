"""SparkSession factory tuned for the CDC/ingest workload.

Local mode is a single JVM; on a real cluster the same config applies per
executor. AQE is on so skewed merge shuffles get re-planned at runtime
(the salting in operators/lww.py is the explicit fallback for pathological
keys, mirroring the skew note in SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hemera_indexer_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    executors: tuple[int, int, int] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: parallelism for local mode; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to max(cores, 32) — match cores locally, NOT
    the 200 default (wrong at both ends; see SURVEY.md §4).
    executors: (num_executors, cores_each, memory_mb) → use Spark's
    ``local-cluster`` master: N REAL executor JVMs with their own memory
    pools, Python workers and BlockManager shuffle endpoints — the faithful
    in-sandbox emulation of an N-executor cluster (``local[N]`` threads
    share one JVM and conflate executor scaling with thread scaling).
    """
    if executors is not None:
        n_exec, cores_each, mem_mb = executors
        master = f"local-cluster[{n_exec},{cores_each},{mem_mb}]"
        n = n_exec * cores_each
    elif cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # change-log epochs arrive as one file per log partition; splitting
        # them at row-group boundaries keeps scan parallelism ∝ cores even
        # when partitions ≪ cores (files are written with 50k-row groups)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get(
                "SPARK_MAX_PARTITION_BYTES",
                # scan splits must outnumber cores even for modest inputs:
                # scale split size inversely with parallelism
                str(max(128 // n, 8) * 1024 * 1024),
            ),
        )
        # less aggressive AQE post-shuffle coalescing: target partition
        # sizes small enough that reduce-stage task count tracks cores
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # fewer, larger Arrow batches through the pandas-UDF reduce
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_ARROW_BATCH", "65536"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # On a real cluster shuffle I/O scales with executor count (each node
        # brings its own disks); in single-box local mode a tmpfs scratch dir
        # ($SPARK_LOCAL_DIR) is the honest proxy for that when measuring
        # core-scaling. Defaults to the system temp dir.
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIR", "/tmp"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # output-committer v2: task commit moves files into place directly.
        # v1's commitJob renames every task's output SERIALLY on the driver —
        # O(bucket-file-count) driver-side work per commit that grows with
        # the table's bucket count and doesn't scale with executors. The
        # atomicity v1 buys is redundant here: the snapshot pointer flip is
        # the transactional boundary, and half-written commit dirs are
        # unreachable orphans by design (see lake/table.py).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # InferFiltersFromGenerate copies a Generate's input expression into
        # an inferred `size(e) > 0 AND isnotnull(e)` filter, which pushdown
        # then moves below any exchange. For the span/shingle pipelines the
        # generator input is a transform(...) -> md5 array over the whole
        # document, so the corpus pays that array THREE times (twice in the
        # single-task pre-exchange filter, once post-exchange) — measured
        # 2.6s -> 0.24s on the sf0.1 span explode with the rule excluded.
        # Excluding an optimizer rule never changes results (the rule only
        # ADDS inferred filters); the cost is losing scan-level pruning for
        # explodes of STORED array columns that are often null/empty, which
        # no table in this engine has.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if executors is not None:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            builder.config("spark.executor.memory", f"{executors[2]}m")
            .config("spark.executorEnv.PYTHONPATH", repo_root)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
