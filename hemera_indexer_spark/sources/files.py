"""File sources/sinks — the reference's exporter/source family re-expressed
as Spark readers/writers.

- CSV change-log source with file-range pruning
  (/root/reference/indexer/jobs/source_job/csv_source_job.py:34-108 prunes
  ``{type}-{start}-{end}.csv`` files by block range before reading; here the
  seq range lives in the directory layout and Spark's partition discovery +
  footer stats do the pruning, with an explicit filename-range filter for
  CSV where no footer exists).
- Range-file sinks (/root/reference/indexer/exporters/
  csv_file_item_exporter.py:45-112 sorts by block number and splits into
  fixed ``blocks_per_file`` range files; json_file_item_exporter.py groups
  per range window): ``write_range_files`` assigns ``range_id =
  floor(seq / seqs_per_file)``, range-partitions so each range is one task,
  sorts within partitions, and writes one directory per range.
- Console sink (console_item_exporter.py) → ``df.show`` behind a function.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------- CSV source
_RANGE_RE = re.compile(r"-(\d+)-(\d+)\.csv$")


def prune_range_files(paths: list[str], lo: int, hi: int) -> list[str]:
    """Keep only ``*-{start}-{end}.csv`` files whose [start, end] overlaps
    [lo, hi] — driver-side filename pruning, the CSV analog of parquet
    footer-stat skipping."""
    out = []
    for p in paths:
        m = _RANGE_RE.search(os.path.basename(p))
        if m is None:
            out.append(p)
            continue
        start, end = int(m.group(1)), int(m.group(2))
        if start <= hi and end >= lo:
            out.append(p)
    return out


def read_csv_changelog(
    spark: SparkSession,
    csv_dir: str,
    schema: T.StructType,
    seq_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Read change events from range-named CSV files. ``tokens`` is carried
    as a JSON-ish string column in CSV (CSV has no arrays) and decoded
    JVM-side with from_json — no Python in the path."""
    paths = sorted(
        os.path.join(csv_dir, f)
        for f in os.listdir(csv_dir)
        if f.endswith(".csv")
    )
    if seq_range is not None:
        paths = prune_range_files(paths, *seq_range)
    if not paths:
        return spark.createDataFrame([], schema)
    flat_fields = [
        f if f.name != "tokens" else T.StructField("tokens", T.StringType(), True)
        for f in schema.fields
    ]
    df = spark.read.schema(T.StructType(flat_fields)).option("header", True).csv(paths)
    df = df.withColumn(
        "tokens", F.from_json(F.col("tokens"), T.ArrayType(T.IntegerType()))
    ).select(*schema.fieldNames())
    if seq_range is not None:
        df = df.where(F.col("seq").between(*seq_range))
    return df


# ---------------------------------------------------------------- file sinks
def write_range_files(
    df: DataFrame,
    out_dir: str,
    seqs_per_file: int = 1000,
    fmt: str = "csv",
    seq_col: str = "seq",
) -> None:
    """Sort by seq and emit one directory per fixed seq range —
    ``range_id=NNN/part-*.{csv,json}``. Ranges are range-partitioned so each
    is produced by one task with sorted content (the reference sorts then
    chunks in the driver; here both happen distributed)."""
    ranged = df.withColumn(
        "range_id", F.floor(F.col(seq_col) / F.lit(seqs_per_file)).cast("long")
    )
    out = ranged.repartitionByRange("range_id").sortWithinPartitions(
        "range_id", seq_col
    )
    if fmt == "csv":
        # CSV cannot carry arrays: encode them as JSON strings JVM-side
        for f in df.schema.fields:
            if isinstance(f.dataType, T.ArrayType):
                out = out.withColumn(f.name, F.to_json(F.col(f.name)))
        out.write.partitionBy("range_id").mode("overwrite").option(
            "header", True
        ).csv(out_dir)
    elif fmt == "json":
        out.write.partitionBy("range_id").mode("overwrite").json(out_dir)
    elif fmt == "orc":
        # columnar interchange sink: arrays survive natively, and ORC's
        # per-stripe min/max stats give downstream readers the same
        # footer-pruning physics as parquet (no JSON string detour)
        out.write.partitionBy("range_id").mode("overwrite").orc(out_dir)
    else:
        raise ValueError(f"unsupported sink format {fmt}")


def read_columnar_changelog(
    spark: SparkSession,
    in_dir: str,
    schema: T.StructType,
    seq_range: tuple[int, int] | None = None,
    seqs_per_file: int | None = None,
    fmt: str = "orc",
) -> DataFrame:
    """Read change events back from a columnar range-file sink
    (``write_range_files(fmt='orc')`` layout) — the columnar counterpart
    of the CSV source, with no JSON-string token detour.

    Pruning physics for a ``seq_range``: pass the sink's
    ``seqs_per_file`` and the derived ``range_id BETWEEN floor(lo/N),
    floor(hi/N)`` predicate becomes a PARTITION filter (directory
    pruning — untouched ranges are never listed, the columnar analog of
    ``prune_range_files``); the ``seq BETWEEN`` predicate additionally
    prunes stripes/row-groups via column stats inside kept
    directories. Without ``seqs_per_file`` only the stats-level pruning
    applies."""
    reader = spark.read.schema(
        T.StructType(
            list(schema.fields)
            + [T.StructField("range_id", T.LongType(), True)]
        )
    )
    df = reader.orc(in_dir) if fmt == "orc" else reader.parquet(in_dir)
    if seq_range is not None:
        lo, hi = seq_range
        if seqs_per_file:
            df = df.where(
                F.col("range_id").between(
                    lo // seqs_per_file, hi // seqs_per_file
                )
            )
        df = df.where(F.col("seq").between(lo, hi))
    return df.select(*schema.fieldNames())


def console_sink(df: DataFrame, n: int = 20) -> None:
    """Debug pretty-printer (console_item_exporter analog)."""
    df.show(n, truncate=80)
