"""Scalar helpers shared by the generator (plain Python), the oracle (plain
Python), and the engine (Spark Columns). Keeping the two implementations
side-by-side guarantees the partition/bucket math agrees everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- log partition
# The change-log partition of a doc. Must be computable in pure Python (the
# generator and oracle run without Spark) and in Spark SQL, so it uses the
# numeric doc suffix, not an engine-specific hash. Analog of the reference's
# block-range unit of work (/root/reference/indexer/controller/
# stream_controller.py:96-103).


def log_partition_py(doc_id: str, num_partitions: int) -> int:
    # LAST underscore-separated token = the numeric suffix; prefixes may
    # themselves contain underscores (tenant-scoped ids like "t1_doc_0001")
    return int(doc_id.rsplit("_", 1)[1]) % num_partitions


def log_partition_col(doc_id: Column, num_partitions: int) -> Column:
    return F.pmod(
        F.element_at(F.split(doc_id, "_"), -1).cast("long"),
        F.lit(num_partitions),
    ).cast("int")


# ---------------------------------------------------------------- storage bucket
# The storage bucket is engine-internal (only Spark ever computes it), so it
# uses xxhash64 — stable across Spark versions and JVM-side/codegen'd.
# Iceberg-analog: bucket(B, doc_id) partition transform.


def bucket_col(doc_id: Column, num_buckets: int) -> Column:
    return F.pmod(F.xxhash64(doc_id), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------------- hex codecs
# Analog of the reference's hex_str_to_bytes / bytes_to_hex_str converters
# (/root/reference/common/models/__init__.py:50-56) — JVM-side, not UDFs.


def hex_to_binary(col: Column) -> Column:
    return F.unhex(F.regexp_replace(col, "^0x", ""))


def binary_to_hex(col: Column) -> Column:
    return F.concat(F.lit("0x"), F.lower(F.hex(col)))
