"""Binary record decode — the ABI-decode analog.

The reference's main custom scalar function decodes EVM event logs
(topics+data byte blobs) into typed transfer records
(/root/reference/indexer/domain/token_transfer.py:106-242,
/root/reference/common/utils/abi_code_utils.py), dispatched by topic0 and
executed per row in Python. Here the same shape is Spark-first:

- ENCODE (for tests/fixtures) is pure JVM: fixed-offset byte packing with
  built-in functions — no UDF.
- DECODE is an Arrow-batched pandas UDF (`mapInPandas`): one numpy
  frombuffer + slicing pass per batch, no per-row Python — the pattern the
  reference's row-loop decode maps to at scale. Values wider than int64
  (uint256 analog) are returned as decimal-strings, mirroring the
  reference's NUMERIC(100) columns (/root/reference/common/models/
  blocks.py:18-22).

Record layout (fixed 44 bytes):
  [0:8)   seq        int64  big-endian
  [8:28)  address    20 raw bytes
  [28:44) amount     uint128 big-endian (uint256 analog, decimal-string out)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_LEN = 44

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("address", T.StringType(), False),  # 0x-hex
        T.StructField("amount", T.StringType(), False),  # decimal string
    ]
)


def encode_records(df: DataFrame, seq_col: str, addr_col: str, amount_col: str) -> DataFrame:
    """JVM-side fixed-offset packing: (long, 20-byte addr hex, long amount)
    → 44-byte binary record. Amount is packed into the low 8 of 16 bytes."""
    seq_bytes = F.unhex(F.lpad(F.hex(F.col(seq_col)), 16, "0"))
    addr_bytes = F.unhex(F.lpad(F.regexp_replace(F.col(addr_col), "^0x", ""), 40, "0"))
    amt_bytes = F.unhex(F.lpad(F.hex(F.col(amount_col)), 32, "0"))
    return df.withColumn(
        "record", F.concat(seq_bytes, addr_bytes, amt_bytes)
    )


def decode_records(df: DataFrame, record_col: str = "record") -> DataFrame:
    """Vectorized decode: per Arrow batch, one contiguous byte matrix and
    numpy slicing — no per-row Python."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            raw = np.frombuffer(
                b"".join(pdf[record_col]), dtype=np.uint8
            ).reshape(len(pdf), RECORD_LEN)
            seq = raw[:, 0:8].astype(np.uint64)
            seq_val = np.zeros(len(pdf), dtype=np.uint64)
            for i in range(8):
                seq_val = (seq_val << np.uint64(8)) | seq[:, i]
            addr = [
                "0x" + bytes(row).hex() for row in raw[:, 8:28]
            ]  # hex() is C-level per row; no Python arithmetic
            hi = np.zeros(len(pdf), dtype=np.uint64)
            lo = np.zeros(len(pdf), dtype=np.uint64)
            for i in range(8):
                hi = (hi << np.uint64(8)) | raw[:, 28 + i].astype(np.uint64)
                lo = (lo << np.uint64(8)) | raw[:, 36 + i].astype(np.uint64)
            amount = [
                str((int(h) << 64) | int(l)) for h, l in zip(hi, lo)
            ]
            yield pd.DataFrame(
                {
                    "seq": seq_val.astype(np.int64),
                    "address": addr,
                    "amount": amount,
                }
            )

    return df.select(record_col).mapInPandas(op, schema=DECODED_SCHEMA)
