"""Recursive call-tree flatten — the debug-trace export analog.

The reference walks an arbitrary-depth geth ``debug_trace`` call tree and
flattens it into rows carrying the path-encoded ``trace_address``
(/root/reference/indexer/jobs/export_traces_job.py:88-120, recursing on
``calls`` and appending the child index to ``trace_address``). A statically
typed Spark schema cannot express an unbounded recursive struct, so the
tree rides in a JSON string column (exactly what the RPC returns) and the
flatten is a ``mapInPandas`` operator: Arrow-batched transfer, one
iterative DFS per tree (explicit stack, no Python recursion limit), rows
appended to flat columnar buffers. JSON parsing is per-tree — the same
boundary the reference pays — but batching, transfer and output assembly
are vectorized, and the operator handles ANY depth/fan-out.

Node shape: ``{"op": str, "value": int, "calls": [child, ...]}``.
Output: one row per node with (id, trace_address "0/1/...", depth, op,
value) — root has trace_address '' and depth 0.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FLAT_TRACE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("trace_address", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("value", T.LongType(), True),
    ]
)


def flatten_call_tree(
    df: DataFrame, tree_col: str = "trace", id_col: str = "id"
) -> DataFrame:
    """Flatten every row's JSON call tree into one row per call. Children
    keep their position index in the path (depth-first, pre-order)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids: list[int] = []
            paths: list[str] = []
            depths: list[int] = []
            ops: list = []
            values: list = []
            for rid, tree in zip(pdf[id_col], pdf[tree_col]):
                stack = [(json.loads(tree), "", 0)]
                while stack:
                    node, path, depth = stack.pop()
                    ids.append(int(rid))
                    paths.append(path)
                    depths.append(depth)
                    ops.append(node.get("op"))
                    values.append(node.get("value"))
                    kids = node.get("calls") or []
                    # push reversed so pop() walks children in order
                    for i in range(len(kids) - 1, -1, -1):
                        p = f"{path}/{i}" if path else str(i)
                        stack.append((kids[i], p, depth + 1))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "trace_address": paths,
                    "depth": pd.Series(depths, dtype="int32"),
                    "op": ops,
                    "value": pd.Series(values, dtype="Int64"),
                }
            )

    return df.select(id_col, tree_col).mapInPandas(op, schema=FLAT_TRACE_SCHEMA)
