"""The cluster submission surface (BASELINE: "submitted via spark-submit
--py-files"): build dist/hemera_indexer_spark.zip, spark-submit a driver
that replays a change log through the engine with the package resolved
ONLY from --py-files, and verify the final state against the pure-Python
oracle inside the submitted process."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("WARN")

# the package must resolve from the --py-files zip, not the repo checkout
import hemera_indexer_spark
assert "hemera_indexer_spark.zip" in hemera_indexer_spark.__file__, (
    hemera_indexer_spark.__file__
)

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.oracle import expected_live_rows
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA
from hemera_indexer_spark.streaming import StreamController

log_dir, lake_dir = sys.argv[1], sys.argv[2]
t = LakeTable.create(spark, lake_dir, SEQUENCES_SCHEMA, num_buckets=8)
StreamController(spark, t, log_dir, 4).run()
exp = expected_live_rows(log_dir, 4)
got = sorted(
    (r.asDict(recursive=True) for r in t.current_state().collect()),
    key=lambda d: d["doc_id"],
)
assert len(got) == len(exp), (len(got), len(exp))
assert all(g["tokens"] == e["tokens"] for g, e in zip(got, exp))
print("SUBMIT_ORACLE_MATCH", len(got))
"""


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_replay(tmp_path):
    # 1. build the zip
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    # 2. generate a tiny log (pure Python, no Spark)
    sys.path.insert(0, REPO)
    from hemera_indexer_spark.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    spec = ChangelogSpec(
        n_docs=150,
        n_epochs=4,
        events_per_epoch=250,
        n_partitions=4,
        seed=7,
        schema_evolution_epoch=2,
        rollback_epochs=(3,),
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)

    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)

    # 3. submit with the package available ONLY via --py-files
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    res = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            str(driver),
            log_dir,
            str(tmp_path / "lake"),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo root: the zip must supply the pkg
        env=env,
        timeout=420,
    )
    assert "SUBMIT_ORACLE_MATCH" in res.stdout, (
        res.stdout[-2000:] + "\n" + res.stderr[-4000:]
    )
