"""Per-file key Bloom filters (`bloom.key.bits` / `set_bloom` /
`create(bloom_bits=)`): point lookups must skip files whose bloom proves
the probed keys absent, must NEVER change results (false positives only
keep extra files; false negatives are impossible), and entries written
under different (m, k) settings — or none — must prune correctly side by
side. Same safety shape as zone maps, but on the per-key-immutable key
column, so the mutable-column fold hazard cannot arise."""

import pytest
from pyspark.sql import types as T

from hemera_indexer_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("val", T.StringType()),
    ]
)


def _mk(spark, root, n_epochs=5, per_epoch=8, **create_kw):
    t = LakeTable.create(spark, root, SCHEMA, num_buckets=2, **create_kw)
    for e in range(n_epochs):
        # disjoint key ranges per epoch -> each delta file holds only its
        # epoch's keys, so a key's bloom should prune the other epochs
        rows = [
            (f"d{e}-{i}", e * 100 + i + 1, f"v{e}-{i}", "upsert")
            for i in range(per_epoch)
        ]
        t.merge_upsert(
            spark.createDataFrame(
                rows, "doc_id string, seq long, val string, op string"
            ),
            epoch_id=e,
        )
    return t


def _bucket_files(t, key):
    b = t.spark.sql(
        f"SELECT pmod(xxhash64(?), {t.num_buckets}) AS b", args=[key]
    ).collect()[0]["b"]
    return t._select_files(buckets={b})


def test_write_stamps_blooms(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b1"), bloom_bits=1024, bloom_hashes=3)
    files = t.snapshot["files"]
    assert files and all(f.get("kbloom") for f in files)
    for f in files:
        kb = f["kbloom"]
        assert kb["m"] == 1024 and kb["k"] == 3
        import base64

        assert len(base64.b64decode(kb["b64"])) == 1024 // 8


def test_lookup_prunes_and_matches(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b2"), bloom_bits=2048)
    key = "d2-3"
    files = _bucket_files(t, key)
    kept = t._bloom_keep(files, [key])
    # the key was written exactly once -> at most a couple of files can
    # really hold it; bloom must prune most of the bucket's delta files
    assert len(kept) < len(files)
    got = [tuple(r) for r in t.lookup(key).collect()]
    want = [
        tuple(r)
        for r in t.current_state().where(f"doc_id = '{key}'").collect()
    ]
    assert got == want and len(got) == 1


def test_no_false_negatives_exhaustive(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b3"), n_epochs=3, bloom_bits=512)
    state = {r["doc_id"]: tuple(r) for r in t.current_state().collect()}
    for key, row in state.items():
        got = [tuple(r) for r in t.lookup(key).collect()]
        assert got == [row], key


def test_lookup_many_prunes_and_matches(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b4"), bloom_bits=2048)
    keys = ["d0-1", "d3-5", "d4-0"]
    got = sorted(tuple(r) for r in t.lookup_many(keys).collect())
    cs = t.current_state()
    want = sorted(
        tuple(r) for r in cs.where(cs.doc_id.isin(keys)).collect()
    )
    assert got == want and len(got) == 3
    all_files = t._select_files()
    kept = t._bloom_keep(all_files, keys)
    assert len(kept) < len(all_files)


def test_opt_in_midlife_mixed_families(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b5"), n_epochs=2)  # no blooms yet
    assert not any(f.get("kbloom") for f in t.snapshot["files"])
    t.set_bloom(1024, hashes=2)
    t.merge_upsert(
        spark.createDataFrame(
            [("mid-1", 900, "m", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    t.set_bloom(4096, hashes=5)
    t.merge_upsert(
        spark.createDataFrame(
            [("late-1", 950, "l", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=3,
    )
    fams = {
        (f["kbloom"]["m"], f["kbloom"]["k"])
        for f in t.snapshot["files"]
        if f.get("kbloom")
    }
    assert fams == {(1024, 2), (4096, 5)}
    # unbloomed files are always kept; mixed families prune correctly
    for key in ("d0-0", "d1-7", "mid-1", "late-1"):
        got = [tuple(r) for r in t.lookup(key).collect()]
        want = [
            tuple(r)
            for r in t.current_state().where(f"doc_id = '{key}'").collect()
        ]
        assert got == want and len(got) == 1


def test_compaction_backfills_blooms(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b6"), n_epochs=3)
    t.set_bloom(1024)
    assert t.compact()
    assert all(f.get("kbloom") for f in t.snapshot["files"])
    got = [tuple(r) for r in t.lookup("d1-2").collect()]
    assert len(got) == 1 and got[0][0] == "d1-2"


def test_disable_stops_stamping(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b7"), n_epochs=1, bloom_bits=512)
    t.set_bloom(0)
    t.merge_upsert(
        spark.createDataFrame(
            [("off-1", 990, "o", "upsert")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=1,
    )
    kinds = [bool(f.get("kbloom")) for f in t.snapshot["files"]]
    assert any(kinds) and not all(kinds)
    assert [r["doc_id"] for r in t.lookup("off-1").collect()] == ["off-1"]


def test_long_keys_hash_consistently(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("val", T.StringType()),
        ]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "b8"),
        schema,
        num_buckets=2,
        key_col="k",
        bloom_bits=1024,
    )
    for e in range(3):
        t.merge_upsert(
            spark.createDataFrame(
                [(e * 10 + i, e * 100 + i + 1, f"v{e}", "upsert") for i in range(5)],
                "k long, seq long, val string, op string",
            ),
            epoch_id=e,
        )
    got = [tuple(r) for r in t.lookup(21).collect()]
    want = [tuple(r) for r in t.current_state().where("k = 21").collect()]
    assert got == want and len(got) == 1
    files = t._select_files()
    assert len(t._bloom_keep(files, [21])) < len(files)


def test_long_key_lookup_without_bloom(spark, tmp_path):
    """Regression: the parameterized bucket probe used to bind a Python
    int as INT while the stored BIGINT column hashed as LONG — lookup on
    an integer-keyed table scanned the wrong bucket and silently returned
    empty. The probe now CASTs to the key column's exact type."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("is_deleted", T.BooleanType(), False),
            T.StructField("val", T.StringType()),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "b13"), schema, num_buckets=4, key_col="k"
    )
    t.merge_upsert(
        spark.createDataFrame(
            [(i, i + 1, f"v{i}", "upsert") for i in range(20)],
            "k long, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    for key in (0, 7, 19):
        got = [tuple(r) for r in t.lookup(key).collect()]
        assert got == [(key, key + 1, f"v{key}")], key
    got = sorted(tuple(r) for r in t.lookup_many([3, 11]).collect())
    assert [r[0] for r in got] == [3, 11]
    hist = t.key_history(5)
    assert hist and hist[-1]["row"]["val"] == "v5"


def test_deleted_key_stays_deleted(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b9"), n_epochs=2, bloom_bits=1024)
    t.merge_upsert(
        spark.createDataFrame(
            [("d0-1", 999, None, "delete")],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=2,
    )
    assert t.lookup("d0-1").collect() == []


def test_fact_table_lookup_prunes(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "b10"),
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("seq", T.LongType()),
                T.StructField("val", T.StringType()),
            ]
        ),
        num_buckets=2,
        properties={"table_type": "fact"},
        bloom_bits=1024,
    )
    for e in range(4):
        t.insert_if_absent(
            spark.createDataFrame(
                [(f"f{e}-{i}", e * 10 + i + 1, f"v{e}") for i in range(6)],
                "doc_id string, seq long, val string",
            ),
            epoch_id=e,
        )
    keys = ["f1-2", "f3-5"]
    got = sorted(tuple(r) for r in t.lookup_many(keys).collect())
    raw = t.read()
    want = sorted(
        tuple(r) for r in raw.where(raw.doc_id.isin(keys)).collect()
    )
    assert got == want and len(got) == 2
    files = t._select_files()
    assert len(t._bloom_keep(files, keys)) < len(files)


def test_special_character_keys(spark, tmp_path):
    """Probe values ride as BOUND parameters end to end (bucket hash,
    bloom positions, predicate literal) — keys holding quotes,
    backslashes, commas or non-ASCII must hash identically to their
    write-side column values and round-trip through lookup."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "b14"),
        SCHEMA,
        num_buckets=2,
        bloom_bits=1024,
    )
    keys = ['a"b', "a'b", "a\\b", "héllo-世界", "a,b(c)", "?:x"]
    t.merge_upsert(
        spark.createDataFrame(
            [(k, i + 1, f"v{i}", "upsert") for i, k in enumerate(keys)],
            "doc_id string, seq long, val string, op string",
        ),
        epoch_id=0,
    )
    for i, k in enumerate(keys):
        got = [tuple(r) for r in t.lookup(k).collect()]
        assert got == [(k, i + 1, f"v{i}")], k
    got = sorted(r["doc_id"] for r in t.lookup_many(keys).collect())
    assert got == sorted(keys)


def test_create_rejects_bad_params(spark, tmp_path):
    with pytest.raises(ValueError):
        LakeTable.create(
            spark, str(tmp_path / "b11"), SCHEMA, bloom_bits=-1
        )
    t = _mk(spark, str(tmp_path / "b12"), n_epochs=1)
    with pytest.raises(ValueError):
        t.set_bloom(128, hashes=0)
