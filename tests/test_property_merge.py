"""Property-based check of the upsert law: for ANY event sequence (ops,
duplicates, interleavings) and ANY split into ordered batches, replaying
through merge_upsert yields exactly the oracle fold. Complements the fixed
seeded e2e test with adversarial shapes."""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hemera_indexer_spark.lake import LakeTable
from hemera_indexer_spark.schemas import SEQUENCES_SCHEMA

DOCS = [f"doc_{i:08d}" for i in range(6)]

event_st = st.tuples(
    st.integers(0, len(DOCS) - 1),           # doc index
    st.sampled_from(["insert", "update", "delete"]),
    st.lists(st.integers(0, 999), min_size=0, max_size=4),  # tokens
)


def _oracle(events):
    state = {}
    for seq, (di, op, toks) in enumerate(events, start=1):
        k = DOCS[di]
        cur = state.get(k)
        if cur is not None and seq <= cur[0]:
            continue
        if op == "delete":
            state[k] = (seq, None, True)
        else:
            state[k] = (seq, toks, False)
    return {
        k: (v[0], v[1]) for k, v in state.items() if not v[2]
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_st, min_size=1, max_size=40),
    split=st.integers(0, 40),
    replay_first=st.booleans(),
)
def test_merge_matches_oracle_fold(spark, tmp_path_factory, events, split, replay_first):
    root = str(tmp_path_factory.mktemp("prop_lake"))
    table = LakeTable.create(spark, root, SEQUENCES_SCHEMA, num_buckets=4)

    rows = [
        (seq, DOCS[di], op, toks if op != "delete" else None,
         len(toks) if op != "delete" else None, "web")
        for seq, (di, op, toks) in enumerate(events, start=1)
    ]
    schema = "seq long, doc_id string, op string, tokens array<int>, n_tok int, source string"
    cut = min(split, len(rows))
    batches = [rows[:cut], rows[cut:]]
    for b in batches:
        if not b:
            continue
        table.merge_upsert(spark.createDataFrame(b, schema))
    if replay_first and batches[0]:
        # duplicate re-delivery of the whole first batch — must be a no-op
        table.merge_upsert(spark.createDataFrame(batches[0], schema))

    expected = _oracle(events)
    got = {
        r["doc_id"]: (r["seq"], r["tokens"])
        for r in table.current_state().collect()
    }
    assert got == expected
