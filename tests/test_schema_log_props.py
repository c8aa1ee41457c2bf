"""Property tests for the schema-log name-mapping walks (pure Python —
no Spark). Ground truth: every column is an IDENTITY (what Iceberg's
field IDs make explicit); adds mint identities, renames move an
identity's name, drops kill it. The walks must agree with the identity
model:

- `_physical_name(c, s, log)`: the name current column c's identity bore
  at generation s, or None if that identity did not exist yet.
- `_resolve_stale(n, log)`: EARLIEST-binding writer resolution — the
  current name of the identity that FIRST bore n in the log's history
  (None if it was dropped), with a re-add of n after its drop rebinding
  to the new incarnation. (A writer carries no generation stamp, so
  earliest-binding is the defined semantics; an exact current-schema
  match always wins before the walk runs — that case is the caller's.)
"""

import random

from hypothesis import given, settings, strategies as st

from hemera_indexer_spark.lake.table import LakeTable

NAMES = ["a", "b", "c", "d", "e"]


def _gen_history(seed, steps):
    """Random valid op sequence + per-generation identity snapshots."""
    rng = random.Random(seed)
    next_id = [0]
    cur: dict[str, int] = {}
    # start with two columns
    log: list[dict] = []
    gens: list[dict] = []
    for n in NAMES[:2]:
        cur[n] = next_id[0]
        next_id[0] += 1
    gens.append(dict(cur))  # generation 0
    sid = 0
    for _ in range(steps):
        ops = []
        free = [n for n in NAMES if n not in cur]
        if free:
            ops.append("add")
        if cur:
            ops.append("drop")
        if cur and free:
            ops.append("rename")
        op = rng.choice(ops)
        sid += 1
        if op == "add":
            n = rng.choice(free)
            cur[n] = next_id[0]
            next_id[0] += 1
            log.append({"sid": sid, "op": "add", "cols": [n]})
        elif op == "drop":
            n = rng.choice(sorted(cur))
            del cur[n]
            log.append({"sid": sid, "op": "drop", "col": n})
        else:
            old = rng.choice(sorted(cur))
            new = rng.choice(free)
            cur[new] = cur.pop(old)
            log.append({"sid": sid, "op": "rename", "old": old, "new": new})
        gens.append(dict(cur))
    return log, gens


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10**6), st.integers(1, 12))
def test_physical_name_matches_identity_model(seed, steps):
    log, gens = _gen_history(seed, steps)
    current = gens[-1]
    for s, gen_s in enumerate(gens):
        inv_s = {i: n for n, i in gen_s.items()}
        for c, ident in current.items():
            got = LakeTable._physical_name(c, s, log)
            want = inv_s.get(ident)  # None: identity postdates the file
            assert got == want, (seed, steps, s, c, log)


def _spec_resolve(n, log, gens):
    """Reference spec over the identity snapshots: bind to the identity
    of n's FIRST binding (generation 0 or its first add); follow that
    identity through renames; when it dies, rebind ONLY to a later
    re-ADD of n (a rename of some other identity INTO the freed name n
    must NOT capture stale writers — that would cross-wire identities);
    repeat. The final identity's current name is the answer; None if the
    last incarnation died unreplaced."""
    # first binding: the identity bearing n at the first generation where
    # n exists — however it arose (table creation, add, or a rename of
    # another identity INTO the fresh name n)
    g = next((h for h, gen in enumerate(gens) if n in gen), None)
    if g is None:
        return None  # never existed
    ident = gens[g][n]
    while True:
        death = None
        for h in range(g + 1, len(gens)):
            if ident not in gens[h].values():
                death = h
                break
        if death is None:
            return {i: c for c, i in gens[-1].items()}[ident]
        nxt = None
        for i in range(death - 1, len(log)):
            if log[i]["op"] == "add" and n in log[i]["cols"]:
                nxt = i + 1
                break
        if nxt is None:
            return None
        g, ident = nxt, gens[nxt][n]


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10**6), st.integers(1, 12))
def test_writer_resolution_matches_identity_spec(seed, steps):
    """API-level semantics (resolve_writer_column): an exact
    current-schema match wins outright; otherwise the stale-name walk
    must agree with the identity spec."""
    log, gens = _gen_history(seed, steps)
    current = gens[-1]
    for n in NAMES:
        if n in current:
            continue  # exact match: the walk never runs at the API level
        got = LakeTable._resolve_stale(n, log)
        if not any(n in g for g in gens):
            # name never existed: unchanged (new column — additive land)
            assert got == n, (seed, steps, n, log)
            continue
        want = _spec_resolve(n, log, gens)
        assert got == want, (seed, steps, n, log, gens)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 10**6), st.integers(1, 12))
def test_physical_mapping_is_injective_per_generation(seed, steps):
    """Two current columns can never map to the same physical name in
    the same file generation — the read select would silently duplicate
    one column's bytes into another."""
    log, gens = _gen_history(seed, steps)
    current = gens[-1]
    for s in range(len(gens)):
        phys = [
            LakeTable._physical_name(c, s, log) for c in sorted(current)
        ]
        present = [p for p in phys if p is not None]
        assert len(present) == len(set(present)), (seed, steps, s, log)
