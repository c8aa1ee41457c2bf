"""LakeCatalog: a named-table registry with ATOMIC multi-table publish.

Each ``LakeTable`` has a single transactional boundary — its own version
pointer. That is enough for one table, but a CDC pipeline routinely needs
a pair of tables to move together (state + its secondary index, facts +
the curated view, two tenants' shards after a coordinated repair): if the
controller crashes between the two pointer flips, direct readers of each
table are fine but any consumer that JOINS them sees a torn pair.

The catalog closes that gap the way Iceberg's REST-catalog multi-table
transactions do (reference analog: hemera's fix_record single-writer lock
covers only one PG schema; cross-entity consistency there comes from one
database transaction — here the catalog pointer plays that role):

- the catalog is itself versioned metadata: ``cat-<v>.json`` maps
  table name -> (root, pinned version), flipped by the same
  compare-and-swap ``VERSION`` pointer discipline as a table;
- writers stage per-table commits with the existing write-audit-publish
  machinery (``merge_upsert(wap_id=...)``), audit them, then call
  ``publish_all``;
- ``publish_all`` writes a durable INTENT file (which doubles as the
  single-in-flight-transaction lock), publishes every stage, then CASes
  the catalog pointer and removes the intent. A crash anywhere in the
  middle leaves the OLD catalog snapshot fully readable — catalog readers
  resolve tables ``as_of`` their pinned versions, so a half-published
  transaction is invisible to them — and ``recover()`` re-drives the
  intent to completion (idempotent: already-published steps are detected
  by their target version and skipped).

Read side: ``read_view()`` returns every table pinned at one catalog
version — a cross-table-consistent snapshot, the multi-table analog of
``as_of``. Direct ``LakeTable.load`` readers keep per-table
read-committed semantics, unchanged.

Scale note: the catalog stores POINTERS only (a few hundred bytes per
table); publish cost is one fsync'd rename per table plus one for the
catalog regardless of data volume, and nothing here touches Spark jobs.

Retention contract: catalog readers resolve tables ``as_of`` pinned
versions, so each table's ``expire_snapshots(keep_last=)`` must retain at
least as many versions as the catalog lags behind the table head.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession

from .table import (
    ConcurrentCommitError,
    LakeTable,
    _atomic_write,
    _publish_exclusive,
)

VERSION_FILE = "VERSION"
TXN_FILE = "txn.json"


class CatalogTxnError(RuntimeError):
    """A multi-table transaction is pending (crashed mid-publish or still
    running elsewhere); call ``recover()`` before starting another."""


class LakeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._snapshot: dict | None = None

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(cls, spark: SparkSession, root: str) -> "LakeCatalog":
        cat = cls(spark, root)
        os.makedirs(root, exist_ok=True)
        if os.path.exists(os.path.join(root, VERSION_FILE)):
            raise ConcurrentCommitError(f"catalog already exists at {root}")
        cat._write({"version": 0, "parent": None, "tables": {}})
        return cat

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeCatalog":
        cat = cls(spark, root)
        cat.refresh()
        return cat

    def refresh(self) -> dict:
        with open(os.path.join(self.root, VERSION_FILE)) as f:
            v = self._probe_head(int(f.read().strip()))
        with open(os.path.join(self.root, f"cat-{v:010d}.json")) as f:
            self._snapshot = json.load(f)
        return self._snapshot

    def _probe_head(self, v: int) -> int:
        """Same discipline as LakeTable: the commit point is the claimed
        cat file; VERSION is a probe-forward fast-path cache."""
        while os.path.exists(
            os.path.join(self.root, f"cat-{v + 1:010d}.json")
        ):
            v += 1
        return v

    @property
    def snapshot(self) -> dict:
        if self._snapshot is None:
            self.refresh()
        return self._snapshot

    def _write(self, snap: dict) -> None:
        """CAS on the catalog pointer, same discipline as the table's."""
        vpath = os.path.join(self.root, VERSION_FILE)
        if snap["parent"] is None:
            if os.path.exists(vpath):
                raise ConcurrentCommitError(
                    f"catalog already exists at {self.root}"
                )
        else:
            with open(vpath) as f:
                cur = self._probe_head(int(f.read().strip()))
            if cur != snap["parent"]:
                raise ConcurrentCommitError(
                    f"catalog moved to {cur}, expected {snap['parent']}"
                )
        # the exclusive claim IS the commit (one winner per version —
        # a concurrent register()/advance() loses loudly, never clobbers)
        if not _publish_exclusive(
            os.path.join(self.root, f"cat-{snap['version']:010d}.json"),
            json.dumps(snap),
        ):
            raise ConcurrentCommitError(
                f"catalog version {snap['version']} was claimed by a "
                f"concurrent committer"
            )
        _atomic_write(vpath, str(snap["version"]))
        self._snapshot = snap

    # ------------------------------------------------------------- registry
    def register(self, name: str, table_root: str) -> None:
        """Enroll a table at its CURRENT version (one catalog commit)."""
        snap = self.snapshot
        if name in snap["tables"]:
            raise ValueError(f"table {name!r} already registered")
        t = LakeTable.load(self.spark, table_root)
        tables = dict(snap["tables"])
        tables[name] = {"root": table_root, "version": t.snapshot["version"]}
        self._write(
            {
                "version": snap["version"] + 1,
                "parent": snap["version"],
                "tables": tables,
            }
        )

    def versions(self) -> dict[str, int]:
        return {n: e["version"] for n, e in self.snapshot["tables"].items()}

    def advance(self, names: list[str] | None = None) -> dict[str, int]:
        """Re-pin tables at their CURRENT versions in ONE catalog commit —
        the read-side companion to ``publish_all`` for pipelines whose
        writes are already individually consistent (e.g. a controller
        that commits state then syncs its index sinks: calling
        ``advance(["state", "index"])`` after the sync exposes the pair
        to catalog readers as one atomic step). Returns the new pinned
        versions. No-op (no catalog commit) when nothing moved."""
        snap = self.snapshot
        picked = names if names is not None else sorted(snap["tables"])
        tables = {n: dict(e) for n, e in snap["tables"].items()}
        moved = False
        for name in picked:
            e = self._entry(name)
            v = LakeTable.load(self.spark, e["root"]).snapshot["version"]
            if v != tables[name]["version"]:
                tables[name]["version"] = v
                moved = True
        if not moved:
            return self.versions()
        self._write(
            {
                "version": snap["version"] + 1,
                "parent": snap["version"],
                "tables": tables,
            }
        )
        return self.versions()

    def live_table(self, name: str) -> LakeTable:
        """The table's CURRENT state — per-table read-committed; may be
        ahead of the catalog's pinned version."""
        return LakeTable.load(self.spark, self._entry(name)["root"])

    def table(self, name: str) -> LakeTable:
        """The table AS THE CATALOG SEES IT: a read-only handle pinned to
        the cataloged version — never shows a half-published transaction."""
        e = self._entry(name)
        return LakeTable.load(self.spark, e["root"]).as_of(e["version"])

    def read_view(self) -> dict[str, LakeTable]:
        """Every table pinned at ONE catalog version — the cross-table-
        consistent snapshot joins should run against."""
        return {n: self.table(n) for n in self.snapshot["tables"]}

    def register_views(
        self, prefix: str = "", strategy: str = "sql"
    ) -> dict[str, int]:
        """Register every catalog table as a ``spark.sql`` temp view at
        its PINNED catalog version — the SQL face of ``read_view()``: all
        views belong to ONE catalog snapshot, so cross-view joins can
        never see a torn multi-table transaction, and a concurrent
        ``publish_all`` (or a table head racing ahead of the catalog) is
        invisible until the catalog pointer advances AND the views are
        re-registered. Returns ``{view_name: pinned_table_version}``."""
        return {
            prefix + n: t.register_view(prefix + n, strategy=strategy)
            for n, t in self.read_view().items()
        }

    def _entry(self, name: str) -> dict:
        try:
            return self.snapshot["tables"][name]
        except KeyError:
            raise KeyError(
                f"table {name!r} not in catalog; registered: "
                f"{sorted(self.snapshot['tables'])}"
            ) from None

    def fsck(self, tables_deep: bool = False) -> dict:
        """Catalog integrity audit — READ-ONLY. The failure mode this
        exists to catch preemptively: a member table's
        ``expire_snapshots`` dropping a version the catalog still PINS,
        which turns every ``table()``/``read_view()`` resolve into a
        FileNotFoundError at read time. Checks per entry: the table root
        loads, the pinned version's snapshot file is still retained, and
        the pin is not ahead of the table's head (a torn external edit).
        Also flags a lingering publish intent (``txn.json`` present —
        a crashed ``publish_all``; run ``recover()``). ``tables_deep``
        cascades each member table's own ``fsck()`` (metadata level) and
        rolls the issues up under its name."""
        issues: list[dict] = []
        snap = self.snapshot
        if os.path.exists(os.path.join(self.root, TXN_FILE)):
            issues.append(
                {"kind": "pending_intent",
                 "detail": "txn.json present — crashed publish_all; "
                           "run recover()"}
            )
        cascaded = 0
        for name, e in sorted(snap["tables"].items()):
            vfile = os.path.join(e["root"], "meta", VERSION_FILE)
            if not os.path.exists(vfile):
                issues.append(
                    {"kind": "table_missing", "table": name,
                     "detail": e["root"]}
                )
                continue
            spath = os.path.join(
                e["root"], "meta", f"snap-{e['version']:010d}.json"
            )
            if not os.path.exists(spath):
                issues.append(
                    {
                        "kind": "pinned_version_expired",
                        "table": name,
                        "detail": f"catalog pins v{e['version']} but the "
                                  "table expired it — pinned reads 404; "
                                  "advance() the catalog or retain more "
                                  "history",
                    }
                )
            with open(vfile) as f:
                head = int(f.read().strip())
            if e["version"] > head:
                issues.append(
                    {
                        "kind": "pin_ahead_of_head",
                        "table": name,
                        "detail": f"pin v{e['version']} > head v{head}",
                    }
                )
            if tables_deep and os.path.exists(vfile):
                t = LakeTable.load(self.spark, e["root"])
                rep = t.fsck()
                cascaded += 1
                for i in rep["issues"]:
                    issues.append({**i, "table": name})
        return {
            "ok": not issues,
            "issues": issues,
            "checked": {
                "catalog_version": snap["version"],
                "tables": len(snap["tables"]),
                "tables_deep": cascaded,
            },
        }

    def expire(self, keep_last: int = 64) -> int:
        """Drop catalog snapshot files older than the newest ``keep_last``
        versions (the catalog's ``expire_snapshots`` analog). The catalog
        commits once per ``advance``/``publish_all`` — per committed group
        under a controller — so without expiry the one-json-per-commit
        metadata grows unboundedly at the 10^10-event design point. The
        current snapshot is always retained; readers only ever resolve
        the pointer's version, so expiry never breaks a live reader."""
        cur = self.snapshot["version"]
        cutoff = cur - max(keep_last, 1) + 1
        removed = 0
        for fn in os.listdir(self.root):
            if not (fn.startswith("cat-") and fn.endswith(".json")):
                continue
            v = int(fn[4:-5])
            if v < cutoff and v != cur:
                os.remove(os.path.join(self.root, fn))
                removed += 1
        return removed

    # ------------------------------------------------- multi-table publish
    def publish_all(self, stages: dict[str, str]) -> dict[str, int]:
        """Atomically publish one staged (write-audit-publish) commit per
        table: ``{table_name: wap_id}`` -> ``{table_name: new_version}``.

        Fail-fast validation first (every stage exists and its parent is
        the table's live head) so a bad transaction publishes NOTHING;
        then intent -> per-table publish -> catalog CAS. The intent file
        is also the lock: one in-flight transaction at a time, and a
        pending one must be ``recover()``-ed first."""
        if not stages:
            raise ValueError("publish_all requires at least one stage")
        txn_path = os.path.join(self.root, TXN_FILE)
        if os.path.exists(txn_path):  # fail fast; O_EXCL below is the guard
            raise CatalogTxnError(
                "a multi-table transaction is already pending; run "
                "recover() (or remove a known-dead txn.json) first"
            )
        snap = self.snapshot
        steps = []
        for name, wap_id in sorted(stages.items()):
            e = self._entry(name)
            t = LakeTable.load(self.spark, e["root"])
            staged = t._load_snap_file(t._staged_path(wap_id))
            if staged["parent"] != t.snapshot["version"]:
                raise ConcurrentCommitError(
                    f"stage {wap_id!r} on {name!r} has parent "
                    f"{staged['parent']} but the table is at "
                    f"{t.snapshot['version']}; re-stage on the new head"
                )
            steps.append(
                {
                    "name": name,
                    "root": e["root"],
                    "wap_id": wap_id,
                    "parent": staged["parent"],
                    "target": staged["version"],
                }
            )
        intent = {
            "txn_id": uuid.uuid4().hex,
            "catalog_parent": snap["version"],
            "steps": steps,
        }
        # O_EXCL create = the lock; _atomic_write would clobber a pending txn
        try:
            fd = os.open(txn_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CatalogTxnError(
                "a multi-table transaction is already pending; run "
                "recover() (or remove a known-dead txn.json) first"
            ) from None
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(intent))
            f.flush()
            os.fsync(f.fileno())
        return self._run_intent(intent)

    def recover(self) -> dict[str, int] | None:
        """Complete a transaction interrupted mid-publish. No-op (None)
        when nothing is pending. Idempotent: steps whose stage file is
        gone AND whose table already reached the target version are
        treated as published; a missing stage on a table that did NOT
        reach the target fails loudly (the stage was lost, not applied)."""
        txn_path = os.path.join(self.root, TXN_FILE)
        if not os.path.exists(txn_path):
            return None
        with open(txn_path) as f:
            intent = json.load(f)
        return self._run_intent(intent)

    def _run_intent(self, intent: dict) -> dict[str, int]:
        published: dict[str, int] = {}
        for step in intent["steps"]:
            t = LakeTable.load(self.spark, step["root"])
            wap_path = os.path.join(t.meta_dir, f"wap-{step['wap_id']}.json")
            if not os.path.exists(wap_path):
                if t.snapshot["version"] >= step["target"]:
                    published[step["name"]] = step["target"]
                    continue  # already published by a prior attempt
                raise ConcurrentCommitError(
                    f"stage {step['wap_id']!r} on {step['name']!r} vanished "
                    f"before publish (table at {t.snapshot['version']}, "
                    f"target {step['target']})"
                )
            published[step["name"]] = t.publish_staged(step["wap_id"])
        # the per-table publishes are the guarded (CAS) half; the catalog
        # flip applies on top of the CURRENT head so a register() that
        # slipped in mid-transaction is kept, never clobbered or skipped
        snap = self.refresh()
        tables = {n: dict(e) for n, e in snap["tables"].items()}
        for name, v in published.items():
            tables[name]["version"] = max(v, tables[name]["version"])
        self._write(
            {
                "version": snap["version"] + 1,
                "parent": snap["version"],
                "tables": tables,
            }
        )
        os.remove(os.path.join(self.root, TXN_FILE))
        return published
