"""Persistent, versioned name -> table-path catalog (r13).

``LakehouseSQL`` (sinks/sql_commands.py) took an in-memory dict per
instance until r13: table names died with the process and two front
doors could silently disagree — while the reference's table namespace
is MySQL's persistent catalog (setup_database_in_mysql.py:7, the
``CREATE DATABASE``/``USE`` that every later statement resolves
through). This module gives the SQL tier the same property with the
machinery the manifest tier already trusts:

- the catalog IS a tiny manifest-style log: ``<root>/_manifests/
  v{N}.json`` bodies hold the full ``{name: table_path}`` map (a
  catalog is small — full-state bodies make every read one file and
  history trivially auditable, no delta chains needed);
- version slots are claimed through the SAME LogStore CAS that
  serializes table commits (``get_log_store().claim``) — concurrent
  CREATEs from different threads, processes, or hosts race on the
  atomic slot create and exactly one wins; the loser re-reads and
  retries (or surfaces the name collision);
- ``latest.json`` advances monotonically via the manifest tier's
  actor-unique-tmp protocol (safe under cross-process races, r12).

Scale posture: the catalog body is O(tables) metadata — thousands of
entries are a few KB; every resolve is one JSON read (zero at the
head fast path via latest.json). Data I/O never touches this module.
"""

from __future__ import annotations

import json
import os
import time

from data_pipeline_project_spark.sinks.manifest import (
    ConcurrentSnapshotError,
    _read_manifest_settled,
    _update_latest_monotonic,
    get_log_store,
    read_manifest,
    snapshot_versions,
)

__all__ = ["TableCatalog", "CatalogError"]


class CatalogError(ValueError):
    """Name collision / unknown table / invalid registration."""


class TableCatalog:
    """Durable name -> path registry under ``root``. Every method is
    safe under concurrent writers sharing the store (CAS-arbitrated);
    instances hold NO state beyond the root path, so any number of
    processes constructing ``TableCatalog(same_root)`` see one
    namespace."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        self._mdir = os.path.join(self.root, "_manifests")

    # -- reads ---------------------------------------------------------

    def tables(self) -> dict:
        """The current name -> path map (latest committed version)."""
        head = self._head()
        return dict(head.get("tables") or {})

    def resolve(self, name: str) -> str:
        t = self.tables()
        if name not in t:
            raise CatalogError(
                f"unknown table {name!r}; catalog has {sorted(t)}"
            )
        return t[name]

    def version(self) -> int:
        versions = snapshot_versions(self.root)
        return versions[-1] if versions else 0

    def history(self, limit: int | None = None) -> list:
        """Newest-first [{version, op, table, committed_at}] — the
        audit trail of CREATE/DROP statements."""
        out = []
        for v in reversed(snapshot_versions(self.root)):
            try:
                m = read_manifest(
                    os.path.join(self._mdir, f"v{v}.json"), resolve=False
                )
            except json.JSONDecodeError:
                continue  # in-flight/torn claim: not yet history
            out.append(
                {
                    "version": v,
                    "op": m.get("op"),
                    "table": m.get("table"),
                    "committed_at": m.get("committed_at"),
                }
            )
            if limit is not None and len(out) >= limit:
                break
        return out

    def _head(self, for_write: bool = False) -> dict:
        """The newest SETTLED catalog version. A freshly claimed slot
        whose body hasn't landed yet (the claim creates the file, the
        body follows) settles within the read loop; a slot whose
        claimant CRASHED pre-body is torn. Readers step DOWN past a
        torn head (the previous version is the committed truth);
        writers must NOT — skipping an in-flight slot would let two
        CREATEs of one name both 'win' against different bases — so a
        write-path head read propagates ConcurrentSnapshotError and
        the commit loop retries with backoff until it settles."""
        latest = os.path.join(self._mdir, "latest.json")
        floor = 0
        floor_m = {"version": 0, "tables": {}}
        if os.path.exists(latest):
            try:
                floor_m = read_manifest(latest)
                floor = floor_m.get("version", 0)
            except json.JSONDecodeError:
                pass
        versions = snapshot_versions(self.root)
        if not versions or versions[-1] <= floor:
            return floor_m
        for v in reversed(versions):
            if v <= floor:
                return floor_m
            try:
                return self._settled(v)
            except ConcurrentSnapshotError:
                if for_write:
                    raise
                continue  # torn head: the previous version is truth
        return floor_m

    def _settled(self, v: int) -> dict:
        return _read_manifest_settled(
            os.path.join(self._mdir, f"v{v}.json"), resolve=False
        )

    # -- writes --------------------------------------------------------

    def create_table(
        self, name: str, path: str, if_not_exists: bool = False
    ) -> dict:
        """Register ``name`` -> ``path``. CAS-protected: two concurrent
        CREATEs of the same name resolve to exactly one winner; the
        loser gets CatalogError (or a no-op under ``if_not_exists``
        when the registered path matches)."""
        if not name or not name.replace("_", "").isalnum():
            raise CatalogError(
                f"table name {name!r} must be alphanumeric/underscore"
            )
        path = os.path.abspath(path)

        def mutate(tables: dict) -> dict | None:
            if name in tables:
                if if_not_exists:
                    return None  # no-op
                raise CatalogError(
                    f"table {name!r} already exists -> {tables[name]}"
                )
            out = dict(tables)
            out[name] = path
            return out

        return self._commit(mutate, op="create_table", table=name)

    def drop_table(self, name: str, if_exists: bool = False) -> dict:
        """Unregister ``name``. The table's DATA and manifest log stay
        on disk (external-table semantics — dropping a name must never
        destroy a lakehouse another name or process may pin)."""

        def mutate(tables: dict) -> dict | None:
            if name not in tables:
                if if_exists:
                    return None
                raise CatalogError(
                    f"unknown table {name!r}; catalog has {sorted(tables)}"
                )
            out = dict(tables)
            del out[name]
            return out

        return self._commit(mutate, op="drop_table", table=name)

    def _commit(self, mutate, op: str, table: str, retries: int = 12) -> dict:
        """Optimistic write loop: read head -> mutate -> claim the next
        slot -> write body -> advance latest. A lost claim means a
        concurrent writer won the slot; re-read (their change is now
        visible) and retry — name-collision checks re-run against the
        NEW head, so two racing CREATEs of one name converge to one
        winner + one CatalogError regardless of interleaving."""
        os.makedirs(self._mdir, exist_ok=True)
        store = get_log_store()
        for attempt in range(retries):
            try:
                head = self._head(for_write=True)
            except ConcurrentSnapshotError:
                # a racing writer claimed the head slot and hasn't
                # landed its body yet — wait it out, then rebase
                time.sleep(0.05 * (attempt + 1))
                continue
            new_tables = mutate(dict(head.get("tables") or {}))
            if new_tables is None:  # IF [NOT] EXISTS no-op
                return {"version": head.get("version", 0), "noop": True}
            version = head.get("version", 0) + 1
            if not store.claim(self._mdir, version):
                continue  # lost the slot: somebody committed; rebase
            body = {
                "version": version,
                "tables": new_tables,
                "op": op,
                "table": table,
                "committed_at": int(time.time() * 1000),
            }
            with open(os.path.join(self._mdir, f"v{version}.json"), "w") as fh:
                json.dump(body, fh, indent=1, sort_keys=True)
            _update_latest_monotonic(self._mdir, body)
            return body
        raise ConcurrentSnapshotError(
            f"catalog commit lost {retries} straight claim races under "
            f"{self.root!r} — contention pathologically high"
        )
