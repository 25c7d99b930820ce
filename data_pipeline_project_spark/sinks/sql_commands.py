"""SQL front door for the lakehouse tier (r12).

A real user's first touch of a table format is SQL — the reference's
entire interface is SQL DDL/DML through MySQL
(setup_database_in_mysql.py:58-103; pipeline.py issues INSERT/UPDATE
through one connection). The manifest tier's operations were
Python-API-only; this module maps the standard Delta-flavored command
grammar onto them, one statement in, one result out:

    MERGE INTO t USING s ON k [WHEN MATCHED THEN UPDATE SET *
                               WHEN NOT MATCHED THEN INSERT *]
    DELETE FROM t WHERE k IN (...)            (targeted rewrite)
    DELETE FROM t WHERE k = v                 (point delete)
    OPTIMIZE t                                 (compact small files)
    OPTIMIZE t ZORDER BY (a, b)                (whole-table recluster)
    OPTIMIZE t WHERE p = v [ZORDER BY (...)]   (one-partition rewrite)
    VACUUM t [RETAIN n VERSIONS]
    ANALYZE TABLE t [COMPUTE STATISTICS]       (distributed, r12)
    DESCRIBE HISTORY t [LIMIT n]
    DESCRIBE DETAIL t
    RESTORE [TABLE] t [TO] VERSION AS OF n
    RESTORE [TABLE] t [TO] TIMESTAMP AS OF 'ts'
    SELECT ...                                 (passthrough: snapshot
                                                views + spark.sql)

Honest scope: this is a COMMAND DISPATCHER, not a SQL engine —
commands are parsed with anchored patterns and delegate to the same
Python twins the rest of the repo tests (merge_upsert,
delete_rows_targeted, compact_snapshot, rewrite_table/partition,
vacuum, analyze_table, restore_table, table_history/table_profile);
SELECT statements hand the full query to Spark's own parser over
registered snapshot views, so query SQL is Catalyst-complete. Every
SQL form is pinned test-equal to its Python twin in
tests/test_sql_commands.py.

Transactions: ``LakehouseSQL.transaction([...])`` runs a statement
list inside ONE cross-table atomic transaction (sinks/txn.py) — the
SQL twin of the reference's raw+agg single-transaction commit
(pipeline.py:246-259). All-or-nothing: any failing statement aborts
every staged table.

100 TB posture: zero logic of its own — each command inherits its
twin's envelope (targeted deletes prune via zone maps + blooms,
OPTIMIZE WHERE touches one partition, ANALYZE is one distributed
job, VACUUM/RESTORE/DESCRIBE are metadata-only).
"""

from __future__ import annotations

import re

__all__ = ["LakehouseSQL", "SQLCommandError"]


class SQLCommandError(ValueError):
    """The statement is not in the supported command grammar — the
    error says what IS supported; silently guessing would be worse."""


def _ident(name: str) -> str:
    return name.strip().strip("`\"")


_MERGE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<t>[\w.`\"]+)\s+USING\s+(?P<s>[\w.`\"]+)\s+"
    r"ON\s+(?P<on>.+?)\s*"
    r"(?P<clauses>WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*)?$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<t>[\w.`\"]+)\s+WHERE\s+(?P<pred>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_IN_LIST = re.compile(
    r"^(?P<k>[\w.`\"]+)\s+IN\s*\((?P<vals>[^)]+)\)$",
    re.IGNORECASE | re.DOTALL,
)
_EQ = re.compile(
    r"^(?P<k>[\w.`\"]+)\s*=\s*(?P<v>.+)$", re.DOTALL
)
_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<t>[\w.`\"]+)"
    r"(?:\s+WHERE\s+(?P<pk>[\w.`\"]+)\s*=\s*"
    r"(?P<pv>.+?(?=\s+ZORDER\s+BY|\s*$)))?"
    r"(?:\s+ZORDER\s+BY\s*\((?P<z>[^)]+)\))?\s*$",
    re.IGNORECASE,
)
_VACUUM = re.compile(
    r"^\s*VACUUM\s+(?P<t>[\w.`\"]+)"
    r"(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS?)?\s*$",
    re.IGNORECASE,
)
_ANALYZE = re.compile(
    r"^\s*ANALYZE\s+TABLE\s+(?P<t>[\w.`\"]+)"
    r"(?:\s+COMPUTE\s+STATISTICS)?\s*$",
    re.IGNORECASE,
)
_DESCRIBE = re.compile(
    r"^\s*DESCRIBE\s+(?P<what>HISTORY|DETAIL)\s+(?P<t>[\w.`\"]+)"
    r"(?:\s+LIMIT\s+(?P<n>\d+))?\s*$",
    re.IGNORECASE,
)
_RESTORE = re.compile(
    r"^\s*RESTORE\s+(?:TABLE\s+)?(?P<t>[\w.`\"]+)\s+(?:TO\s+)?"
    r"(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+(?P<v>.+?)\s*$",
    re.IGNORECASE,
)


def _parse_literal(tok: str):
    tok = tok.strip()
    if (tok.startswith("'") and tok.endswith("'")) or (
        tok.startswith('"') and tok.endswith('"')
    ):
        return tok[1:-1]
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError as e:
        raise SQLCommandError(
            f"unsupported literal {tok!r} (string/number/bool)"
        ) from e


class LakehouseSQL:
    """One SQL entry point over a name -> table-path catalog.

    ``catalog`` maps table names to manifest-table roots; ``duck`` is
    the optional DuckDB connection some twins use for zone-map probes
    (``None`` exercises the stats-in-the-log fast path, same as the
    Python API)."""

    def __init__(self, spark, catalog: dict, duck=None):
        self.spark = spark
        self.duck = duck
        self.catalog = {k: v for k, v in catalog.items()}

    # -- helpers -----------------------------------------------------------

    def _path(self, name: str) -> str:
        t = _ident(name)
        if t not in self.catalog:
            raise SQLCommandError(
                f"unknown table {t!r}; catalog has {sorted(self.catalog)}"
            )
        return self.catalog[t]

    def _register_views(self) -> None:
        from data_pipeline_project_spark.sinks.manifest import read_version

        for name, path in self.catalog.items():
            read_version(self.spark, path).createOrReplaceTempView(name)

    def _keys_df(self, col: str, values: list):
        # one-column frame for the targeted twins; schema inferred
        # from the first literal (int -> long, float -> double, ...)
        return self.spark.createDataFrame(
            [(v,) for v in values]
        ).toDF(col)

    # -- the front door ----------------------------------------------------

    def sql(self, statement: str):
        """Execute one statement. Commands return the twin's result
        dict; DESCRIBE and SELECT return a DataFrame."""
        s = statement.strip().rstrip(";")
        head = s.split(None, 1)[0].upper() if s.split() else ""
        if head == "SELECT" or head == "WITH":
            self._register_views()
            return self.spark.sql(s)
        if head == "MERGE":
            return self._merge(s)
        if head == "DELETE":
            return self._delete(s)
        if head == "OPTIMIZE":
            return self._optimize(s)
        if head == "VACUUM":
            return self._vacuum(s)
        if head == "ANALYZE":
            return self._analyze(s)
        if head == "DESCRIBE":
            return self._describe(s)
        if head == "RESTORE":
            return self._restore(s)
        raise SQLCommandError(
            f"unsupported statement {head!r}: supported commands are "
            f"MERGE INTO / DELETE FROM / OPTIMIZE / VACUUM / ANALYZE "
            f"TABLE / DESCRIBE HISTORY|DETAIL / RESTORE, plus SELECT "
            f"passthrough"
        )

    def transaction(self, statements: list) -> dict:
        """Run ``statements`` inside ONE cross-table atomic
        transaction: every touched table publishes together or not at
        all — the reference's raw+agg single-transaction commit
        (pipeline.py:246-259), SQL form. Statements must be commands
        that WRITE a catalog table (MERGE/DELETE)."""
        from data_pipeline_project_spark.sinks.txn import transaction

        tables = []
        for s in statements:
            m = _MERGE.match(s.strip().rstrip(";")) or _DELETE.match(
                s.strip().rstrip(";")
            )
            if not m:
                raise SQLCommandError(
                    "transactions take MERGE/DELETE statements only "
                    "(each stages one table commit)"
                )
            p = self._path(m.group("t"))
            if p not in tables:
                tables.append(p)
        if len(tables) < 2:
            raise SQLCommandError(
                "a transaction needs >= 2 distinct tables; a single "
                "table's commit is already atomic"
            )
        results = []
        with transaction(tables):
            for s in statements:
                results.append(self.sql(s))
        return {"tables": tables, "results": results}

    # -- command implementations -------------------------------------------

    def _merge(self, s: str):
        from data_pipeline_project_spark.sinks.manifest import merge_upsert

        m = _MERGE.match(s)
        if not m:
            raise SQLCommandError(
                "MERGE grammar: MERGE INTO t USING source_view ON key "
                "[WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *] — whole-row upsert by "
                "key (the only WHEN forms this tier defines)"
            )
        path = self._path(m.group("t"))
        on = m.group("on").strip()
        eq = re.match(
            r"^(?:[\w`\"]+\.)?([\w`\"]+)\s*=\s*(?:[\w`\"]+\.)?([\w`\"]+)$",
            on,
        )
        if eq:
            k1, k2 = _ident(eq.group(1)), _ident(eq.group(2))
            if k1 != k2:
                raise SQLCommandError(
                    f"MERGE ON must equate the SAME key column on both "
                    f"sides (got {k1!r} vs {k2!r}) — the upsert key"
                )
            key = k1
        else:
            key = _ident(on)
        src = _ident(m.group("s"))
        updates = self.spark.table(src)
        return merge_upsert(self.spark, self.duck, path, key, updates)

    def _delete(self, s: str):
        from data_pipeline_project_spark.sinks.manifest import (
            delete_rows_targeted,
        )

        m = _DELETE.match(s)
        if not m:
            raise SQLCommandError("DELETE grammar: DELETE FROM t WHERE ...")
        path = self._path(m.group("t"))
        pred = m.group("pred").strip()
        mi = _IN_LIST.match(pred)
        if mi:
            key = _ident(mi.group("k"))
            vals = [_parse_literal(v) for v in mi.group("vals").split(",")]
        else:
            me = _EQ.match(pred)
            if not me:
                raise SQLCommandError(
                    "DELETE predicates supported: k IN (v, ...) and "
                    "k = v — the point-delete shapes zone maps and "
                    "blooms prune; arbitrary predicates belong to a "
                    "rewrite job"
                )
            key = _ident(me.group("k"))
            vals = [_parse_literal(me.group("v"))]
        return delete_rows_targeted(
            self.spark, self.duck, path, key,
            self._keys_df(key, vals), commit=True,
        )

    def _optimize(self, s: str):
        from data_pipeline_project_spark.sinks.manifest import (
            compact_snapshot,
            rewrite_partition,
            rewrite_table,
        )

        m = _OPTIMIZE.match(s)
        if not m:
            raise SQLCommandError(
                "OPTIMIZE grammar: OPTIMIZE t [WHERE part = v] "
                "[ZORDER BY (a, b)]"
            )
        path = self._path(m.group("t"))
        zcols = (
            [_ident(c) for c in m.group("z").split(",")]
            if m.group("z")
            else None
        )
        if m.group("pk"):
            part = {_ident(m.group("pk")): str(_parse_literal(m.group("pv")))}
            if not zcols:
                raise SQLCommandError(
                    "OPTIMIZE ... WHERE needs ZORDER BY (cols) — a "
                    "partition rewrite clusters on something"
                )
            return rewrite_partition(
                self.spark, path,
                zcols if len(zcols) > 1 else zcols[0], part,
            )
        if zcols:
            return rewrite_table(
                self.spark, path, zcols if len(zcols) > 1 else zcols[0]
            )
        return compact_snapshot(self.spark, path)

    def _vacuum(self, s: str):
        from data_pipeline_project_spark.sinks.manifest import vacuum

        m = _VACUUM.match(s)
        if not m:
            raise SQLCommandError(
                "VACUUM grammar: VACUUM t [RETAIN n VERSIONS]"
            )
        path = self._path(m.group("t"))
        keep = int(m.group("n")) if m.group("n") else 2
        return vacuum(path, keep_versions=keep)

    def _analyze(self, s: str):
        from data_pipeline_project_spark.sinks.manifest import analyze_table

        m = _ANALYZE.match(s)
        if not m:
            raise SQLCommandError(
                "ANALYZE grammar: ANALYZE TABLE t [COMPUTE STATISTICS]"
            )
        return analyze_table(self._path(m.group("t")), spark=self.spark)

    def _describe(self, s: str):
        m = _DESCRIBE.match(s)
        if not m:
            raise SQLCommandError(
                "DESCRIBE grammar: DESCRIBE HISTORY|DETAIL t [LIMIT n]"
            )
        path = self._path(m.group("t"))
        if m.group("what").upper() == "HISTORY":
            from data_pipeline_project_spark.sinks.manifest import (
                table_history,
            )

            hist = table_history(
                path, limit=int(m.group("n")) if m.group("n") else None
            )
            rows = [
                (
                    h["version"],
                    h["op"],
                    h["committed_at"],
                    h["n_files"],
                    h["total_rows"],
                    h["files_removed"],
                    bool(h["schema_change"]),
                )
                for h in hist
            ]
            return self.spark.createDataFrame(
                rows,
                "version long, operation string, committed_at long, "
                "n_files long, total_rows long, files_removed long, "
                "schema_change boolean",
            )
        from data_pipeline_project_spark.sinks.layout import table_detail

        prof = table_detail(path)
        return self.spark.createDataFrame(
            [(
                prof["version"],
                prof["last_op"],
                prof["n_files"],
                prof["total_bytes"],
                prof["live_rows"],
                prof["n_versions"],
                float(prof["ndv_coverage"]),
            )],
            "version long, last_op string, n_files long, "
            "total_bytes long, live_rows long, n_versions long, "
            "ndv_coverage double",
        )

    def _restore(self, s: str):
        from data_pipeline_project_spark.sinks.manifest import restore_table

        m = _RESTORE.match(s)
        if not m:
            raise SQLCommandError(
                "RESTORE grammar: RESTORE [TABLE] t [TO] "
                "VERSION|TIMESTAMP AS OF x"
            )
        path = self._path(m.group("t"))
        if m.group("kind").upper() == "VERSION":
            return restore_table(path, version=int(m.group("v")))
        return restore_table(path, as_of=_parse_literal(m.group("v")))
