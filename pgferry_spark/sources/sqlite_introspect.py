"""SQLite schema introspection.

Parity with the reference's SQLite source (reference source_sqlite.go:15-721):
``sqlite_master`` + table-valued pragmas (table_xinfo, index_list,
index_info, foreign_key_list), read-only open, ``:memory:`` rejection,
AUTOINCREMENT detection by scanning the stored CREATE TABLE SQL, and
declared-type normalization via affinity.

Introspection is a pure driver activity (catalog queries, not data), so the
stdlib ``sqlite3`` module is the natural client — data movement goes through
the partitioned read layer separately.
"""

from __future__ import annotations

import re
import sqlite3

from ..catalog.identifiers import normalize_identifier
from ..catalog.model import Column, ForeignKey, Index, Schema, SourceObjects, Table


def open_readonly(path: str) -> sqlite3.Connection:
    """Read-only open; ``:memory:`` rejected (reference source_sqlite.go:37-48)."""
    if path == ":memory:" or path.startswith("file::memory:"):
        raise ValueError("in-memory SQLite databases cannot be migrated")
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    con.row_factory = sqlite3.Row
    return con


def _table_names(con: sqlite3.Connection) -> list[str]:
    rows = con.execute(
        "SELECT name FROM sqlite_master WHERE type = 'table' "
        "AND name NOT LIKE 'sqlite_%' ORDER BY name"
    ).fetchall()
    return [r["name"] for r in rows]


_AUTOINC_RE = re.compile(r"\bAUTOINCREMENT\b", re.IGNORECASE)


def _has_autoincrement(con: sqlite3.Connection, table: str, column: str) -> bool:
    """Detect AUTOINCREMENT by scanning the stored DDL (the pragma surface
    doesn't expose it; reference source_sqlite.go:756-777)."""
    row = con.execute(
        "SELECT sql FROM sqlite_master WHERE type = 'table' AND name = ?", (table,)
    ).fetchone()
    if not row or not row["sql"]:
        return False
    sql = row["sql"]
    if not _AUTOINC_RE.search(sql):
        return False
    # AUTOINCREMENT applies to the INTEGER PRIMARY KEY column only
    pat = re.compile(
        r'["\[`]?' + re.escape(column) + r'["\]`]?\s+INTEGER\s+PRIMARY\s+KEY\s+AUTOINCREMENT',
        re.IGNORECASE,
    )
    return bool(pat.search(sql))


def introspect_table(con: sqlite3.Connection, name: str, snake_case: bool) -> Table:
    cols: list[Column] = []
    pk_cols: list[tuple[int, str]] = []
    for r in con.execute(f"PRAGMA table_xinfo({_q(name)})"):
        if r["hidden"] == 1:  # hidden columns of virtual tables
            continue
        is_generated = r["hidden"] in (2, 3)  # VIRTUAL / STORED generated
        col = Column(
            source_name=r["name"],
            pg_name=normalize_identifier(r["name"], snake_case),
            data_type=(r["type"] or "").split("(")[0].strip().lower(),
            column_type=r["type"] or "",
            nullable=not r["notnull"],
            default=r["dflt_value"],
            extra="GENERATED" if is_generated else (
                "auto_increment" if r["pk"] and _has_autoincrement(con, name, r["name"]) else ""
            ),
            ordinal_pos=r["cid"],
        )
        cols.append(col)
        if r["pk"]:
            pk_cols.append((r["pk"], col.pg_name))

    primary_key = None
    if pk_cols:
        ordered = [c for _, c in sorted(pk_cols)]
        primary_key = Index("PRIMARY", "PRIMARY", ordered, is_primary=True, unique=True)

    indexes: list[Index] = []
    for ir in con.execute(f"PRAGMA index_list({_q(name)})"):
        if ir["origin"] == "pk":
            continue
        idx_cols = []
        has_expr = False
        for ic in con.execute(f"PRAGMA index_info({_q(ir['name'])})"):
            if ic["name"] is None:
                has_expr = True
            else:
                idx_cols.append(normalize_identifier(ic["name"], snake_case))
        indexes.append(
            Index(
                name=normalize_identifier(ir["name"], snake_case),
                source_name=ir["name"],
                columns=idx_cols,
                unique=bool(ir["unique"]),
                has_expression=has_expr or bool(ir["partial"]),
            )
        )

    fks: list[ForeignKey] = []
    by_id: dict[int, dict] = {}
    for fr in con.execute(f"PRAGMA foreign_key_list({_q(name)})"):
        ent = by_id.setdefault(
            fr["id"],
            {"table": fr["table"], "from": [], "to": [],
             "on_update": fr["on_update"], "on_delete": fr["on_delete"]},
        )
        ent["from"].append(fr["from"])
        ent["to"].append(fr["to"])
    for fk_id, ent in sorted(by_id.items()):
        pg_ref = normalize_identifier(ent["table"], snake_case)
        fks.append(
            ForeignKey(
                name=f"{normalize_identifier(name, snake_case)}_fk_{fk_id}",
                columns=[normalize_identifier(c, snake_case) for c in ent["from"]],
                ref_table=ent["table"],
                ref_pg_table=pg_ref,
                ref_columns=[normalize_identifier(c, snake_case) for c in ent["to"]],
                update_rule=ent["on_update"] or "NO ACTION",
                delete_rule=ent["on_delete"] or "NO ACTION",
            )
        )

    return Table(
        source_name=name,
        pg_name=normalize_identifier(name, snake_case),
        columns=cols,
        primary_key=primary_key,
        indexes=indexes,
        foreign_keys=fks,
    )


def introspect_schema(path: str, snake_case: bool = True) -> Schema:
    con = open_readonly(path)
    try:
        return Schema(tables=[introspect_table(con, t, snake_case) for t in _table_names(con)])
    finally:
        con.close()


def introspect_source_objects(path: str) -> SourceObjects:
    """Views/triggers reported for manual migration (SQLite has no routines)."""
    con = open_readonly(path)
    try:
        views = [r["name"] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='view' ORDER BY name")]
        triggers = [r["name"] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='trigger' ORDER BY name")]
        return SourceObjects(views=views, routines=[], triggers=triggers)
    finally:
        con.close()


def read_table_rows(path: str, table: Table, chunk_predicate: str | None = None):
    """Driver-side row fetch for the single-connection SQLite path (the
    reference caps SQLite at 1 worker; at Spark scale a JDBC sqlite driver
    replaces this). Yields tuples in catalog column order."""
    con = open_readonly(path)
    try:
        cols = ", ".join(_q(c.source_name) for c in table.columns)
        sql = f"SELECT {cols} FROM {_q(table.source_name)}"
        if chunk_predicate:
            sql += f" WHERE {chunk_predicate}"
        yield from con.execute(sql)
    finally:
        con.close()


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'
