"""Target-side DDL generation & constraint-replay planning.

Fresh implementation of the reference's DDL surface: CREATE TABLE generation
(reference ddl.go:16-98), idempotent native-enum types (ddl.go:117-175),
enum/set CHECK constraints (ddl.go:177-214), and the ordered post-load
constraint replay (post.go:17-100): SET LOGGED → PK → indexes → FKs →
sequences → unsigned CHECKs (NOT VALID + VALIDATE) → ON UPDATE triggers.

All of this is driver-side: the engine runs these statements over a plain
JDBC/DB-API connection around the distributed write. The *fast-load* posture
(constraint-free UNLOGGED tables during COPY, constraints after) is what
makes a 100 TB load feasible — index maintenance during ingest would
dominate the write path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .catalog.identifiers import enum_type_name, pg_ident, pg_literal, truncate_identifier
from .catalog.model import Column, ForeignKey, Index, Table
from .catalog.parsers import parse_enum_values
from .types.config import UNSIGNED_MAX, TypeMappingConfig


@dataclass
class IndexSkip:
    index: str
    reason: str


@dataclass
class PostMigratePlan:
    """Ordered statement groups for the constraint-replay phase."""

    set_logged: list[str] = field(default_factory=list)
    primary_keys: list[str] = field(default_factory=list)
    indexes: list[str] = field(default_factory=list)
    skipped_indexes: list[IndexSkip] = field(default_factory=list)
    foreign_keys: list[str] = field(default_factory=list)
    sequences: list[str] = field(default_factory=list)
    checks: list[str] = field(default_factory=list)
    triggers: list[str] = field(default_factory=list)


def qualified(schema: str, name: str) -> str:
    return f"{pg_ident(schema)}.{pg_ident(name)}"


def create_schema_sql(schema: str, recreate: bool) -> list[str]:
    stmts = []
    if recreate:
        stmts.append(f"DROP SCHEMA IF EXISTS {pg_ident(schema)} CASCADE")
    stmts.append(f"CREATE SCHEMA {pg_ident(schema)}")
    return stmts


def create_enum_type_sql(values: list[str], schema: str | None = None) -> str:
    """Idempotent content-addressed enum type (semantics of ddl.go:117-175).

    Schema-qualified like the reference (ddl.go createEnumTypes): an
    unqualified CREATE TYPE would land in the first search_path schema and
    survive an on_schema_exists='recreate' DROP SCHEMA CASCADE."""
    name = enum_type_name(values)
    qname = qualified(schema, name) if schema else pg_ident(name)
    vals = ", ".join(pg_literal(v) for v in values)
    return (
        "DO $$ BEGIN "
        f"CREATE TYPE {qname} AS ENUM ({vals}); "
        "EXCEPTION WHEN duplicate_object THEN NULL; END $$"
    )


def _column_clause(
    col: Column, pg_type: str, default_sql: str | None, cfg: TypeMappingConfig
) -> str:
    parts = [pg_ident(col.pg_name), pg_type]
    if default_sql is not None and not col.is_generated:
        parts.append(f"DEFAULT {default_sql}")
    if not col.nullable:
        parts.append("NOT NULL")
    return " ".join(parts)


def _check_constraints(table: Table, cfg: TypeMappingConfig, type_map) -> list[str]:
    checks: list[str] = []
    for col in table.columns:
        base = col.data_type.lower()
        if base == "enum" and cfg.enum_mode == "check":
            values = parse_enum_values(col.column_type)
            vals = ", ".join(pg_literal(v) for v in values)
            cname = truncate_identifier(f"{table.pg_name}_{col.pg_name}_check")
            checks.append(f"CONSTRAINT {pg_ident(cname)} CHECK ({pg_ident(col.pg_name)} IN ({vals}))")
        elif base == "set" and cfg.set_mode == "text_array_check":
            values = parse_enum_values(col.column_type)
            vals = ", ".join(pg_literal(v) for v in values)
            cname = truncate_identifier(f"{table.pg_name}_{col.pg_name}_check")
            checks.append(
                f"CONSTRAINT {pg_ident(cname)} CHECK ({pg_ident(col.pg_name)} <@ ARRAY[{vals}]::text[])"
            )
    return checks


def create_table_sql(
    table: Table,
    schema: str,
    cfg: TypeMappingConfig,
    type_mapper,
    default_mapper,
    unlogged: bool = True,
) -> str:
    """CREATE [UNLOGGED] TABLE — constraint-free except NOT NULL, DEFAULT and
    enum/set CHECKs; PKs/indexes/FKs are deferred to the post-load plan."""
    clauses: list[str] = []
    for col in table.columns:
        pg_type, _ = type_mapper(col, cfg)
        if pg_type.startswith("pgferry_enum_"):
            # native enum types are created inside the target schema — the
            # column reference must match (search_path-independent)
            pg_type = qualified(schema, pg_type)
        try:
            default_sql = default_mapper(col, pg_type, cfg)
        except Exception:
            default_sql = None  # unsupported default → skipped with warning upstream
        clauses.append(_column_clause(col, pg_type, default_sql, cfg))
    clauses.extend(_check_constraints(table, cfg, type_mapper))
    body = ",\n  ".join(clauses)
    kw = "UNLOGGED TABLE" if unlogged else "TABLE"
    return f"CREATE {kw} {qualified(schema, table.pg_name)} (\n  {body}\n)"


# -- index compatibility policy (reference index_compat.go:5-31) -------------


def index_skip_reason(idx: Index, postgis: bool) -> str | None:
    if idx.has_expression:
        return "expression index"
    if idx.has_prefix:
        return "prefix index"
    if not idx.columns:
        return "no columns"
    if idx.type == "FULLTEXT":
        return "FULLTEXT index"
    if idx.type == "HASH":
        return "HASH index"
    if idx.type == "SPATIAL":
        if not postgis:
            return "SPATIAL index requires PostGIS"
        if len(idx.columns) != 1 or idx.unique:
            return "SPATIAL index must be single-column non-unique"
    return None


def create_index_sql(table: Table, idx: Index, schema: str, postgis: bool) -> str:
    name = truncate_identifier(idx.name)
    if idx.type == "SPATIAL":
        cols = pg_ident(idx.columns[0])
        return (
            f"CREATE INDEX {pg_ident(name)} ON {qualified(schema, table.pg_name)} "
            f"USING GIST ({cols})"
        )
    col_parts = []
    for i, c in enumerate(idx.columns):
        order = idx.column_orders[i] if i < len(idx.column_orders) else "ASC"
        col_parts.append(f"{pg_ident(c)}{' DESC' if order.upper() == 'DESC' else ''}")
    uq = "UNIQUE " if idx.unique else ""
    return (
        f"CREATE {uq}INDEX {pg_ident(name)} ON {qualified(schema, table.pg_name)} "
        f"({', '.join(col_parts)})"
    )


def add_primary_key_sql(table: Table, schema: str) -> str | None:
    if not table.primary_key or not table.primary_key.columns:
        return None
    cols = ", ".join(pg_ident(c) for c in table.primary_key.columns)
    cname = truncate_identifier(f"{table.pg_name}_pkey")
    return (
        f"ALTER TABLE {qualified(schema, table.pg_name)} "
        f"ADD CONSTRAINT {pg_ident(cname)} PRIMARY KEY ({cols})"
    )


_FK_RULES = {"CASCADE", "SET NULL", "SET DEFAULT", "RESTRICT", "NO ACTION"}


def add_foreign_key_sql(table: Table, fk: ForeignKey, schema: str) -> str:
    cols = ", ".join(pg_ident(c) for c in fk.columns)
    ref_cols = ", ".join(pg_ident(c) for c in fk.ref_columns)
    name = truncate_identifier(fk.name)
    stmt = (
        f"ALTER TABLE {qualified(schema, table.pg_name)} ADD CONSTRAINT {pg_ident(name)} "
        f"FOREIGN KEY ({cols}) REFERENCES {qualified(schema, fk.ref_pg_table)} ({ref_cols})"
    )
    if fk.update_rule.upper() in _FK_RULES and fk.update_rule.upper() != "NO ACTION":
        stmt += f" ON UPDATE {fk.update_rule.upper()}"
    if fk.delete_rule.upper() in _FK_RULES and fk.delete_rule.upper() != "NO ACTION":
        stmt += f" ON DELETE {fk.delete_rule.upper()}"
    return stmt


def sequence_reset_sql(table: Table, col: Column, schema: str) -> list[str]:
    """CREATE SEQUENCE + setval(MAX(col)+1) + SET DEFAULT nextval
    (semantics of post.go:395-426)."""
    seq = truncate_identifier(f"{table.pg_name}_{col.pg_name}_seq")
    qseq = qualified(schema, seq)
    qtbl = qualified(schema, table.pg_name)
    qcol = pg_ident(col.pg_name)
    # regclass text input downcases unquoted names — the literal must carry
    # the pg_ident-quoted form so mixed-case/special schemas resolve (the
    # format('%I.%I') discipline)
    seq_reg = pg_literal(qseq)
    return [
        f"CREATE SEQUENCE IF NOT EXISTS {qseq}",
        f"SELECT setval({seq_reg}, COALESCE((SELECT MAX({qcol}) FROM {qtbl}), 0) + 1, false)",
        f"ALTER TABLE {qtbl} ALTER COLUMN {qcol} SET DEFAULT nextval({seq_reg})",
        f"ALTER SEQUENCE {qseq} OWNED BY {qtbl}.{qcol}",
    ]


def unsigned_check_sql(table: Table, col: Column, schema: str) -> list[str] | None:
    """Range CHECK for unsigned source ints, added NOT VALID then VALIDATEd
    (post.go:102-158) so the check never blocks the load."""
    declared = (col.column_type or col.data_type).lower()
    if "unsigned" not in declared:
        return None
    base = declared.split("(")[0].strip().split(" ")[0]
    mx = UNSIGNED_MAX.get(base)
    if mx is None:
        return None
    cname = truncate_identifier(f"{table.pg_name}_{col.pg_name}_unsigned_check")
    qtbl = qualified(schema, table.pg_name)
    qcol = pg_ident(col.pg_name)
    return [
        f"ALTER TABLE {qtbl} ADD CONSTRAINT {pg_ident(cname)} "
        f"CHECK ({qcol} >= 0 AND {qcol} <= {mx}) NOT VALID",
        f"ALTER TABLE {qtbl} VALIDATE CONSTRAINT {pg_ident(cname)}",
    ]


def on_update_trigger_sql(table: Table, col: Column, schema: str) -> list[str]:
    """Emulate MySQL ``ON UPDATE CURRENT_TIMESTAMP`` with a plpgsql trigger
    (post.go:437-473)."""
    fn = truncate_identifier(f"{table.pg_name}_{col.pg_name}_on_update")
    trg = truncate_identifier(f"{table.pg_name}_{col.pg_name}_trg")
    qtbl = qualified(schema, table.pg_name)
    return [
        f"CREATE OR REPLACE FUNCTION {qualified(schema, fn)}() RETURNS trigger AS $$ "
        f"BEGIN NEW.{pg_ident(col.pg_name)} = CURRENT_TIMESTAMP; RETURN NEW; END $$ LANGUAGE plpgsql",
        f"CREATE TRIGGER {pg_ident(trg)} BEFORE UPDATE ON {qtbl} "
        f"FOR EACH ROW EXECUTE FUNCTION {qualified(schema, fn)}()",
    ]


def build_post_migrate_plan(
    tables: list[Table], schema: str, cfg: TypeMappingConfig, unlogged: bool = True
) -> PostMigratePlan:
    """Assemble the ordered post-load statement plan (post.go:17-100)."""
    plan = PostMigratePlan()
    for t in tables:
        qtbl = qualified(schema, t.pg_name)
        if unlogged:
            plan.set_logged.append(f"ALTER TABLE {qtbl} SET LOGGED")
        pk = add_primary_key_sql(t, schema)
        if pk:
            plan.primary_keys.append(pk)
        for idx in t.indexes:
            if idx.is_primary:
                continue
            reason = index_skip_reason(idx, cfg.use_postgis)
            if reason:
                plan.skipped_indexes.append(IndexSkip(idx.name, reason))
            else:
                plan.indexes.append(create_index_sql(t, idx, schema, cfg.use_postgis))
        for fk in t.foreign_keys:
            plan.foreign_keys.append(add_foreign_key_sql(t, fk, schema))
        for col in t.columns:
            if col.is_auto_increment:
                plan.sequences.extend(sequence_reset_sql(t, col, schema))
            if cfg.unsigned_checks:
                chk = unsigned_check_sql(t, col, schema)
                if chk:
                    plan.checks.extend(chk)
            if "on update current_timestamp" in col.extra.lower():
                plan.triggers.extend(on_update_trigger_sql(t, col, schema))
    return plan
