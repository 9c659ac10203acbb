"""SQLite → (PostgreSQL type, Spark type) mapping.

Parity with the reference's SQLite ``MapType``/``MapDefault`` (reference
source_sqlite.go:781-820, 822-868). SQLite is dynamically typed: mapping goes
off the *declared* type, with affinity normalization for the fallback.
"""

from __future__ import annotations

import re

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    TimestampNTZType,
)

from ..catalog.identifiers import pg_literal
from ..catalog.model import Column
from ..catalog.parsers import parse_precision_scale, sqlite_normalize_affinity
from .config import TypeMappingConfig


def map_sqlite_type(col: Column, cfg: TypeMappingConfig) -> tuple[str, DataType]:
    declared = (col.column_type or col.data_type or "").strip().lower()
    base = declared.split("(")[0].strip()

    if "int" in base:
        # all SQLite ints are 64-bit storage
        return "bigint", LongType()
    if base in ("real", "double", "double precision", "float"):
        return "double precision", DoubleType()
    if base in ("text", "clob") or "char" in base:
        return "text", StringType()
    if base in ("numeric", "decimal"):
        p, s = parse_precision_scale(declared)
        if p is None:
            return "numeric", DecimalType(38, 18)
        if s is None:
            return f"numeric({p})", DecimalType(p, 0)
        return f"numeric({p},{s})", DecimalType(p, s)
    if base in ("boolean", "bool"):
        return "boolean", BooleanType()
    if base in ("datetime", "timestamp"):
        return "timestamp", TimestampNTZType()
    if base == "date":
        return "date", DateType()
    if base == "time":
        return "time", StringType()
    if base == "json":
        return ("jsonb" if cfg.json_mode == "jsonb" else "json"), StringType()
    if base == "blob" or declared == "":
        return "bytea", BinaryType()

    # unknown declared type → affinity fallback
    affinity = sqlite_normalize_affinity(declared)
    return {
        "INTEGER": ("bigint", LongType()),
        "TEXT": ("text", StringType()),
        "REAL": ("double precision", DoubleType()),
        "NUMERIC": ("numeric", DecimalType(38, 18)),
        "BLOB": ("bytea", BinaryType()),
    }[affinity]


_NUMERIC_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def map_sqlite_default(col: Column, pg_type: str, cfg: TypeMappingConfig) -> str | None:
    """SQLite defaults: keywords, booleans, numerics and quoted strings map;
    expression defaults are skipped (None) with a warning upstream."""
    d = col.default
    if d is None:
        return None
    up = d.strip().upper()
    if up in ("CURRENT_TIMESTAMP", "CURRENT_DATE", "CURRENT_TIME"):
        return up
    if up in ("TRUE", "FALSE"):
        return up
    if pg_type == "boolean" and d in ("0", "1"):
        return "TRUE" if d == "1" else "FALSE"
    if _NUMERIC_RE.match(d.strip()):
        return d.strip()
    s = d.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return pg_literal(s[1:-1].replace("''", "'"))
    if up == "NULL":
        return None
    return None  # expression default — skipped
