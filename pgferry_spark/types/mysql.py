"""MySQL → (PostgreSQL type, Spark type) mapping.

Behavioral parity with the reference's MySQL ``MapType``/``MapDefault``
(reference source_mysql.go:516-644, 859-938; docs/type-mapping.md:8-145),
expressed as a pure driver function. Returns ``(pg_type, DataType)`` so one
call drives both the target DDL and the Spark read schema.
"""

from __future__ import annotations

import re

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DayTimeIntervalType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from ..catalog.identifiers import enum_type_name, pg_literal
from ..catalog.model import Column
from ..catalog.parsers import parse_enum_values, parse_precision_scale, parse_type_length
from .config import TypeMappingConfig

SPATIAL_TYPES = {
    "geometry",
    "point",
    "linestring",
    "polygon",
    "multipoint",
    "multilinestring",
    "multipolygon",
    "geometrycollection",
}

TEXT_TYPES = {"tinytext", "text", "mediumtext", "longtext"}
BLOB_TYPES = {"tinyblob", "blob", "mediumblob", "longblob"}

_INT_WIDEN = {
    # base -> (signed_pg, signed_spark, unsigned_pg, unsigned_spark)
    "tinyint": ("smallint", ShortType(), "smallint", ShortType()),
    "smallint": ("smallint", ShortType(), "integer", IntegerType()),
    "mediumint": ("integer", IntegerType(), "integer", IntegerType()),
    "int": ("integer", IntegerType(), "bigint", LongType()),
    "integer": ("integer", IntegerType(), "bigint", LongType()),
    "bigint": ("bigint", LongType(), "numeric(20)", DecimalType(20, 0)),
}


class UnsupportedTypeError(ValueError):
    pass


def _is_unsigned(column_type: str) -> bool:
    return "unsigned" in column_type.lower()


def map_mysql_type(col: Column, cfg: TypeMappingConfig) -> tuple[str, DataType]:
    base = col.data_type.lower()
    full = (col.column_type or base).lower()

    # opt-in UUID paths checked before the generic branches
    if cfg.binary16_as_uuid and base == "binary" and parse_type_length(full) == 16:
        return "uuid", StringType()
    if cfg.char36_as_uuid and base in ("char", "varchar") and parse_type_length(full) == 36:
        return "uuid", StringType()
    if cfg.tinyint1_as_boolean and full.startswith("tinyint(1)") and not _is_unsigned(full):
        return "boolean", BooleanType()

    if base in _INT_WIDEN:
        signed_pg, signed_sp, uns_pg, uns_sp = _INT_WIDEN[base]
        if _is_unsigned(full) and cfg.widen_unsigned_integers:
            return uns_pg, uns_sp
        return signed_pg, signed_sp

    if base in ("decimal", "numeric"):
        p, s = parse_precision_scale(full)
        p = p if p is not None else (col.precision or 10)
        s = s if s is not None else (col.scale or 0)
        return f"numeric({p},{s})", DecimalType(p, s)
    if base == "float":
        return "real", FloatType()
    if base in ("double", "real"):
        return "double precision", DoubleType()

    if base in ("varchar", "char"):
        n = parse_type_length(full) or col.char_max_len
        if cfg.ci_as_citext and col.collation.lower().endswith("_ci"):
            return "citext", StringType()
        if base == "char" and not cfg.char_as_varchar:
            return "text", StringType()
        if cfg.varchar_as_text or n is None:
            return "text", StringType()
        return f"varchar({n})", StringType()
    if base in TEXT_TYPES:
        return "text", StringType()
    if base == "json":
        return ("jsonb" if cfg.json_mode == "jsonb" else "json"), StringType()

    if base == "enum":
        if cfg.enum_mode == "native":
            return enum_type_name(parse_enum_values(col.column_type)), StringType()
        return "text", StringType()  # CHECK constraint is added by the DDL layer
    if base == "set":
        if cfg.set_mode in ("text_array", "text_array_check"):
            from pyspark.sql.types import ArrayType

            return "text[]", ArrayType(StringType())
        return "text", StringType()

    if base == "timestamp":
        return "timestamptz", TimestampType()
    if base == "datetime":
        if cfg.datetime_as_timestamptz:
            return "timestamptz", TimestampType()
        return "timestamp", TimestampNTZType()
    if base == "year":
        return "integer", IntegerType()
    if base == "date":
        return "date", DateType()
    if base == "time":
        if cfg.time_mode == "text":
            return "text", StringType()
        if cfg.time_mode == "interval":
            # MySQL TIME spans ±838:59:59 — wider than PG time; interval keeps it
            return "interval", DayTimeIntervalType()
        return "time", StringType()

    if base == "bit":
        n = parse_type_length(full) or 1
        if cfg.bit_mode == "bit":
            return f"bit({n})", StringType()
        if cfg.bit_mode == "varbit":
            return f"varbit({n})", StringType()
        return "bytea", BinaryType()

    if base in ("binary", "varbinary") or base in BLOB_TYPES:
        return "bytea", BinaryType()

    if base in SPATIAL_TYPES:
        if cfg.spatial_mode == "postgis":
            return "geometry", BinaryType()  # EWKB bytes
        if cfg.spatial_mode == "bytea":
            return "bytea", BinaryType()  # SRID+WKB as-is
        if cfg.spatial_mode == "text":
            return "text", StringType()  # WKT via server-side ST_AsText
        raise UnsupportedTypeError(
            f"spatial column {col.source_name!r} ({base}) requires spatial_mode"
        )

    if cfg.unknown_as_text:
        return "text", StringType()
    raise UnsupportedTypeError(f"unsupported MySQL type {col.column_type!r} for {col.source_name!r}")


_CURRENT_TS_RE = re.compile(r"^current_timestamp(\(\d*\))?$", re.IGNORECASE)
_NUMERIC_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def map_mysql_default(col: Column, pg_type: str, cfg: TypeMappingConfig) -> str | None:
    """Map a MySQL column default to a PG default expression (or None)."""
    d = col.default
    if d is None:
        return None
    base = col.data_type.lower()
    if _CURRENT_TS_RE.match(d.strip()):
        return "CURRENT_TIMESTAMP"
    if pg_type == "boolean":
        if d in ("0", "b'0'"):
            return "FALSE"
        if d in ("1", "b'1'"):
            return "TRUE"
        raise UnsupportedTypeError(f"boolean default {d!r}")
    if base == "bit":
        m = re.match(r"^b'([01]+)'$", d)
        bits = m.group(1) if m else d
        return f"B'{bits}'"
    if base == "set" and pg_type == "text[]":
        items = [v for v in d.split(",") if v != ""] if d else []
        inner = ", ".join(pg_literal(v) for v in items)
        return f"ARRAY[{inner}]::text[]"
    if base == "json":
        return f"{pg_literal(d)}::{ 'jsonb' if cfg.json_mode == 'jsonb' else 'json' }"
    if pg_type in ("bytea", "geometry") or pg_type.startswith("bytea"):
        raise UnsupportedTypeError(f"bytea/geometry default {d!r} not supported")
    if _NUMERIC_RE.match(d):
        return d
    return pg_literal(d)
