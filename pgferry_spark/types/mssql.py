"""MSSQL → (PostgreSQL type, Spark type) mapping.

Parity with the reference's MSSQL ``MapType``/``MapDefault`` (reference
source_mssql.go:603-732, 740-813). Notable semantics: ``nvarchar`` length is
stored as bytes and halved upstream during introspection; ``timestamp`` /
``rowversion`` is a byte cookie, NOT a datetime; ``uniqueidentifier`` needs a
mixed-endian fix at the value layer; money → numeric(19,4).
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
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from ..catalog.identifiers import pg_literal
from ..catalog.model import Column
from ..catalog.parsers import parse_precision_scale, parse_type_length, strip_balanced_parens
from .config import TypeMappingConfig
from .mysql import UnsupportedTypeError


def map_mssql_type(col: Column, cfg: TypeMappingConfig) -> tuple[str, DataType]:
    base = col.data_type.lower()
    full = (col.column_type or base).lower()

    if base == "bit":
        return "boolean", BooleanType()
    if base == "tinyint":  # MSSQL tinyint is UNSIGNED 0..255
        return "smallint", ShortType()
    if base == "smallint":
        return "smallint", ShortType()
    if base == "int":
        return "integer", IntegerType()
    if base == "bigint":
        return "bigint", LongType()
    if base in ("decimal", "numeric"):
        p, s = parse_precision_scale(full)
        p = p if p is not None else (col.precision or 18)
        s = s if s is not None else (col.scale or 0)
        return f"numeric({p},{s})", DecimalType(p, s)
    if base == "money":
        return "numeric(19,4)", DecimalType(19, 4)
    if base == "smallmoney":
        return "numeric(10,4)", DecimalType(10, 4)
    if base == "real":
        return "real", FloatType()
    if base == "float":
        return "double precision", DoubleType()

    if base in ("char", "nchar", "varchar", "nvarchar"):
        n = parse_type_length(full) or col.char_max_len
        if n is not None and base.startswith("n"):
            pass  # introspection already halves nvarchar byte lengths
        if n is None or n < 0 or cfg.nvarchar_as_text:  # n == -1 => (max)
            return "text", StringType()
        kind = "char" if base in ("char", "nchar") else "varchar"
        return f"{kind}({n})", StringType()
    if base in ("text", "ntext"):
        return "text", StringType()

    if base in ("datetime", "datetime2", "smalldatetime"):
        return "timestamp", TimestampNTZType()
    if base == "datetimeoffset":
        return "timestamptz", TimestampType()
    if base == "date":
        return "date", DateType()
    if base == "time":
        return "time", StringType()

    if base in ("binary", "varbinary", "image"):
        return "bytea", BinaryType()
    if base in ("timestamp", "rowversion"):
        return "bytea", BinaryType()  # row-version cookie, not a datetime
    if base == "uniqueidentifier":
        return "uuid", StringType()
    if base == "xml":
        return ("text" if cfg.xml_as_text else "xml"), StringType()
    if base == "sql_variant":
        return "text", StringType()  # server-side CAST to nvarchar(max) in the scan
    if base == "hierarchyid":
        return "text", StringType()  # server-side .ToString() in the scan
    if base in ("geometry", "geography"):
        if cfg.spatial_mode == "postgis":
            return "geometry", BinaryType()
        if cfg.spatial_mode == "bytea":
            return "bytea", BinaryType()
        if cfg.spatial_mode == "text":
            return "text", StringType()
        raise UnsupportedTypeError(f"spatial column {col.source_name!r} requires spatial_mode")

    if cfg.unknown_as_text:
        return "text", StringType()
    raise UnsupportedTypeError(f"unsupported MSSQL type {col.column_type!r} for {col.source_name!r}")


_NUMERIC_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def map_mssql_default(col: Column, pg_type: str, cfg: TypeMappingConfig) -> str | None:
    d = col.default
    if d is None:
        return None
    s = strip_balanced_parens(d)
    low = s.lower()
    if low in ("getdate()", "sysdatetime()", "getutcdate()", "sysutcdatetime()", "current_timestamp"):
        return "CURRENT_TIMESTAMP"
    if low in ("newid()", "newsequentialid()"):
        return "gen_random_uuid()"
    if low in ("suser_sname()", "user_name()", "current_user"):
        return "CURRENT_USER"
    m = re.match(r"^N'(.*)'$", s, re.DOTALL)
    if m:
        return pg_literal(m.group(1).replace("''", "'"))
    m = re.match(r"^'(.*)'$", s, re.DOTALL)
    if m:
        if pg_type == "boolean":
            pass
        return pg_literal(m.group(1).replace("''", "'"))
    if pg_type == "boolean" and s in ("0", "1"):
        return "TRUE" if s == "1" else "FALSE"
    if _NUMERIC_RE.match(s):
        return s
    return None
