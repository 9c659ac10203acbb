"""Parquet (Spark-typed) → PostgreSQL type mapping.

Unlike the database sources there is no wire-format ambiguity: the catalog
column carries Spark's ``simpleString`` and maps 1:1 onto a PostgreSQL
type. Arrays map to PostgreSQL arrays of the element type (the only nested
shape the target DDL supports — matching the reference's text[] precedent,
reference ddl.go:198-214).
"""

from __future__ import annotations

import re

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
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

from ..catalog.model import Column
from .config import TypeMappingConfig
from .mysql import UnsupportedTypeError

_SCALARS: dict[str, tuple[str, DataType]] = {
    "tinyint": ("smallint", ByteType()),
    "smallint": ("smallint", ShortType()),
    "int": ("integer", IntegerType()),
    "bigint": ("bigint", LongType()),
    "float": ("real", FloatType()),
    "double": ("double precision", DoubleType()),
    "string": ("text", StringType()),
    "boolean": ("boolean", BooleanType()),
    "binary": ("bytea", BinaryType()),
    "date": ("date", DateType()),
    "timestamp": ("timestamptz", TimestampType()),
    "timestamp_ntz": ("timestamp", TimestampNTZType()),
}

_DECIMAL_RE = re.compile(r"^decimal\((\d+),(\d+)\)$")
_ARRAY_RE = re.compile(r"^array<(.+)>$")


def map_parquet_type(col: Column, cfg: TypeMappingConfig) -> tuple[str, DataType]:
    t = (col.data_type or "").lower()
    if t in _SCALARS:
        return _SCALARS[t]
    m = _DECIMAL_RE.match(t)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        return f"numeric({p},{s})", DecimalType(p, s)
    m = _ARRAY_RE.match(t)
    if m and m.group(1) in _SCALARS:
        pg_elem, spark_elem = _SCALARS[m.group(1)]
        return f"{pg_elem}[]", ArrayType(spark_elem)
    if cfg.unknown_as_text:
        return "text", StringType()
    raise UnsupportedTypeError(
        f"unsupported parquet/Spark type {col.data_type!r} for {col.source_name!r}"
    )


def map_parquet_default(col: Column, pg_type: str, cfg: TypeMappingConfig) -> str | None:
    return None  # parquet has no column defaults
