"""Catalog-driven transform application.

Builds the per-column ``Column`` expression list for a table — the Spark
equivalent of the reference applying ``TransformValue`` to every cell in the
COPY stream (reference migrate.go:459-466), except the dispatch happens once
per column at plan time instead of once per value at row time: the selected
expressions compile into whole-stage codegen, so at 100 TB the transform
layer costs one projection, not a per-row interpreter.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import DataType, StringType

from ..catalog.model import Column, Table
from ..catalog.parsers import parse_type_length
from ..types.config import TypeMappingConfig
from ..types.mysql import BLOB_TYPES, SPATIAL_TYPES, TEXT_TYPES
from . import transforms as X


def mysql_transform_expr(col: Column, cfg: TypeMappingConfig) -> SparkColumn:
    """Pick the F1–F11 transform for one MySQL column (reference
    source_mysql.go:652-850 dispatch)."""
    base = col.data_type.lower()
    full = (col.column_type or base).lower()
    src = F.col(col.pg_name)

    if cfg.binary16_as_uuid and base == "binary" and parse_type_length(full) == 16:
        return X.binary16_to_uuid(src, swap=cfg.mysql_uuid_to_bin_swap)
    if cfg.char36_as_uuid and base in ("char", "varchar") and parse_type_length(full) == 36:
        return X.validate_uuid_string(src)
    if cfg.tinyint1_as_boolean and full.startswith("tinyint(1)") and "unsigned" not in full:
        return X.tinyint1_to_boolean(src)
    if base == "json":
        return X.json_sanitize(src)
    if base == "set" and cfg.set_mode in ("text_array", "text_array_check"):
        return X.set_to_array(src)
    if base == "bit" and cfg.bit_mode in ("bit", "varbit"):
        return X.bit_to_bitstring(src, parse_type_length(full) or 1)
    if base == "year":
        return X.year_to_int(src)
    if base == "time" and cfg.time_mode == "interval":
        return X.mysql_time_to_interval_literal(src)
    if base in ("date", "datetime", "timestamp"):
        # zero dates only reach us in string form (S4 keeps them unparsed)
        return src
    if base in SPATIAL_TYPES and cfg.spatial_mode == "postgis":
        return X.mysql_spatial_to_ewkb(src)
    if base in TEXT_TYPES or base in ("varchar", "char", "enum") or (
        base == "set" and cfg.set_mode == "text"
    ):
        return X.strip_null_bytes(src)
    return src


def mssql_transform_expr(
    col: Column, cfg: TypeMappingConfig, input_type: DataType | None = None
) -> SparkColumn:
    """F12/F13 dispatch for MSSQL (reference source_mssql.go:856-914)."""
    base = col.data_type.lower()
    src = F.col(col.pg_name)
    if base == "uniqueidentifier":
        # the reference switches on the RUNTIME value type
        # (source_mssql.go:857-877: []byte -> mixed-endian fix, string ->
        # lowercase): the Go driver hands raw 16-byte wire values where
        # mssql-jdbc surfaces the canonical string. Mirror that switch on
        # the Spark input type so either driver shape is safe — applying
        # the endian fix to a string would hex its CHARACTERS.
        if input_type is not None and isinstance(input_type, StringType):
            return X.validate_uuid_string(src)
        return X.mssql_uniqueidentifier_to_uuid(src)
    if base in ("money", "smallmoney"):
        return X.mssql_money_to_decimal(src)
    if base in ("nvarchar", "nchar", "varchar", "char", "text", "ntext", "xml"):
        return X.strip_null_bytes(src)
    return src


def transform_exprs(
    table: Table,
    source_kind: str,
    cfg: TypeMappingConfig,
    input_types: dict[str, DataType] | None = None,
) -> list[SparkColumn]:
    """Ordered select-expression list for the whole table.

    ``input_types`` (pg_name -> actual Spark input type, normally
    ``{f.name: f.dataType for f in df.schema.fields}``) lets the MSSQL
    dispatch mirror the reference's runtime type switch; omitted, the
    wire-byte shapes are assumed (the Go-driver layout the unit fixtures
    feed)."""
    if source_kind == "mssql":
        types = input_types or {}
        return [
            mssql_transform_expr(c, cfg, types.get(c.pg_name)).alias(c.pg_name)
            for c in table.columns
        ]
    pick = {
        "mysql": mysql_transform_expr,
        "sqlite": lambda c, _cfg: F.col(c.pg_name),  # F14: identity passthrough
        "parquet": lambda c, _cfg: F.col(c.pg_name),  # typed at the source
    }[source_kind]
    return [pick(c, cfg).alias(c.pg_name) for c in table.columns]


def apply_transforms(
    df: DataFrame, table: Table, source_kind: str, cfg: TypeMappingConfig
) -> DataFrame:
    input_types = {f.name: f.dataType for f in df.schema.fields}
    return df.select(*transform_exprs(table, source_kind, cfg, input_types))
