"""Concrete source/target backends for the migration pipeline.

* ``SqliteSource`` — real introspection through the stdlib driver (the
  pragma surface, reference source_sqlite.go) + driver-side row fetch into a
  Spark DataFrame. SQLite is capped at one read connection by the reference
  (source_sqlite.go:173); a file-local database has no distributed read path
  anyway, so driver-side fetch + parallelize matches the reference's
  effective parallelism. MySQL/MSSQL take the JDBC partitioned path
  (sources/jdbc.py) instead.
* ``SpoolTarget`` — test/diagnostic target: DDL statements are recorded in
  order (inspectable, like a dry-run transcript), data lands as parquet per
  table. Swap for a JDBC/COPY target (sources/sink.py) against PostgreSQL;
  the pipeline only sees the 3-method protocol.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .catalog.model import Schema, SourceObjects, Table
from .catalog.parsers import sqlite_normalize_affinity
from .sources import sqlite_introspect as sq


_AFFINITY_SPARK = {
    "INTEGER": LongType(),
    "TEXT": StringType(),
    "REAL": DoubleType(),
    "NUMERIC": DoubleType(),
    "BLOB": BinaryType(),
}


@dataclass
class SqliteSource:
    path: str
    snake_case: bool = True
    kind: str = "sqlite"

    def introspect(self) -> Schema:
        return sq.introspect_schema(self.path, self.snake_case)

    def source_objects(self) -> SourceObjects:
        return sq.introspect_source_objects(self.path)

    def _read_schema(self, table: Table) -> StructType:
        """Spark read schema from declared-type affinity (SQLite's dynamic
        typing means the wire values follow affinity, not declarations)."""
        fields = []
        for c in table.columns:
            aff = sqlite_normalize_affinity(c.column_type or c.data_type)
            fields.append(StructField(c.pg_name, _AFFINITY_SPARK[aff], True))
        return StructType(fields)

    def read_table(
        self, spark: SparkSession, table: Table, predicates: list[str] | None
    ) -> DataFrame:
        schema = self._read_schema(table)
        preds = predicates if predicates else [None]
        rows: list[tuple] = []
        for p in preds:  # sequential: the reference's SQLite worker cap of 1
            rows.extend(tuple(r) for r in sq.read_table_rows(self.path, table, p))
        return spark.createDataFrame(rows, schema)

    def count(self, table: Table) -> int:
        con = sq.open_readonly(self.path)
        try:
            return con.execute(f'SELECT COUNT(*) FROM "{table.source_name}"').fetchone()[0]
        finally:
            con.close()

    def min_max(self, table: Table, key_source_name: str):
        con = sq.open_readonly(self.path)
        try:
            row = con.execute(
                f'SELECT MIN("{key_source_name}"), MAX("{key_source_name}") '
                f'FROM "{table.source_name}"'
            ).fetchone()
            return row[0], row[1]
        finally:
            con.close()


@dataclass
class SpoolTarget:
    spark: SparkSession
    root: str
    ddl: list[str] = field(default_factory=list)

    def execute(self, sql: str) -> None:
        self.ddl.append(sql)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(self, df: DataFrame, table: str, append: bool = False) -> int:
        rows = df.count()
        df.write.mode("append" if append else "overwrite").parquet(self._path(table))
        return rows

    def count(self, table: str) -> int:
        return self.spark.read.parquet(self._path(table)).count()
