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
class ParquetSource:
    """Parquet-directory source: migrate a parquet lake into a PostgreSQL-
    shaped target through the same pipeline the database sources use.

    Introspection derives the catalog from parquet footers (one driver-side
    schema read per table); ``pks`` marks numeric primary-key columns so the
    chunk planner produces range-partitioned reads (min/max probed with one
    aggregate per table). Reads are fully distributed parquet scans with the
    chunk predicates pushed to row-group pruning — at 100 TB this is the
    native path: no driver-side rows, no connection caps."""

    spark: SparkSession
    root: str
    tables: tuple = ()
    pks: dict = field(default_factory=dict)
    snake_case: bool = True
    kind: str = "parquet"

    def _path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.parquet")

    def _df(self, table: str) -> DataFrame:
        from .sources.parquet import read_parquet

        return read_parquet(self.spark, self._path(table))

    def introspect(self) -> Schema:
        from .catalog.identifiers import normalize_identifier
        from .catalog.model import Column, Index

        out = []
        for t in self.tables:
            df = self._df(t)
            cols = []
            for i, f in enumerate(df.schema.fields, start=1):
                cols.append(
                    Column(
                        source_name=f.name,
                        pg_name=normalize_identifier(f.name, self.snake_case),
                        data_type=f.dataType.simpleString(),
                        column_type=f.dataType.simpleString(),
                        nullable=f.nullable,
                        ordinal_pos=i,
                    )
                )
            pk = None
            pk_col = self.pks.get(t)
            if pk_col:
                pk = Index(
                    name=f"{t}_pkey", source_name=f"{t}_pkey",
                    columns=[normalize_identifier(pk_col, self.snake_case)],
                    column_orders=["ASC"], unique=True, is_primary=True,
                )
            out.append(
                Table(
                    source_name=t,
                    pg_name=normalize_identifier(t, self.snake_case),
                    columns=cols,
                    primary_key=pk,
                )
            )
        return Schema(tables=out)

    def source_objects(self) -> SourceObjects:
        return SourceObjects()

    def read_table(
        self, spark: SparkSession, table: Table, predicates: list[str] | None
    ) -> DataFrame:
        from pyspark.sql import functions as F

        df = self._df(table.source_name)
        if not predicates:
            return df
        from functools import reduce

        parts = [df.filter(F.expr(p)) for p in predicates]
        return reduce(DataFrame.unionByName, parts)

    def count(self, table: Table) -> int:
        return self._df(table.source_name).count()

    def min_max(self, table: Table, key_source_name: str):
        from pyspark.sql import functions as F

        row = self._df(table.source_name).agg(
            F.min(key_source_name), F.max(key_source_name)
        ).first()
        return row[0], row[1]


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

    def delete_where(self, table: str, predicate: str) -> None:
        """Idempotent-resume support: drop rows matching the predicate —
        the parquet-spool twin of a SQL target's ``DELETE FROM .. WHERE``
        (rewrite-on-delete, like any immutable-file table format)."""
        import shutil

        from pyspark.sql import functions as F

        path = self._path(table)
        if not os.path.exists(path):
            return
        tmp = path + "__delete_tmp"
        self.spark.read.parquet(path).filter(~F.expr(predicate)).write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.rmtree(path)
        os.replace(tmp, path)
        self.ddl.append(f"DELETE FROM {table} WHERE {predicate}")
