"""End-to-end pipeline run over a MySQL-shaped catalog (FIXTURES.md F2
sakila subset semantics) without a server: a fake source backend supplies
the introspected catalog (via the real mysql_introspect parsers) and raw
wire-shaped rows; the pipeline applies the REAL MySQL type mapping,
transform dispatch (tinyint(1)->bool, enum NUL-strip + CHECK, SET->array,
YEAR->int, binary16->UUID), DDL generation, and constraint replay."""

from dataclasses import dataclass

import pytest
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pgferry_spark.backends import SpoolTarget
from pgferry_spark.catalog.model import Schema, SourceObjects, Table
from pgferry_spark.config import MigrationConfig
from pgferry_spark.pipeline import MigrationPipeline
from pgferry_spark.sources import mysql_introspect as my
from pgferry_spark.types import map_mysql_default, map_mysql_type

FILM_COLUMNS = [
    {"TABLE_NAME": "Film", "COLUMN_NAME": "film_id", "DATA_TYPE": "smallint",
     "COLUMN_TYPE": "smallint unsigned", "IS_NULLABLE": "NO",
     "EXTRA": "auto_increment", "ORDINAL_POSITION": 1},
    {"TABLE_NAME": "Film", "COLUMN_NAME": "title", "DATA_TYPE": "varchar",
     "COLUMN_TYPE": "varchar(255)", "IS_NULLABLE": "NO", "ORDINAL_POSITION": 2},
    {"TABLE_NAME": "Film", "COLUMN_NAME": "rating", "DATA_TYPE": "enum",
     "COLUMN_TYPE": "enum('G','PG','PG-13','R','NC-17')", "IS_NULLABLE": "YES",
     "COLUMN_DEFAULT": "G", "ORDINAL_POSITION": 3},
    {"TABLE_NAME": "Film", "COLUMN_NAME": "special_features", "DATA_TYPE": "set",
     "COLUMN_TYPE": "set('Trailers','Commentaries','Deleted Scenes')",
     "IS_NULLABLE": "YES", "ORDINAL_POSITION": 4},
    {"TABLE_NAME": "Film", "COLUMN_NAME": "release_year", "DATA_TYPE": "year",
     "COLUMN_TYPE": "year", "IS_NULLABLE": "YES", "ORDINAL_POSITION": 5},
    {"TABLE_NAME": "Film", "COLUMN_NAME": "active", "DATA_TYPE": "tinyint",
     "COLUMN_TYPE": "tinyint(1)", "IS_NULLABLE": "NO", "COLUMN_DEFAULT": "1",
     "ORDINAL_POSITION": 6},
    {"TABLE_NAME": "Film", "COLUMN_NAME": "uuid_bin", "DATA_TYPE": "binary",
     "COLUMN_TYPE": "binary(16)", "IS_NULLABLE": "YES", "ORDINAL_POSITION": 7},
]

FILM_STATS = [
    {"TABLE_NAME": "Film", "INDEX_NAME": "PRIMARY", "NON_UNIQUE": 0,
     "SEQ_IN_INDEX": 1, "COLUMN_NAME": "film_id", "INDEX_TYPE": "BTREE"},
    {"TABLE_NAME": "Film", "INDEX_NAME": "idx_title", "NON_UNIQUE": 1,
     "SEQ_IN_INDEX": 1, "COLUMN_NAME": "title", "SUB_PART": 10,
     "INDEX_TYPE": "BTREE"},  # prefix index -> skipped
]

# wire-shaped rows: tinyint as int, set as comma string, binary16 as bytes
FILM_ROWS = [
    (1, "ACADEMY DINOSAUR", "PG", "Trailers,Deleted Scenes", 2006, 1,
     bytes(range(16))),
    (2, "ACE GOLDFINGER\x00", "G", "", 2007, 0, None),  # NUL byte in text
]


@dataclass
class FakeMySQLSource:
    spark_ref: object
    kind: str = "mysql"

    def introspect(self) -> Schema:
        return my.parse_catalog_rows(
            [{"TABLE_NAME": "Film"}], FILM_COLUMNS, FILM_STATS, []
        )

    def source_objects(self) -> SourceObjects:
        return SourceObjects(views=["v_film_list"])

    def read_table(self, spark, table: Table, predicates):
        schema = StructType(
            [
                StructField("film_id", LongType()),
                StructField("title", StringType()),
                StructField("rating", StringType()),
                StructField("special_features", StringType()),
                StructField("release_year", IntegerType()),
                StructField("active", IntegerType()),
                StructField("uuid_bin", BinaryType()),
            ]
        )
        return spark.createDataFrame(FILM_ROWS, schema)

    def count(self, table: Table) -> int:
        return len(FILM_ROWS)

    def min_max(self, table: Table, key):
        return 1, 2


@pytest.fixture()
def mysql_pipe(spark, tmp_path):
    cfg = MigrationConfig(
        source_type="mysql", source_dsn="fake://", target_dsn="spool://x",
        target_schema="sakila",
    )
    cfg.type_mapping.tinyint1_as_boolean = True
    cfg.type_mapping.set_mode = "text_array"
    cfg.type_mapping.binary16_as_uuid = True
    target = SpoolTarget(spark, str(tmp_path / "out"))
    pipe = MigrationPipeline(
        spark, cfg, FakeMySQLSource(spark), target, map_mysql_type, map_mysql_default,
    )
    return pipe, target, tmp_path


def test_mysql_types_end_to_end(spark, mysql_pipe):
    pipe, target, tmp_path = mysql_pipe
    result = pipe.run()
    assert result.ok

    out = {r["film_id"]: r for r in
           spark.read.parquet(str(tmp_path / "out" / "film")).collect()}
    # F4: tinyint(1) -> boolean
    assert out[1]["active"] is True and out[2]["active"] is False
    # F5: SET -> text[], '' -> empty array
    assert out[1]["special_features"] == ["Trailers", "Deleted Scenes"]
    assert out[2]["special_features"] == []
    # F1: binary(16) -> canonical UUID string; NULL passthrough
    assert out[1]["uuid_bin"] == "00010203-0405-0607-0809-0a0b0c0d0e0f"
    assert out[2]["uuid_bin"] is None
    # F11: NUL byte stripped from varchar
    assert out[2]["title"] == "ACE GOLDFINGER"
    # F7: YEAR -> int
    assert out[1]["release_year"] == 2006


def test_mysql_ddl_and_report(mysql_pipe):
    pipe, target, _ = mysql_pipe
    result = pipe.run()

    create = next(s for s in target.ddl if s.startswith("CREATE UNLOGGED TABLE"))
    assert '"film_id" integer NOT NULL' in create  # unsigned smallint widened
    assert '"rating" text DEFAULT \'G\'' in create
    assert "CHECK (\"rating\" IN ('G', 'NC-17', 'PG', 'PG-13', 'R'))" in create or \
           "CHECK (\"rating\" IN ('G', 'PG', 'PG-13', 'R', 'NC-17'))" in create
    assert '"special_features" text[]' in create
    assert '"active" boolean' in create and "DEFAULT TRUE" in create
    assert '"uuid_bin" uuid' in create

    # prefix index skipped, reported in the plan
    assert any(s["reason"] == "prefix index" for s in result.report.skipped_indexes)
    # sequence replay for the auto_increment PK
    assert any("setval" in s for s in target.ddl)
    assert result.report.views == ["v_film_list"]