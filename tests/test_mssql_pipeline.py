"""End-to-end pipeline run over an MSSQL-shaped catalog without a server:
a fake source backend supplies the introspected catalog (via the real
mssql_introspect parsers) and raw wire-shaped rows; the pipeline applies
the REAL MSSQL type mapping, transform dispatch (uniqueidentifier endian
fix, money->numeric(19,4), NUL-strip), DDL generation (identity, defaults,
nvarchar halving), and constraint replay (filtered-index skip, sequence
reset). Mirrors reference integration semantics for source_mssql.go."""

from dataclasses import dataclass
from decimal import Decimal

import pytest
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pgferry_spark.backends import SpoolTarget
from pgferry_spark.catalog.model import Schema, SourceObjects, Table
from pgferry_spark.config import MigrationConfig
from pgferry_spark.pipeline import MigrationPipeline
from pgferry_spark.sources import mssql_introspect as ms
from pgferry_spark.types import map_mssql_default, map_mssql_type
from pgferry_spark.types.config import TypeMappingConfig

ACCOUNT_COLUMNS = [
    {"TABLE_NAME": "Account", "COLUMN_NAME": "AccountID", "BASE_TYPE": "int",
     "IS_NULLABLE": False, "IS_IDENTITY": True, "ORDINAL": 1},
    {"TABLE_NAME": "Account", "COLUMN_NAME": "DisplayName", "BASE_TYPE": "nvarchar",
     "MAX_LENGTH": 200, "IS_NULLABLE": False, "ORDINAL": 2},
    {"TABLE_NAME": "Account", "COLUMN_NAME": "RowGuid", "BASE_TYPE": "uniqueidentifier",
     "IS_NULLABLE": True, "DEFAULT_DEFINITION": "(newid())", "ORDINAL": 3},
    {"TABLE_NAME": "Account", "COLUMN_NAME": "Balance", "BASE_TYPE": "money",
     "IS_NULLABLE": True, "ORDINAL": 4},
    {"TABLE_NAME": "Account", "COLUMN_NAME": "IsActive", "BASE_TYPE": "bit",
     "IS_NULLABLE": False, "DEFAULT_DEFINITION": "((1))", "ORDINAL": 5},
    {"TABLE_NAME": "Account", "COLUMN_NAME": "CreatedAt", "BASE_TYPE": "datetime2",
     "IS_NULLABLE": False, "DEFAULT_DEFINITION": "(getdate())", "ORDINAL": 6},
]

ACCOUNT_INDEXES = [
    {"TABLE_NAME": "Account", "INDEX_NAME": "PK_Account", "COLUMN_NAME": "AccountID",
     "IS_UNIQUE": True, "IS_PRIMARY": True, "TYPE_DESC": "CLUSTERED"},
    {"TABLE_NAME": "Account", "INDEX_NAME": "IX_Account_Active",
     "COLUMN_NAME": "DisplayName", "IS_UNIQUE": False,
     "TYPE_DESC": "NONCLUSTERED", "HAS_FILTER": True},  # filtered -> skipped
]

# wire-shaped rows: uniqueidentifier as raw MSSQL bytes (first 3 groups LE),
# money as double, bit as bool, NUL byte embedded in an nvarchar
_GUID_WIRE = bytes(
    [0x33, 0x22, 0x11, 0x00,  # 00112233 little-endian
     0x55, 0x44,              # 4455
     0x77, 0x66,              # 6677
     0x88, 0x99, 0xAA, 0xBB, 0xCC, 0xDD, 0xEE, 0xFF]
)

ACCOUNT_ROWS = [
    (1, "Contoso", _GUID_WIRE, 1234.5, True, "2024-01-01 10:00:00"),
    (2, "Fabrikam\x00Ltd", None, -0.0001, False, "2024-02-02 11:30:00"),
]


@dataclass
class FakeMSSQLSource:
    spark_ref: object
    kind: str = "mssql"

    def introspect(self) -> Schema:
        return ms.parse_catalog_rows(
            [{"TABLE_NAME": "Account"}], ACCOUNT_COLUMNS, ACCOUNT_INDEXES, []
        )

    def source_objects(self) -> SourceObjects:
        return SourceObjects(routines=["dbo.usp_rebuild_stats"])

    def read_table(self, spark, table: Table, predicates):
        schema = StructType(
            [
                StructField("account_id", LongType()),
                StructField("display_name", StringType()),
                StructField("row_guid", BinaryType()),
                StructField("balance", DoubleType()),
                StructField("is_active", BooleanType()),
                StructField("created_at", StringType()),
            ]
        )
        return spark.createDataFrame(ACCOUNT_ROWS, schema)

    def count(self, table: Table) -> int:
        return len(ACCOUNT_ROWS)

    def min_max(self, table: Table, key):
        return 1, 2


@pytest.fixture()
def mssql_pipe(spark, tmp_path):
    cfg = MigrationConfig(
        source_type="mssql", source_dsn="fake://", target_dsn="spool://x",
        target_schema="sales",
    )
    target = SpoolTarget(spark, str(tmp_path / "out"))
    pipe = MigrationPipeline(
        spark, cfg, FakeMSSQLSource(spark), target, map_mssql_type, map_mssql_default,
    )
    return pipe, target, tmp_path


def test_mssql_values_end_to_end(spark, mssql_pipe):
    pipe, target, tmp_path = mssql_pipe
    result = pipe.run()
    assert result.ok

    out = {r["account_id"]: r for r in
           spark.read.parquet(str(tmp_path / "out" / "account")).collect()}
    # F12: uniqueidentifier wire bytes -> canonical UUID (first 3 groups
    # un-little-endianed); NULL passthrough
    assert out[1]["row_guid"] == "00112233-4455-6677-8899-aabbccddeeff"
    assert out[2]["row_guid"] is None
    # F13: money -> numeric(19,4), exact 4-dp (no float repr drift)
    assert out[1]["balance"] == Decimal("1234.5000")
    assert out[2]["balance"] == Decimal("-0.0001")
    # NUL byte stripped from nvarchar
    assert out[2]["display_name"] == "FabrikamLtd"
    # bit passes through as boolean
    assert out[1]["is_active"] is True and out[2]["is_active"] is False


def test_mssql_uniqueidentifier_string_arm(spark):
    """F12's runtime type switch (reference source_mssql.go:857-877): the
    Go driver hands 16 wire bytes (arm above), but mssql-jdbc surfaces the
    CANONICAL STRING — the transform must lowercase/validate it, never hex
    its characters. r14, paired with the live smoke harness."""
    from pgferry_spark.functions.apply import apply_transforms

    tbl = ms.parse_catalog_rows(
        [{"TABLE_NAME": "Account"}],
        [r for r in ACCOUNT_COLUMNS if r["COLUMN_NAME"] == "RowGuid"],
        [], [],
    ).tables[0]
    df = spark.createDataFrame(
        [("00112233-4455-6677-8899-AABBCCDDEEFF",), (None,)],
        StructType([StructField("row_guid", StringType())]),
    )
    out = apply_transforms(df, tbl, "mssql", TypeMappingConfig())
    vals = [r["row_guid"] for r in out.collect()]
    assert vals == ["00112233-4455-6677-8899-aabbccddeeff", None]


def test_mssql_ddl_and_report(mssql_pipe):
    pipe, target, _ = mssql_pipe
    result = pipe.run()

    create = next(s for s in target.ddl if s.startswith("CREATE UNLOGGED TABLE"))
    assert '"account_id" integer NOT NULL' in create
    # nvarchar byte-length halved: 200 bytes -> varchar(100)
    assert '"display_name" varchar(100) NOT NULL' in create
    assert '"row_guid" uuid DEFAULT gen_random_uuid()' in create
    assert '"balance" numeric(19,4)' in create
    assert '"is_active" boolean DEFAULT TRUE NOT NULL' in create
    assert '"created_at" timestamp DEFAULT CURRENT_TIMESTAMP NOT NULL' in create

    # filtered index skipped with a reason; identity column replays a sequence
    assert any("filtered" in s["reason"] or "expression" in s["reason"]
               for s in result.report.skipped_indexes)
    assert any("setval" in s for s in target.ddl)
    assert result.report.routines == ["dbo.usp_rebuild_stats"]
