"""Type-mapping parity tests (mirror of reference transform_test.go:15-101,
source_sqlite_test.go:12-64, source_mssql_test.go:10-186 coverage)."""

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
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

from pgferry_spark.catalog.model import Column
from pgferry_spark.types import (
    TypeMappingConfig,
    map_mssql_default,
    map_mssql_type,
    map_mysql_default,
    map_mysql_type,
    map_sqlite_default,
    map_sqlite_type,
)
from pgferry_spark.types.mysql import UnsupportedTypeError


def col(data_type, column_type="", **kw):
    return Column(source_name="c", pg_name="c", data_type=data_type, column_type=column_type or data_type, **kw)


CFG = TypeMappingConfig()


class TestMySQL:
    def test_integers_signed(self):
        assert map_mysql_type(col("tinyint", "tinyint(4)"), CFG) == ("smallint", ShortType())
        assert map_mysql_type(col("int", "int(11)"), CFG) == ("integer", IntegerType())
        assert map_mysql_type(col("bigint"), CFG) == ("bigint", LongType())

    def test_unsigned_widening(self):
        assert map_mysql_type(col("int", "int unsigned"), CFG) == ("bigint", LongType())
        assert map_mysql_type(col("smallint", "smallint unsigned"), CFG) == ("integer", IntegerType())
        assert map_mysql_type(col("bigint", "bigint unsigned"), CFG) == (
            "numeric(20)",
            DecimalType(20, 0),
        )

    def test_tinyint1_boolean_opt_in(self):
        c = col("tinyint", "tinyint(1)")
        assert map_mysql_type(c, CFG) == ("smallint", ShortType())
        cfg = TypeMappingConfig(tinyint1_as_boolean=True)
        assert map_mysql_type(c, cfg) == ("boolean", BooleanType())

    def test_decimal_float(self):
        assert map_mysql_type(col("decimal", "decimal(10,2)"), CFG) == (
            "numeric(10,2)",
            DecimalType(10, 2),
        )
        assert map_mysql_type(col("float"), CFG) == ("real", FloatType())
        assert map_mysql_type(col("double"), CFG) == ("double precision", DoubleType())

    def test_strings(self):
        assert map_mysql_type(col("varchar", "varchar(100)"), CFG) == ("varchar(100)", StringType())
        assert map_mysql_type(col("char", "char(20)"), CFG) == ("varchar(20)", StringType())
        assert map_mysql_type(col("text"), CFG) == ("text", StringType())
        assert map_mysql_type(col("json"), CFG) == ("jsonb", StringType())

    def test_enum_modes(self):
        c = col("enum", "enum('a','b')")
        assert map_mysql_type(c, CFG) == ("text", StringType())
        native = map_mysql_type(c, TypeMappingConfig(enum_mode="native"))[0]
        assert native.startswith("pgferry_enum_")

    def test_set_modes(self):
        c = col("set", "set('a','b')")
        assert map_mysql_type(c, CFG) == ("text", StringType())
        pg, sp = map_mysql_type(c, TypeMappingConfig(set_mode="text_array"))
        assert pg == "text[]" and sp == ArrayType(StringType())

    def test_temporal(self):
        assert map_mysql_type(col("timestamp"), CFG) == ("timestamptz", TimestampType())
        assert map_mysql_type(col("datetime"), CFG) == ("timestamp", TimestampNTZType())
        assert map_mysql_type(col("year"), CFG) == ("integer", IntegerType())
        assert map_mysql_type(col("date"), CFG) == ("date", DateType())
        assert map_mysql_type(col("time"), TypeMappingConfig(time_mode="interval"))[0] == "interval"

    def test_binary_and_uuid(self):
        assert map_mysql_type(col("binary", "binary(16)"), CFG) == ("bytea", BinaryType())
        cfg = TypeMappingConfig(binary16_as_uuid=True)
        assert map_mysql_type(col("binary", "binary(16)"), cfg) == ("uuid", StringType())
        cfg36 = TypeMappingConfig(char36_as_uuid=True)
        assert map_mysql_type(col("char", "char(36)"), cfg36) == ("uuid", StringType())
        assert map_mysql_type(col("blob"), CFG) == ("bytea", BinaryType())

    def test_bit_modes(self):
        assert map_mysql_type(col("bit", "bit(5)"), CFG) == ("bytea", BinaryType())
        assert map_mysql_type(col("bit", "bit(5)"), TypeMappingConfig(bit_mode="bit"))[0] == "bit(5)"

    def test_spatial_modes(self):
        c = col("point")
        with pytest.raises(UnsupportedTypeError):
            map_mysql_type(c, CFG)  # default: error
        assert map_mysql_type(c, TypeMappingConfig(spatial_mode="postgis")) == (
            "geometry",
            BinaryType(),
        )
        assert map_mysql_type(c, TypeMappingConfig(spatial_mode="text")) == ("text", StringType())

    def test_unknown(self):
        with pytest.raises(UnsupportedTypeError):
            map_mysql_type(col("weirdtype"), CFG)
        assert map_mysql_type(col("weirdtype"), TypeMappingConfig(unknown_as_text=True)) == (
            "text",
            StringType(),
        )

    def test_defaults(self):
        assert map_mysql_default(col("timestamp", default="CURRENT_TIMESTAMP"), "timestamptz", CFG) == "CURRENT_TIMESTAMP"
        assert map_mysql_default(col("tinyint", "tinyint(1)", default="1"), "boolean", CFG) == "TRUE"
        assert map_mysql_default(col("int", default="42"), "integer", CFG) == "42"
        assert map_mysql_default(col("varchar", "varchar(5)", default="a'b"), "varchar(5)", CFG) == "'a''b'"
        assert (
            map_mysql_default(col("set", "set('a','b')", default="a,b"), "text[]", CFG)
            == "ARRAY['a', 'b']::text[]"
        )
        assert map_mysql_default(col("int"), "integer", CFG) is None


class TestSQLite:
    def test_core(self):
        assert map_sqlite_type(col("INTEGER"), CFG) == ("bigint", LongType())
        assert map_sqlite_type(col("INT"), CFG) == ("bigint", LongType())
        assert map_sqlite_type(col("REAL"), CFG) == ("double precision", DoubleType())
        assert map_sqlite_type(col("TEXT"), CFG) == ("text", StringType())
        assert map_sqlite_type(col("VARCHAR", "VARCHAR(40)"), CFG) == ("text", StringType())
        assert map_sqlite_type(col("BLOB"), CFG) == ("bytea", BinaryType())
        assert map_sqlite_type(col("", ""), CFG) == ("bytea", BinaryType())  # undeclared

    def test_parameterized_numeric(self):
        assert map_sqlite_type(col("DECIMAL", "DECIMAL(10,2)"), CFG) == (
            "numeric(10,2)",
            DecimalType(10, 2),
        )
        assert map_sqlite_type(col("NUMERIC", "NUMERIC(8)"), CFG) == ("numeric(8)", DecimalType(8, 0))

    def test_rich_declared(self):
        assert map_sqlite_type(col("BOOLEAN"), CFG) == ("boolean", BooleanType())
        assert map_sqlite_type(col("DATETIME"), CFG) == ("timestamp", TimestampNTZType())
        assert map_sqlite_type(col("DATE"), CFG) == ("date", DateType())
        assert map_sqlite_type(col("JSON"), CFG) == ("jsonb", StringType())

    def test_defaults(self):
        assert map_sqlite_default(col("TEXT", default="CURRENT_TIMESTAMP"), "text", CFG) == "CURRENT_TIMESTAMP"
        assert map_sqlite_default(col("BOOLEAN", default="1"), "boolean", CFG) == "TRUE"
        assert map_sqlite_default(col("TEXT", default="'abc'"), "text", CFG) == "'abc'"
        assert map_sqlite_default(col("INTEGER", default="5"), "bigint", CFG) == "5"
        # expression defaults skipped
        assert map_sqlite_default(col("TEXT", default="(hex(randomblob(4)))"), "text", CFG) is None


class TestMSSQL:
    def test_core(self):
        assert map_mssql_type(col("bit"), CFG) == ("boolean", BooleanType())
        assert map_mssql_type(col("tinyint"), CFG) == ("smallint", ShortType())
        assert map_mssql_type(col("money"), CFG) == ("numeric(19,4)", DecimalType(19, 4))
        assert map_mssql_type(col("smallmoney"), CFG) == ("numeric(10,4)", DecimalType(10, 4))
        assert map_mssql_type(col("nvarchar", "nvarchar(50)"), CFG) == ("varchar(50)", StringType())
        assert map_mssql_type(col("nvarchar", "nvarchar(-1)"), CFG) == ("text", StringType())
        assert map_mssql_type(col("datetimeoffset"), CFG) == ("timestamptz", TimestampType())
        assert map_mssql_type(col("datetime2"), CFG) == ("timestamp", TimestampNTZType())

    def test_rowversion_is_bytea_not_datetime(self):
        assert map_mssql_type(col("timestamp"), CFG) == ("bytea", BinaryType())
        assert map_mssql_type(col("rowversion"), CFG) == ("bytea", BinaryType())

    def test_special_types(self):
        assert map_mssql_type(col("uniqueidentifier"), CFG) == ("uuid", StringType())
        assert map_mssql_type(col("hierarchyid"), CFG) == ("text", StringType())
        assert map_mssql_type(col("sql_variant"), CFG) == ("text", StringType())
        assert map_mssql_type(col("xml"), CFG) == ("xml", StringType())
        assert map_mssql_type(col("xml"), TypeMappingConfig(xml_as_text=True)) == ("text", StringType())

    def test_defaults(self):
        assert map_mssql_default(col("datetime", default="(getdate())"), "timestamp", CFG) == "CURRENT_TIMESTAMP"
        assert map_mssql_default(col("uniqueidentifier", default="(newid())"), "uuid", CFG) == "gen_random_uuid()"
        assert map_mssql_default(col("int", default="((1))"), "integer", CFG) == "1"
        assert map_mssql_default(col("nvarchar", "nvarchar(10)", default="(N'x''y')"), "varchar(10)", CFG) == "'x''y'"
        assert map_mssql_default(col("bit", default="((1))"), "boolean", CFG) == "TRUE"
