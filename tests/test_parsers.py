import pytest

from pgferry_spark.catalog.parsers import (
    parse_enum_values,
    parse_precision_scale,
    parse_type_length,
    split_sql_statements,
    sqlite_normalize_affinity,
    strip_balanced_parens,
)


def test_enum_values_basic():
    assert parse_enum_values("enum('a','b','c')") == ["a", "b", "c"]
    assert parse_enum_values("SET('x','y')") == ["x", "y"]


def test_enum_values_escapes():
    assert parse_enum_values("enum('a''b','c\\'d')") == ["a'b", "c'd"]
    assert parse_enum_values("enum('a\\\\b')") == ["a\\b"]
    assert parse_enum_values("enum('')") == [""]


def test_enum_values_rejects_non_enum():
    with pytest.raises(ValueError):
        parse_enum_values("varchar(10)")


def test_type_length():
    assert parse_type_length("varchar(100)") == 100
    assert parse_type_length("tinyint(1) unsigned") == 1
    assert parse_type_length("binary(16)") == 16
    assert parse_type_length("text") is None


def test_precision_scale():
    assert parse_precision_scale("decimal(10,2)") == (10, 2)
    assert parse_precision_scale("numeric(5)") == (5, None)
    assert parse_precision_scale("int") == (None, None)


def test_strip_balanced_parens():
    assert strip_balanced_parens("((1))") == "1"
    assert strip_balanced_parens("(getdate())") == "getdate()"
    assert strip_balanced_parens("(a)+(b)") == "(a)+(b)"
    assert strip_balanced_parens("plain") == "plain"


def test_split_statements_basic():
    assert split_sql_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]


def test_split_statements_quotes_and_comments():
    sql = "INSERT INTO t VALUES ('a;b'); -- trailing; comment\nSELECT 1;"
    # comments are preserved inside statements (the ';' within one is inert)
    assert split_sql_statements(sql) == [
        "INSERT INTO t VALUES ('a;b')",
        "-- trailing; comment\nSELECT 1",
    ]
    sql2 = 'SELECT "we;ird"; /* c1 /* nested; */ still */ SELECT 2;'
    assert split_sql_statements(sql2) == ['SELECT "we;ird"', "/* c1 /* nested; */ still */ SELECT 2"]


def test_split_statements_dollar_quoting():
    sql = "CREATE FUNCTION f() AS $$ BEGIN x; END $$ LANGUAGE plpgsql; SELECT 1;"
    out = split_sql_statements(sql)
    assert len(out) == 2
    assert "BEGIN x; END" in out[0]
    sql_tag = "DO $tag$ a; b $tag$; SELECT 2;"
    out2 = split_sql_statements(sql_tag)
    assert out2[0] == "DO $tag$ a; b $tag$"


def test_split_statements_comment_only_dropped():
    assert split_sql_statements("-- nothing here\n;  /* also nothing */;SELECT 1") == ["SELECT 1"]


def test_sqlite_affinity():
    assert sqlite_normalize_affinity("BIGINT") == "INTEGER"
    assert sqlite_normalize_affinity("VARCHAR(10)") == "TEXT"
    assert sqlite_normalize_affinity("") == "BLOB"
    assert sqlite_normalize_affinity("FLOATING POINT") == "INTEGER"  # 'INT' wins first (SQLite rule)
    assert sqlite_normalize_affinity("DOUBLE") == "REAL"
    assert sqlite_normalize_affinity("STUFF") == "NUMERIC"
