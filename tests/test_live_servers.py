"""Live MySQL / MSSQL smoke harness — the EXECUTABLE form of
docs/SCALE.md's "Live MySQL/MSSQL boundary — permanent contract"
(VERDICT r13 Next #6), mirroring the reference's ``//go:build
integration`` gate (reference integration_test.go:1 build tag;
:21-24 ``os.Getenv("MYSQL_DSN")`` + ``t.Skip`` when unset).

Every test here skips cleanly when no server is reachable (this
sandbox), and runs the real introspection → type-map → chunked read →
transform → sink loop when one is. One-command invocation against a
real server:

    PGFERRY_MYSQL_DSN='jdbc:mysql://host:3306/testdb' \
    PGFERRY_MYSQL_USER=root PGFERRY_MYSQL_PASSWORD=secret \
    PGFERRY_JDBC_JARS=/path/to/mysql-connector-j-8.4.0.jar \
    python -m pytest tests/test_live_servers.py -q

    PGFERRY_MSSQL_DSN='jdbc:sqlserver://host:1433;databaseName=testdb;encrypt=false' \
    PGFERRY_MSSQL_USER=sa PGFERRY_MSSQL_PASSWORD='Str0ng!Pass' \
    PGFERRY_JDBC_JARS=/path/to/mssql-jdbc-12.6.1.jre11.jar \
    python -m pytest tests/test_live_servers.py -q

Run this module in its OWN pytest process: the JDBC driver jar must be
on the DRIVER classpath at JVM start (``spark.jars`` /
``spark.driver.extraClassPath``), which cannot be injected into an
already-running shared test JVM. The module builds its own session for
exactly that reason.

What each smoke proves end to end (the surfaces the Derby-hosted mock
catalogs cannot: real server dialect acceptance + real JDBC driver
value coercion — docs/SCALE.md boundary cases 1-3):

* the catalog SQL strings from ``build_catalog_queries`` parse, bind,
  and order on the real server, and ``parse_catalog_rows`` assembles
  the seeded table from their live result sets;
* ``map_mysql_type`` / ``map_mssql_type`` drive both the DDL and the
  Spark read schema for the seeded tricky-type columns;
* ``build_source_select`` (server-side cast rewrites) is accepted by
  the server, and ``read_table`` moves rows through a chunk-plan
  predicate list;
* the transform layer (``apply_transforms``) reproduces the golden
  semantics on server-round-tripped values — tinyint(1) -> bool,
  SET -> text[], TIME -> interval, BINARY(16) -> UUID, money 4-dp;
* the frame lands in the COPY-shaped sink with exact row accounting.
"""

from __future__ import annotations

import os
import re
import uuid

import pytest

from pgferry_spark.types.config import TypeMappingConfig

MYSQL_DSN = os.environ.get("PGFERRY_MYSQL_DSN", "")
MYSQL_USER = os.environ.get("PGFERRY_MYSQL_USER", "")
MYSQL_PASSWORD = os.environ.get("PGFERRY_MYSQL_PASSWORD", "")
MSSQL_DSN = os.environ.get("PGFERRY_MSSQL_DSN", "")
MSSQL_USER = os.environ.get("PGFERRY_MSSQL_USER", "")
MSSQL_PASSWORD = os.environ.get("PGFERRY_MSSQL_PASSWORD", "")
JARS = os.environ.get("PGFERRY_JDBC_JARS", "")

needs_mysql = pytest.mark.skipif(
    not MYSQL_DSN, reason="PGFERRY_MYSQL_DSN not set (live-server smoke)"
)
needs_mssql = pytest.mark.skipif(
    not MSSQL_DSN, reason="PGFERRY_MSSQL_DSN not set (live-server smoke)"
)

SMOKE_TABLE = "pgferry_smoke"


@pytest.fixture(scope="module")
def live_spark():
    """Module-owned session with the driver jar(s) on the classpath.
    Deliberately NOT the shared conftest session — see module docstring."""
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[4]")
        .appName("pgferry_live_smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if JARS:
        jars = JARS.replace(":", ",")
        b = b.config("spark.jars", jars).config(
            "spark.driver.extraClassPath", JARS
        )
    s = b.getOrCreate()
    yield s


def _connect(spark, url: str, user: str, password: str):
    jvm = spark._jvm
    if user:
        return jvm.java.sql.DriverManager.getConnection(url, user, password)
    return jvm.java.sql.DriverManager.getConnection(url)


def _exec(con, *stmts: str) -> None:
    st = con.createStatement()
    try:
        for s in stmts:
            st.executeUpdate(s)
    finally:
        st.close()


def _rows_as_dicts(con, sql):
    """Live twin of test_jdbc_integration._rows_as_dicts: fetch a catalog
    query's result set as dict rows keyed by upper-cased column labels
    (MySQL lower-cases labels depending on server settings)."""
    st = con.createStatement()
    rs = st.executeQuery(sql)
    md = rs.getMetaData()
    labels = [
        md.getColumnLabel(i).upper() for i in range(1, md.getColumnCount() + 1)
    ]
    out = []
    while rs.next():
        out.append({lab: rs.getObject(i) for i, lab in enumerate(labels, 1)})
    st.close()
    return out


def _mysql_db_from_dsn(dsn: str) -> str:
    m = re.search(r"jdbc:mysql://[^/]+/([^?;]+)", dsn)
    assert m, f"cannot parse database name from {dsn!r}"
    return m.group(1)


# MSSQL introspection is per-SCHEMA (sys.* joins filter on s.name);
# the JDBC URL's databaseName selects the database
MSSQL_SCHEMA = os.environ.get("PGFERRY_MSSQL_SCHEMA", "dbo")


# ---------------------------------------------------------------------------
# MySQL
# ---------------------------------------------------------------------------


@needs_mysql
class TestLiveMySQL:
    @pytest.fixture(scope="class")
    def seeded(self, live_spark):
        """Seed the tricky-type smoke table (the reference CI seeds its own
        fixtures the same way — integration_test.go spins schema per test)."""
        con = _connect(live_spark, MYSQL_DSN, MYSQL_USER, MYSQL_PASSWORD)
        uid = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
        try:
            _exec(
                con,
                f"DROP TABLE IF EXISTS {SMOKE_TABLE}",
                f"""CREATE TABLE {SMOKE_TABLE} (
                      id BIGINT NOT NULL AUTO_INCREMENT PRIMARY KEY,
                      flag TINYINT(1),
                      tags SET('a','b','c'),
                      yr YEAR,
                      elapsed TIME,
                      uid BINARY(16),
                      body TEXT,
                      price DECIMAL(10,2)
                    ) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4""",
                f"""INSERT INTO {SMOKE_TABLE}
                      (flag, tags, yr, elapsed, uid, body, price) VALUES
                      (1, 'a,c', 2024, '838:59:59',
                       UNHEX('{uid.hex}'), 'hello world', 12.34),
                      (0, 'b', 1999, '-01:02:03', NULL, NULL, NULL),
                      (NULL, NULL, NULL, NULL, NULL, '', 0.00)""",
            )
        finally:
            con.close()
        yield uid
        con = _connect(live_spark, MYSQL_DSN, MYSQL_USER, MYSQL_PASSWORD)
        try:
            _exec(con, f"DROP TABLE IF EXISTS {SMOKE_TABLE}")
        finally:
            con.close()

    @pytest.fixture(scope="class")
    def catalog_table(self, live_spark, seeded):
        """Introspection leg: the exact catalog SQL strings, live."""
        from pgferry_spark.sources.mysql_introspect import (
            build_catalog_queries,
            parse_catalog_rows,
        )

        db = _mysql_db_from_dsn(MYSQL_DSN)
        con = _connect(live_spark, MYSQL_DSN, MYSQL_USER, MYSQL_PASSWORD)
        try:
            results = {
                name: _rows_as_dicts(con, sql)
                for name, sql in build_catalog_queries(db).items()
            }
        finally:
            con.close()
        schema = parse_catalog_rows(
            results["tables"], results["columns"],
            results["statistics"], results["foreign_keys"],
        )
        by_name = {t.source_name: t for t in schema.tables}
        assert SMOKE_TABLE in by_name, sorted(by_name)
        return by_name[SMOKE_TABLE]

    def test_introspection_sees_seeded_types(self, catalog_table):
        types = {c.source_name: c.data_type for c in catalog_table.columns}
        assert types["flag"] == "tinyint"
        assert types["tags"] == "set"
        assert types["yr"] == "year"
        assert types["elapsed"] == "time"
        assert types["uid"] == "binary"
        assert catalog_table.columns[0].extra == "auto_increment"
        assert catalog_table.primary_key is not None

    def test_type_map_drives_tricky_columns(self, catalog_table):
        from pgferry_spark.types.mysql import map_mysql_type

        cfg = TypeMappingConfig()
        pg = {
            c.source_name: map_mysql_type(c, cfg)[0]
            for c in catalog_table.columns
        }
        assert pg["flag"] == "boolean"      # F4
        assert pg["tags"] == "text[]"       # F5
        assert pg["elapsed"] == "interval"  # F8
        assert pg["uid"] == "uuid"          # F1

    def test_read_transform_sink_roundtrip(
        self, live_spark, seeded, catalog_table, tmp_path
    ):
        """The movement loop: chunk-plan read -> transforms -> sink, value
        fidelity asserted against the seeded literals."""
        from pgferry_spark.backends import SpoolTarget
        from pgferry_spark.functions.apply import apply_transforms
        from pgferry_spark.plans.chunk import plan_table_chunks
        from pgferry_spark.sources.jdbc import mysql_source, read_table

        src = mysql_source(MYSQL_DSN, user=MYSQL_USER, password=MYSQL_PASSWORD)
        cfg = TypeMappingConfig()
        plan = plan_table_chunks(SMOKE_TABLE, "`id`", 1, 3, chunk_size=2)
        df = read_table(live_spark, src, catalog_table, "mysql", cfg, plan=plan)
        assert df.rdd.getNumPartitions() == len(plan.chunks)
        out = apply_transforms(df, catalog_table, "mysql", cfg)
        rows = {r["id"]: r for r in out.collect()}
        assert len(rows) == 3
        assert rows[1]["flag"] is True and rows[2]["flag"] is False
        assert rows[3]["flag"] is None
        assert sorted(rows[1]["tags"]) == ["a", "c"]
        assert rows[1]["yr"] == 2024 and rows[2]["yr"] == 1999
        assert rows[1]["uid"] == str(seeded)
        assert rows[2]["elapsed"] is not None  # -01:02:03 parsed, not erred

        sink = SpoolTarget(live_spark, str(tmp_path))
        assert sink.write(out, SMOKE_TABLE) == 3
        assert sink.count(SMOKE_TABLE) == 3


# ---------------------------------------------------------------------------
# MSSQL
# ---------------------------------------------------------------------------


@needs_mssql
class TestLiveMSSQL:
    @pytest.fixture(scope="class")
    def seeded(self, live_spark):
        con = _connect(live_spark, MSSQL_DSN, MSSQL_USER, MSSQL_PASSWORD)
        uid = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
        try:
            _exec(
                con,
                f"DROP TABLE IF EXISTS {SMOKE_TABLE}",
                f"""CREATE TABLE {SMOKE_TABLE} (
                      id BIGINT IDENTITY(1,1) PRIMARY KEY,
                      uid UNIQUEIDENTIFIER,
                      amount MONEY,
                      label NVARCHAR(50),
                      node HIERARCHYID,
                      created DATETIME2
                    )""",
                f"""INSERT INTO {SMOKE_TABLE}
                      (uid, amount, label, node, created) VALUES
                      ('{uid}', 12.3456, N'héllo', '/1/2/',
                       '2024-07-22T12:00:00'),
                      (NULL, -0.0001, NULL, '/', NULL)""",
            )
        finally:
            con.close()
        yield uid
        con = _connect(live_spark, MSSQL_DSN, MSSQL_USER, MSSQL_PASSWORD)
        try:
            _exec(con, f"DROP TABLE IF EXISTS {SMOKE_TABLE}")
        finally:
            con.close()

    @pytest.fixture(scope="class")
    def catalog_table(self, live_spark, seeded):
        from pgferry_spark.sources.mssql_introspect import (
            build_catalog_queries,
            parse_catalog_rows,
        )

        con = _connect(live_spark, MSSQL_DSN, MSSQL_USER, MSSQL_PASSWORD)
        try:
            results = {
                name: _rows_as_dicts(con, sql)
                for name, sql in build_catalog_queries(MSSQL_SCHEMA).items()
            }
        finally:
            con.close()
        schema = parse_catalog_rows(
            results["tables"], results["columns"],
            results["indexes"], results["foreign_keys"],
        )
        by_name = {t.source_name: t for t in schema.tables}
        assert SMOKE_TABLE in by_name, sorted(by_name)
        return by_name[SMOKE_TABLE]

    def test_introspection_sees_seeded_types(self, catalog_table):
        types = {c.source_name: c.data_type for c in catalog_table.columns}
        assert types["uid"] == "uniqueidentifier"
        assert types["amount"] == "money"
        assert types["node"] == "hierarchyid"

    def test_type_map_drives_tricky_columns(self, catalog_table):
        from pgferry_spark.types.mssql import map_mssql_type

        cfg = TypeMappingConfig()
        pg = {
            c.source_name: map_mssql_type(c, cfg)[0]
            for c in catalog_table.columns
        }
        assert pg["uid"] == "uuid"              # F12
        assert pg["amount"] == "numeric(19,4)"  # F13

    def test_read_transform_sink_roundtrip(
        self, live_spark, seeded, catalog_table, tmp_path
    ):
        """hierarchyid.ToString() and sql_variant casts are accepted by the
        server (select_expression rewrites, S4), the uniqueidentifier
        endianness fix applies, money lands at exactly 4 dp."""
        from decimal import Decimal

        from pgferry_spark.backends import SpoolTarget
        from pgferry_spark.functions.apply import apply_transforms
        from pgferry_spark.sources.jdbc import JdbcSource, read_table

        src = JdbcSource(
            url=MSSQL_DSN,
            driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
            user=MSSQL_USER,
            password=MSSQL_PASSWORD,
        )
        cfg = TypeMappingConfig()
        df = read_table(live_spark, src, catalog_table, "mssql", cfg, plan=None)
        out = apply_transforms(df, catalog_table, "mssql", cfg)
        rows = {r["id"]: r for r in out.collect()}
        assert len(rows) == 2
        assert rows[1]["uid"] == str(seeded)
        assert rows[1]["amount"] == Decimal("12.3456")
        assert rows[1]["label"] == "héllo"
        assert rows[1]["node"] == "/1/2/"

        sink = SpoolTarget(live_spark, str(tmp_path))
        assert sink.write(out, SMOKE_TABLE) == 2
