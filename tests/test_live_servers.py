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


def _splice_ewkb(wkb: bytes, srid: int) -> bytes:
    """Test-local golden EWKB construction (deliberately independent of
    functions.transforms.mysql_spatial_to_ewkb's hex surgery): set the
    0x20000000 SRID flag in the WKB type word and insert the SRID in the
    geometry's declared byte order."""
    import struct

    if srid == 0:
        return wkb
    bo = wkb[0]
    fmt = "<I" if bo == 1 else ">I"
    type_word = struct.unpack(fmt, wkb[1:5])[0] | 0x20000000
    return wkb[:1] + struct.pack(fmt, type_word) + struct.pack(fmt, srid) + wkb[5:]


@needs_mysql
class TestLiveMySQLSpatialAxisOrder:
    """MySQL 8 geographic-SRID axis order (VERDICT r13 missing #3): the
    reference exports spatial columns via ``ST_AsWKB(g,
    'axis-order=long-lat')`` (reference source_mysql.go:72-86,
    migrate.go:499-505); this repo instead reads the RAW internal value
    (4-byte LE SRID ‖ WKB) and splices EWKB in the transform layer, on
    the claim that MySQL's internal storage is ALREADY long-lat for
    geographic SRSs.  This class pins that equivalence against a live
    MySQL 8 server: the transform output must byte-equal the golden
    built from the server's own axis-order=long-lat export, and the
    first coordinate of a 4326 point must be the LONGITUDE."""

    GEO_TABLE = "pgferry_smoke_geo"
    # inserted as WKT 'POINT(48.8584 2.2945)' SRID 4326: MySQL reads WKT
    # in the SRS's declared axis order, which for EPSG:4326 is
    # latitude-longitude — so lat=48.8584, lon=2.2945
    LAT, LON = 48.8584, 2.2945

    @pytest.fixture(scope="class")
    def seeded(self, live_spark):
        con = _connect(live_spark, MYSQL_DSN, MYSQL_USER, MYSQL_PASSWORD)
        try:
            ver = _rows_as_dicts(con, "SELECT VERSION() AS V")[0]["V"]
            if int(str(ver).split(".", 1)[0]) < 8:
                pytest.skip(f"SRID-typed columns need MySQL 8 (server {ver})")
            _exec(
                con,
                f"DROP TABLE IF EXISTS {self.GEO_TABLE}",
                f"""CREATE TABLE {self.GEO_TABLE} (
                      id BIGINT NOT NULL PRIMARY KEY,
                      g GEOMETRY NOT NULL SRID 4326,
                      p GEOMETRY SRID 0
                    ) ENGINE=InnoDB""",
                f"""INSERT INTO {self.GEO_TABLE} (id, g, p) VALUES
                      (1, ST_GeomFromText('POINT({self.LAT} {self.LON})', 4326),
                          ST_GeomFromText('POINT(1 2)')),
                      (2, ST_GeomFromText(
                            'LINESTRING({self.LAT} {self.LON}, 0 0)', 4326),
                          NULL)""",
            )
        finally:
            con.close()
        yield
        con = _connect(live_spark, MYSQL_DSN, MYSQL_USER, MYSQL_PASSWORD)
        try:
            _exec(con, f"DROP TABLE IF EXISTS {self.GEO_TABLE}")
        finally:
            con.close()

    @pytest.fixture(scope="class")
    def reference_export(self, live_spark, seeded):
        """The reference's leg, run on the live server: per-row golden
        ``(srid, axis-order=long-lat WKB)``."""
        con = _connect(live_spark, MYSQL_DSN, MYSQL_USER, MYSQL_PASSWORD)
        try:
            try:
                rows = _rows_as_dicts(
                    con,
                    "SELECT id AS ID, ST_SRID(g) AS SRID, "
                    "HEX(ST_AsWKB(g, 'axis-order=long-lat')) AS WKB_LL, "
                    f"HEX(ST_AsWKB(p)) AS P_WKB FROM {self.GEO_TABLE} "
                    "ORDER BY id",
                )
            except Exception as exc:  # pragma: no cover - old-server path
                pytest.skip(f"ST_AsWKB axis-order option unsupported: {exc}")
        finally:
            con.close()
        return {int(r["ID"]): r for r in rows}

    @pytest.fixture(scope="class")
    def transformed(self, live_spark, seeded):
        """This repo's leg: raw read (select_expression returns the bare
        identifier for spatial columns in postgis mode) + the
        transform-layer EWKB splice."""
        from pgferry_spark.catalog.model import Column, Table
        from pgferry_spark.functions.apply import apply_transforms
        from pgferry_spark.sources.jdbc import mysql_source, read_table

        table = Table(
            source_name=self.GEO_TABLE,
            pg_name=self.GEO_TABLE,
            columns=[
                Column("id", "id", "bigint", "bigint", nullable=False),
                Column("g", "g", "geometry", "geometry", nullable=False),
                Column("p", "p", "geometry", "geometry"),
            ],
        )
        src = mysql_source(MYSQL_DSN, user=MYSQL_USER, password=MYSQL_PASSWORD)
        cfg = TypeMappingConfig(spatial_mode="postgis")
        df = read_table(live_spark, src, table, "mysql", cfg, plan=None)
        out = apply_transforms(df, table, "mysql", cfg)
        return {r["id"]: r for r in out.collect()}

    def test_ewkb_matches_server_long_lat_export(
        self, reference_export, transformed
    ):
        """Byte-for-byte: transform(raw internal value) == EWKB spliced
        from the server's own ST_AsWKB(..., 'axis-order=long-lat')."""
        for rid, ref in reference_export.items():
            golden = _splice_ewkb(
                bytes.fromhex(ref["WKB_LL"]), int(ref["SRID"])
            )
            assert bytes(transformed[rid]["g"]) == golden, f"row {rid}"

    def test_srid0_is_plain_wkb_passthrough(
        self, reference_export, transformed
    ):
        """SRID 0 strips the prefix and emits plain WKB, axis order moot."""
        assert bytes(transformed[1]["p"]) == bytes.fromhex(
            reference_export[1]["P_WKB"]
        )
        assert transformed[2]["p"] is None

    def test_first_coordinate_is_longitude(self, transformed):
        """THE axis-order claim, asserted on the decoded doubles: the
        EWKB point's X (bytes 9-16 for a little-endian point) is the
        longitude, i.e. MySQL's internal storage is long-lat even though
        EPSG:4326 declares lat-long."""
        import struct

        ewkb = bytes(transformed[1]["g"])
        assert ewkb[0] == 1  # little-endian
        type_word, srid = struct.unpack_from("<II", ewkb, 1)
        assert type_word == 0x20000001 and srid == 4326  # flagged point
        x, y = struct.unpack_from("<dd", ewkb, 9)
        assert x == pytest.approx(self.LON) and y == pytest.approx(self.LAT)


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
