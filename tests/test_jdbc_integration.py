"""Real JDBC read-path integration: Spark bundles the embedded Derby driver
(for the Hive metastore), which gives the sandbox a genuine JDBC database
with no server. This exercises sources/jdbc.py::read_table end to end —
spark.read.jdbc with a chunk-plan predicate list — the path every
MySQL/MSSQL migration takes with a real URL (S1/S2, reference
chunk.go:73-94, migrate.go:44-147)."""

import pytest

from pgferry_spark.catalog.model import Column, Table
from pgferry_spark.plans.chunk import plan_table_chunks
from pgferry_spark.sources.jdbc import JdbcSource, read_table
from pgferry_spark.types.config import TypeMappingConfig

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _users_table():
    cols = [
        Column(source_name="id", pg_name="id", data_type="bigint",
               column_type="bigint", nullable=False, ordinal_pos=1),
        Column(source_name="name", pg_name="name", data_type="varchar",
               column_type="varchar(50)", nullable=True, ordinal_pos=2),
    ]
    return Table(source_name="users", pg_name="users", columns=cols)


@pytest.fixture()
def derby_url(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    con = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = con.createStatement()
        st.executeUpdate(
            'CREATE TABLE "users" ("id" BIGINT NOT NULL, "name" VARCHAR(50))'
        )
        values = ", ".join(f"({i}, 'u{i}')" for i in range(1, 201))
        st.executeUpdate(f'INSERT INTO "users" VALUES {values}')
        st.close()
    finally:
        con.close()
    return url


def test_jdbc_partitioned_read_matches_full_read(spark, derby_url):
    src = JdbcSource(url=derby_url, driver=DRIVER, fetch_size=100)
    table = _users_table()
    cfg = TypeMappingConfig()

    plan = plan_table_chunks("users", '"id"', 1, 200, chunk_size=50)
    assert len(plan.chunks) == 4

    chunked = read_table(spark, src, table, "derby", cfg, plan=plan)
    # the predicate list maps 1:1 to read partitions (reference: one worker
    # semaphore slot per chunk)
    assert chunked.rdd.getNumPartitions() == 4
    rows = sorted((r["id"], r["name"]) for r in chunked.collect())
    assert len(rows) == 200
    assert rows[0] == (1, "u1") and rows[-1] == (200, "u200")

    full = read_table(spark, src, table, "derby", cfg, plan=None)
    assert sorted((r["id"], r["name"]) for r in full.collect()) == rows


def test_jdbc_predicate_prunes_rows(spark, derby_url):
    """A single-chunk plan reads exactly its key range (server-side WHERE)."""
    src = JdbcSource(url=derby_url, driver=DRIVER)
    table = _users_table()
    plan = plan_table_chunks("users", '"id"', 1, 200, chunk_size=50)
    one = plan_table_chunks("users", '"id"', 51, 100, chunk_size=50)
    df = read_table(spark, src, table, "derby", TypeMappingConfig(), plan=one)
    ids = sorted(r["id"] for r in df.collect())
    assert ids[0] == 51 and ids[-1] == 100 and len(ids) == 50
