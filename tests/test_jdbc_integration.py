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


# -- live execution of the MySQL introspection SQL ---------------------------
#
# The MySQL catalog queries are INFORMATION_SCHEMA-shaped ANSI SQL; Derby
# lets us host equivalent-shaped mock catalog tables and EXECUTE the exact
# strings build_catalog_queries emits through a real JDBC session — so the
# SQL parses, binds, joins, and orders for real, not just its row parsers
# (reference source_mysql.go:142-413; the MSSQL twin lives further down —
# its sys.* views are mocked under "MSSQLSYS" because Derby reserves SYS).


_MOCK_CATALOG_DDL = [
    "CREATE SCHEMA INFORMATION_SCHEMA",
    """CREATE TABLE INFORMATION_SCHEMA.TABLES (
        TABLE_SCHEMA VARCHAR(64), TABLE_NAME VARCHAR(64),
        TABLE_TYPE VARCHAR(32))""",
    """CREATE TABLE INFORMATION_SCHEMA.COLUMNS (
        TABLE_SCHEMA VARCHAR(64), TABLE_NAME VARCHAR(64),
        COLUMN_NAME VARCHAR(64), DATA_TYPE VARCHAR(64),
        COLUMN_TYPE VARCHAR(256), CHARACTER_MAXIMUM_LENGTH BIGINT,
        NUMERIC_PRECISION BIGINT, NUMERIC_SCALE BIGINT,
        IS_NULLABLE VARCHAR(3), COLUMN_DEFAULT VARCHAR(256),
        EXTRA VARCHAR(64), GENERATION_EXPRESSION VARCHAR(256),
        ORDINAL_POSITION INT, CHARACTER_SET_NAME VARCHAR(64),
        COLLATION_NAME VARCHAR(64))""",
    """CREATE TABLE INFORMATION_SCHEMA.STATISTICS (
        TABLE_SCHEMA VARCHAR(64), TABLE_NAME VARCHAR(64),
        INDEX_NAME VARCHAR(64), NON_UNIQUE INT, SEQ_IN_INDEX INT,
        COLUMN_NAME VARCHAR(64), "COLLATION" VARCHAR(8), SUB_PART INT,
        EXPRESSION VARCHAR(256), INDEX_TYPE VARCHAR(16))""",
    """CREATE TABLE INFORMATION_SCHEMA.KEY_COLUMN_USAGE (
        CONSTRAINT_SCHEMA VARCHAR(64), CONSTRAINT_NAME VARCHAR(64),
        TABLE_SCHEMA VARCHAR(64), TABLE_NAME VARCHAR(64),
        COLUMN_NAME VARCHAR(64), REFERENCED_TABLE_NAME VARCHAR(64),
        REFERENCED_COLUMN_NAME VARCHAR(64), ORDINAL_POSITION INT)""",
    """CREATE TABLE INFORMATION_SCHEMA.REFERENTIAL_CONSTRAINTS (
        CONSTRAINT_SCHEMA VARCHAR(64), CONSTRAINT_NAME VARCHAR(64),
        UPDATE_RULE VARCHAR(16), DELETE_RULE VARCHAR(16))""",
]

_MOCK_CATALOG_ROWS = [
    "INSERT INTO INFORMATION_SCHEMA.TABLES VALUES ('appdb','orders','BASE TABLE')",
    "INSERT INTO INFORMATION_SCHEMA.TABLES VALUES ('appdb','users','BASE TABLE')",
    "INSERT INTO INFORMATION_SCHEMA.TABLES VALUES ('appdb','v1','VIEW')",
    "INSERT INTO INFORMATION_SCHEMA.TABLES VALUES ('otherdb','users','BASE TABLE')",
    """INSERT INTO INFORMATION_SCHEMA.COLUMNS VALUES
       ('appdb','users','id','bigint','bigint',NULL,19,0,'NO',NULL,
        'auto_increment','',1,NULL,NULL)""",
    """INSERT INTO INFORMATION_SCHEMA.COLUMNS VALUES
       ('appdb','users','email','varchar','varchar(190)',190,NULL,NULL,'YES',
        NULL,'','',2,'utf8mb4','utf8mb4_general_ci')""",
    """INSERT INTO INFORMATION_SCHEMA.COLUMNS VALUES
       ('appdb','orders','id','bigint','bigint',NULL,19,0,'NO',NULL,
        'auto_increment','',1,NULL,NULL)""",
    """INSERT INTO INFORMATION_SCHEMA.COLUMNS VALUES
       ('appdb','orders','user_id','bigint','bigint',NULL,19,0,'NO',NULL,
        '','',2,NULL,NULL)""",
    """INSERT INTO INFORMATION_SCHEMA.STATISTICS VALUES
       ('appdb','users','PRIMARY',0,1,'id','A',NULL,NULL,'BTREE')""",
    """INSERT INTO INFORMATION_SCHEMA.STATISTICS VALUES
       ('appdb','orders','PRIMARY',0,1,'id','A',NULL,NULL,'BTREE')""",
    """INSERT INTO INFORMATION_SCHEMA.STATISTICS VALUES
       ('appdb','orders','ix_user',1,1,'user_id','A',NULL,NULL,'BTREE')""",
    """INSERT INTO INFORMATION_SCHEMA.KEY_COLUMN_USAGE VALUES
       ('appdb','fk_orders_user','appdb','orders','user_id','users','id',1)""",
    """INSERT INTO INFORMATION_SCHEMA.REFERENTIAL_CONSTRAINTS VALUES
       ('appdb','fk_orders_user','RESTRICT','CASCADE')""",
]


def _rows_as_dicts(con, sql):
    st = con.createStatement()
    rs = st.executeQuery(sql)
    md = rs.getMetaData()
    labels = [md.getColumnLabel(i) for i in range(1, md.getColumnCount() + 1)]
    out = []
    while rs.next():
        row = {}
        for i, lab in enumerate(labels, start=1):
            v = rs.getObject(i)
            row[lab] = v
        out.append(row)
    st.close()
    return out


def test_mysql_catalog_sql_executes_against_live_jdbc(spark, tmp_path):
    from pgferry_spark.sources.mysql_introspect import (
        build_catalog_queries,
        parse_catalog_rows,
    )

    url = f"jdbc:derby:{tmp_path}/mockcat;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    con = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = con.createStatement()
        for ddl in _MOCK_CATALOG_DDL:
            st.executeUpdate(ddl)
        for ins in _MOCK_CATALOG_ROWS:
            st.executeUpdate(ins)
        st.close()

        qs = build_catalog_queries("appdb")
        # Dialect shim, one token: COLLATION is a Derby reserved word but a
        # plain column name in MySQL's INFORMATION_SCHEMA.STATISTICS — quote
        # it so Derby parses; everything else runs VERBATIM as emitted.
        qs["statistics"] = qs["statistics"].replace(
            "COLUMN_NAME, COLLATION,", 'COLUMN_NAME, "COLLATION",'
        )
        results = {name: _rows_as_dicts(con, sql) for name, sql in qs.items()}
    finally:
        con.close()

    # schema filter worked: no otherdb leakage, views excluded
    assert [r["TABLE_NAME"] for r in results["tables"]] == ["orders", "users"]
    schema = parse_catalog_rows(
        results["tables"], results["columns"],
        results["statistics"], results["foreign_keys"],
    )
    by_name = {t.source_name: t for t in schema.tables}
    assert set(by_name) == {"orders", "users"}
    assert [c.source_name for c in by_name["users"].columns] == ["id", "email"]
    assert by_name["users"].columns[0].extra == "auto_increment"
    assert by_name["users"].columns[1].char_max_len == 190
    fks = by_name["orders"].foreign_keys
    assert len(fks) == 1 and fks[0].ref_table == "users"
    assert fks[0].delete_rule == "CASCADE"


# MSSQL's catalog queries are plain ANSI join chains over sys.* views. Derby
# reserves the SYS schema, so the mock catalog lives in "MSSQLSYS" and the
# emitted SQL runs through a FOUR-token mechanical shim (schema prefix + the
# Derby-reserved words PRECISION/SCALE/COLLATION quoted); every join, filter,
# and ORDER BY otherwise executes verbatim through a real JDBC session
# (reference source_mssql.go:141-508).

_MSSQL_MOCK_DDL = [
    'CREATE SCHEMA "MSSQLSYS"',
    'CREATE TABLE "MSSQLSYS".schemas (schema_id INT, name VARCHAR(64))',
    'CREATE TABLE "MSSQLSYS".tables (object_id INT, name VARCHAR(64), schema_id INT)',
    'CREATE TABLE "MSSQLSYS".types '
    "(user_type_id INT, system_type_id INT, name VARCHAR(64))",
    'CREATE TABLE "MSSQLSYS".columns (object_id INT, column_id INT, '
    'name VARCHAR(64), user_type_id INT, max_length INT, "PRECISION" INT, '
    "scale INT, is_nullable BOOLEAN, is_identity BOOLEAN, is_computed BOOLEAN, "
    "default_object_id INT, collation_name VARCHAR(64))",
    'CREATE TABLE "MSSQLSYS".computed_columns '
    "(object_id INT, column_id INT, definition VARCHAR(256))",
    'CREATE TABLE "MSSQLSYS".default_constraints '
    "(object_id INT, definition VARCHAR(256))",
    'CREATE TABLE "MSSQLSYS".indexes (object_id INT, index_id INT, '
    "name VARCHAR(64), is_unique BOOLEAN, is_primary_key BOOLEAN, "
    "type_desc VARCHAR(32), has_filter BOOLEAN)",
    'CREATE TABLE "MSSQLSYS".index_columns (object_id INT, index_id INT, '
    "key_ordinal INT, column_id INT, is_descending_key BOOLEAN)",
    'CREATE TABLE "MSSQLSYS".foreign_keys (object_id INT, name VARCHAR(64), '
    "parent_object_id INT, referenced_object_id INT, "
    "update_referential_action_desc VARCHAR(32), "
    "delete_referential_action_desc VARCHAR(32))",
    'CREATE TABLE "MSSQLSYS".foreign_key_columns (constraint_object_id INT, '
    "constraint_column_id INT, parent_object_id INT, parent_column_id INT, "
    "referenced_object_id INT, referenced_column_id INT)",
]

_MSSQL_MOCK_ROWS = [
    # schemas: dbo plus a decoy that must be filtered out
    "INSERT INTO \"MSSQLSYS\".schemas VALUES (1,'dbo'),(2,'other')",
    # users(object 10, dbo) / orders(object 20, dbo) / decoy(object 30, other)
    "INSERT INTO \"MSSQLSYS\".tables VALUES "
    "(10,'Users',1),(20,'Orders',1),(30,'Decoy',2)",
    # types: 56=int (system), 231=nvarchar, 300=user-defined alias of nvarchar
    "INSERT INTO \"MSSQLSYS\".types VALUES "
    "(56,56,'int'),(231,231,'nvarchar'),(300,231,'EmailType')",
    # Users: id identity int pk, Email nvarchar(190) via user type + collation,
    # Total computed
    'INSERT INTO "MSSQLSYS".columns VALUES '
    "(10,1,'Id',56,4,10,0,false,true,false,NULL,NULL),"
    "(10,2,'Email',300,380,NULL,NULL,true,false,false,NULL,"
    "'SQL_Latin1_General_CP1_CI_AS'),"
    "(10,3,'Total',56,4,10,0,true,false,true,NULL,NULL),"
    "(20,1,'Id',56,4,10,0,false,true,false,NULL,NULL),"
    "(20,2,'UserId',56,4,10,0,false,false,false,77,NULL)",
    "INSERT INTO \"MSSQLSYS\".computed_columns VALUES (10,3,'([a]+[b])')",
    "INSERT INTO \"MSSQLSYS\".default_constraints VALUES (77,'((0))')",
    # Users PK; Orders PK + a DESC secondary + a filtered index
    'INSERT INTO "MSSQLSYS".indexes VALUES '
    "(10,1,'PK_Users',true,true,'CLUSTERED',false),"
    "(20,1,'PK_Orders',true,true,'CLUSTERED',false),"
    "(20,2,'IX_Orders_User',false,false,'NONCLUSTERED',false),"
    "(20,3,'IX_Filtered',false,false,'NONCLUSTERED',true)",
    'INSERT INTO "MSSQLSYS".index_columns VALUES '
    "(10,1,1,1,false),(20,1,1,1,false),(20,2,1,2,true),(20,3,1,2,false)",
    'INSERT INTO "MSSQLSYS".foreign_keys VALUES '
    "(90,'FK_Orders_Users',20,10,'NO_ACTION','CASCADE')",
    'INSERT INTO "MSSQLSYS".foreign_key_columns VALUES (90,1,20,2,10,1)',
]


def _mssql_derby_shim(sql: str) -> str:
    return (
        sql.replace("sys.", '"MSSQLSYS".')
        .replace("c.precision AS PRECISION", 'c."PRECISION" AS "PRECISION"')
        .replace("c.scale AS SCALE", 'c.scale AS "SCALE"')
        .replace("c.collation_name AS COLLATION",
                 'c.collation_name AS "COLLATION"')
    )


def test_mssql_catalog_sql_executes_against_live_jdbc(spark, tmp_path):
    from pgferry_spark.sources.mssql_introspect import (
        build_catalog_queries,
        parse_catalog_rows,
    )

    url = f"jdbc:derby:{tmp_path}/msmockcat;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    con = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = con.createStatement()
        for ddl in _MSSQL_MOCK_DDL:
            st.executeUpdate(ddl)
        for ins in _MSSQL_MOCK_ROWS:
            st.executeUpdate(ins)
        st.close()

        qs = build_catalog_queries("dbo")
        results = {
            name: _rows_as_dicts(con, _mssql_derby_shim(sql))
            for name, sql in qs.items()
        }
    finally:
        con.close()

    # schema filter worked: the 'other'-schema decoy never surfaces
    assert [r["TABLE_NAME"] for r in results["tables"]] == ["Orders", "Users"]

    schema = parse_catalog_rows(
        results["tables"], results["columns"],
        results["indexes"], results["foreign_keys"],
    )
    by_name = {t.source_name: t for t in schema.tables}
    assert set(by_name) == {"Orders", "Users"}

    users = by_name["Users"]
    assert [c.source_name for c in users.columns] == ["Id", "Email", "Total"]
    assert users.columns[0].extra == "auto_increment"
    # user-defined type resolved to its base system type; nvarchar len = bytes/2
    email = users.columns[1]
    assert email.data_type == "nvarchar" and email.char_max_len == 190
    assert email.collation == "SQL_Latin1_General_CP1_CI_AS"
    assert users.columns[2].extra == "COMPUTED"
    assert users.columns[2].generation_expression == "([a]+[b])"
    assert users.primary_key is not None and users.primary_key.is_primary

    orders = by_name["Orders"]
    assert orders.columns[1].default == "((0))"
    sec = {i.source_name: i for i in orders.indexes}
    assert sec["IX_Orders_User"].column_orders == ["DESC"]
    assert sec["IX_Filtered"].has_expression  # filtered index flagged for skip
    fk = orders.foreign_keys[0]
    assert fk.ref_table == "Users" and fk.delete_rule == "CASCADE"
    assert fk.update_rule == "NO ACTION"
