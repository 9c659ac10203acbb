"""DDL generation tests (mirror of reference ddl_test.go:10-595 coverage)."""

from pgferry_spark.catalog.model import Column, ForeignKey, Index, Table
from pgferry_spark.ddl import (
    add_foreign_key_sql,
    add_primary_key_sql,
    build_post_migrate_plan,
    create_enum_type_sql,
    create_index_sql,
    create_schema_sql,
    create_table_sql,
    index_skip_reason,
    sequence_reset_sql,
    unsigned_check_sql,
)
from pgferry_spark.types import TypeMappingConfig, map_mysql_default, map_mysql_type

CFG = TypeMappingConfig(tinyint1_as_boolean=True)


def users_table():
    return Table(
        source_name="Users",
        pg_name="users",
        columns=[
            Column("id", "id", "int", "int(11)", nullable=False, extra="auto_increment"),
            Column("name", "name", "varchar", "varchar(100)", nullable=False),
            Column("rating", "rating", "enum", "enum('G','PG')", default="G"),
            Column("ts", "ts", "timestamp", "timestamp", default="CURRENT_TIMESTAMP",
                   extra="on update CURRENT_TIMESTAMP"),
        ],
        primary_key=Index("PRIMARY", "PRIMARY", ["id"], is_primary=True, unique=True),
        indexes=[
            Index("idx_name", "idx_name", ["name"], ["DESC"]),
            Index("ft", "ft", ["name"], type="FULLTEXT"),
        ],
        foreign_keys=[],
    )


def test_create_table_quoting_defaults_checks():
    sql = create_table_sql(users_table(), "public", CFG, map_mysql_type, map_mysql_default)
    assert sql.startswith('CREATE UNLOGGED TABLE "public"."users"')
    assert '"id" integer NOT NULL' in sql
    assert '"name" varchar(100) NOT NULL' in sql
    assert "\"rating\" text DEFAULT 'G'" in sql
    assert 'CHECK ("rating" IN (\'G\', \'PG\'))' in sql
    assert '"ts" timestamptz DEFAULT CURRENT_TIMESTAMP' in sql


def test_create_table_logged():
    sql = create_table_sql(users_table(), "public", CFG, map_mysql_type, map_mysql_default, unlogged=False)
    assert sql.startswith('CREATE TABLE "public"."users"')


def test_schema_prepare():
    assert create_schema_sql("s", recreate=False) == ['CREATE SCHEMA "s"']
    assert create_schema_sql("s", recreate=True)[0] == 'DROP SCHEMA IF EXISTS "s" CASCADE'


def test_enum_type_idempotent_block():
    sql = create_enum_type_sql(["a", "b"])
    assert "DO $$ BEGIN" in sql and "duplicate_object" in sql and "'a', 'b'" in sql


def test_index_skip_policy():
    assert index_skip_reason(Index("i", "i", ["c"], type="FULLTEXT"), False) == "FULLTEXT index"
    assert index_skip_reason(Index("i", "i", ["c"], has_prefix=True), False) == "prefix index"
    assert index_skip_reason(Index("i", "i", [], type="BTREE"), False) == "no columns"
    assert index_skip_reason(Index("i", "i", ["c"], type="SPATIAL"), False) is not None
    assert index_skip_reason(Index("i", "i", ["c"], type="SPATIAL"), True) is None
    assert index_skip_reason(Index("i", "i", ["a", "b"], type="SPATIAL"), True) is not None
    assert index_skip_reason(Index("i", "i", ["c"]), False) is None


def test_index_sql_desc_and_unique():
    t = users_table()
    sql = create_index_sql(t, Index("idx_name", "idx_name", ["name"], ["DESC"], unique=True), "s", False)
    assert sql == 'CREATE UNIQUE INDEX "idx_name" ON "s"."users" ("name" DESC)'
    gist = create_index_sql(t, Index("gi", "gi", ["geo"], type="SPATIAL"), "s", True)
    assert "USING GIST" in gist


def test_pk_fk_sequence_check_sql():
    t = users_table()
    assert add_primary_key_sql(t, "s") == (
        'ALTER TABLE "s"."users" ADD CONSTRAINT "users_pkey" PRIMARY KEY ("id")'
    )
    fk = ForeignKey("fk_u", ["user_id"], "Users", "users", ["id"], delete_rule="SET NULL", update_rule="CASCADE")
    child = Table("Posts", "posts", [])
    fksql = add_foreign_key_sql(child, fk, "s")
    assert 'FOREIGN KEY ("user_id") REFERENCES "s"."users" ("id")' in fksql
    assert "ON UPDATE CASCADE" in fksql and "ON DELETE SET NULL" in fksql

    seq = sequence_reset_sql(t, t.columns[0], "s")
    assert any("setval" in s and "COALESCE((SELECT MAX(" in s for s in seq)
    assert any("SET DEFAULT nextval" in s for s in seq)

    chk = unsigned_check_sql(t, Column("u", "u", "int", "int unsigned"), "s")
    assert chk and "NOT VALID" in chk[0] and chk[0].count("4294967295") == 1
    assert "VALIDATE CONSTRAINT" in chk[1]
    assert unsigned_check_sql(t, Column("i", "i", "int", "int(11)"), "s") is None


def test_post_migrate_plan_order_and_content():
    cfg = TypeMappingConfig(tinyint1_as_boolean=True, unsigned_checks=True)
    plan = build_post_migrate_plan([users_table()], "s", cfg, unlogged=True)
    assert plan.set_logged == ['ALTER TABLE "s"."users" SET LOGGED']
    assert len(plan.primary_keys) == 1
    assert len(plan.indexes) == 1  # FULLTEXT skipped
    assert [s.reason for s in plan.skipped_indexes] == ["FULLTEXT index"]
    assert len(plan.sequences) == 4  # CREATE/SETVAL/DEFAULT/OWNED for the one auto_increment col
    assert len(plan.triggers) == 2  # ON UPDATE CURRENT_TIMESTAMP emulation
