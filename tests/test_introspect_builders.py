"""MySQL/MSSQL introspection builder + parser tests over fixture rows
(modeled on FIXTURES.md F2 sakila16 features and the reference's MSSQL
semantics: nvarchar byte-length halving, identity, computed columns,
filtered-index skip flags)."""

from pgferry_spark.sources import mssql_introspect as ms
from pgferry_spark.sources import mysql_introspect as my


class TestMySQLIntrospect:
    def test_queries_are_batched_and_deterministic(self):
        qs = my.build_catalog_queries("app")
        assert set(qs) == {"tables", "columns", "statistics", "foreign_keys"}
        for sql in qs.values():
            assert "ORDER BY" in sql and "'app'" in sql
        assert "REFERENTIAL_CONSTRAINTS" in qs["foreign_keys"]
        # quote-escape of the schema name
        assert "''x''" in my.build_catalog_queries("'x'")["tables"]

    def test_parse_full_table(self):
        tables = [{"TABLE_NAME": "FilmActor"}]
        columns = [
            {
                "TABLE_NAME": "FilmActor", "COLUMN_NAME": "actorID",
                "DATA_TYPE": "smallint", "COLUMN_TYPE": "smallint unsigned",
                "IS_NULLABLE": "NO", "EXTRA": "auto_increment",
                "ORDINAL_POSITION": 1, "COLLATION_NAME": "",
            },
            {
                "TABLE_NAME": "FilmActor", "COLUMN_NAME": "lastUpdate",
                "DATA_TYPE": "timestamp", "COLUMN_TYPE": "timestamp",
                "IS_NULLABLE": "NO", "COLUMN_DEFAULT": "CURRENT_TIMESTAMP",
                "EXTRA": "on update CURRENT_TIMESTAMP", "ORDINAL_POSITION": 2,
            },
            {
                "TABLE_NAME": "FilmActor", "COLUMN_NAME": "fullName",
                "DATA_TYPE": "varchar", "COLUMN_TYPE": "varchar(91)",
                "IS_NULLABLE": "YES", "EXTRA": "STORED GENERATED",
                "GENERATION_EXPRESSION": "concat(first,' ',last)",
                "ORDINAL_POSITION": 3,
            },
        ]
        statistics = [
            {"TABLE_NAME": "FilmActor", "INDEX_NAME": "PRIMARY", "NON_UNIQUE": 0,
             "SEQ_IN_INDEX": 1, "COLUMN_NAME": "actorID", "INDEX_TYPE": "BTREE"},
            {"TABLE_NAME": "FilmActor", "INDEX_NAME": "idx_title", "NON_UNIQUE": 1,
             "SEQ_IN_INDEX": 1, "COLUMN_NAME": "fullName", "SUB_PART": 10,
             "INDEX_TYPE": "BTREE"},
            {"TABLE_NAME": "FilmActor", "INDEX_NAME": "ft_name", "NON_UNIQUE": 1,
             "SEQ_IN_INDEX": 1, "COLUMN_NAME": "fullName", "INDEX_TYPE": "FULLTEXT"},
            {"TABLE_NAME": "FilmActor", "INDEX_NAME": "idx_desc", "NON_UNIQUE": 1,
             "SEQ_IN_INDEX": 1, "COLUMN_NAME": "lastUpdate", "COLLATION": "D",
             "INDEX_TYPE": "BTREE"},
        ]
        fks = [
            {"TABLE_NAME": "FilmActor", "CONSTRAINT_NAME": "fk_actor",
             "COLUMN_NAME": "actorID", "REFERENCED_TABLE_NAME": "Actor",
             "REFERENCED_COLUMN_NAME": "actorID", "ORDINAL_POSITION": 1,
             "UPDATE_RULE": "CASCADE", "DELETE_RULE": "SET NULL"},
        ]
        schema = my.parse_catalog_rows(tables, columns, statistics, fks)
        t = schema.table("film_actor")
        assert t.column("actor_id").is_auto_increment
        assert t.column("full_name").is_generated
        assert t.primary_key.columns == ["actor_id"]
        named = {i.name: i for i in t.indexes}
        assert named["idx_title"].has_prefix
        assert named["ft_name"].type == "FULLTEXT"
        assert named["idx_desc"].column_orders == ["DESC"]
        fk = t.foreign_keys[0]
        assert fk.ref_pg_table == "actor" and fk.delete_rule == "SET NULL"


class TestMSSQLIntrospect:
    def test_queries_reference_sys_catalogs(self):
        qs = ms.build_catalog_queries("dbo")
        assert "sys.tables" in qs["tables"]
        assert "sys.types" in qs["columns"] and "user_type_id" in qs["columns"]
        assert "sys.index_columns" in qs["indexes"]
        assert "sys.foreign_key_columns" in qs["foreign_keys"]

    def test_nvarchar_halving_and_max(self):
        tables = [{"TABLE_NAME": "T"}]
        columns = [
            {"TABLE_NAME": "T", "COLUMN_NAME": "Name", "BASE_TYPE": "nvarchar",
             "MAX_LENGTH": 100, "IS_NULLABLE": True, "ORDINAL": 1},
            {"TABLE_NAME": "T", "COLUMN_NAME": "Blob", "BASE_TYPE": "nvarchar",
             "MAX_LENGTH": -1, "IS_NULLABLE": True, "ORDINAL": 2},
            {"TABLE_NAME": "T", "COLUMN_NAME": "Id", "BASE_TYPE": "int",
             "MAX_LENGTH": 4, "IS_NULLABLE": False, "IS_IDENTITY": True, "ORDINAL": 3},
            {"TABLE_NAME": "T", "COLUMN_NAME": "Total", "BASE_TYPE": "money",
             "MAX_LENGTH": 8, "IS_COMPUTED": True,
             "COMPUTED_DEFINITION": "([a]+[b])", "ORDINAL": 4},
            {"TABLE_NAME": "T", "COLUMN_NAME": "Amt", "BASE_TYPE": "decimal",
             "MAX_LENGTH": 9, "PRECISION": 10, "SCALE": 2, "ORDINAL": 5},
        ]
        schema = ms.parse_catalog_rows(tables, columns, [], [])
        t = schema.table("t")
        assert t.column("name").column_type == "nvarchar(50)"  # bytes / 2
        assert t.column("name").char_max_len == 50
        assert t.column("blob").column_type == "nvarchar(-1)"  # (max) → text
        assert t.column("id").is_auto_increment
        assert t.column("total").is_generated
        assert t.column("total").generation_expression == "([a]+[b])"
        assert t.column("amt").column_type == "decimal(10,2)"

    def test_indexes_and_fk_rules(self):
        tables = [{"TABLE_NAME": "Child"}]
        indexes = [
            {"TABLE_NAME": "Child", "INDEX_NAME": "PK_Child", "IS_UNIQUE": True,
             "IS_PRIMARY": True, "TYPE_DESC": "CLUSTERED", "KEY_ORDINAL": 1,
             "COLUMN_NAME": "Id"},
            {"TABLE_NAME": "Child", "INDEX_NAME": "IX_Filtered", "IS_UNIQUE": False,
             "IS_PRIMARY": False, "TYPE_DESC": "NONCLUSTERED", "HAS_FILTER": True,
             "KEY_ORDINAL": 1, "COLUMN_NAME": "A"},
            {"TABLE_NAME": "Child", "INDEX_NAME": "IX_Spatial", "IS_UNIQUE": False,
             "IS_PRIMARY": False, "TYPE_DESC": "SPATIAL", "KEY_ORDINAL": 1,
             "COLUMN_NAME": "Geo"},
            {"TABLE_NAME": "Child", "INDEX_NAME": "IX_Desc", "IS_UNIQUE": False,
             "IS_PRIMARY": False, "TYPE_DESC": "NONCLUSTERED", "KEY_ORDINAL": 1,
             "COLUMN_NAME": "B", "IS_DESC": True},
        ]
        fks = [
            {"TABLE_NAME": "Child", "FK_NAME": "FK_Child_Parent",
             "COLUMN_NAME": "ParentId", "REF_TABLE": "Parent", "REF_COLUMN": "Id",
             "ORDINAL": 1, "UPDATE_RULE": "NO_ACTION", "DELETE_RULE": "SET_NULL"},
        ]
        schema = ms.parse_catalog_rows(tables, [], indexes, fks)
        t = schema.table("child")
        assert t.primary_key.columns == ["id"]
        named = {i.name: i for i in t.indexes}
        assert named["ix_filtered"].has_expression  # filtered → skipped downstream
        assert named["ix_spatial"].type == "SPATIAL"
        assert named["ix_desc"].column_orders == ["DESC"]
        fk = t.foreign_keys[0]
        assert fk.delete_rule == "SET NULL" and fk.update_rule == "NO ACTION"

    def test_source_objects(self):
        objs = ms.parse_source_objects(
            [{"name": "v1"}], [{"name": "sp1"}, {"name": "fn1"}], []
        )
        assert objs.views == ["v1"] and objs.routines == ["sp1", "fn1"]
