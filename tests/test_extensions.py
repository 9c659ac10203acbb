"""Runtime extension-manager decision table (reference extensions.go:99-129)
driven through a fake run_sql; the live-server legs are in
test_postgres_integration.py."""

import pytest

from pgferry_spark.catalog.model import Column, Schema, Table
from pgferry_spark.extensions import (
    ExtensionError,
    ExtensionRequirement,
    collect_extension_requirements,
    ensure_required_extensions,
)
from pgferry_spark.types.config import TypeMappingConfig


def fake_db(installed: set[str], available: set[str]):
    """Catalog-probing fake: answers the two EXISTS probes and records
    CREATE EXTENSION statements."""
    created = []

    def run_sql(sql: str):
        if sql.startswith("CREATE EXTENSION"):
            created.append(sql)
            return []
        name = sql.split("extname = '")[1].split("'")[0]
        return [(name in installed, name in available)]

    return run_sql, created


def schema_with(ci: bool = False, spatial: bool = False) -> Schema:
    cols = [Column("id", "id", "int")]
    if ci:
        cols.append(
            Column("name", "name", "varchar", collation="utf8mb4_general_ci")
        )
    if spatial:
        cols.append(Column("loc", "loc", "point"))
    return Schema(tables=[Table("t", "t", columns=cols)])


class TestCollect:
    def test_citext_requirement_auto_creates(self):
        cfg = TypeMappingConfig(ci_as_citext=True)
        reqs = collect_extension_requirements(schema_with(ci=True), cfg)
        assert [r.name for r in reqs] == ["citext"]
        assert reqs[0].create_if_missing  # reference: always auto-create

    def test_postgis_requirement_gated_by_flag(self):
        cfg = TypeMappingConfig(spatial_mode="postgis")
        reqs = collect_extension_requirements(schema_with(spatial=True), cfg)
        assert [r.name for r in reqs] == ["postgis"]
        assert not reqs[0].create_if_missing
        assert "postgis_create_extension" in reqs[0].create_hint
        cfg2 = TypeMappingConfig(
            spatial_mode="postgis", postgis_create_extension=True
        )
        assert collect_extension_requirements(schema_with(spatial=True), cfg2)[
            0
        ].create_if_missing

    def test_no_matching_columns_no_requirements(self):
        cfg = TypeMappingConfig(ci_as_citext=True, spatial_mode="postgis")
        assert collect_extension_requirements(schema_with(), cfg) == []

    def test_sorted_by_name(self):
        cfg = TypeMappingConfig(ci_as_citext=True, spatial_mode="postgis")
        reqs = collect_extension_requirements(
            schema_with(ci=True, spatial=True), cfg
        )
        assert [r.name for r in reqs] == ["citext", "postgis"]


class TestEnsure:
    REQ = ExtensionRequirement("postgis", "postgis", create_if_missing=False,
                               create_hint="or set the flag")

    def test_installed_is_noop(self):
        run, created = fake_db(installed={"postgis"}, available={"postgis"})
        log = ensure_required_extensions(run, [self.REQ])
        assert log == ["postgis: already installed (postgis)"]
        assert created == []

    def test_unavailable_errors_before_any_work(self):
        run, created = fake_db(installed=set(), available=set())
        with pytest.raises(ExtensionError, match="not available on the target"):
            ensure_required_extensions(run, [self.REQ])
        assert created == []

    def test_available_but_not_creatable_errors_with_hint(self):
        run, created = fake_db(installed=set(), available={"postgis"})
        with pytest.raises(ExtensionError, match="install it first or set the flag"):
            ensure_required_extensions(run, [self.REQ])
        assert created == []

    def test_creatable_creates(self):
        req = ExtensionRequirement("citext", "ci_as_citext", create_if_missing=True)
        run, created = fake_db(installed=set(), available={"citext"})
        log = ensure_required_extensions(run, [req])
        assert log == ["citext: created (ci_as_citext)"]
        assert created == ['CREATE EXTENSION IF NOT EXISTS "citext"']

    def test_text_catalog_booleans_accepted(self):
        # psql -tA surfaces booleans as 't'/'f' strings
        def run(sql):
            if sql.startswith("CREATE"):
                return []
            return [("f", "t")]

        req = ExtensionRequirement("citext", "ci_as_citext", create_if_missing=True)
        assert ensure_required_extensions(run, [req]) == [
            "citext: created (ci_as_citext)"
        ]
