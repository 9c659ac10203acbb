"""Data-quality check operators (P4) and wizard (O10) tests."""

import pytest

from pgferry_spark.operators import checks as C
from pgferry_spark.wizard import render_toml, run_wizard
from pgferry_spark.config import config_from_dict


class TestChecks:
    def df(self, spark):
        return spark.createDataFrame(
            [
                (1, "G", ["a"], 10),
                (2, "PG", ["a", "b"], 4294967295),
                (3, "X", ["a", "z"], -1),       # enum + set + unsigned violations
                (4, None, None, None),          # NULLs pass CHECKs
            ],
            "id: long, rating: string, tags: array<string>, n: long",
        )

    def test_single_pass_counts(self, spark):
        got = {
            r["check_name"]: (r["violations"], r["total"])
            for r in C.run_checks(
                self.df(spark),
                [
                    C.enum_check("rating", ["G", "PG"]),
                    C.set_check("tags", ["a", "b"]),
                    C.unsigned_check("n", "int"),
                    C.not_null_check("id"),
                ],
            ).collect()
        }
        assert got["rating_enum"] == (1, 4)
        assert got["tags_set"] == (1, 4)
        assert got["n_unsigned"] == (1, 4)
        assert got["id_not_null"] == (0, 4)

    def test_assert_raises_on_violation(self, spark):
        with pytest.raises(ValueError, match="rating_enum"):
            C.assert_checks(self.df(spark), [C.enum_check("rating", ["G", "PG"])])
        C.assert_checks(self.df(spark), [C.not_null_check("id")])  # clean


class TestWizard:
    def scripted(self, answers):
        it = iter(answers)
        return lambda prompt: next(it)

    def test_full_flow_and_toml(self):
        cfg = run_wizard(
            ask=self.scripted(
                ["mysql", "db://host/app", "full", "pg://t/db", "appschema", "y", "check", "text_array"]
            ),
            say=lambda s: None,
        )
        assert cfg.source_type == "mysql" and cfg.type_mapping.tinyint1_as_boolean
        assert cfg.type_mapping.set_mode == "text_array"
        toml = render_toml(cfg)
        assert 'source_type = "mysql"' in toml
        assert 'tinyint1_as_boolean = true' in toml
        assert "enum_mode" not in toml  # default values omitted
        # the rendered TOML must round-trip through the loader
        import tomllib

        cfg2 = config_from_dict(tomllib.loads(toml))
        assert cfg2.target_schema == "appschema"

    def test_defaults_and_reprompts(self):
        # invalid source type re-prompts; empty answers take defaults
        cfg = run_wizard(
            ask=self.scripted(["oracle", "", "/data/x.db", "schema_only", "", "", "", ""]),
            say=lambda s: None,
        )
        assert cfg.source_type == "mysql"  # default after the invalid answer
        assert cfg.mode == "schema_only" and cfg.target_dsn == ""
        assert cfg.target_schema == "public"
