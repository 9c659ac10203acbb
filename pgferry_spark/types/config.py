"""Type-mapping configuration knobs.

One flat config object covering the per-source toggles documented in the
reference (docs/type-mapping.md:8-145; defaults in reference config.go).
Field names follow the reference's TOML keys so configs translate 1:1.
"""

from __future__ import annotations

from dataclasses import dataclass

# max value per unsigned MySQL integer base type (shared by the DDL CHECK
# generator and the data-quality check operators)
UNSIGNED_MAX = {
    "tinyint": 255,
    "smallint": 65535,
    "mediumint": 16777215,
    "int": 4294967295,
    "integer": 4294967295,
    "bigint": 18446744073709551615,
}


@dataclass
class TypeMappingConfig:
    # MySQL
    tinyint1_as_boolean: bool = False
    widen_unsigned_integers: bool = True
    json_mode: str = "jsonb"  # jsonb | json
    enum_mode: str = "check"  # check | text | native
    set_mode: str = "text"  # text | text_array | text_array_check
    char_as_varchar: bool = True  # char(n) -> varchar(n); False -> text
    varchar_as_text: bool = False
    datetime_as_timestamptz: bool = False
    time_mode: str = "time"  # time | text | interval
    bit_mode: str = "bytea"  # bytea | bit | varbit
    binary16_as_uuid: bool = False
    mysql_uuid_to_bin_swap: bool = False
    char36_as_uuid: bool = False
    spatial_mode: str = "error"  # postgis | bytea | text | error
    # allow the migration to CREATE EXTENSION postgis itself; citext needs
    # no flag (auto-created when required — reference extensions.go:27-30)
    postgis_create_extension: bool = False
    zero_date_mode: str = "null"  # null | error
    unknown_as_text: bool = False
    unsigned_checks: bool = False
    ci_as_citext: bool = False
    # MSSQL
    xml_as_text: bool = False
    nvarchar_as_text: bool = False

    @property
    def use_postgis(self) -> bool:
        return self.spatial_mode == "postgis"
