"""Interactive config generator (the reference's wizard, O10; reference
wizard.go:54-568) — prompts for source/target, validates choices against the
config matrix, and renders the TOML. I/O is injected (``ask``/``say``
callables) so the flow is fully testable and scriptable.
"""

from __future__ import annotations

from typing import Callable

from .config import (
    VALID_ENUM_MODES,
    VALID_MODES,
    VALID_SET_MODES,
    VALID_SOURCE_TYPES,
    MigrationConfig,
    validate_config,
)
from .types.config import TypeMappingConfig


def _choose(ask: Callable[[str], str], prompt: str, valid: set[str], default: str) -> str:
    while True:
        raw = ask(f"{prompt} [{'/'.join(sorted(valid))}] (default {default}): ").strip()
        if not raw:
            return default
        if raw in valid:
            return raw


def run_wizard(
    ask: Callable[[str], str] = input,
    say: Callable[[str], None] = print,
) -> MigrationConfig:
    say("pgferry_spark migration config wizard")
    source_type = _choose(ask, "Source type", VALID_SOURCE_TYPES, "mysql")
    source_dsn = ""
    while not source_dsn:
        source_dsn = ask("Source DSN (e.g. host/db or /path/to.db): ").strip()
    mode = _choose(ask, "Mode", VALID_MODES, "full")
    target_dsn = ""
    if mode != "schema_only":
        while not target_dsn:
            target_dsn = ask("Target PostgreSQL DSN: ").strip()
    target_schema = ask("Target schema (default public): ").strip() or "public"

    tm = TypeMappingConfig()
    if source_type == "mysql":
        if ask("Map tinyint(1) to boolean? [y/N]: ").strip().lower() == "y":
            tm.tinyint1_as_boolean = True
        tm.enum_mode = _choose(ask, "Enum mode", VALID_ENUM_MODES, "check")
        tm.set_mode = _choose(ask, "Set mode", VALID_SET_MODES, "text")

    cfg = MigrationConfig(
        source_type=source_type,
        source_dsn=source_dsn,
        target_dsn=target_dsn,
        target_schema=target_schema,
        mode=mode,
        type_mapping=tm,
    )
    validate_config(cfg)
    say("Config validated.")
    return cfg


def render_toml(cfg: MigrationConfig) -> str:
    """Render the config as reference-compatible TOML (only non-default
    type-mapping keys are emitted)."""

    def lit(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return str(v)
        return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'

    lines = [
        f"source_type = {lit(cfg.source_type)}",
        f"source_dsn = {lit(cfg.source_dsn)}",
    ]
    if cfg.target_dsn:
        lines.append(f"target_dsn = {lit(cfg.target_dsn)}")
    lines.append(f"target_schema = {lit(cfg.target_schema)}")
    if cfg.mode != "full":
        lines.append(f"mode = {lit(cfg.mode)}")
    if cfg.chunk_size != 100_000:
        lines.append(f"chunk_size = {cfg.chunk_size}")

    defaults = TypeMappingConfig()
    tm_lines = [
        f"{name} = {lit(value)}"
        for name, value in vars(cfg.type_mapping).items()
        if value != getattr(defaults, name)
    ]
    if tm_lines:
        lines += ["", "[type_mapping]"] + tm_lines
    return "\n".join(lines) + "\n"
