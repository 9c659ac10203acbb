"""Interactive config generator (the reference's wizard, O10; reference
wizard.go:54-568) — prompts for source/target, validates choices against the
config matrix, live-tests connections, and renders the TOML. I/O is injected
(``ask``/``say`` callables) so the flow is fully testable and scriptable, and
the connection probe is an injected callable (reference wizard.go:25-28 uses
the same seam: package-var testers swapped in tests) so the probe path —
success, failure-then-reprompt, timeout — is unit-testable without a server.
"""

from __future__ import annotations

import re
import socket
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

_DEFAULT_PORTS = {"mysql": 3306, "mssql": 1433, "postgres": 5432}


def _host_port(dsn: str, default_port: int) -> tuple[str, int]:
    """Liberal host[:port] extraction covering the DSN shapes the wizard
    accepts: Go-style ``user:pw@tcp(host:3306)/db``, URL-style
    ``scheme://user:pw@host:port/db``, and bare ``host/db``."""
    s = dsn.strip()
    m = re.search(r"tcp\(([^)]+)\)", s)
    if m:
        s = m.group(1)
    else:
        if "://" in s:
            s = s.split("://", 1)[1]
        if "@" in s:
            s = s.rsplit("@", 1)[1]
        s = s.split("/", 1)[0].split("?", 1)[0]
    if ":" in s:
        host, _, p = s.rpartition(":")
        if p.isdigit():
            return host, int(p)
    return s, default_port


def probe_connection(source_type: str, dsn: str, timeout: float = 5.0) -> None:
    """Default live connection test (reference wizard.go:834-877, 5 s ping).
    Raises on failure; returns None on success.

    * ``sqlite`` — genuinely opens the file read-only and runs ``SELECT 1``
      (the real reference behavior, fully exercisable here);
    * ``mysql`` / ``mssql`` / ``postgres`` — TCP reachability with timeout:
      no wire-protocol client ships in this environment, so the probe
      verifies host:port liveness, the part a DSN typo most often breaks
      (standing deviation from the reference's driver-level ping).
    """
    if source_type == "sqlite":
        import sqlite3

        path = dsn.split("?", 1)[0]
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True, timeout=timeout)
        try:
            con.execute("SELECT 1")
        finally:
            con.close()
        return
    port = _DEFAULT_PORTS.get(source_type)
    if port is None:
        raise ValueError(f"unsupported source type {source_type!r}")
    host, port = _host_port(dsn, port)
    with socket.create_connection((host, port), timeout=timeout):
        return


def _prompt_dsn(
    ask: Callable[[str], str],
    say: Callable[[str], None],
    prompt: str,
    tester: Callable[[str], None],
) -> str:
    """DSN prompt with the reference's test-now loop: offer a live probe
    after each entry; a failed probe reports the error and re-prompts
    rather than accepting a dead DSN silently (wizard.go:964-992)."""
    while True:
        dsn = ""
        while not dsn:
            dsn = ask(prompt).strip()
        if ask("Test connection now? [Y/n]: ").strip().lower() in ("", "y", "yes"):
            try:
                tester(dsn)
            except Exception as exc:  # noqa: BLE001 - report any probe failure
                say(f"Connection test failed: {exc}")
                continue
            say("Connection OK.")
        return dsn


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
    test_source: Callable[[str, str], None] = probe_connection,
    test_target: Callable[[str], None] | None = None,
) -> MigrationConfig:
    if test_target is None:
        test_target = lambda dsn: probe_connection("postgres", dsn)  # noqa: E731
    say("pgferry_spark migration config wizard")
    source_type = _choose(ask, "Source type", VALID_SOURCE_TYPES, "mysql")
    source_dsn = _prompt_dsn(
        ask,
        say,
        "Source DSN (e.g. host/db or /path/to.db): ",
        lambda dsn: test_source(source_type, dsn),
    )
    mode = _choose(ask, "Mode", VALID_MODES, "full")
    target_dsn = ""
    if mode != "schema_only":
        target_dsn = _prompt_dsn(ask, say, "Target PostgreSQL DSN: ", test_target)
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
