"""SQL hook runner — the reference's only user-extensibility surface.

Parity with reference hooks.go:14-165: four fixed phases (before_data,
after_data, before_fk, after_all), hook files resolved relative to the
config directory, ``{{schema}}`` substitution, and statement splitting that
respects comments/quotes/dollar-quoting (catalog.parsers.split_sql_statements).
The executor is injected (any DB-API cursor / JDBC statement runner).
"""

from __future__ import annotations

from typing import Callable

from .catalog.parsers import split_sql_statements

HOOK_PHASES = ("before_data", "after_data", "before_fk", "after_all")


def render_hook_sql(raw_sql: str, schema: str) -> list[str]:
    """Substitute ``{{schema}}`` and split into executable statements."""
    return split_sql_statements(raw_sql.replace("{{schema}}", schema))


def run_hooks(
    hooks: dict[str, list[str]],
    phase: str,
    schema: str,
    execute: Callable[[str], None],
    read_file: Callable[[str], str] | None = None,
) -> int:
    """Run all hook files for ``phase``; returns #statements executed."""
    if phase not in HOOK_PHASES:
        raise ValueError(f"unknown hook phase {phase!r}")
    reader = read_file or (lambda p: open(p, encoding="utf-8").read())
    n = 0
    for path in hooks.get(phase, []):
        for stmt in render_hook_sql(reader(path), schema):
            execute(stmt)
            n += 1
    return n
