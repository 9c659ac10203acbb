"""Row-count validation.

Parity with the reference's validation runner (reference validate.go:24-135):
per-table COUNT(*) on source and target, compared, deterministic report
order, any mismatch fails the run. In Spark the two counts are ``df.count()``
actions; countStar on parquet is metadata-only (statistics), so validation
cost at 100 TB is bounded by the *target*-side count, not a data scan.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable


@dataclass
class ValidationResult:
    table: str
    source_rows: int
    target_rows: int

    @property
    def ok(self) -> bool:
        return self.source_rows == self.target_rows


def validate_row_counts(
    tables: list[str],
    source_count: Callable[[str], int],
    target_count: Callable[[str], int],
    max_workers: int = 8,
) -> list[ValidationResult]:
    """Parallel per-table count comparison; results in input-table order."""

    def one(t: str) -> ValidationResult:
        return ValidationResult(t, source_count(t), target_count(t))

    with ThreadPoolExecutor(max_workers=max(1, max_workers)) as pool:
        results = list(pool.map(one, tables))
    return results
