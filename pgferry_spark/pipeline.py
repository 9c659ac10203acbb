"""Migration pipeline orchestration.

The reference's 16-step sequence (reference docs/migration-pipeline.md:8-26,
main.go:125-348, post.go:17-100) re-expressed over Spark:

 1. introspect source schema → catalog
 2. advisory passes (unsupported types hard-gate, generated cols,
    skipped indexes, collations) → PlanReport
 3. target schema prepare + CREATE TABLE DDL (constraint-free, UNLOGGED)
 4. movement: chunk plan → partitioned read → transform projection →
    orphan cleanup (anti-join, FK delete/set-null rules) → write
 5. validation: per-table row-count comparison
 6. post-migrate constraint replay (SET LOGGED → PK → indexes → FKs →
    sequences → checks → triggers) + hooks at 4 phases
 7. checkpoint/resume around the movement phase

The **target backend** is pluggable: `execute(sql)` + `write(df, table)` +
`count(table)`. Production is JDBC/COPY against PostgreSQL; tests use a
local spool target. The reference's `workers` semaphore becomes Spark's
task scheduler over the chunk partitions.

`single_tx` snapshot mode (reference migrate.go:149-259) is the one
semantic it is impossible to distribute: one REPEATABLE READ transaction
cannot span executors. In that mode the pipeline degrades to a sequential
driver-side read per table through one connection — correct, slow,
documented (SURVEY §7 hard-part 1).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog.model import Schema, SourceObjects, Table
from .config import MigrationConfig
from .ddl import build_post_migrate_plan, create_schema_sql, create_table_sql, create_enum_type_sql
from .catalog.parsers import parse_enum_values
from .functions.apply import apply_transforms
from .hooks import run_hooks
from .operators.orphans import clean_orphans_delete, clean_orphans_set_null
from .plan_report import PlanReport, build_plan_report
from .plans.checkpoint import CheckpointManager, compatibility_fingerprint
from .plans.chunk import plan_table_chunks
from .plans.validation import ValidationResult, validate_row_counts


class TargetBackend(Protocol):
    def execute(self, sql: str) -> None: ...
    def write(self, df: DataFrame, table: str, append: bool = False) -> int: ...
    def count(self, table: str) -> int: ...


class SourceBackend(Protocol):
    kind: str
    def introspect(self) -> Schema: ...
    def source_objects(self) -> SourceObjects: ...
    def read_table(self, spark: SparkSession, table: Table, predicates: list[str] | None) -> DataFrame: ...
    def count(self, table: Table) -> int: ...
    def min_max(self, table: Table, key_source_name: str) -> tuple[int | None, int | None]: ...


@dataclass
class TableRunResult:
    table: str
    rows_written: int
    chunks: int
    orphans_removed: int = 0
    # True when every chunk was written by THIS run (not skipped/resumed):
    # rows_written is then the complete cleaned row count and validation can
    # trust it without a second source read
    complete_this_run: bool = True
    # wall seconds for this table's movement (read+transform+write+cleanup);
    # the reference logs per-table progress every 10s (migrate.go:469-473) —
    # this is the batch-run equivalent a operator reads post-hoc
    seconds: float = 0.0


@dataclass
class MigrationResult:
    tables: list[TableRunResult] = field(default_factory=list)
    validation: list[ValidationResult] = field(default_factory=list)
    report: PlanReport | None = None
    elapsed_sec: float = 0.0

    @property
    def ok(self) -> bool:
        return all(v.ok for v in self.validation)


class MigrationPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: MigrationConfig,
        source: SourceBackend,
        target: TargetBackend,
        type_mapper: Callable,
        default_mapper: Callable,
        checkpoint: CheckpointManager | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.source = source
        self.target = target
        self.type_mapper = type_mapper
        self.default_mapper = default_mapper
        self.checkpoint = checkpoint or CheckpointManager("", noop=True)
        # per-run caches: one persisted source read per table, shared by the
        # movement write, self-FK snapshot, parent anti-joins, and validation
        self._transformed_cache: dict[str, DataFrame] = {}
        self._cleaned_cache: dict[str, DataFrame] = {}
        # advisor outputs: source row counts measured at plan time (reused by
        # validation), parents whose FK anti-joins should broadcast
        self._source_counts: dict[str, int] = {}
        self._broadcast_parents: frozenset[str] = frozenset()
        # guards the per-run DataFrame caches when tables move concurrently
        # (wave-parallel movement, guide §2.6); CheckpointManager carries
        # its own lock
        self._cache_lock = threading.Lock()

    # -- steps ---------------------------------------------------------------

    def select_tables(self, schema: Schema) -> list[Table]:
        tables = schema.tables
        if self.cfg.include_tables:
            want = set(self.cfg.include_tables)
            tables = [t for t in tables if t.pg_name in want or t.source_name in want]
        if self.cfg.exclude_tables:
            skip = set(self.cfg.exclude_tables)
            tables = [t for t in tables if t.pg_name not in skip and t.source_name not in skip]
        return tables

    def hard_gate(self, report: PlanReport) -> None:
        if report.unsupported_columns:
            raise ValueError(f"unsupported columns abort the run: {report.unsupported_columns}")

    def ensure_extensions(self, tables: list[Table]) -> list[str]:
        """Runtime extension step (reference extensions.go:99-129, run
        before any DDL/data): probe the target's catalogs and create /
        reject per requirement. Targets without a ``query`` surface
        (spool, dry-run) can't probe a catalog — the static plan report
        still lists the requirement, and a real-server target enforces
        it here."""
        from .extensions import (
            collect_extension_requirements, ensure_required_extensions,
        )

        reqs = collect_extension_requirements(
            Schema(tables=tables), self.cfg.type_mapping
        )
        if not reqs:
            return []
        query = getattr(self.target, "query", None)
        if query is None:
            return []
        return ensure_required_extensions(query, reqs)

    def create_schema_objects(self, tables: list[Table]) -> None:
        for stmt in create_schema_sql(self.cfg.target_schema, self.cfg.on_schema_exists == "recreate"):
            self.target.execute(stmt)
        if self.cfg.type_mapping.enum_mode == "native":
            seen = set()
            for t in tables:
                for c in t.columns:
                    if c.data_type.lower() == "enum":
                        values = tuple(sorted(parse_enum_values(c.column_type)))
                        if values not in seen:
                            seen.add(values)
                            self.target.execute(
                                create_enum_type_sql(list(values), self.cfg.target_schema)
                            )
        for t in tables:
            self.target.execute(
                create_table_sql(
                    t, self.cfg.target_schema, self.cfg.type_mapping,
                    self.type_mapper, self.default_mapper,
                    unlogged=self.cfg.unlogged_tables,
                )
            )

    def chunk_plan_for(self, table: Table):
        from .plans.chunk import chunk_key_for_table

        pk_cols = table.primary_key.columns if table.primary_key else []
        col_types = {c.pg_name: (c.column_type or c.data_type) for c in table.columns}
        key = chunk_key_for_table(pk_cols, col_types)
        if key is None:
            return plan_table_chunks(table.pg_name, None, None, None, self.cfg.chunk_size)
        # predicates execute against the SOURCE database, so the chunk key in
        # the predicate text must be the source column name, not the
        # normalized pg_name (they differ whenever snake_casing renames)
        src_name = table.column(key).source_name
        lo, hi = self.source.min_max(table, src_name)
        return plan_table_chunks(table.pg_name, src_name, lo, hi, self.cfg.chunk_size)

    def plan_advice(self, tables: list[Table]):
        """Measure → advise → apply, before the movement phase (closes the
        loop plans/advisor.py documents; reference analogue: the advisory
        surface of plan.go:41-254).

        Measurements: one ``COUNT(*)`` per table from the source (cached in
        ``_source_counts`` so validation reuses it instead of re-counting),
        row width estimated from declared column types, and — only for
        children of at least ``advisor_skew_min_rows`` rows — a measured
        ``skew_profile`` of each single-column FK key (one column-pruned
        scan; below the threshold no reducer can straggle long enough to
        justify the diagnostic job).

        Application: ``spark.sql.shuffle.partitions`` sized for the largest
        table, AQE skew-join confs turned on when a hot key was measured,
        and the set of broadcast-sized FK parents recorded for
        ``clean_orphans`` to hint."""
        from .operators.skew import skew_profile
        from .plans.advisor import TableStats, advise_migration, estimate_row_bytes

        stats = []
        for t in tables:
            n = self.source.count(t)
            self._source_counts[t.pg_name] = n
            stats.append(TableStats(t.pg_name, n, estimate_row_bytes(t.columns)))
        names = {s.name for s in stats}
        edges = []
        for t in tables:
            for fk in t.foreign_keys:
                if fk.ref_pg_table == t.pg_name or fk.ref_pg_table not in names:
                    continue
                share = 0.0
                if (
                    self._source_counts[t.pg_name] >= self.cfg.advisor_skew_min_rows
                    and len(fk.columns) == 1
                ):
                    top = skew_profile(
                        self.source.read_table(self.spark, t, None).select(fk.columns[0]),
                        fk.columns[0], top=1,
                    ).collect()
                    if top:
                        share = float(top[0]["share"])
                edges.append((t.pg_name, fk.ref_pg_table, share))
        from .plans.advisor import (
            DEFAULT_BROADCAST_THRESHOLD, DEFAULT_TARGET_PARTITION_BYTES,
        )

        advice = advise_migration(
            stats, edges,
            parallelism=self.spark.sparkContext.defaultParallelism,
            broadcast_threshold=(
                self.cfg.advisor_broadcast_threshold or DEFAULT_BROADCAST_THRESHOLD
            ),
            target_partition_bytes=(
                self.cfg.advisor_target_partition_bytes
                or DEFAULT_TARGET_PARTITION_BYTES
            ),
        )
        for k, v in advice.conf.items():
            self.spark.conf.set(k, v)
        self._broadcast_parents = advice.broadcast_parents
        return advice

    def clean_orphans(
        self,
        df: DataFrame,
        table: Table,
        parents: dict[str, DataFrame],
        self_snapshot: DataFrame | None = None,
    ) -> tuple[DataFrame, int]:
        """J1 applied in-flight: anti-join each FK against its parent before
        the write (same final state as the reference's post-load DELETE).

        Self-referential FKs anti-join against the table's own pre-clean
        snapshot — matching SQL DELETE semantics, where the NOT EXISTS
        subquery evaluates against the pre-delete state of the WHOLE table
        (reference post.go:475-538). When ``df`` is one chunk batch of a
        larger table the caller must pass the full-table snapshot via
        ``self_snapshot``; anti-joining a batch against itself would delete
        valid rows whose parent lives in another batch. Row counting is one
        before/after pair for the whole FK set, not per FK."""
        snapshot = self_snapshot if self_snapshot is not None else df
        any_delete_rule = False
        for fk in table.foreign_keys:
            parent_df = (
                snapshot if fk.ref_pg_table == table.pg_name else parents.get(fk.ref_pg_table)
            )
            if parent_df is None:
                continue
            if fk.ref_pg_table in self._broadcast_parents and fk.ref_pg_table != table.pg_name:
                # advisor measured this parent under the broadcast threshold:
                # ship it to every executor so the child never shuffles
                parent_df = F.broadcast(parent_df)
            if fk.delete_rule.upper() == "SET NULL":
                df = clean_orphans_set_null(df, parent_df, fk.columns, fk.ref_columns)
            else:
                any_delete_rule = True
                df = clean_orphans_delete(df, parent_df, fk.columns, fk.ref_columns)
        removed = (snapshot.count() - df.count()) if any_delete_rule and self_snapshot is None else 0
        if any_delete_rule and self_snapshot is not None:
            removed = -1  # caller derives the count from write-side totals
        return df, removed

    def _full_transformed(self, table: Table) -> DataFrame:
        """Full-table source read → transforms, persisted and cached so the
        self-FK snapshot, parent cache, and validation all share ONE read
        (the reference reads each table once and validates from COPY row
        counts, validate.go:34-135 — this is the Spark analogue)."""
        with self._cache_lock:
            df = self._transformed_cache.get(table.pg_name)
            if df is None:
                df = apply_transforms(
                    self.source.read_table(self.spark, table, None),
                    table, self.source.kind, self.cfg.type_mapping,
                ).persist()
                self._transformed_cache[table.pg_name] = df
            return df

    def cleaned_source_df(self, table: Table, parents: dict[str, DataFrame]) -> DataFrame:
        """The table exactly as the movement phase writes it: full source
        read → transforms → orphan cleanup against the (cleaned) parents.
        Cached per table — consumers (parent cache, validation) share the
        same lineage over the one persisted transformed read."""
        cached = self._cleaned_cache.get(table.pg_name)
        if cached is not None:
            return cached
        cleaned, _ = self.clean_orphans(self._full_transformed(table), table, parents)
        self._cleaned_cache[table.pg_name] = cleaned
        return cleaned

    def move_table(self, table: Table, parents: dict[str, DataFrame]) -> TableRunResult:
        """Move one table with **chunk-granular restartability**: chunk
        predicates are processed in batches of ``workers×4``; each batch is
        one distributed read→transform→write job, and every chunk in the
        batch is marked complete only after the batch's write commits.

        Resume is **idempotent by delete-then-insert**: the production sinks
        commit per partition, so a crash mid-batch can leave some partitions
        committed with no chunk recorded. A resumed run re-plans the
        identical chunks (guarded by the compatibility fingerprint), DELETEs
        every not-yet-recorded chunk's key range from the target, and
        re-writes exactly those chunks — count-exact, no duplicate rows even
        when the crash landed between a partition commit and the checkpoint
        flush (BASELINE.md restartability target).
        """
        if self.checkpoint.is_table_done(table.pg_name):
            return TableRunResult(table.pg_name, 0, 0, complete_this_run=False)
        plan = self.chunk_plan_for(table)
        preds = plan.predicates()
        has_self_fk = any(fk.ref_pg_table == table.pg_name for fk in table.foreign_keys)

        def prepared(
            predicates: list[str] | None, self_snap: DataFrame | None
        ) -> tuple[DataFrame, DataFrame, int]:
            base = self.source.read_table(self.spark, table, predicates)
            base = apply_transforms(
                base, table, self.source.kind, self.cfg.type_mapping
            ).persist()  # counted + cleaned + written: one computation
            cleaned, removed = self.clean_orphans(base, table, parents, self_snapshot=self_snap)
            return base, cleaned, removed

        if preds is None or len(preds) <= 1:
            base, df, removed = prepared(preds, None)
            rows = self.target.write(df, table.pg_name)
            self.checkpoint.begin_table(table.pg_name, max(1, len(plan.chunks)))
            self.checkpoint.mark_table_done(table.pg_name, rows)
            # the written DataFrame IS the cleaned full table: cache it for
            # parent/validation reuse instead of re-reading the source
            self._transformed_cache.setdefault(table.pg_name, base)
            self._cleaned_cache.setdefault(table.pg_name, df)
            return TableRunResult(table.pg_name, rows, len(plan.chunks), removed)

        done = self.checkpoint.completed_indices(table.pg_name)
        self.checkpoint.begin_table(table.pg_name, len(preds))
        todo = [(i, p) for i, p in enumerate(preds) if i not in done]
        if done and todo:
            # partitions of an unrecorded chunk may have committed before the
            # crash — purge each pending chunk's key range so re-writes land
            # exactly once (reference records each chunk after its own COPY
            # transaction; per-range DELETE is the idempotent equivalent)
            pg_key = table.column(plan.chunk_key).pg_name if plan.chunk_key else None
            for i, _ in todo:
                chunk = plan.chunks[i]
                if chunk.predicate(pg_key) is not None:
                    self._delete_range(table.pg_name, chunk, pg_key)
        # self-FK cleanup must see the whole pre-clean table, not the batch
        self_snap = self._full_transformed(table) if has_self_fk else None
        batch_size = max(1, self.cfg.effective_workers() * 4)
        rows_total, removed_total = 0, 0
        batch_rows_in = 0
        appending = bool(done)  # resumed: prior chunks already landed
        for start in range(0, len(todo), batch_size):
            batch = todo[start : start + batch_size]
            base, df, removed = prepared([p for _, p in batch], self_snap)
            rows = self.target.write(df, table.pg_name, append=appending)
            if removed < 0:  # self-FK path: derive removals from write totals
                batch_rows_in += base.count()
                removed = 0
            base.unpersist()
            appending = True
            rows_total += rows
            removed_total += removed
            # chunks are marked after the batch write returns; a crash inside
            # the write is repaired by the delete-then-insert pass above on
            # the next resume. Rows land on the first chunk of the batch so
            # checkpoint row totals stay exact.
            for n, (i, _) in enumerate(batch):
                self.checkpoint.mark_chunk_done(table.pg_name, i, rows if n == 0 else 0)
        if has_self_fk and not done:
            removed_total = batch_rows_in - rows_total
        self.checkpoint.mark_table_done(table.pg_name, rows_total)
        return TableRunResult(
            table.pg_name, rows_total, len(preds), removed_total,
            complete_this_run=not done,
        )

    def _table_parallelism(self) -> int:
        """How many tables may move concurrently (guide §2.6: overlap
        independent jobs so the next table's tasks back-fill executors
        freed by the current table's straggler tail — at any scale the
        per-table read→write jobs end in a tail that otherwise idles
        the cluster). Sequential when the source is a one-connection
        snapshot (``single_tx``; config already forbids workers > 1
        there) or the target has not declared its ``write`` safe for
        concurrent per-table calls (a shared-connection COPY sink is
        not; the parquet spool writes disjoint paths and is)."""
        if self.cfg.source_snapshot_mode == "single_tx":
            return 1
        if not getattr(self.target, "concurrent_write_safe", False):
            return 1
        return max(1, self.cfg.effective_workers())

    def _move_wave(
        self, wave: list[Table], parent_dfs: dict[str, DataFrame],
        sink: list[TableRunResult] | None = None,
    ) -> list[TableRunResult]:
        """Move one dependency wave — tables whose FK parents have all
        landed — concurrently when allowed, preserving ``wave`` order in
        the returned results (and hence in ``result.tables``). Each
        table's movement is exactly the sequential ``move_table`` call;
        only the scheduling overlaps. Spark's scheduler is explicitly
        built for concurrent jobs from driver threads (FIFO: later jobs
        back-fill what earlier ones leave idle)."""

        def _one(table: Table) -> TableRunResult:
            t0 = time.perf_counter()
            res = self.move_table(table, parent_dfs)
            res.seconds = round(time.perf_counter() - t0, 3)
            return res

        workers = min(self._table_parallelism(), len(wave))
        if workers <= 1 or len(wave) <= 1:
            out: list[TableRunResult] = []
            for t in wave:
                res = _one(t)
                out.append(res)
                if sink is not None:
                    sink.append(res)
            return out
        from concurrent.futures import ThreadPoolExecutor

        # ADVICE r14: submit futures individually and harvest every
        # completed table before re-raising a failure — pool.map re-raises
        # the FIRST failed table's exception and discards the
        # TableRunResults of same-wave tables that finished; appending
        # completed results to ``sink`` (the caller's result.tables) as
        # they land keeps the run report's rows/seconds for every table
        # that actually moved, matching the sequential loop's behavior
        # (checkpoints already kept resume correct either way).
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futures = [pool.submit(_one, t) for t in wave]
            results: list[TableRunResult] = []
            first_exc: BaseException | None = None
            for fut in futures:
                try:
                    res = fut.result()
                except BaseException as exc:  # noqa: BLE001 — re-raised below
                    if first_exc is None:
                        first_exc = exc
                    continue
                results.append(res)
                if sink is not None:
                    sink.append(res)
            if first_exc is not None:
                raise first_exc
            return results

    def _delete_range(self, table: str, chunk, pg_key: str) -> None:
        """Purge one chunk's key range from the target. ``delete_where``
        receives the predicate over the BARE normalized column name (valid
        in both Spark SQL and fold-to-lowercase PostgreSQL); the raw-SQL
        fallback quotes identifiers pg-style."""
        if hasattr(self.target, "delete_where"):
            self.target.delete_where(table, chunk.predicate(pg_key))
        else:
            qualified = f"{_q(self.cfg.target_schema)}.{_q(table)}"
            self.target.execute(
                f"DELETE FROM {qualified} WHERE {chunk.predicate(_q(pg_key))}"
            )

    # -- the full sequence ---------------------------------------------------

    def run(self) -> MigrationResult:
        t0 = time.monotonic()
        result = MigrationResult()

        schema = self.source.introspect()
        tables = self.select_tables(schema)
        objects = self.source.source_objects()
        report = build_plan_report(
            Schema(tables=tables), objects, self.cfg.type_mapping,
            lambda c, cfg: self.type_mapper(c, cfg),
        )
        result.report = report
        self.hard_gate(report)

        if self.cfg.resume:
            payload = {
                "source_type": self.cfg.source_type,
                "target_schema": self.cfg.target_schema,
                "snake_case": self.cfg.snake_case_identifiers,
                "mode": self.cfg.mode,
                "unlogged": self.cfg.unlogged_tables,
                "chunk_size": self.cfg.chunk_size,
                "type_mapping": vars(self.cfg.type_mapping),
                "tables": {t.pg_name: [c.pg_name for c in t.columns] for t in tables},
            }
            self.checkpoint.fingerprint = compatibility_fingerprint(payload)
            self.checkpoint.payload = payload
            self.checkpoint.load()

        # extensions precede DDL *and* data_only loads: a missing postgis
        # must abort before the first spatial value hits the wire
        self.ensure_extensions(tables)

        if self.cfg.advise and self.cfg.mode != "schema_only" and tables:
            advice = self.plan_advice(tables)
            report.advice = advice.report_dict()

        if self.cfg.mode != "data_only":
            self.create_schema_objects(tables)

        if self.cfg.mode != "schema_only":
            if self.cfg.mode == "data_only":
                # existing target tables may carry triggers; disable around the
                # load (reference post.go:542-554, main.go:350-402)
                for t in tables:
                    self.target.execute(
                        f"ALTER TABLE {_q(self.cfg.target_schema)}.{_q(t.pg_name)} "
                        "DISABLE TRIGGER ALL"
                    )
            run_hooks(self.cfg.hooks, "before_data", self.cfg.target_schema, self.target.execute)

            # parents load first so FK cleanup can consume their DataFrames;
            # only tables some FK actually references are retained, and the
            # retained DataFrame is the CLEANED form (what was written), so
            # grandchildren are checked against surviving parent rows only
            referenced = {
                fk.ref_pg_table
                for t in tables
                for fk in t.foreign_keys
                if fk.ref_pg_table != t.pg_name
            }
            ordered = _parents_first(tables)
            parent_dfs: dict[str, DataFrame] = {}
            for wave in _dependency_waves(ordered):
                # completed tables append to result.tables as they land,
                # so a wave failure still leaves the report reflecting
                # every table that actually moved (ADVICE r14)
                self._move_wave(wave, parent_dfs, sink=result.tables)
                for table in wave:
                    if table.pg_name in referenced:
                        parent_dfs[table.pg_name] = self.cleaned_source_df(
                            table, parent_dfs
                        )
            run_hooks(self.cfg.hooks, "after_data", self.cfg.target_schema, self.target.execute)
            if self.cfg.mode == "data_only":
                for t in tables:
                    self.target.execute(
                        f"ALTER TABLE {_q(self.cfg.target_schema)}.{_q(t.pg_name)} "
                        "ENABLE TRIGGER ALL"
                    )

            if self.cfg.validation == "row_count":
                by_name = {t.pg_name: t for t in tables}
                results_by_name = {r.table: r for r in result.tables}

                def expected_count(name: str) -> int:
                    t = by_name[name]
                    if not any(
                        fk.ref_pg_table in parent_dfs or fk.ref_pg_table == t.pg_name
                        for fk in t.foreign_keys
                    ):
                        # the advisor already counted this table at plan time
                        if name in self._source_counts:
                            return self._source_counts[name]
                        return self.source.count(t)
                    # FK tables: the expected count is the cleaned row count.
                    # A fresh complete run already computed it on the source
                    # side of the write — reuse it instead of a second read
                    # (the reference validates source COUNT vs target COUNT;
                    # rows_written here is the source-derived plan count).
                    res = results_by_name.get(name)
                    if res is not None and res.complete_this_run:
                        return res.rows_written
                    # resumed/skipped tables: recompute from the source so
                    # prior-run orphan removals still validate correctly
                    return self.cleaned_source_df(t, parent_dfs).count()

                result.validation = validate_row_counts(
                    [t.pg_name for t in tables],
                    expected_count,
                    self.target.count,
                    max_workers=1,  # expected_count launches Spark jobs; keep serial
                )

            run_hooks(self.cfg.hooks, "before_fk", self.cfg.target_schema, self.target.execute)
            if self.cfg.mode != "data_only":
                # data_only loads into an existing schema whose constraints
                # are already in place — replay would duplicate them
                post = build_post_migrate_plan(
                    tables, self.cfg.target_schema, self.cfg.type_mapping,
                    unlogged=self.cfg.unlogged_tables,
                )
                for group in (post.set_logged, post.primary_keys, post.indexes,
                              post.foreign_keys, post.sequences, post.checks, post.triggers):
                    for stmt in group:
                        self.target.execute(stmt)
            run_hooks(self.cfg.hooks, "after_all", self.cfg.target_schema, self.target.execute)

        self.checkpoint.flush()
        if result.ok:
            self.checkpoint.delete()
        if hasattr(self.source, "close"):
            self.source.close()  # single_tx: ends the snapshot transaction
        for df in self._transformed_cache.values():
            df.unpersist()
        self._transformed_cache.clear()
        self._cleaned_cache.clear()
        result.elapsed_sec = time.monotonic() - t0
        return result


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _dependency_waves(ordered: list[Table]) -> list[list[Table]]:
    """Partition a parents-first table list into waves: every table in a
    wave has all its (present, non-self) FK parents in earlier waves, so
    waves run in order and tables inside a wave are mutually independent.
    FK-free schemas (the parquet-lake case) collapse to ONE wave. A cycle
    leaves no table ready; the fallback emits the next table alone in
    ``ordered`` order — exactly the sequential loop's behavior (the
    missing parent is skipped by ``clean_orphans``'s ``parents.get``)."""
    names = {t.pg_name for t in ordered}
    done: set[str] = set()
    remaining = list(ordered)
    waves: list[list[Table]] = []
    while remaining:
        wave = [
            t
            for t in remaining
            if all(
                fk.ref_pg_table == t.pg_name
                or fk.ref_pg_table not in names
                or fk.ref_pg_table in done
                for fk in t.foreign_keys
            )
        ]
        if not wave:  # FK cycle: fall back to strict sequential order
            wave = [remaining[0]]
        waves.append(wave)
        done.update(t.pg_name for t in wave)
        in_wave = {t.pg_name for t in wave}
        remaining = [t for t in remaining if t.pg_name not in in_wave]
    return waves


def _parents_first(tables: list[Table]) -> list[Table]:
    """Topological-ish order: referenced tables before referencing ones
    (cycles broken by input order, matching the reference's deferred-FK
    posture — constraints only replay after all data lands)."""
    by_name = {t.pg_name: t for t in tables}
    visited: dict[str, int] = {}
    out: list[Table] = []

    def visit(t: Table) -> None:
        state = visited.get(t.pg_name, 0)
        if state:  # 1 = in progress (cycle) or 2 = done
            return
        visited[t.pg_name] = 1
        for fk in t.foreign_keys:
            ref = by_name.get(fk.ref_pg_table)
            if ref is not None and ref.pg_name != t.pg_name:
                visit(ref)
        visited[t.pg_name] = 2
        out.append(t)

    for t in tables:
        visit(t)
    return out
