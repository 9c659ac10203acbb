"""End-to-end migration pipeline test on the reference's flagship fixture:
the F1 blog schema (users/posts/comments with 2 seeded orphans; FIXTURES.md
F1, reference integration_test.go:20-175 expectations: 5/5/10 rows after
orphan cleanup, PKs and FKs replayed, spot value users.name='Alice')."""

import sqlite3

import pytest

from pgferry_spark.backends import SpoolTarget, SqliteSource
from pgferry_spark.config import MigrationConfig
from pgferry_spark.pipeline import MigrationPipeline, _parents_first
from pgferry_spark.plans.checkpoint import CheckpointManager
from pgferry_spark.types import map_sqlite_default, map_sqlite_type


@pytest.fixture()
def blog_db(tmp_path):
    path = str(tmp_path / "blog.db")
    con = sqlite3.connect(path)
    con.executescript(
        """
        CREATE TABLE users (
          id    INTEGER PRIMARY KEY AUTOINCREMENT,
          name  TEXT NOT NULL,
          email TEXT
        );
        CREATE TABLE posts (
          id      INTEGER PRIMARY KEY AUTOINCREMENT,
          user_id INTEGER NOT NULL,
          title   TEXT NOT NULL,
          body    TEXT,
          FOREIGN KEY (user_id) REFERENCES users(id)
        );
        CREATE TABLE comments (
          id      INTEGER PRIMARY KEY AUTOINCREMENT,
          post_id INTEGER NOT NULL,
          user_id INTEGER NOT NULL,
          content TEXT,
          FOREIGN KEY (post_id) REFERENCES posts(id),
          FOREIGN KEY (user_id) REFERENCES users(id)
        );
        CREATE INDEX idx_posts_user ON posts(user_id);
        """
    )
    users = [(i, n, f"{n.lower()}@x.io") for i, n in
             enumerate(["Alice", "Bob", "Carol", "Dan", "Eve"], start=1)]
    con.executemany("INSERT INTO users VALUES (?,?,?)", users)
    con.executemany(
        "INSERT INTO posts VALUES (?,?,?,?)",
        [(i, (i % 5) + 1, f"post {i}", f"body {i}") for i in range(1, 6)],
    )
    comments = [(i, (i % 5) + 1, (i % 5) + 1, f"comment {i}") for i in range(1, 11)]
    comments += [(11, 998, 1, "orphan one"), (12, 999, 2, "orphan two")]  # FK checks off
    con.executemany("INSERT INTO comments VALUES (?,?,?,?)", comments)
    con.commit()
    con.close()
    return path


def make_pipeline(spark, blog_db, tmp_path, **cfg_kw):
    cfg_kw.setdefault("target_dsn", "spool://x")
    cfg = MigrationConfig(
        source_type="sqlite", source_dsn=blog_db, target_schema="blog", **cfg_kw,
    )
    target = SpoolTarget(spark, str(tmp_path / "target"))
    pipe = MigrationPipeline(
        spark, cfg, SqliteSource(blog_db), target,
        map_sqlite_type, map_sqlite_default,
    )
    return pipe, target


def test_full_migration_counts_and_orphans(spark, blog_db, tmp_path):
    pipe, target = make_pipeline(spark, blog_db, tmp_path)
    result = pipe.run()

    assert result.ok
    rows = {r.table: r.rows_written for r in result.tables}
    assert rows == {"users": 5, "posts": 5, "comments": 10}  # orphans removed
    orphans = {r.table: r.orphans_removed for r in result.tables}
    assert orphans["comments"] == 2

    users = spark.read.parquet(str(tmp_path / "target" / "users"))
    alice = users.filter("id = 1").first()
    assert alice["name"] == "Alice"


def test_parents_load_before_children(spark, blog_db, tmp_path):
    pipe, _ = make_pipeline(spark, blog_db, tmp_path)
    schema = pipe.source.introspect()
    ordered = [t.pg_name for t in _parents_first(pipe.select_tables(schema))]
    assert ordered.index("users") < ordered.index("posts") < ordered.index("comments")


def test_ddl_transcript_structure(spark, blog_db, tmp_path):
    pipe, target = make_pipeline(spark, blog_db, tmp_path)
    pipe.run()
    ddl = target.ddl
    assert ddl[0] == 'CREATE SCHEMA "blog"'
    creates = [s for s in ddl if s.startswith("CREATE UNLOGGED TABLE")]
    assert len(creates) == 3
    pks = [s for s in ddl if "PRIMARY KEY" in s and s.startswith("ALTER")]
    assert len(pks) == 3
    fks = [s for s in ddl if "FOREIGN KEY" in s]
    assert len(fks) == 3  # posts->users, comments->posts, comments->users
    # constraint replay strictly after all loads: SET LOGGED precedes PKs
    logged_idx = [i for i, s in enumerate(ddl) if "SET LOGGED" in s]
    pk_idx = [i for i, s in enumerate(ddl) if "ADD CONSTRAINT" in s and "PRIMARY KEY" in s]
    assert max(logged_idx) < min(pk_idx)
    seqs = [s for s in ddl if "nextval" in s or "setval" in s]
    assert len(seqs) == 6  # 3 auto-increment PKs x (setval + set default)


def test_validation_detects_mismatch(spark, blog_db, tmp_path):
    pipe, target = make_pipeline(spark, blog_db, tmp_path)

    class LyingTarget(SpoolTarget):
        def count(self, table):
            return super().count(table) + (1 if table == "users" else 0)

    lying = LyingTarget(spark, str(tmp_path / "target2"))
    pipe.target = lying
    result = pipe.run()
    assert not result.ok
    bad = [v for v in result.validation if not v.ok]
    assert [v.table for v in bad] == ["users"]


def test_resume_skips_done_tables(spark, blog_db, tmp_path):
    ckpt_path = str(tmp_path / "ckpt.json")
    pipe, target = make_pipeline(spark, blog_db, tmp_path, resume=True)
    pipe.checkpoint = CheckpointManager(ckpt_path)
    result = pipe.run()
    assert result.ok  # successful run deletes the checkpoint
    import os

    assert not os.path.exists(ckpt_path)

    # simulate an interrupted run: pre-mark users as done, re-run
    pipe2, _ = make_pipeline(spark, blog_db, tmp_path, resume=True)
    pipe2.checkpoint = CheckpointManager(ckpt_path)
    # seed a checkpoint compatible with pipe2's config fingerprint
    from pgferry_spark.plans.checkpoint import compatibility_fingerprint

    schema = pipe2.source.introspect()
    tables = pipe2.select_tables(schema)
    fp = compatibility_fingerprint(
        {
            "source_type": "sqlite",
            "target_schema": "blog",
            "snake_case": True,
            "mode": "full",
            "unlogged": True,
            "chunk_size": 100_000,
            "type_mapping": vars(pipe2.cfg.type_mapping),
            "tables": {t.pg_name: [c.pg_name for c in t.columns] for t in tables},
        }
    )
    seeded = CheckpointManager(ckpt_path, fingerprint=fp)
    seeded.mark_table_done("users", rows=5)
    result2 = pipe2.run()
    skipped = {r.table: r.rows_written for r in result2.tables}
    assert skipped["users"] == 0  # resumed past the completed table
    assert skipped["comments"] == 10


def test_schema_only_mode_writes_no_data(spark, blog_db, tmp_path):
    pipe, target = make_pipeline(spark, blog_db, tmp_path, mode="schema_only", target_dsn="")
    result = pipe.run()
    assert result.tables == []
    assert any(s.startswith("CREATE UNLOGGED TABLE") for s in target.ddl)


def test_hooks_run_in_phases(spark, blog_db, tmp_path):
    hook = tmp_path / "before_fk.sql"
    hook.write_text("DELETE FROM {{schema}}.comments WHERE content = 'x'; -- cleanup\n")
    pipe, target = make_pipeline(
        spark, blog_db, tmp_path, hooks={"before_fk": [str(hook)]}
    )
    pipe.run()
    assert 'DELETE FROM blog.comments' in " ".join(target.ddl)


def test_unsupported_type_hard_gate(spark, tmp_path):
    path = str(tmp_path / "odd.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    con.commit()
    con.close()

    from pgferry_spark.types.mysql import UnsupportedTypeError

    def failing_mapper(col, cfg):
        if col.pg_name == "v":
            raise UnsupportedTypeError("nope")
        from pgferry_spark.types import map_sqlite_type

        return map_sqlite_type(col, cfg)

    cfg = MigrationConfig(source_type="sqlite", source_dsn=path, target_dsn="x")
    pipe = MigrationPipeline(
        spark, cfg, SqliteSource(path), SpoolTarget(spark, str(tmp_path / "t2")),
        failing_mapper, map_sqlite_default,
    )
    with pytest.raises(ValueError, match="unsupported columns"):
        pipe.run()


def test_data_only_mode_toggles_triggers(spark, blog_db, tmp_path):
    pipe, target = make_pipeline(spark, blog_db, tmp_path, mode="data_only")
    result = pipe.run()
    assert result.ok
    disables = [s for s in target.ddl if "DISABLE TRIGGER ALL" in s]
    enables = [s for s in target.ddl if "ENABLE TRIGGER ALL" in s]
    assert len(disables) == 3 and len(enables) == 3
    # disable precedes every write; enable follows (by transcript position)
    assert target.ddl.index(disables[0]) < target.ddl.index(enables[0])
    # data_only must not create tables
    assert not any(s.startswith("CREATE UNLOGGED TABLE") for s in target.ddl)


def test_data_only_skips_constraint_replay(spark, blog_db, tmp_path):
    pipe, target = make_pipeline(spark, blog_db, tmp_path, mode="data_only")
    pipe.run()
    assert not any("ADD CONSTRAINT" in s for s in target.ddl)
    assert not any("SET LOGGED" in s for s in target.ddl)


def test_chunk_level_restartability(spark, tmp_path):
    """BASELINE.md target: after a simulated mid-table failure, the resumed
    run skips completed chunks and lands count-exact (no duplicates)."""
    import os
    import sqlite3 as sq3

    db = str(tmp_path / "big.db")
    con = sq3.connect(db)
    con.execute("CREATE TABLE big (id INTEGER PRIMARY KEY, payload TEXT)")
    con.executemany("INSERT INTO big VALUES (?,?)", [(i, f"p{i}") for i in range(1, 501)])
    con.commit()
    con.close()

    ckpt = str(tmp_path / "ckpt.json")

    def build(target):
        cfg = MigrationConfig(
            source_type="sqlite", source_dsn=db, target_dsn="spool://x",
            target_schema="app", chunk_size=50, workers=1, resume=True,
        )
        pipe = MigrationPipeline(
            spark, cfg, SqliteSource(db), target, map_sqlite_type, map_sqlite_default,
        )
        pipe.checkpoint = CheckpointManager(ckpt, flush_items=1)
        return pipe

    class FlakyTarget(SpoolTarget):
        def __init__(self, *a, fail_after: int, **kw):
            super().__init__(*a, **kw)
            self.writes = 0
            self.fail_after = fail_after

        def write(self, df, table, append=False):
            self.writes += 1
            if self.writes > self.fail_after:
                raise RuntimeError("simulated crash")
            return super().write(df, table, append=append)

    out = str(tmp_path / "target")
    # chunk_size=50 over ids 1..500 -> 10 chunks; workers=1 -> batches of 4
    flaky = FlakyTarget(spark, out, fail_after=1)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        build(flaky).run()
    assert os.path.exists(ckpt)  # progress survived the crash

    result = build(SpoolTarget(spark, out)).run()
    assert result.ok
    final = spark.read.parquet(os.path.join(out, "big"))
    assert final.count() == 500                      # count-exact
    assert final.select("id").distinct().count() == 500  # no duplicates
    assert not os.path.exists(ckpt)  # success deletes the checkpoint

    # the resumed run moved only the missing chunks (10 total, 4 done before)
    moved = {r.table: r.rows_written for r in result.tables}
    assert moved["big"] == 300


def test_mixed_case_pk_chunking(spark, tmp_path):
    """Chunk predicates must carry the SOURCE column name: a CamelCase PK
    that snake_cases to a different pg_name used to break the chunked read."""
    import sqlite3 as sq3

    db = str(tmp_path / "camel.db")
    con = sq3.connect(db)
    con.execute('CREATE TABLE t ("OrderID" INTEGER PRIMARY KEY, v TEXT)')
    con.executemany("INSERT INTO t VALUES (?,?)", [(i, f"v{i}") for i in range(1, 301)])
    con.commit()
    con.close()

    cfg = MigrationConfig(
        source_type="sqlite", source_dsn=db, target_dsn="spool://x",
        target_schema="app", chunk_size=50, workers=1,
    )
    target = SpoolTarget(spark, str(tmp_path / "camel_out"))
    result = MigrationPipeline(
        spark, cfg, SqliteSource(db), target, map_sqlite_type, map_sqlite_default,
    ).run()
    assert result.ok
    assert result.tables[0].rows_written == 300
    assert result.tables[0].chunks == 6
    out = spark.read.parquet(str(tmp_path / "camel_out" / "t"))
    assert out.columns == ["order_id", "v"]  # normalized on the way out


def test_orphan_chain_cascades_through_cleaned_parents(spark, tmp_path):
    """A→B→C chain: a B row orphaned against A must also disqualify the C
    rows that referenced it (children clean against CLEANED parents)."""
    import sqlite3 as sq3

    db = str(tmp_path / "chain.db")
    con = sq3.connect(db)
    con.executescript(
        """
        CREATE TABLE a (id INTEGER PRIMARY KEY);
        CREATE TABLE b (id INTEGER PRIMARY KEY, a_id INTEGER NOT NULL REFERENCES a(id));
        CREATE TABLE c (id INTEGER PRIMARY KEY, b_id INTEGER NOT NULL REFERENCES b(id));
        """
    )
    con.execute("INSERT INTO a VALUES (1)")
    con.executemany("INSERT INTO b VALUES (?,?)", [(1, 1), (2, 99)])  # b2 orphan
    con.executemany("INSERT INTO c VALUES (?,?)", [(1, 1), (2, 2)])   # c2 -> orphan b2
    con.commit()
    con.close()

    cfg = MigrationConfig(
        source_type="sqlite", source_dsn=db, target_dsn="spool://x", target_schema="app",
    )
    target = SpoolTarget(spark, str(tmp_path / "chain_out"))
    result = MigrationPipeline(
        spark, cfg, SqliteSource(db), target, map_sqlite_type, map_sqlite_default,
    ).run()
    assert result.ok
    rows = {r.table: r.rows_written for r in result.tables}
    assert rows == {"a": 1, "b": 1, "c": 1}  # b2 AND its dependent c2 removed


def test_self_referential_fk_cleaned(spark, tmp_path):
    """Self-FK: rows pointing at nonexistent rows of the SAME table are
    orphans (anti-join against the pre-clean snapshot, SQL DELETE semantics)."""
    import sqlite3 as sq3

    db = str(tmp_path / "selfref.db")
    con = sq3.connect(db)
    con.execute(
        "CREATE TABLE node (id INTEGER PRIMARY KEY, parent_id INTEGER REFERENCES node(id))"
    )
    con.executemany(
        "INSERT INTO node VALUES (?,?)",
        [(1, None), (2, 1), (3, 777)],  # 3 points at a nonexistent node
    )
    con.commit()
    con.close()

    cfg = MigrationConfig(
        source_type="sqlite", source_dsn=db, target_dsn="spool://x", target_schema="app",
    )
    target = SpoolTarget(spark, str(tmp_path / "self_out"))
    result = MigrationPipeline(
        spark, cfg, SqliteSource(db), target, map_sqlite_type, map_sqlite_default,
    ).run()
    assert result.ok
    out = spark.read.parquet(str(tmp_path / "self_out" / "node"))
    assert sorted(r["id"] for r in out.collect()) == [1, 2]  # NULL-parent row kept


def test_resumed_run_validates_with_prior_orphans(spark, blog_db, tmp_path):
    """A resume that skips a table whose earlier run removed orphans must
    still validate (expected counts recomputed, not taken from run state)."""
    ckpt = str(tmp_path / "rv.json")
    pipe1, target = make_pipeline(spark, blog_db, tmp_path, resume=True)
    pipe1.checkpoint = CheckpointManager(ckpt)
    assert pipe1.run().ok  # full run: comments lands with 10 rows (2 orphans removed)

    # simulate: second run resumes with every table already done
    pipe2, _ = make_pipeline(spark, blog_db, tmp_path, resume=True)
    pipe2.checkpoint = CheckpointManager(ckpt)
    schema = pipe2.source.introspect()
    tables = pipe2.select_tables(schema)
    from pgferry_spark.plans.checkpoint import compatibility_fingerprint

    fp = compatibility_fingerprint(
        {
            "source_type": "sqlite", "target_schema": "blog", "snake_case": True,
            "mode": "full", "unlogged": True, "chunk_size": 100_000,
            "type_mapping": vars(pipe2.cfg.type_mapping),
            "tables": {t.pg_name: [c.pg_name for c in t.columns] for t in tables},
        }
    )
    seeded = CheckpointManager(ckpt, fingerprint=fp)
    for t in ("users", "posts", "comments"):
        seeded.mark_table_done(t, rows=0)
    result2 = pipe2.run()
    assert result2.ok  # validation passes: comments expected 10, not 12
    assert all(r.rows_written == 0 for r in result2.tables)


def test_self_fk_chunked_batches_keep_cross_batch_parents(spark, tmp_path):
    """A chunked self-FK table must anti-join against the FULL pre-clean
    snapshot, not the batch: in a 100-row parent chain (parent_id = id-1)
    with chunk_size=10, most rows' parents live in another batch — none of
    them are orphans. One seeded true orphan (id 50 -> 999) is removed, and
    its child survives (SQL DELETE NOT EXISTS evaluates pre-delete state)."""
    import sqlite3 as sq3

    db = str(tmp_path / "chainfk.db")
    con = sq3.connect(db)
    con.execute(
        "CREATE TABLE node (id INTEGER PRIMARY KEY, parent_id INTEGER REFERENCES node(id))"
    )
    rows = [(i, None if i == 1 else (999 if i == 50 else i - 1)) for i in range(1, 101)]
    con.executemany("INSERT INTO node VALUES (?,?)", rows)
    con.commit()
    con.close()

    cfg = MigrationConfig(
        source_type="sqlite", source_dsn=db, target_dsn="spool://x",
        target_schema="app", chunk_size=10, workers=1,
    )
    target = SpoolTarget(spark, str(tmp_path / "chainfk_out"))
    result = MigrationPipeline(
        spark, cfg, SqliteSource(db), target, map_sqlite_type, map_sqlite_default,
    ).run()
    assert result.ok  # validation: expected 99 == written 99
    res = result.tables[0]
    assert res.rows_written == 99
    assert res.orphans_removed == 1
    out = spark.read.parquet(str(tmp_path / "chainfk_out" / "node"))
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [i for i in range(1, 101) if i != 50]


def test_resume_after_partition_commit_without_chunk_record(spark, tmp_path):
    """Production sinks commit per partition: a crash inside a batch write
    can leave its rows committed with NO chunk recorded. Resume must
    delete-then-insert those chunks' key ranges, landing count-exact."""
    import os
    import sqlite3 as sq3

    db = str(tmp_path / "torn.db")
    con = sq3.connect(db)
    con.execute("CREATE TABLE big (id INTEGER PRIMARY KEY, payload TEXT)")
    con.executemany("INSERT INTO big VALUES (?,?)", [(i, f"p{i}") for i in range(1, 501)])
    con.commit()
    con.close()

    ckpt = str(tmp_path / "torn_ckpt.json")

    def build(target):
        cfg = MigrationConfig(
            source_type="sqlite", source_dsn=db, target_dsn="spool://x",
            target_schema="app", chunk_size=50, workers=1, resume=True,
        )
        pipe = MigrationPipeline(
            spark, cfg, SqliteSource(db), target, map_sqlite_type, map_sqlite_default,
        )
        pipe.checkpoint = CheckpointManager(ckpt, flush_items=1)
        return pipe

    class TornWriteTarget(SpoolTarget):
        """Write N lands on disk (partitions committed) and THEN the crash
        hits — before any chunk of the batch is recorded."""

        def __init__(self, *a, tear_on: int, **kw):
            super().__init__(*a, **kw)
            self.writes = 0
            self.tear_on = tear_on

        def write(self, df, table, append=False):
            self.writes += 1
            rows = super().write(df, table, append=append)
            if self.writes == self.tear_on:
                raise RuntimeError("crash after partition commits")
            return rows

    out = str(tmp_path / "torn_out")
    # 10 chunks, batches of 4: batch 1 commits+records, batch 2 commits
    # its data then crashes unrecorded
    torn = TornWriteTarget(spark, out, tear_on=2)
    with pytest.raises(RuntimeError, match="crash after partition commits"):
        build(torn).run()
    assert os.path.exists(ckpt)
    # the torn batch's rows are on disk but not in the checkpoint
    assert spark.read.parquet(os.path.join(out, "big")).count() == 400

    result = build(SpoolTarget(spark, out)).run()
    assert result.ok
    final = spark.read.parquet(os.path.join(out, "big"))
    assert final.count() == 500
    assert final.select("id").distinct().count() == 500  # no duplicates


class TestContentDiff:
    def test_all_four_statuses(self, spark):
        from pgferry_spark.plans.validation import content_diff

        src = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        tgt = spark.createDataFrame(
            [(1, "a"), (2, "CHANGED"), (4, "d")], "k long, v string"
        )
        got = {r.status: r.n_rows for r in content_diff(src, tgt, ["k"], ["v"]).collect()}
        assert got == {
            "equal": 1, "changed": 1, "only_in_source": 1, "only_in_target": 1,
        }

    def test_null_differs_from_empty_and_concat_is_unambiguous(self, spark):
        from pgferry_spark.plans.validation import content_diff

        src = spark.createDataFrame(
            [(1, None, "x"), (2, "ab", "c")], "k long, a string, b string"
        )
        tgt = spark.createDataFrame(
            [(1, "", "x"), (2, "a", "bc")], "k long, a string, b string"
        )
        got = {r.status: r.n_rows for r in content_diff(src, tgt, ["k"], ["a", "b"]).collect()}
        # NULL vs '' must differ; ("ab","c") vs ("a","bc") must differ
        assert got == {"changed": 2}

    def test_equal_counts_can_hide_drift_that_diff_catches(self, spark):
        from pgferry_spark.plans.validation import content_diff

        # same row count both sides (the reference's validation passes),
        # but one row swapped for another
        src = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        tgt = spark.createDataFrame([(1, "a"), (9, "z")], "k long, v string")
        assert src.count() == tgt.count()
        got = {r.status: r.n_rows for r in content_diff(src, tgt, ["k"], ["v"]).collect()}
        assert got == {"equal": 1, "only_in_source": 1, "only_in_target": 1}


class TestPsiDrift:
    def test_identical_distributions_score_zero(self, spark):
        from pgferry_spark.plans.validation import psi_drift

        df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
        r = psi_drift(df, df, "v").collect()[0]
        assert r.psi == 0.0 and r.n_old == r.n_new == 100

    def test_shift_scores_above_action_threshold(self, spark):
        from pgferry_spark.plans.validation import psi_drift

        old = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
        # whole population shifted past the old max -> lands in edge bin
        new = spark.createDataFrame([(float(i) + 1000,) for i in range(100)], "v double")
        r = psi_drift(old, new, "v").collect()[0]
        assert r.psi > 0.25  # "action" reading

    def test_moderate_shift_between_thresholds(self, spark):
        from pgferry_spark.plans.validation import psi_drift

        old = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
        # 15% of mass moved to the top decile
        new = spark.createDataFrame(
            [(float(i % 100),) for i in range(850)]
            + [(95.0,) for _ in range(150)],
            "v double",
        )
        r = psi_drift(old, new, "v").collect()[0]
        assert 0.0 < r.psi < 0.25


def test_extension_wiring_in_pipeline(spark, blog_db, tmp_path):
    """ensure_extensions: no-query targets skip with the plan report still
    listing the requirement; probing targets get the real decision table."""
    from pgferry_spark.catalog.model import Column, Table

    pipe, target = make_pipeline(spark, blog_db, tmp_path)
    pipe.cfg.type_mapping.ci_as_citext = True
    ci_tables = [
        Table("t", "t", columns=[
            Column("name", "name", "varchar", collation="utf8mb4_general_ci"),
        ])
    ]
    # SpoolTarget exposes no query(): catalog probe impossible -> documented skip
    assert pipe.ensure_extensions(ci_tables) == []

    created = []

    class ProbingTarget:
        def query(self, sql):
            if sql.startswith("CREATE"):
                created.append(sql)
                return []
            return [(False, True)]  # not installed, available

    pipe.target = ProbingTarget()
    assert pipe.ensure_extensions(ci_tables) == ["citext: created (ci_as_citext)"]
    assert created == ['CREATE EXTENSION IF NOT EXISTS "citext"']
    # schema without CI columns -> no requirements, no probes
    created.clear()
    assert pipe.ensure_extensions([]) == []
    assert created == []


def test_run_ensures_extensions_before_ddl(spark, blog_db, tmp_path):
    order = []

    class Spy(MigrationPipeline):
        def ensure_extensions(self, tables):
            order.append("extensions")
            return super().ensure_extensions(tables)

        def create_schema_objects(self, tables):
            order.append("ddl")
            return super().create_schema_objects(tables)

    cfg = MigrationConfig(
        source_type="sqlite", source_dsn=blog_db, target_schema="blog",
        target_dsn="spool://x",
    )
    target = SpoolTarget(spark, str(tmp_path / "targ2"))
    result = Spy(
        spark, cfg, SqliteSource(blog_db), target,
        map_sqlite_type, map_sqlite_default,
    ).run()
    assert result.ok
    assert order[:2] == ["extensions", "ddl"]
