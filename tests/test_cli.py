"""CLI (__main__) tests — plan and migrate subcommands in-process."""

import json
import sqlite3

import pytest

from pgferry_spark.__main__ import main


@pytest.fixture()
def project(tmp_path):
    db = str(tmp_path / "app.db")
    con = sqlite3.connect(db)
    con.executescript(
        """
        CREATE TABLE users (id INTEGER PRIMARY KEY AUTOINCREMENT, name TEXT NOT NULL);
        CREATE TABLE posts (id INTEGER PRIMARY KEY,
                            user_id INTEGER NOT NULL REFERENCES users(id), title TEXT);
        CREATE VIEW v_users AS SELECT * FROM users;
        """
    )
    con.executemany("INSERT INTO users VALUES (?,?)", [(1, "Alice"), (2, "Bob")])
    con.executemany("INSERT INTO posts VALUES (?,?,?)", [(1, 1, "a"), (2, 9, "orphan")])
    con.commit()
    con.close()
    cfg = tmp_path / "mig.toml"
    cfg.write_text(
        f'source_type = "sqlite"\nsource_dsn = "{db}"\n'
        f'target_dsn = "spool://{tmp_path}/out"\ntarget_schema = "app"\n'
    )
    return str(cfg)


def test_plan_json(project, capsys):
    assert main(["plan", project, "--json"]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["views"] == ["v_users"]
    assert report["unsupported_columns"] == []


def test_migrate_runs_and_validates(project, capsys, spark):
    assert main(["migrate", project]) == 0
    out = capsys.readouterr().out
    assert "users: 2 rows" in out
    assert "posts: 1 rows (1 orphans removed)" in out
    assert "OK" in out


def test_unknown_source_type_refused(tmp_path):
    cfg = tmp_path / "bad.toml"
    cfg.write_text(
        'source_type = "mysql"\nsource_dsn = "h/db"\ntarget_dsn = "x"\n'
    )
    with pytest.raises(SystemExit, match="live database server"):
        main(["plan", str(cfg)])


def test_plan_hook_skeletons(project, tmp_path, capsys):
    hooks_dir = str(tmp_path / "hooks")
    assert main(["plan", project, "--hooks-skeleton", hooks_dir]) == 0
    import os

    files = sorted(os.listdir(hooks_dir))
    assert files == ["after_all.sql", "after_data.sql", "before_data.sql", "before_fk.sql"]
    content = open(os.path.join(hooks_dir, "before_fk.sql")).read()
    assert "{{schema}}" in content
    # idempotent: existing files untouched
    assert main(["plan", project, "--hooks-skeleton", hooks_dir]) == 0
