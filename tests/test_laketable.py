"""LakeTable (sources/laketable.py): snapshot log, time travel, vacuum."""

from __future__ import annotations

import os

import pytest

from pgferry_spark.sources.laketable import LakeTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tbl"))
    t.write_snapshot(_df(spark, [(1, "a"), (2, "b")]))
    return t


def test_snapshot_and_read_current(spark, table):
    assert table.current_version() == 1
    assert {(r.k, r.v) for r in table.read().collect()} == {(1, "a"), (2, "b")}


def test_upsert_creates_new_version_and_time_travel(spark, table):
    changes = spark.createDataFrame(
        [(2, "U", 5, "b2"), (3, "I", 6, "c")],
        "k long, op string, seq long, v string",
    )
    info = table.upsert(changes, "k", "seq")
    assert info.version == 2 and info.op == "upsert" and info.rows == 3
    assert {(r.k, r.v) for r in table.read().collect()} == {
        (1, "a"), (2, "b2"), (3, "c"),
    }
    # time travel: version 1 is untouched
    assert {(r.k, r.v) for r in table.read(version=1).collect()} == {
        (1, "a"), (2, "b"),
    }


def test_history_is_the_commit_log(spark, table):
    table.write_snapshot(_df(spark, [(9, "z")]), op="compact")
    hist = table.history()
    assert [(s.version, s.op, s.rows) for s in hist] == [
        (1, "overwrite", 2), (2, "compact", 1),
    ]
    assert hist[0].committed_at <= hist[1].committed_at


def test_vacuum_keeps_current_and_retention(spark, table):
    table.write_snapshot(_df(spark, [(9, "z")]))
    table.write_snapshot(_df(spark, [(10, "y")]))
    removed = table.vacuum(keep_last=1)
    assert removed == [1, 2]
    assert table.current_version() == 3
    assert [s.version for s in table.history()] == [3]
    with pytest.raises(FileNotFoundError):
        table.read(version=1)


def test_vacuum_never_removes_pointer_target(spark, table):
    # even keep_last=1 with a single snapshot leaves the current version
    assert table.vacuum(keep_last=1) == []
    assert table.current_version() == 1
    table.read().count()


def test_pointer_flip_is_atomic_file_replace(spark, table, tmp_path):
    # no .tmp residue after commits
    table.write_snapshot(_df(spark, [(5, "e")]))
    assert not any(
        f.endswith(".tmp") for f in os.listdir(str(tmp_path / "tbl"))
    )


def test_diff_between_versions(spark, table):
    changes = spark.createDataFrame(
        [(2, "U", 5, "b2"), (3, "I", 6, "c")],
        "k long, op string, seq long, v string",
    )
    table.upsert(changes, "k", "seq")
    got = {
        r.status: r.n_rows
        for r in table.diff(["k"], ["v"], from_version=1).collect()
    }
    assert got == {"equal": 1, "changed": 1, "only_in_target": 1}


def test_stream_to_laketable_exactly_once_and_upsert(spark, tmp_path):
    from pgferry_spark.streaming.events import stream_to_laketable

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = LakeTable(spark, str(tmp_path / "stream_tbl"))
    _df(spark, [(1, "a"), (2, "b")]).coalesce(1).write.mode("overwrite").parquet(src)

    def run(name="lake_sink", checkpoint=ckpt):
        q = stream_to_laketable(
            spark.readStream.schema("k long, v string").parquet(src),
            t, "k", checkpoint, query_name=name,
        )
        q.awaitTermination()

    run()
    assert [s.op for s in t.history()] == ["batch:lake_sink:0"]
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a"), (2, "b")}

    # replay: a fresh checkpoint re-delivers batch 0 under the same query
    # name (the crash-between-write-and-commit scenario) -> skipped
    run(checkpoint=str(tmp_path / "ckpt_replay"))
    assert [s.op for s in t.history()] == ["batch:lake_sink:0"]

    # new data + the ORIGINAL checkpoint -> batch 1 upserts (key 2
    # overwritten, key 3 appended), history extends
    _df(spark, [(2, "b2"), (3, "c")]).coalesce(1).write.mode("append").parquet(src)
    run()
    assert [s.op for s in t.history()] == [
        "batch:lake_sink:0", "batch:lake_sink:1",
    ]
    assert {(r.k, r.v) for r in t.read().collect()} == {
        (1, "a"), (2, "b2"), (3, "c"),
    }
    # audit trail: what batch 1 changed
    got = {r.status: r.n_rows for r in t.diff(["k"], ["v"], from_version=1).collect()}
    assert got == {"equal": 1, "changed": 1, "only_in_target": 1}


def test_append_hardlinks_history_o_batch(spark, tmp_path):
    """LakeTable.append (round 9): the new version shares the previous
    version's data files via hardlinks (O(batch) data written per
    append), every version stays a complete snapshot (time travel
    intact), and the commit protocol is unchanged."""
    import os

    t = LakeTable(spark, str(tmp_path / "app_tbl"))
    t.append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), "batch:0")
    t.append(_df(spark, [(3, "c")]).coalesce(1), "batch:1")
    t.append(_df(spark, [(4, "d")]).coalesce(1), "batch:2")
    assert [s.op for s in t.history()] == ["batch:0", "batch:1", "batch:2"]
    assert {(r.k, r.v) for r in t.read().collect()} == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    }
    # time travel: v2 is the first two batches
    assert {(r.k, r.v) for r in t.read(version=2).collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    # the shared files really are hardlinks, not copies
    v3 = t._vdir(3)
    prev_files = [n for n in os.listdir(v3) if n.startswith("prev-")]
    assert prev_files
    assert all(
        os.stat(os.path.join(v3, n)).st_nlink >= 2 for n in prev_files
    )
    # vacuum old versions: current still reads fine (links keep blocks)
    t.vacuum(keep_last=1)
    assert {(r.k, r.v) for r in t.read().collect()} == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    }


def test_append_recovers_from_crashed_commit(spark, tmp_path):
    """A crash between writing a version's files and _finalize leaves a
    v<N> dir (or a ._append_tmp) with no _meta.json and an unflipped
    pointer; every later append then raised FileExistsError forever
    (round-9 ADVICE).  The next commit clears uncommitted leftovers
    above the pointer and proceeds."""
    import os
    import shutil

    t = LakeTable(spark, str(tmp_path / "crash_tbl"))
    t.append(_df(spark, [(1, "a")]).coalesce(1), "batch:0")

    # simulate a crash AFTER the data write, BEFORE _finalize: a v2 dir
    # without _meta.json, plus a stranded append tmp for the same version
    v2 = t._vdir(2)
    _df(spark, [(9, "x")]).coalesce(1).write.parquet(v2)
    os.makedirs(v2 + "._append_tmp")
    assert not os.path.isfile(os.path.join(v2, "_meta.json"))

    t.append(_df(spark, [(2, "b")]).coalesce(1), "batch:1")
    assert [s.op for s in t.history()] == ["batch:0", "batch:1"]
    # the stranded row never leaked into the committed snapshot
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a"), (2, "b")}
    assert not os.path.isdir(v2 + "._append_tmp")

    # committed dirs are NEVER touched: doctor a fake committed v9 ahead
    # of the pointer and verify recovery leaves it alone
    v9 = t._vdir(9)
    _df(spark, [(7, "z")]).coalesce(1).write.parquet(v9)
    with open(os.path.join(v9, "_meta.json"), "w") as f:
        f.write('{"version": 9, "rows": 1, "op": "x", "committed_at": 0}')
    t.append(_df(spark, [(3, "c")]).coalesce(1), "batch:2")
    assert os.path.isfile(os.path.join(v9, "_meta.json"))
    shutil.rmtree(v9)


def test_warc_ingest_stream_appends_index_exactly_once(spark, tmp_path):
    """Round 9: streamed WARC containers land as index rows (offsets,
    never payload bytes) with the exactly-once batch-tag protocol; a
    replayed batch id is skipped; ranges recover the documents."""
    from pgferry_spark.sources.warc import (
        attach_warc,
        warc_range_read,
    )
    from pgferry_spark.streaming.events import warc_ingest_stream

    src = str(tmp_path / "warc_src")
    ckpt = str(tmp_path / "warc_ckpt")
    t = LakeTable(spark, str(tmp_path / "warc_idx"))

    def containers(lo, hi):
        docs = spark.createDataFrame(
            [(i, f"https://s.org/{i}", f"Doc body {i}.")
             for i in range(lo, hi)],
            "doc_id: long, url: string, text: string",
        )
        return attach_warc(docs)

    containers(1, 9).write.mode("overwrite").parquet(src)

    def run(checkpoint=ckpt):
        q = warc_ingest_stream(
            spark.readStream.schema(
                "container_id long, container binary"
            ).parquet(src),
            t, checkpoint,
        )
        q.awaitTermination()

    run()
    assert [s.op for s in t.history()] == ["batch:warc_ingest:0"]
    idx1 = t.read().collect()
    assert len(idx1) == 8 and "payload_offset" in t.read().columns
    # replay with a fresh checkpoint -> same batch id, skipped
    run(checkpoint=str(tmp_path / "warc_ckpt2"))
    assert [s.op for s in t.history()] == ["batch:warc_ingest:0"]
    # second crawl batch appends
    containers(9, 13).write.mode("append").parquet(src)
    run()
    assert len(t.read().collect()) == 12
    # the persisted ranges recover a document from the container store
    blobs = {
        r["container_id"]: bytes(r["container"])
        for r in spark.read.parquet(src).collect()
    }
    row = [r for r in t.read().collect() if r["target_uri"].endswith("/3")][0]
    got = warc_range_read(
        blobs[row["container_id"]], row["payload_offset"], row["payload_len"]
    )
    assert got == b"Doc body 3."


def test_warc_ingest_stream_gzip_members(spark, tmp_path):
    """Round 10: the streamed ingest handles the CommonCrawl transport
    framing unchanged — warc_record_index detects the gzip member magic
    per container, so per-record-gzipped containers stream into the
    same lake index; the persisted member ranges recover a document via
    range read + capped inflate."""
    from pgferry_spark.sources.warc import (
        attach_warc,
        warc_member_read,
    )
    from pgferry_spark.streaming.events import warc_ingest_stream

    src = str(tmp_path / "gz_src")
    ckpt = str(tmp_path / "gz_ckpt")
    t = LakeTable(spark, str(tmp_path / "gz_idx"))
    docs = spark.createDataFrame(
        [(i, f"https://g.org/{i}", f"Gz body {i}.") for i in range(1, 9)],
        "doc_id: long, url: string, text: string",
    )
    attach_warc(docs, gzip_members=True).write.mode("overwrite").parquet(src)
    q = warc_ingest_stream(
        spark.readStream.schema(
            "container_id long, container binary"
        ).parquet(src),
        t, ckpt, query_name="gz_ingest",
    )
    q.awaitTermination()
    assert [s.op for s in t.history()] == ["batch:gz_ingest:0"]
    rows = t.read().collect()
    assert len(rows) == 8
    blobs = {
        r["container_id"]: bytes(r["container"])
        for r in spark.read.parquet(src).collect()
    }
    row = [r for r in rows if r["target_uri"].endswith("/5")][0]
    rec = warc_member_read(
        blobs[row["container_id"]], row["rec_offset"], row["rec_len"]
    )
    pay = rec[row["payload_offset"]: row["payload_offset"] + row["payload_len"]]
    assert pay == b"Gz body 5."


def test_http_ingest_stream_appends_envelope_index_exactly_once(
    spark, tmp_path
):
    """Round 11: streamed HTTP-enveloped containers land as envelope
    index rows (status/charset/body ranges, never payload bytes) with
    the exactly-once batch-tag protocol; a replayed batch id is
    skipped; the persisted facts match the synthesis classes."""
    from pgferry_spark.sources.httpmsg import attach_warc_http
    from pgferry_spark.streaming.events import http_ingest_stream

    src = str(tmp_path / "http_src")
    ckpt = str(tmp_path / "http_ckpt")
    t = LakeTable(spark, str(tmp_path / "http_idx"))

    def containers(lo, hi):
        docs = spark.createDataFrame(
            [(i, f"https://s.org/{i}", f"Http doc body {i}.")
             for i in range(lo, hi)],
            "doc_id: long, url: string, text: string",
        )
        return attach_warc_http(docs)

    containers(1, 9).write.mode("overwrite").parquet(src)

    def run(checkpoint=ckpt):
        q = http_ingest_stream(
            spark.readStream.schema(
                "container_id long, container binary"
            ).parquet(src),
            t, checkpoint,
        )
        q.awaitTermination()

    run()
    assert [s.op for s in t.history()] == ["batch:http_ingest:0"]
    rows = t.read().collect()
    assert len(rows) == 8
    assert all(r.digest_ok and not r.truncated for r in rows)
    # replay with a fresh checkpoint -> same batch id, skipped
    run(checkpoint=str(tmp_path / "http_ckpt2"))
    assert [s.op for s in t.history()] == ["batch:http_ingest:0"]
    # second crawl batch appends; status classes persist correctly
    containers(9, 13).write.mode("append").parquet(src)
    run()
    got = {r.target_uri: r.status for r in t.read().collect()}
    assert len(got) == 12
    for i in range(1, 13):
        want = 404 if i % 7 == 3 else 301 if i % 7 == 5 else 200
        assert got[f"https://s.org/{i}"] == want


def test_wet_publish_stream_exactly_once_and_readable(spark, tmp_path):
    """Round 10, second wave: streamed WET publication — document
    batches pack into conversion containers appended to the lake shard
    store with the exactly-once batch-tag protocol; a replayed batch is
    skipped; the published shards are readable by the UNCHANGED extract
    operator and recover every document."""
    from pgferry_spark.sources.warc import warc_payload_extract
    from pgferry_spark.streaming.events import wet_publish_stream

    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "wet_ckpt")
    t = LakeTable(spark, str(tmp_path / "wet_shards"))

    def docs(lo, hi):
        return spark.createDataFrame(
            [(i, f"https://w.org/{i}", f"Wet body {i}.")
             for i in range(lo, hi)],
            "doc_id: long, url: string, text: string",
        )

    docs(0, 8).write.mode("overwrite").parquet(src)

    def run(checkpoint=ckpt):
        q = wet_publish_stream(
            spark.readStream.schema(
                "doc_id long, url string, text string"
            ).parquet(src),
            t, checkpoint,
        )
        q.awaitTermination()

    run()
    assert [s.op for s in t.history()] == ["batch:wet_publish:0"]
    assert t.read().count() == 1  # 8 docs -> one container
    # replay with a fresh checkpoint -> same batch id, skipped
    run(checkpoint=str(tmp_path / "wet_ckpt2"))
    assert [s.op for s in t.history()] == ["batch:wet_publish:0"]
    # a second extraction run publishes new shards
    docs(8, 20).write.mode("append").parquet(src)
    run()
    shards = t.read()
    assert shards.count() == 3
    got = {
        r["target_uri"]: r["text"]
        for r in warc_payload_extract(shards)
        .filter("record_no >= 1").collect()
    }
    assert got == {f"https://w.org/{i}": f"Wet body {i}."
                   for i in range(20)}


def test_wet_publish_stream_batch_boundary_splits_bucket(spark, tmp_path):
    """Round-10 ADVICE (medium): streaming batch composition is
    source-dependent, so a micro-batch boundary CAN split a div-k
    bucket — batch 0 carries docs 0-5 (bucket 0 partial), batch 1
    carries docs 6-20 (the rest of bucket 0 plus buckets 1-2).  Without
    the batch_id offset both batches would publish a shard with
    container_id 0 holding partial buckets and (container_id,
    record_no) addressing would collide; with it every published shard
    id is unique and addressing stays a key."""
    from pgferry_spark.sources.warc import warc_payload_extract
    from pgferry_spark.streaming.events import wet_publish_stream

    src = str(tmp_path / "docs_src")
    t = LakeTable(spark, str(tmp_path / "wet_shards"))

    def docs(lo, hi):
        return spark.createDataFrame(
            [(i, f"https://w.org/{i}", f"Wet body {i}.")
             for i in range(lo, hi)],
            "doc_id: long, url: string, text: string",
        )

    def run(ckpt):
        q = wet_publish_stream(
            spark.readStream.schema(
                "doc_id long, url string, text string"
            ).parquet(src),
            t, str(tmp_path / ckpt),
        )
        q.awaitTermination()

    # batch 0: docs 0-5 — bucket 0 is split mid-bucket
    docs(0, 6).coalesce(1).write.mode("overwrite").parquet(src)
    run("ck1")
    # batch 1: docs 6-20 — rest of bucket 0 + buckets 1-2
    docs(6, 20).coalesce(1).write.mode("append").parquet(src)
    run("ck1")
    shards = t.read()
    ids = [r.container_id for r in shards.select("container_id").collect()]
    assert len(ids) == len(set(ids)) == 4  # no collision across batches
    # batch-invariant pairing key survives as id % stride
    assert sorted(i % (1 << 40) for i in ids) == [0, 0, 1, 2]
    # (container_id, record_no) is a KEY and recovery is total
    ext = warc_payload_extract(shards).filter("record_no >= 1").collect()
    addr = [(r.container_id, r.record_no) for r in ext]
    assert len(addr) == len(set(addr)) == 20
    assert {r.text for r in ext} == {f"Wet body {i}." for i in range(20)}
    # round 12 (r11 ADVICE): the warcinfo record id EMBEDDED in the
    # shard bytes equals the published container_id — the offset is
    # applied before the build, so the id is recoverable from bytes
    # alone
    import re

    for r in shards.select("container_id", "container").collect():
        m = re.search(
            rb"WARC-Record-ID: <urn:uuid:info-(\d+)>", bytes(r.container)
        )
        assert m and int(m.group(1)) == r.container_id


def test_stream_materialized_agg_incremental_equals_recompute(spark, tmp_path):
    from pyspark.sql import functions as F

    from pgferry_spark.streaming.events import stream_materialized_agg

    src = str(tmp_path / "mv_src")
    ckpt = str(tmp_path / "mv_ckpt")
    t = LakeTable(spark, str(tmp_path / "mv_tbl"))
    b1 = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "g string, v double"
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        q = stream_materialized_agg(
            spark.readStream.schema("g string, v double").parquet(src),
            t, "g", "v", ckpt,
        )
        q.awaitTermination()

    run()
    assert [s.op for s in t.history()] == ["mv:mv_sink:0"]
    got = {r.g: (r.n, r.total) for r in t.read().collect()}
    assert got == {"a": (2, 30.0), "b": (1, 5.0)}

    # batch 2: new group + growth of an old one; incremental result must
    # equal a full recompute over all data
    b2 = spark.createDataFrame([("a", 1.0), ("c", 7.0)], "g string, v double")
    b2.coalesce(1).write.mode("append").parquet(src)
    run()
    got = {r.g: (r.n, r.total) for r in t.read().collect()}
    full = {
        r.g: (r.n, r.total)
        for r in spark.read.parquet(src)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == full == {"a": (3, 31.0), "b": (1, 5.0), "c": (1, 7.0)}
    # time travel: version 1 still shows the first batch's view
    v1 = {r.g: (r.n, r.total) for r in t.read(version=1).collect()}
    assert v1 == {"a": (2, 30.0), "b": (1, 5.0)}
    # replayed batch ids are skipped
    run2_ckpt = str(tmp_path / "mv_ckpt2")
    q = stream_materialized_agg(
        spark.readStream.schema("g string, v double").parquet(src),
        t, "g", "v", run2_ckpt,
    )
    q.awaitTermination()
    assert [s.op for s in t.history()] == ["mv:mv_sink:0", "mv:mv_sink:1"]


class TestCompact:
    def test_compact_row_identical_fewer_files(self, spark, tmp_path):
        """OPTIMIZE semantics: same rows, fewer files, old version still
        time-travelable, history records the compact op."""
        import glob
        import os

        from pgferry_spark.sources.laketable import LakeTable

        t = LakeTable(spark, str(tmp_path / "lake"))
        from pyspark.sql import functions as F

        df = spark.range(2000).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        )
        t.write_snapshot(df.repartition(12))
        v1_files = glob.glob(os.path.join(t._vdir(1), "part-*"))
        assert len(v1_files) == 12

        info = t.compact(target_bytes=sum(map(os.path.getsize, v1_files)) // 3)
        assert info.version == 2 and info.op == "compact"
        v2_files = glob.glob(os.path.join(t._vdir(2), "part-*"))
        assert 1 < len(v2_files) < 12

        cur = t.read()
        assert cur.count() == 2000
        assert cur.exceptAll(df).count() == 0
        assert df.exceptAll(cur).count() == 0
        # pre-compaction version still readable (copy-on-write)
        assert t.read(version=1).count() == 2000
        assert [s.op for s in t.history()] == ["overwrite", "compact"]

    def test_compact_single_bin_when_target_large(self, spark, tmp_path):
        import glob
        import os

        from pgferry_spark.sources.laketable import LakeTable

        t = LakeTable(spark, str(tmp_path / "lake"))
        t.write_snapshot(spark.range(500).repartition(8))
        t.compact(target_bytes=1 << 30)
        assert len(glob.glob(os.path.join(t._vdir(2), "part-*"))) == 1
        assert t.read().count() == 500


class TestOptimizeZorder:
    def test_optimize_clusters_and_compact_preserves_it(self, spark, tmp_path):
        """optimize() commits a z-clustered version with disjoint
        per-file key ranges; a later compact() keeps the ranges
        disjoint (order-preserving bin packing) while shrinking the
        file count. Row identity holds across all three versions."""
        import glob
        import os

        from pyspark.sql import functions as F

        from pgferry_spark.sources.layout import zorder_key
        from pgferry_spark.sources.laketable import LakeTable

        t = LakeTable(spark, str(tmp_path / "lake"))
        df = spark.range(3000).select(
            (F.col("id") % 60).alias("x"),
            (F.col("id") * 11 % 60).alias("y"),
            F.col("id").alias("payload"),
        )
        t.write_snapshot(df.repartition(10))
        info = t.optimize("x", "y", n_files=6)
        assert info.op == "zorder" and info.version == 2

        def spans(vdir):
            out = []
            for f in glob.glob(os.path.join(vdir, "part-*")):
                lo, hi = (
                    spark.read.parquet(f)
                    .select(zorder_key(F.col("x"), F.col("y")).alias("z"))
                    .agg(F.min("z"), F.max("z"))
                    .first()
                )
                out.append((lo, hi))
            return sorted(out)

        s2 = spans(t._vdir(2))
        assert 2 <= len(s2) <= 6
        for (_, hi1), (lo2, _) in zip(s2, s2[1:]):
            assert hi1 <= lo2

        # compact to roughly half the files: clustering must survive
        sizes = [os.path.getsize(f)
                 for f in glob.glob(os.path.join(t._vdir(2), "part-*"))]
        t.compact(target_bytes=int(sum(sizes) / 3))
        s3 = spans(t._vdir(3))
        assert len(s3) < len(s2)
        for (_, hi1), (lo2, _) in zip(s3, s3[1:]):
            assert hi1 <= lo2

        cur = t.read()
        assert cur.count() == 3000
        assert cur.exceptAll(df).count() == 0 and df.exceptAll(cur).count() == 0
        assert [s.op for s in t.history()] == ["overwrite", "zorder", "compact"]


class TestMaybeCompact:
    def test_triggers_only_past_threshold(self, spark, tmp_path):
        import glob
        import os

        from pgferry_spark.sources.laketable import LakeTable

        t = LakeTable(spark, str(tmp_path / "lake"))
        t.write_snapshot(spark.range(1000).repartition(4))
        # 4 files <= 8: no-op, version unchanged
        assert t.maybe_compact(max_files=8, target_bytes=1 << 20) is None
        assert t.current_version() == 1

        t.write_snapshot(spark.range(1000).repartition(12))
        info = t.maybe_compact(max_files=8, target_bytes=1 << 30)
        assert info is not None and info.op == "compact"
        assert t.read().count() == 1000
        assert len(glob.glob(os.path.join(t._vdir(info.version), "part-*"))) == 1


class TestCompactHardening:
    def test_retry_after_partial_compact_does_not_duplicate(self, spark, tmp_path):
        """A crashed compact leaves a partial never-pointed-at vdir; the
        retry must clear it instead of appending into it (which would
        silently duplicate rows)."""
        import os

        from pgferry_spark.sources.laketable import LakeTable

        t = LakeTable(spark, str(tmp_path / "lake"))
        t.write_snapshot(spark.range(1200).repartition(6))
        # simulate the crash: a partial v2 with one stray bin already
        # written but no _meta.json and no pointer flip
        partial = t._vdir(2)
        spark.range(1200).coalesce(1).write.parquet(partial)
        assert t.current_version() == 1

        info = t.compact(target_bytes=1 << 30)
        assert info.version == 2
        assert t.read().count() == 1200  # not 2400

    def test_second_compact_preserves_clustering(self, spark, tmp_path):
        """compact-after-compact: the recorded _file_order.json keeps the
        manifest in key order even though append-job part names carry
        random UUIDs, so repeated compaction never interleaves disjoint
        key ranges into one file."""
        import glob
        import os

        from pyspark.sql import functions as F

        from pgferry_spark.sources.layout import zorder_key
        from pgferry_spark.sources.laketable import LakeTable

        t = LakeTable(spark, str(tmp_path / "lake"))
        df = spark.range(4000).select(
            (F.col("id") % 70).alias("x"),
            (F.col("id") * 13 % 70).alias("y"),
            F.col("id").alias("payload"),
        )
        t.write_snapshot(df.repartition(8))
        t.optimize("x", "y", n_files=8)
        sizes = [os.path.getsize(f)
                 for f in glob.glob(os.path.join(t._vdir(2), "part-*"))]
        t.compact(target_bytes=int(sum(sizes) / 4))   # 8 -> ~4 files
        v3_sizes = [os.path.getsize(f)
                    for f in glob.glob(os.path.join(t._vdir(3), "part-*"))]
        t.compact(target_bytes=int(sum(v3_sizes) / 2))  # ~4 -> ~2 files

        def spans(vdir):
            out = []
            for f in sorted(glob.glob(os.path.join(vdir, "part-*"))):
                lo, hi = (
                    spark.read.parquet(f)
                    .select(zorder_key(F.col("x"), F.col("y")).alias("z"))
                    .agg(F.min("z"), F.max("z"))
                    .first()
                )
                out.append((lo, hi))
            return sorted(out)

        s4 = spans(t._vdir(4))
        assert len(s4) >= 2
        for (_, hi1), (lo2, _) in zip(s4, s4[1:]):
            assert hi1 <= lo2, f"second compact interleaved key ranges: {s4}"
        assert t.read().count() == 4000


def test_crawl_merge_stream_keep_newest_and_replay(spark, tmp_path):
    """Streaming crawl ingest: keep-newest per canonical URL across
    micro-batches (an out-of-order OLDER capture must never regress the
    index — plain upsert would), exactly-once via the lake batch tag."""
    from pgferry_spark.streaming.events import crawl_merge_stream

    src = str(tmp_path / "captures")
    ckpt = str(tmp_path / "crawl_ckpt")
    t = LakeTable(spark, str(tmp_path / "url_index"))
    schema = "doc_id long, url string, capture_ts long, fp string"

    def run(checkpoint=ckpt):
        q = crawl_merge_stream(
            spark.readStream.schema(schema).parquet(src), t, checkpoint,
        )
        q.awaitTermination()

    b0 = spark.createDataFrame(
        [(1, "https://www.a.com/x?utm_source=1", 100, "f1"),
         # tracking-param variant of the SAME page, same batch, older ts
         (2, "https://a.com/x", 90, "f0"),
         (3, "https://b.com/y", 100, "g1")],
        schema,
    )
    b0.coalesce(1).write.mode("overwrite").parquet(src)
    run()
    assert [s.op for s in t.history()] == ["batch:crawl_merge:0"]
    idx = {r.nurl: r for r in t.read().collect()}
    assert set(idx) == {"a.com/x", "b.com/y"}
    assert idx["a.com/x"].capture_ts == 100 and idx["a.com/x"].fp == "f1"

    b1 = spark.createDataFrame(
        [(4, "https://a.com/x", 200, "f2"),      # re-crawl, newer -> wins
         (5, "https://b.com/y", 50, "g0"),       # out-of-order OLDER -> loses
         (6, "https://c.com/z", 200, "h1")],     # new page
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    run()
    idx = {r.nurl: r for r in t.read().collect()}
    assert idx["a.com/x"].fp == "f2" and idx["a.com/x"].capture_ts == 200
    assert idx["b.com/y"].fp == "g1" and idx["b.com/y"].capture_ts == 100
    assert idx["c.com/z"].doc_id == 6
    assert "status" not in t.read().columns

    # crash-replay: fresh checkpoint re-delivers batch 0 -> skipped
    run(checkpoint=str(tmp_path / "crawl_ckpt2"))
    assert [s.op for s in t.history()] == [
        "batch:crawl_merge:0", "batch:crawl_merge:1",
    ]
