"""applyInPandasWithState sessionization test."""

import datetime as dt

from pgferry_spark.streaming.events import sessionize_stream


def test_stateful_sessionize_closes_on_gap(spark, tmp_path):
    # user 1: two sessions separated by a 60-min gap; a late sentinel event
    # far in the future advances the watermark so the first session closes.
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 10, 10), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 11, 30), 1, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 2, 9, 0), 2, "view", 1.0, "{}"),  # watermark driver
    ]
    schema = (
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string"
    )
    path = str(tmp_path / "stream_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)

    from pgferry_spark.streaming.events import stream_events_from_parquet

    stream = stream_events_from_parquet(spark, path)
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM t_sessions").collect()

    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1's first session (2 events, 10:00-10:10) must have closed via the gap
    assert any(r["n_events"] == 2 for r in by_user.get(1, []))


def test_stream_dedup_drops_redelivery(spark, tmp_path):
    import datetime as dt

    from pgferry_spark.streaming.events import dedup_stream, stream_events_from_parquet

    t = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t, 1, "view", 1.0, "{}"),
        (1, t, 1, "view", 1.0, "{}"),   # exact redelivery
        (2, t, 1, "view", 1.0, "{}"),
    ]
    schema = (
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string"
    )
    path = str(tmp_path / "dup_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    stream = dedup_stream(stream_events_from_parquet(spark, path))
    q = (
        stream.writeStream.format("memory").queryName("t_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM t_dedup").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2]


def test_stream_content_dedup_normalized_twins(spark, tmp_path):
    """Content-keyed streaming dedup: same normalized text under different
    ids collapses to one row; distinct content flows through."""
    import datetime as dt

    from pgferry_spark.streaming.events import dedup_stream_by_content

    t = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t, "Hello   World"),
        (2, t, "hello world"),        # normalized twin of doc 1 -> dropped
        (3, t, "entirely different"),
    ]
    path = str(tmp_path / "content_src")
    spark.createDataFrame(rows, "doc_id: long, ts: timestamp, text: string") \
        .coalesce(1).write.parquet(path)
    stream = dedup_stream_by_content(
        spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(path)
    )
    q = (
        stream.writeStream.format("memory").queryName("t_content_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM t_content_dedup").collect()
    )
    assert len(got) == 2 and 3 in got and (1 in got or 2 in got)
    # schema passthrough: the internal fingerprint column must not leak
    assert set(stream.schema.fieldNames()) == {"doc_id", "ts", "text"}
