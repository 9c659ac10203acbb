import datetime as dt

from pyspark.sql import functions as F

from pgferry_spark.streaming.events import (
    hourly_event_counts,
    run_to_completion,
    stream_events_from_parquet,
)


def test_streaming_hourly_matches_batch(spark, tmp_path):
    rows = [
        (i, dt.datetime(2024, 1, 1, hour, minute, 0), i % 3,
         "click" if i % 2 else "view", float(i), "{}")
        for i, (hour, minute) in enumerate(
            [(0, 5), (0, 25), (0, 55), (1, 10), (1, 40), (2, 0)]
        )
    ]
    schema = (
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string"
    )
    batch = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "events_stream")
    batch.repartition(3).write.parquet(path)  # 3 files -> 3 micro-batches

    stream = stream_events_from_parquet(spark, path)
    assert stream.isStreaming
    got = run_to_completion(hourly_event_counts(stream), "t_events_hourly")

    expect_rows = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .selectExpr("w.start as hour_start", "event_type", "n_events", "total_value")
        .collect()
    )
    key = lambda r: (r["hour_start"], r["event_type"])
    expect = {key(r): (r["n_events"], r["total_value"]) for r in expect_rows}
    got_map = {key(r): (r["n_events"], r["total_value"]) for r in got}
    assert got_map == expect


def test_stream_static_enrichment(spark, tmp_path):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 5), 0, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 6), 1, "view", 2.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 7), 9, "click", 3.0, "{}"),  # no dim row
    ]
    schema = (
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string"
    )
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "ev"))
    dim = spark.createDataFrame(
        [(0, "BUILDING"), (1, "MACHINERY")], "c_custkey: long, c_mktsegment: string"
    )

    from pgferry_spark.streaming.events import enrich_with_dimension

    stream = stream_events_from_parquet(spark, str(tmp_path / "ev"))
    enriched = enrich_with_dimension(stream, dim)
    assert enriched.isStreaming

    q = (
        enriched.writeStream.format("memory").queryName("t_enriched")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["event_id"]: r["c_mktsegment"]
           for r in spark.sql("SELECT * FROM t_enriched").collect()}
    assert got == {1: "BUILDING", 2: "MACHINERY"}  # event 3 dropped (inner)


def _write_events(spark, tmp_path, rows, name):
    schema = (
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string"
    )
    batch = spark.createDataFrame(rows, schema)
    path = str(tmp_path / name)
    batch.repartition(2).write.parquet(path)
    return batch, path


def test_sliding_windows_overlap(spark, tmp_path):
    from pgferry_spark.streaming.events import sliding_event_rates

    rows = [
        (1, dt.datetime(2024, 1, 1, 1, 0, 0), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1, 20, 0), 2, "click", 1.0, "{}"),
    ]
    _, path = _write_events(spark, tmp_path, rows, "ev_slide")
    stream = stream_events_from_parquet(spark, path)
    got = run_to_completion(sliding_event_rates(stream), "t_sliding")
    # 1h window / 15m slide: the 01:00 event belongs to 4 windows
    # (00:15..01:15 through 01:00..02:00)
    per_event1 = [r for r in got if r["win_start"] <= dt.datetime(2024, 1, 1, 1, 0, 0) < r["win_end"]]
    assert len(per_event1) == 4
    # the 01:00..02:00 window holds both events
    w0100 = [r for r in got if r["win_start"] == dt.datetime(2024, 1, 1, 1, 0, 0)]
    assert len(w0100) == 1 and w0100[0]["n_events"] == 2


def test_stream_stream_interval_join(spark, tmp_path):
    from pgferry_spark.streaming.events import correlate_streams

    clicks = [
        (1, dt.datetime(2024, 1, 1, 1, 0, 0), 7, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 2, 0, 0), 8, "click", 1.0, "{}"),
    ]
    buys = [
        (3, dt.datetime(2024, 1, 1, 1, 5, 0), 7, "purchase", 9.0, "{}"),   # within 10m of click 1
        (4, dt.datetime(2024, 1, 1, 1, 30, 0), 7, "purchase", 9.0, "{}"),  # too late
        (5, dt.datetime(2024, 1, 1, 2, 1, 0), 9, "purchase", 9.0, "{}"),   # other user
    ]
    _, cpath = _write_events(spark, tmp_path, clicks, "ev_clicks")
    _, bpath = _write_events(spark, tmp_path, buys, "ev_buys")
    joined = correlate_streams(
        stream_events_from_parquet(spark, cpath),
        stream_events_from_parquet(spark, bpath),
        within_minutes=10,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_corr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM t_corr").collect()
    assert len(got) == 1
    assert got[0]["l_user"] == 7 and got[0]["r_ts"] == dt.datetime(2024, 1, 1, 1, 5, 0)


def test_stream_to_pipeline_sink(spark, tmp_path):
    from pgferry_spark.backends import SpoolTarget
    from pgferry_spark.streaming.events import stream_to_target

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i, 0), i, "click", float(i), "{}")
        for i in range(6)
    ]
    _, path = _write_events(spark, tmp_path, rows, "ev_sink")
    target = SpoolTarget(spark, str(tmp_path / "spool"))
    q = stream_to_target(
        stream_events_from_parquet(spark, path),
        target,
        "events_landed",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert target.count("events_landed") == 6
    # restart with the same checkpoint: no new micro-batches, no duplicates
    q2 = stream_to_target(
        stream_events_from_parquet(spark, path),
        target,
        "events_landed",
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="stream_sink_2",
    )
    q2.awaitTermination()
    assert target.count("events_landed") == 6


def test_trending_tokens_windows_and_floor(spark, tmp_path):
    import datetime as dt

    from pgferry_spark.streaming.events import trending_tokens

    t = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (t, "spark spark rocks"),
        (t + dt.timedelta(minutes=2), "spark again"),
        (t + dt.timedelta(minutes=25), "later window spark"),
        # advances the watermark past the earlier windows so append-mode
        # emits them in this single availableNow batch
        (t + dt.timedelta(minutes=50), "flush marker"),
    ]
    path = str(tmp_path / "trend_src")
    spark.createDataFrame(rows, "ts: timestamp, text: string") \
        .coalesce(1).write.parquet(path)
    stream = trending_tokens(
        spark.readStream.schema("ts timestamp, text string").parquet(path),
        window="10 minutes", watermark="5 minutes", min_count=2,
    )
    q = (
        stream.writeStream.format("memory").queryName("t_trend")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(str(r["window_start"]), r["token"]): r["n"]
           for r in spark.sql("SELECT * FROM t_trend").collect()}
    # 'spark' x3 in the 10:00 window survives the floor; singletons pruned
    assert got == {("2024-01-01 10:00:00", "spark"): 3}


def test_native_session_window_matches_gap_rule(spark, tmp_path):
    """session_window twin: same gap rule as the stateful sessionizer —
    events within the gap merge; a gap beyond it opens a new session.
    window_end is last_event + gap by session_window's definition."""
    import datetime as dt

    from pgferry_spark.streaming.events import sessionize_stream_native

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(minutes=10)),   # same session (gap 30)
        (1, 3, t0 + dt.timedelta(minutes=50)),   # 40 min gap -> new session
        (2, 4, t0),
    ]
    path = str(tmp_path / "native_sess_src")
    spark.createDataFrame(
        rows, "user_id: long, event_id: long, ts: timestamp"
    ).coalesce(1).write.parquet(path)
    stream = sessionize_stream_native(
        spark.readStream.schema("user_id long, event_id long, ts timestamp").parquet(path)
    )
    # complete mode: append would hold sessions until the watermark
    # passes their end, which never happens in a bounded availableNow run
    q = (
        stream.writeStream.format("memory").queryName("t_native_sess")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.sql("SELECT * FROM t_native_sess").collect()
    }
    assert got == {
        (1, t0, 2),
        (1, t0 + dt.timedelta(minutes=50), 1),
        (2, t0, 1),
    }
