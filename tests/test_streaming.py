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
