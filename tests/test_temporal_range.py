import datetime as dt

from pyspark.sql import functions as F

from pgferry_spark.operators.temporal import range_join, time_bucket_rollup


def _points(spark):
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=7 * i)) for i in range(60)]
    return spark.createDataFrame(rows, "pid: long, ts: timestamp")


def _intervals(spark):
    rows = [
        # overlapping, adjacent, and disjoint windows of varying length
        (100, dt.datetime(2024, 1, 1, 0, 10), dt.datetime(2024, 1, 1, 1, 10)),
        (101, dt.datetime(2024, 1, 1, 1, 0), dt.datetime(2024, 1, 1, 1, 30)),
        (102, dt.datetime(2024, 1, 1, 5, 0), dt.datetime(2024, 1, 1, 5, 1)),
        (103, dt.datetime(2024, 1, 2, 0, 0), dt.datetime(2024, 1, 2, 12, 0)),
    ]
    return spark.createDataFrame(rows, "iid: long, lo: timestamp, hi: timestamp")


def test_range_join_matches_theta_join(spark):
    p, i = _points(spark), _intervals(spark)
    got = {
        (r["pid"], r["iid"])
        for r in range_join(p, i, "ts", "lo", "hi", bucket_seconds=1800).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in p.crossJoin(i)
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    }
    assert got == naive and got  # identical and non-empty


def test_range_join_boundary_inclusive(spark):
    p = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 10)), (2, dt.datetime(2024, 1, 1, 1, 10))],
        "pid: long, ts: timestamp",
    )
    i = spark.createDataFrame(
        [(9, dt.datetime(2024, 1, 1, 0, 10), dt.datetime(2024, 1, 1, 1, 10))],
        "iid: long, lo: timestamp, hi: timestamp",
    )
    got = {(r["pid"], r["iid"]) for r in range_join(p, i, "ts", "lo", "hi").collect()}
    assert got == {(1, 9), (2, 9)}  # both closed endpoints included


def test_range_join_is_equi_join_not_nested_loop(spark):
    p, i = _points(spark), _intervals(spark)
    df = range_join(p, i, "ts", "lo", "hi")
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_time_bucket_rollup_matches_separate_groupbys(spark):
    rows = [
        (i, dt.datetime(2024, 1, 1, i % 3, (i * 13) % 60, 0), "t%d" % (i % 2), 1.0)
        for i in range(50)
    ]
    ev = spark.createDataFrame(rows, "event_id: long, ts: timestamp, event_type: string, value: double")
    rolled = time_bucket_rollup(ev)
    for res, trunc in [("minute", "minute"), ("hour", "hour"), ("day", "day")]:
        got = {
            (r["bucket_start"], r["event_type"]): r["n_events"]
            for r in rolled.filter(F.col("resolution") == res).collect()
        }
        want = {
            (r["b"], r["event_type"]): r["n"]
            for r in ev.groupBy(
                F.date_trunc(trunc, "ts").alias("b"), "event_type"
            ).agg(F.count("*").alias("n")).collect()
        }
        assert got == want
