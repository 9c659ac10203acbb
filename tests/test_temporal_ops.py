"""Sessionization, as-of join, and IVF operator semantics tests."""

import datetime as dt

from pyspark.sql import functions as F

from pgferry_spark.operators import queries as Q
from pgferry_spark.operators import similarity


def ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double"
    )


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        rows = [
            (1, ts(0), 1, "view", 1.0),
            (2, ts(10), 1, "click", 1.0),   # same session (10 min gap)
            (3, ts(50), 1, "view", 1.0),    # 40 min gap -> new session
            (4, ts(0), 2, "view", 1.0),     # other user, own session
        ]
        got = Q.sessionize(events_df(spark, rows), gap_minutes=30).collect()
        by_user = {}
        for r in got:
            by_user.setdefault(r["user_id"], []).append(r)
        assert len(by_user[1]) == 2
        first = min(by_user[1], key=lambda r: r["session_id"])
        assert first["n_events"] == 2 and first["session_start"] == ts(0)
        assert len(by_user[2]) == 1

    def test_exact_gap_boundary_stays_in_session(self, spark):
        rows = [(1, ts(0), 1, "view", 1.0), (2, ts(30), 1, "view", 1.0)]  # gap == 30min
        got = Q.sessionize(events_df(spark, rows), gap_minutes=30).collect()
        assert len(got) == 1 and got[0]["n_events"] == 2  # strict > starts a session


class TestAsofJoin:
    def test_most_recent_prior_view(self, spark):
        rows = [
            (1, ts(0), 1, "view", 1.0),
            (2, ts(5), 1, "view", 1.0),
            (3, ts(10), 1, "purchase", 9.0),  # matches view @5
            (4, ts(20), 1, "purchase", 9.0),  # still view @5
            (5, ts(1), 2, "purchase", 9.0),   # user 2 has no prior view -> NULL
        ]
        got = {r["event_id"]: r for r in Q.asof_join_purchase_view(events_df(spark, rows)).collect()}
        assert got[3]["secs_since_view"] == 300.0
        assert got[4]["secs_since_view"] == 900.0
        assert got[5]["last_view_us"] is None

    def test_same_timestamp_ordering_by_event_id(self, spark):
        rows = [
            (1, ts(0), 1, "view", 1.0),
            (2, ts(0), 1, "purchase", 9.0),  # view has lower event_id -> visible
            (3, ts(0), 1, "view", 1.0),      # later event_id -> not visible to #2
        ]
        got = {r["event_id"]: r for r in Q.asof_join_purchase_view(events_df(spark, rows)).collect()}
        assert got[2]["secs_since_view"] == 0.0


class TestIVF:
    def embeddings(self, spark):
        rows = [
            (0, [1.0, 0.0]),   # centroid 0
            (1, [0.0, 1.0]),   # centroid 1
            (2, [0.9, 0.1]),   # -> cell 0
            (3, [0.1, 0.9]),   # -> cell 1
            (4, [-1.0, 0.0]),  # dot ties at <=0 -> deterministic cell
        ]
        return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    def test_assignment(self, spark):
        got = {r["vec_id"]: r["cell_id"] for r in
               similarity.ivf_assign(self.embeddings(spark), "embedding", "vec_id", n_cells=2).collect()}
        assert got[0] == 0 and got[1] == 1
        assert got[2] == 0 and got[3] == 1
        assert got[4] == 1  # dots -1.0 vs 0.0 -> cell 1 wins on value

    def test_probe_restricted_to_cell(self, spark):
        e = self.embeddings(spark)
        got = similarity.ivf_topk(e, "embedding", "vec_id", [1.0, 0.0], query_cell=0, k=10, n_cells=2)
        ids = [r["vec_id"] for r in got.collect()]
        assert set(ids) == {0, 2}  # only cell-0 members scored


class TestFillTimeGaps:
    def test_zero_fills_silent_days(self, spark):
        from pgferry_spark.operators.temporal import fill_time_gaps

        rows = [
            (1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"),
            (1, "2024-01-04 09:00:00"),  # days 2,3 silent
            (2, "2024-01-02 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.to_timestamp("ts_s").alias("ts")
        )
        got = {(r.user_id, str(r.bucket)[:10]): r.n_events
               for r in fill_time_gaps(df, "user_id", "ts", "day").collect()}
        assert got[(1, "2024-01-01")] == 2
        assert got[(1, "2024-01-02")] == 0
        assert got[(1, "2024-01-03")] == 0
        assert got[(1, "2024-01-04")] == 1
        assert got[(2, "2024-01-02")] == 1
        assert len(got) == 5  # user 1: 4 days, user 2: 1 day


class TestRateAnomalies:
    def test_spike_scores_high(self, spark):
        from pgferry_spark.operators.temporal import rate_anomalies

        rows = []
        # 10 quiet days alternating 2/3 events (nonzero trailing variance),
        # then a 40-event spike on day 11
        for d in range(1, 11):
            for i in range(2 + d % 2):
                rows.append((d * 100 + i, f"2024-01-{d:02d} 05:00:00", "click"))
        rows += [(9000 + i, "2024-01-11 05:00:00", "click") for i in range(40)]
        df = spark.createDataFrame(rows, "event_id long, ts_s string, event_type string").select(
            "event_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
        )
        got = {str(r.bucket)[:10]: r for r in rate_anomalies(df, "ts", "event_type", "day", 7).collect()}
        # first bucket has no trailing window at all -> NULL z
        assert got["2024-01-01"].z_score is None
        # the spike is far above any trailing variation
        spike = got["2024-01-11"]
        assert spike.n_events == 40 and spike.z_score is not None and spike.z_score > 3


class TestFunnel:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id: long, ts: timestamp, event_type: string"
        )

    def test_ordered_matching_and_depths(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import funnel_report, funnel_steps

        t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
        rows = [
            # u1 completes all three in order
            (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
            # u2: click BEFORE view never counts; no purchase after click
            (2, t(1), "click"), (2, t(2), "view"), (2, t(3), "click"),
            # u3: purchase before anything, then view only
            (3, t(1), "purchase"), (3, t(2), "view"),
            # u4: only non-funnel traffic -> excluded entirely
            (4, t(1), "error"),
        ]
        out = {r["user_id"]: r for r in funnel_steps(
            self._events(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["steps_completed"] == 3
        assert (out[1]["t_first"], out[1]["t_last"]) == (t(1), t(3))
        assert out[2]["steps_completed"] == 2          # view@2 then click@3
        assert out[2]["t_first"] == t(2) and out[2]["t_last"] == t(3)
        assert out[3]["steps_completed"] == 1          # view only

        rep = funnel_report(
            self._events(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
        assert [(r["step"], r["step_type"], r["n_users"]) for r in rep] == [
            (1, "view", 3), (2, "click", 2), (3, "purchase", 1),
        ]

    def test_equal_timestamp_never_advances(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import funnel_steps

        t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
        rows = [
            (1, t(1), "view"), (1, t(1), "click"),   # tie: click not after view
            (1, t(2), "click"),                      # this one counts
            (2, t(1), "click"), (2, t(1), "purchase"),  # no view at all
        ]
        out = {r["user_id"]: r for r in funnel_steps(
            self._events(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()}
        assert out[1]["steps_completed"] == 2 and out[1]["t_last"] == t(2)
        assert out[2]["steps_completed"] == 0
        assert out[2]["t_first"] is None and out[2]["t_last"] is None

    def test_empty_steps_raises(self, spark):
        import pytest as _pytest

        from pgferry_spark.operators.temporal import funnel_steps

        with _pytest.raises(ValueError):
            funnel_steps(self._events(spark, []), "user_id", "ts",
                         "event_type", [])


class TestRetentionAndTransitions:
    def test_retention_cohorts(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import retention_cohorts

        d = lambda day, h=9: dt.datetime(2026, 1, day, h)
        rows = [
            (1, d(1)), (1, d(1, 12)),        # chatty on day 1 -> counts once
            (1, d(3)),                       # back on day 3
            (2, d(1)), (2, d(2)),            # cohort day 1, offsets 0 and 1
            (3, d(2)),                       # cohort day 2, offset 0 only
        ]
        df = spark.createDataFrame(rows, "user_id: long, ts: timestamp")
        got = {(str(r["cohort_day"]), r["offset_days"]): r["n_users"]
               for r in retention_cohorts(df, "user_id", "ts").collect()}
        assert got == {
            ("2026-01-01", 0): 2,   # users 1, 2
            ("2026-01-01", 1): 1,   # user 2
            ("2026-01-01", 2): 1,   # user 1
            ("2026-01-02", 0): 1,   # user 3
        }

    def test_transition_counts_with_tie_break(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import transition_counts

        t = dt.datetime(2026, 1, 1, 10, 0)
        rows = [  # (event_id, ts, user, type); ids 2,3 share a timestamp
            (1, t, 1, "view"),
            (2, t.replace(minute=1), 1, "click"),
            (3, t.replace(minute=1), 1, "view"),   # tie: id orders click->view
            (4, t, 2, "view"),
            (5, t.replace(minute=5), 2, "click"),
        ]
        df = spark.createDataFrame(
            rows, "event_id: long, ts: timestamp, user_id: long, event_type: string"
        )
        got = {(r["prev_type"], r["next_type"]): r["n"]
               for r in transition_counts(
                   df, "user_id", "ts", "event_type", order_col="event_id"
               ).collect()}
        assert got == {("view", "click"): 2, ("click", "view"): 1}



def test_last_touch_attribution_goldens(spark):
    import datetime as dt

    from pgferry_spark.operators.temporal import last_touch_attribution

    t = lambda m: dt.datetime(2026, 2, 1, 10, m)
    rows = [  # (event_id, user, ts, type)
        (1, 1, t(0), "view"),
        (2, 1, t(1), "click"),
        (3, 1, t(2), "purchase"),      # attributed: click
        (4, 1, t(3), "purchase"),      # consecutive conversion: still click
        (5, 2, t(0), "purchase"),      # no prior touch -> NULL
        (6, 3, t(0), "view"),
        (7, 3, t(0), "purchase"),      # same ts: id order puts view first
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp, event_type: string"
    )
    got = {r["conversion_id"]: r["attributed_type"]
           for r in last_touch_attribution(
               df, "user_id", "ts", "event_type", "event_id"
           ).collect()}
    assert got == {3: "click", 4: "click", 5: None, 7: "view"}


def test_inter_event_gaps_goldens(spark):
    import datetime as dt

    from pgferry_spark.operators.temporal import inter_event_gaps

    t = lambda s: dt.datetime(2026, 3, 1, 12, 0, s)
    rows = [
        (1, 1, t(0)), (2, 1, t(10)), (3, 1, t(40)),   # gaps 10s, 30s
        (4, 2, t(5)),                                  # single event: no row
    ]
    df = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    got = {r["user_id"]: r for r in
           inter_event_gaps(df, "user_id", "ts", "event_id").collect()}
    assert set(got) == {1}
    r = got[1]
    assert (r["n_gaps"], r["min_gap_s"], r["median_gap_s"], r["max_gap_s"]) == \
        (2, 10.0, 20.0, 30.0)


class TestConcurrencyProfile:
    def _sessions(self, spark, rows):
        import datetime as dt

        data = [
            (i, dt.datetime.fromisoformat(s), dt.datetime.fromisoformat(e))
            for i, (s, e) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data, "sid long, session_start timestamp, session_end timestamp"
        )

    def test_peak_and_cross_bucket_carry(self, spark):
        from pgferry_spark.operators.temporal import concurrency_profile

        # three sessions: two overlap inside 10:00; one spans 10:30-12:30,
        # so hour 11 has NO boundary events (absent by contract) and hour
        # 12 must inherit carry 1 before its own -1
        s = self._sessions(spark, [
            ("2024-01-01 10:00:00", "2024-01-01 10:20:00"),
            ("2024-01-01 10:10:00", "2024-01-01 10:40:00"),
            ("2024-01-01 10:30:00", "2024-01-01 12:30:00"),
        ])
        got = {
            r.bucket_ts.isoformat(): r.peak_concurrency
            for r in concurrency_profile(
                s, "session_start", "session_end", "hour"
            ).collect()
        }
        assert got == {
            "2024-01-01T10:00:00": 2,  # sessions 0+1 overlap 10:10-10:20
            "2024-01-01T12:00:00": 1,  # carry-in 1, then the -1 at 12:30
        }

    def test_end_releases_before_start_claims(self, spark):
        from pgferry_spark.operators.temporal import concurrency_profile

        # back-to-back sessions sharing one instant must not double-count
        s = self._sessions(spark, [
            ("2024-01-01 10:00:00", "2024-01-01 10:30:00"),
            ("2024-01-01 10:30:00", "2024-01-01 10:45:00"),
        ])
        got = {
            r.bucket_ts.isoformat(): r.peak_concurrency
            for r in concurrency_profile(
                s, "session_start", "session_end", "hour"
            ).collect()
        }
        assert got == {"2024-01-01T10:00:00": 1}

    def test_bad_bucket_rejected(self, spark):
        import pytest as _pytest

        from pgferry_spark.operators.temporal import concurrency_profile

        s = self._sessions(spark, [("2024-01-01 10:00:00", "2024-01-01 10:30:00")])
        with _pytest.raises(ValueError):
            concurrency_profile(s, "session_start", "session_end", "hour; DROP")


class TestDebounce:
    def test_greedy_rearm_differs_from_lag(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import debounce_events

        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
        rows = [
            (1, 10, t0),
            (1, 11, t0 + dt.timedelta(seconds=4)),   # < 5s after kept A -> drop
            (1, 12, t0 + dt.timedelta(seconds=8)),   # >= 5s after A -> KEEP (lag-based would drop)
            (1, 13, t0 + dt.timedelta(seconds=9)),   # < 5s after C -> drop
            (1, 14, t0 + dt.timedelta(seconds=20)),  # keep
            (2, 20, t0),                             # other user independent
        ]
        df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
        kept = sorted(
            r.event_id
            for r in debounce_events(df, "user_id", "ts", "event_id", cooldown_s=5).collect()
        )
        assert kept == [10, 12, 14, 20]

    def test_tie_breaks_on_event_id(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import debounce_events

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, 5, t0), (1, 3, t0)], "user_id long, event_id long, ts timestamp"
        )
        kept = [r.event_id for r in debounce_events(df, "user_id", "ts", "event_id", 60).collect()]
        assert kept == [3]  # lower id wins the simultaneous tie


class TestSeasonalAnomalies:
    def test_same_slot_baseline(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import seasonal_anomalies

        # Mondays 09:00 over 4 weeks: 10, 10, 10, 40 -> week 4 is the
        # outlier against ITS OWN slot; a Tuesday bucket with count 40 has
        # a single-observation slot -> NULL z
        rows = []
        eid = 0
        base = dt.datetime(2024, 1, 1, 9, 0)  # a Monday
        for week, n in enumerate([10, 10, 10, 40]):
            for i in range(n):
                rows.append((eid, base + dt.timedelta(weeks=week, seconds=i), "click"))
                eid += 1
        for i in range(40):
            rows.append((eid, dt.datetime(2024, 1, 2, 9, 0, i), "click"))
            eid += 1
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        out = {(r.bucket, r.n_events): r.z_score for r in seasonal_anomalies(df).collect()}
        z_spike = out[(dt.datetime(2024, 1, 22, 9, 0), 40)]
        z_normal = out[(dt.datetime(2024, 1, 1, 9, 0), 10)]
        assert z_spike > 1.4 and z_normal < 0
        assert out[(dt.datetime(2024, 1, 2, 9, 0), 40)] is None  # lone slot

    def test_constant_slot_has_null_z(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import seasonal_anomalies

        rows = [
            (i, dt.datetime(2024, 1, 1, 9, 0) + dt.timedelta(weeks=w), "view")
            for w in range(3) for i in range(1)
        ]
        df = spark.createDataFrame(
            [(w, t, e) for w, (i, t, e) in enumerate(rows)],
            "event_id long, ts timestamp, event_type string",
        )
        out = seasonal_anomalies(df).collect()
        assert all(r.z_score is None for r in out)  # zero variance


class TestDecayedTopk:
    def test_recent_burst_outranks_old_volume(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import decayed_topk

        as_of = "2024-02-01 00:00:00"
        t_new = dt.datetime(2024, 1, 31, 23, 0)   # 1h old
        t_old = dt.datetime(2024, 1, 1, 0, 0)     # a month old
        rows = [(1, t_new)] * 5 + [(2, t_old)] * 500
        df = spark.createDataFrame(
            [(u, t) for u, t in rows], "user_id long, ts timestamp"
        )
        out = decayed_topk(df, "user_id", "ts", as_of, half_life_hours=24.0, k=2).collect()
        # user 1: ~5 * 2^(-1/24) ≈ 4.86; user 2: 500 * 2^(-744/24) ≈ 2e-7
        assert out[0].user_id == 1 and out[1].user_id == 2
        assert out[0].decayed_score > 4.5 > 1 > out[1].decayed_score

    def test_anchored_not_wall_clock(self, spark):
        import datetime as dt

        from pgferry_spark.operators.temporal import decayed_topk

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
        )
        a = decayed_topk(df, "user_id", "ts", "2024-01-02 00:00:00").collect()[0]
        b = decayed_topk(df, "user_id", "ts", "2024-01-02 00:00:00").collect()[0]
        assert a.decayed_score == b.decayed_score == 0.5  # exactly one half-life
