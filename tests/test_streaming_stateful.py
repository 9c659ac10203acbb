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


def test_stream_vs_corpus_dedup_filters_history_and_horizon(spark, tmp_path):
    """Stream-static anti join against the batch fingerprint index: a
    re-crawl of a document already in the corpus is dropped at ingest
    (dedup_stream_by_content alone would pass it — history isn't in
    stream state); fresh docs still dedup against each other within the
    horizon; state never holds corpus history."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pgferry_spark.functions.text import fingerprint
    from pgferry_spark.streaming.events import dedup_stream_vs_corpus

    t = dt.datetime(2024, 1, 1, 10, 0)
    corpus = spark.createDataFrame(
        [(100, "an old page already in the lake")], "doc_id long, text string"
    ).select(fingerprint(F.col("text")).alias("fp"))
    rows = [
        (1, t, "AN OLD   page already in the lake"),  # normalized re-crawl -> dropped vs corpus
        (2, t, "a genuinely new document"),
        (3, t, "a GENUINELY   new document"),         # twin of 2 -> dropped vs horizon
        (4, t, "another new document"),
    ]
    path = str(tmp_path / "vs_corpus_src")
    spark.createDataFrame(rows, "doc_id: long, ts: timestamp, text: string") \
        .coalesce(1).write.parquet(path)
    stream = dedup_stream_vs_corpus(
        spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(path),
        corpus,
    )
    q = (
        stream.writeStream.format("memory").queryName("t_vs_corpus")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM t_vs_corpus").collect()
    )
    assert 1 not in got            # history caught it
    assert 4 in got
    assert (2 in got) != (3 in got) or (2 in got and 3 not in got)
    assert len(got) == 2           # one of {2,3} plus 4
    assert set(stream.schema.fieldNames()) == {"doc_id", "ts", "text"}


def test_curate_stream_scrubs_filters_and_dedups(spark, tmp_path):
    """The edge curation gate: PII scrubbed BEFORE fingerprinting (so docs
    differing only in PII dedup), junk filtered, survivors annotated."""
    import datetime as dt

    from pgferry_spark.streaming.events import curate_stream

    t = dt.datetime(2024, 1, 1, 10, 0)
    good = ("a sensible document, with enough words to pass the gate. "
            "it continues for a while and stays reasonable.")
    rows = [
        (1, t, good + " contact alice@example.com for details."),
        (2, t, good + " contact bob@other.org for details."),  # PII twin of 1
        (3, t, "!!!! ???? ;;;; >>>> ::::"),                    # junk -> filtered
        (4, t, "another acceptable document with plenty of ordinary words "
               "to keep the quality score comfortably above the bar."),
    ]
    path = str(tmp_path / "curate_src")
    spark.createDataFrame(rows, "doc_id: long, ts: timestamp, text: string") \
        .coalesce(1).write.parquet(path)
    stream = curate_stream(
        spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(path),
        min_quality=0.4,
    )
    q = (
        stream.writeStream.format("memory").queryName("t_curate")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM t_curate").collect()}
    # doc 3 junk-filtered; docs 1/2 differ only in the scrubbed email -> one kept
    assert 3 not in got and 4 in got
    assert sum(1 for i in (1, 2) if i in got) == 1
    kept_pii = got[1] if 1 in got else got[2]
    assert kept_pii["n_pii"] == 1 and "<EMAIL>" in kept_pii["text"]
    assert "@" not in kept_pii["text"].replace("<EMAIL>", "")
    assert got[4]["n_pii"] == 0 and got[4]["quality"] >= 0.4


def test_pii_card_gate_stream_redacts_and_drops(spark, tmp_path):
    """Checksum gate at the edge: only the Luhn-VALID carrier is flagged;
    phone-shaped runs pass untouched; drop mode quarantines the carrier."""
    import datetime as dt

    from pgferry_spark.streaming.events import pii_card_gate_stream

    t = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t, "pay with 4539 5787 6362 1486 today"),      # valid card
        (2, t, "call 415 555 0199 123 4 maybe"),           # fails Luhn
        (3, t, "no digits in sight"),
    ]
    path = str(tmp_path / "card_src")
    spark.createDataFrame(rows, "doc_id: long, ts: timestamp, text: string") \
        .coalesce(1).write.parquet(path)

    def run(mode, name):
        stream = pii_card_gate_stream(
            spark.readStream.schema(
                "doc_id long, ts timestamp, text string"
            ).parquet(path),
            mode=mode,
        )
        q = (
            stream.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return {r["doc_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}

    got = run("redact", "t_card_redact")
    assert got[1]["n_valid_cards"] == 1 and "<CARD>" in got[1]["text"]
    assert "4539" not in got[1]["text"]
    assert got[2]["n_valid_cards"] == 0 and got[2]["text"] == rows[1][2]
    assert got[3]["n_valid_cards"] == 0

    dropped = run("drop", "t_card_drop")
    assert set(dropped) == {2, 3}


def test_funnel_stream_emits_on_completion(spark, tmp_path):
    """Real-time funnel: completion rows emit with the batch operator's
    exact matching semantics (ordered, strictly-increasing ts)."""
    import datetime as dt

    from pgferry_spark.streaming.events import funnel_stream

    t = dt.datetime(2024, 1, 1, 10, 0)
    m = lambda k: t + dt.timedelta(minutes=k)
    rows = [
        # u1 completes: view -> click -> purchase
        (1, m(0), "view"), (1, m(1), "click"), (1, m(2), "purchase"),
        # u2 clicks before viewing, never purchases -> no completion row
        (2, m(0), "click"), (2, m(1), "view"),
        # u3 out-of-order arrival within the batch still completes
        (3, m(2), "purchase"), (3, m(0), "view"), (3, m(1), "click"),
    ]
    path = str(tmp_path / "funnel_src")
    spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, event_type: string"
    ).coalesce(1).write.parquet(path)
    stream = funnel_stream(
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .parquet(path),
        ["view", "click", "purchase"],
    )
    q = (
        stream.writeStream.format("memory").queryName("t_funnel")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["user_id"]: r for r in spark.sql("SELECT * FROM t_funnel").collect()}
    # only completions emit in this single-batch run (u2 is parked in state)
    assert set(got) == {1, 3}
    for uid in (1, 3):
        assert got[uid]["steps_completed"] == 3
        assert got[uid]["t_first"] == m(0) and got[uid]["t_last"] == m(2)


class TestDecontaminateStream:
    def test_near_dup_gate_vs_corpus_index(self, spark, tmp_path):
        from pgferry_spark.operators.dedup import lsh_bucket_table
        from pgferry_spark.streaming.events import decontaminate_stream

        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
             (2, "an entirely different corpus document about distributed query engines")],
            "doc_id: long, text: string",
        )
        index = lsh_bucket_table(corpus, "text", "doc_id")

        import datetime
        ts = datetime.datetime(2026, 1, 1)
        arrivals = spark.createDataFrame(
            [(100, ts, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),  # exact dup
             (101, ts, "the quick brown fox jumps over the lazy dog near the quiet river bank now"),    # near dup (1 word)
             (102, ts, "a genuinely novel document about perceptual hashing of images")],               # fresh
            "doc_id: long, ts: timestamp, text: string",
        )
        src = str(tmp_path / "arrivals")
        arrivals.write.parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).parquet(src)

        passed: list = []

        def sink(batch_df, batch_id):
            passed.extend(batch_df.collect())

        q = decontaminate_stream(
            stream, index, sink, str(tmp_path / "ckpt"),
            query_name="t_decontaminate",
        )
        q.awaitTermination()
        ids = sorted(r["doc_id"] for r in passed)
        # exact dup AND the lightly-edited near dup are both stopped (the
        # exact-fingerprint gate would have let 101 through); novel passes
        assert ids == [102]


class TestDsirGateStream:
    def test_only_target_lookalikes_admitted(self, spark, tmp_path):
        import datetime

        from pyspark.sql import functions as F

        from pgferry_spark.operators.filters import (
            dsir_feature_buckets, dsir_importance_weights,
        )
        from pgferry_spark.streaming.events import dsir_gate_stream

        cook = "simmer the garlic butter sauce then whisk the cream slowly"
        law = "the party of the first part shall indemnify the licensor"
        train = spark.createDataFrame(
            [(i, cook + f" variation {i}", True) for i in range(10)]
            + [(100 + i, law + f" clause {i}", False) for i in range(10)],
            "doc_id: long, text: string, is_tgt: boolean",
        )
        # train the ratio table ONCE (batch) and derive the broadcastable
        # (__b, __lr) artifact the gate consumes: rebuild it exactly the
        # way dsir_importance_weights does internally
        n_buckets = 512
        feats = dsir_feature_buckets(
            train.withColumn("__tgt", F.col("is_tgt")), "text", "doc_id",
            n_buckets, carry=["__tgt"],
        )
        dist = feats.groupBy("__b").agg(
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("tgt_cnt"),
            F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).alias("raw_cnt"),
        )
        totals = dist.agg(F.sum("tgt_cnt").alias("T"), F.sum("raw_cnt").alias("R"))
        a, b = F.lit(1.0), F.lit(float(n_buckets))
        ratio = dist.crossJoin(F.broadcast(totals)).select(
            "__b",
            (F.log((F.col("tgt_cnt") + a) / (F.col("T") + a * b))
             - F.log((F.col("raw_cnt") + a) / (F.col("R") + a * b))).alias("__lr"),
        )

        ts = datetime.datetime(2026, 1, 1)
        arrivals = spark.createDataFrame(
            [(900, ts, "whisk garlic butter slowly"),      # cooking lookalike
             (901, ts, "licensor shall indemnify party")], # legal lookalike
            "doc_id: long, ts: timestamp, text: string",
        )
        src = str(tmp_path / "arrivals")
        arrivals.write.parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).parquet(src)

        passed: list = []

        def sink(batch_df, batch_id):
            passed.extend(batch_df.collect())

        # threshold between the two lookalikes' batch scores, so the gate
        # must reproduce the batch calibration to pass the test
        batch_scores = {
            r["doc_id"]: r["dsir_weight"]
            for r in dsir_importance_weights(
                train.unionByName(
                    arrivals.select("doc_id", "text",
                                    F.lit(False).alias("is_tgt"))
                ),
                "text", "doc_id", F.col("is_tgt"), n_buckets=n_buckets,
            ).collect()
        }
        assert batch_scores[900] > batch_scores[901]
        cut = (batch_scores[900] + batch_scores[901]) / 2

        q = dsir_gate_stream(
            stream, ratio, sink, str(tmp_path / "ckpt"), min_weight=cut,
            n_buckets=n_buckets, query_name="t_dsir_gate",
        )
        q.awaitTermination()
        assert [r["doc_id"] for r in passed] == [900]
        assert passed[0]["dsir_weight"] > cut


class TestPsiDriftMonitorStream:
    def test_shifted_batch_alerts_stable_batch_does_not(self, spark, tmp_path):
        import datetime

        from pgferry_spark.streaming.events import psi_drift_monitor_stream

        baseline = spark.createDataFrame(
            [(float(i % 100),) for i in range(1000)], "v: double"
        )
        ts = datetime.datetime(2026, 1, 1)
        # file 1: same distribution; file 2: shifted far right
        stable = spark.createDataFrame(
            [(i, ts, float((i * 7) % 100)) for i in range(500)],
            "id: long, ts: timestamp, v: double",
        )
        shifted = spark.createDataFrame(
            [(i, ts, 500.0 + i) for i in range(500)],
            "id: long, ts: timestamp, v: double",
        )
        src = str(tmp_path / "batches")
        stable.coalesce(1).write.parquet(src)
        shifted.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("id long, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        results: list = []

        def sink(batch_id, row, alerted):
            results.append((row["psi"], alerted, row["n_new"]))

        q = psi_drift_monitor_stream(
            stream, baseline, "v", sink, str(tmp_path / "ckpt"),
            alert_threshold=0.25, query_name="t_psi_monitor",
        )
        q.awaitTermination()
        assert len(results) == 2
        alerts = sorted(results)  # stable (low psi) first
        assert alerts[0][1] is False and alerts[0][0] < 0.25
        assert alerts[1][1] is True and alerts[1][0] > 0.25
        assert all(n == 500 for _, _, n in results)


class TestQualityGateStream:
    def test_gate_reproduces_batch_calibration(self, spark, tmp_path):
        """Weights trained ONCE by the batch twin; the stream gate must
        score arrivals identically (integer micro-units) — a threshold
        set between two arrivals' batch scores admits exactly one."""
        import datetime

        from pgferry_spark.operators.classify import (
            hashed_log_odds_weights, score_with_log_odds,
        )
        from pgferry_spark.streaming.events import quality_gate_stream

        prose = "the quick brown fox jumps over the lazy dog by the river"
        junk = "zzzz qqqq xxxx kkkk wwww vvvv jjjj hhhh"
        train = spark.createDataFrame(
            [(i, prose + f" variant {i}", 1) for i in range(10)]
            + [(100 + i, junk + f" {i}", 0) for i in range(10)],
            "doc_id: long, text: string, label: int",
        )
        weights = hashed_log_odds_weights(train, "text", "doc_id", "label", 512)

        ts = datetime.datetime(2026, 1, 1)
        arrivals = spark.createDataFrame(
            [(900, ts, "quick brown fox by the river"),
             (901, ts, "qqqq zzzz wwww kkkk")],
            "doc_id: long, ts: timestamp, text: string",
        )
        batch_scores = {
            r["doc_id"]: r["score_micro"]
            for r in score_with_log_odds(
                arrivals, weights, "text", "doc_id", 512
            ).collect()
        }
        assert batch_scores[900] > batch_scores[901]
        cut = (batch_scores[900] + batch_scores[901]) // 2

        src = str(tmp_path / "arrivals")
        arrivals.write.parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).parquet(src)
        passed: list = []

        def sink(batch_df, batch_id):
            passed.extend(batch_df.collect())

        q = quality_gate_stream(
            stream, weights, sink, str(tmp_path / "ckpt"),
            min_score_micro=cut, n_buckets=512, query_name="t_quality_gate",
        )
        q.awaitTermination()
        assert [r["doc_id"] for r in passed] == [900]
        # the stream-side score IS the batch score — bit-identical ints
        assert passed[0]["score_micro"] == batch_scores[900]


class TestLoghistMonitorStream:
    def test_running_quantiles_match_batch_sketch(self, spark, tmp_path):
        """Mergeability on the stream: after the last micro-batch, the
        running estimates must equal the batch sketch's quantiles over
        the union of all batches — bit-identical, no tolerance."""
        import datetime

        from pgferry_spark.operators.sketches import (
            loghist_counts,
            loghist_quantiles,
        )
        from pgferry_spark.streaming.events import loghist_monitor_stream

        ts = datetime.datetime(2026, 1, 1)
        lo = spark.createDataFrame(
            [(i, ts, 10.0 + (i * 13) % 90) for i in range(400)],
            "id: long, ts: timestamp, v: double",
        )
        hi = spark.createDataFrame(
            [(i, ts, 1000.0 + (i * 7) % 5000) for i in range(400)],
            "id: long, ts: timestamp, v: double",
        )
        src = str(tmp_path / "batches")
        lo.coalesce(1).write.parquet(src)
        hi.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("id long, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        results: list = []

        def sink(batch_id, ests, n_cells):
            results.append((ests, n_cells))

        q = loghist_monitor_stream(
            stream, "v", sink, str(tmp_path / "ckpt"),
            qs=(0.5, 0.99), query_name="t_loghist_monitor",
        )
        q.awaitTermination()
        assert len(results) == 2

        batch_hist = loghist_counts(lo.union(hi), "v")
        expect = {
            r["q"]: r["est"]
            for r in loghist_quantiles(batch_hist, (0.5, 0.99)).collect()
        }
        final_ests, final_cells = results[-1]
        assert final_ests == expect
        assert final_cells == batch_hist.count()
        # the monitor's state is sketch-bounded, not stream-bounded
        assert final_cells <= 63 * 16

    def test_estimates_move_as_distribution_shifts(self, spark, tmp_path):
        import datetime

        from pgferry_spark.streaming.events import loghist_monitor_stream

        ts = datetime.datetime(2026, 1, 1)
        src = str(tmp_path / "batches")
        spark.createDataFrame(
            [(i, ts, 50.0) for i in range(100)],
            "id: long, ts: timestamp, v: double",
        ).coalesce(1).write.parquet(src)
        spark.createDataFrame(
            [(i, ts, 5000.0) for i in range(300)],
            "id: long, ts: timestamp, v: double",
        ).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("id long, ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        seen: list = []
        q = loghist_monitor_stream(
            stream, "v", lambda b, e, n: seen.append(e[0.5]),
            str(tmp_path / "ckpt"), qs=(0.5,),
            query_name="t_loghist_shift",
        )
        q.awaitTermination()
        medians = sorted(seen)  # batch order isn't guaranteed; values are
        assert medians[0] <= 50.0 < medians[1]  # p50 jumps once hi dominates


class TestHllRegisterStoreStream:
    def test_store_rolling_equals_batch_rolling(self, spark, tmp_path):
        """The stream maintains the per-day register store; rolling WAU
        read from the store must equal the batch hll_rolling_distinct
        over the union of all batches — bit-identical. The store stays
        register-table-sized and versioned (one snapshot per batch)."""
        import datetime

        from pgferry_spark.operators.sketches import hll_rolling_distinct
        from pgferry_spark.sources.laketable import LakeTable
        from pgferry_spark.streaming.events import (
            hll_register_store_stream,
            rolling_distinct_from_store,
        )

        base = datetime.datetime(2026, 4, 1)
        week1 = spark.createDataFrame(
            [(i, base + datetime.timedelta(days=i % 5, hours=i % 20), i % 90)
             for i in range(600)],
            "id: long, ts: timestamp, user_id: long",
        )
        week2 = spark.createDataFrame(
            [(i, base + datetime.timedelta(days=4 + i % 6, hours=i % 20),
              40 + i % 120)
             for i in range(600)],
            "id: long, ts: timestamp, user_id: long",
        )
        src = str(tmp_path / "batches")
        week1.coalesce(1).write.parquet(src)
        week2.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("id long, ts timestamp, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        store = LakeTable(spark, str(tmp_path / "regstore"))
        q = hll_register_store_stream(
            stream, store, "ts", "user_id", str(tmp_path / "ckpt"),
            query_name="t_hll_store",
        )
        q.awaitTermination()

        from_store = {
            r.day: (r.est_distinct, r.n_present)
            for r in rolling_distinct_from_store(store, window_days=7).collect()
        }
        from_batch = {
            r.day: (r.est_distinct, r.n_present)
            for r in hll_rolling_distinct(
                week1.union(week2), "ts", "user_id", window_days=7
            ).collect()
        }
        assert from_store == from_batch
        # versioned: one snapshot per non-empty batch, ops recorded with
        # the replay-guard run/batch coordinates
        ops = [s.op for s in store.history()]
        assert len(ops) == 2
        assert all(op.startswith("hll_merge:run=") for op in ops)
        assert [op.rsplit(":batch=", 1)[1] for op in ops] == ["0", "1"]
        # the store is sketch-bounded: <= days * 256 rows
        n_days = store.read().select("day").distinct().count()
        assert store.read().count() <= n_days * 256


class TestRegisterStoreVacuum:
    def test_vacuum_keep_last_bounds_snapshots(self, spark, tmp_path):
        import datetime

        from pgferry_spark.sources.laketable import LakeTable
        from pgferry_spark.streaming.events import hll_register_store_stream

        base = datetime.datetime(2026, 5, 1)
        src = str(tmp_path / "batches")
        for b in range(3):
            spark.createDataFrame(
                [(i, base + datetime.timedelta(days=b), b * 1000 + i)
                 for i in range(50)],
                "id: long, ts: timestamp, user_id: long",
            ).coalesce(1).write.mode("append" if b else "overwrite").parquet(src)
        stream = (
            spark.readStream.schema("id long, ts timestamp, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        store = LakeTable(spark, str(tmp_path / "regstore"))
        q = hll_register_store_stream(
            stream, store, "ts", "user_id", str(tmp_path / "ckpt"),
            vacuum_keep_last=1, query_name="t_hll_store_vac",
        )
        q.awaitTermination()
        # only the newest snapshot survives; it holds all 3 days' registers
        assert len(store.history()) == 1
        assert store.read().select("day").distinct().count() == 3


class TestLoghistStoreStream:
    def test_kill_and_resume_percentiles_survive_restart(self, spark, tmp_path):
        """VERDICT r5 Next #5: the durable loghist store. Stage 1 drains
        file 1 and the process 'dies' (the query object and its closure
        state are gone). Stage 2 is a FRESH query on the same checkpoint
        + store: the checkpoint skips file 1, so the only way the running
        percentiles can cover it is the persisted histogram. The merged
        sketch is bit-identical to a batch run over all data."""
        from pgferry_spark.operators.sketches import (
            loghist_counts,
            loghist_quantiles,
        )
        from pgferry_spark.sources.laketable import LakeTable
        from pgferry_spark.streaming.events import (
            loghist_store_stream,
            quantiles_from_store,
        )

        schema = "id long, v double"
        src = str(tmp_path / "batches")
        ckpt = str(tmp_path / "ckpt")
        store_path = str(tmp_path / "histstore")
        lo = spark.createDataFrame(
            [(i, 1.0 + (i % 97) / 10.0) for i in range(400)], schema
        )
        hi = spark.createDataFrame(
            [(i, 500.0 + (i % 211) * 3.0) for i in range(400)], schema
        )
        lo.coalesce(1).write.parquet(src)

        def start():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            store = LakeTable(spark, store_path)
            return store, loghist_store_stream(
                stream, store, "v", ckpt, query_name="t_loghist_store"
            )

        store1, q1 = start()
        q1.awaitTermination()  # drains file 1, then the "process" exits
        mid_p50 = {
            r.q: r.est for r in quantiles_from_store(store1, (0.5,)).collect()
        }[0.5]

        hi.coalesce(1).write.mode("append").parquet(src)
        store2, q2 = start()  # fresh query, fresh closures — a restart
        q2.awaitTermination()

        got = {
            r.q: r.est
            for r in quantiles_from_store(store2, (0.5, 0.95, 0.99)).collect()
        }
        want = {
            r.q: r.est
            for r in loghist_quantiles(
                loghist_counts(lo.union(hi), "v"), (0.5, 0.95, 0.99)
            ).collect()
        }
        assert got == want  # mergeable sketch: restart leaves no gap
        # and the estimates really moved when the hi file arrived
        assert got[0.5] > mid_p50
        # durable state stays sketch-bounded: <= 63*16 cells
        assert store2.read().count() <= 63 * 16
        # one snapshot per non-empty batch; same run id (same checkpoint
        # lineage) with advancing batch ids
        ops = [s.op for s in store2.history()]
        assert len(ops) == 2
        assert all(op.startswith("loghist_merge:run=") for op in ops)
        runs = {op.split(":run=")[1].split(":")[0] for op in ops}
        assert len(runs) == 1
        assert [op.rsplit(":batch=", 1)[1] for op in ops] == ["0", "1"]

    def test_redelivered_batch_not_double_counted(self, spark, tmp_path):
        """foreachBatch is at-least-once: a crash between the snapshot
        write and the checkpoint commit redelivers the batch.  Simulate
        it faithfully: keep the checkpoint (same lineage, same run
        token) but delete its COMMIT marker for batch 0 — on restart the
        source re-offers batch 0 under the same run id.  The sum-merge
        would double every cell; the batch-id guard must make the
        replay a no-op."""
        import os

        import pyspark.sql.functions as F

        from pgferry_spark.sources.laketable import LakeTable
        from pgferry_spark.streaming.events import loghist_store_stream

        schema = "id long, v double"
        src = str(tmp_path / "batches")
        ckpt = str(tmp_path / "ckpt")
        store_path = str(tmp_path / "histstore")
        spark.createDataFrame(
            [(i, 2.0 + i % 11) for i in range(300)], schema
        ).coalesce(1).write.parquet(src)

        def run():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            store = LakeTable(spark, store_path)
            loghist_store_stream(
                stream, store, "v", ckpt, query_name="t_loghist_replay"
            ).awaitTermination()

        run()
        # crash-before-commit: drop the batch-0 commit marker (and its
        # Hadoop checksum twin, which would otherwise fail the re-write)
        os.remove(os.path.join(ckpt, "commits", "0"))
        os.remove(os.path.join(ckpt, "commits", ".0.crc"))
        run()  # same checkpoint lineage: batch 0 redelivers
        total = (
            LakeTable(spark, store_path)
            .read()
            .agg(F.sum("cnt").alias("n"))
            .collect()[0]["n"]
        )
        assert total == 300  # not 600: the redelivered batch was skipped

    def test_redelivery_guard_survives_foreign_snapshot(self, spark, tmp_path):
        """ADVICE r6: an interleaved foreign snapshot (compaction, another
        writer) between the store write and the checkpoint commit used to
        defeat the guard, which only looked at hist[-1].  The guard now
        scans history for the newest op of THIS run, so the redelivered
        batch is still skipped."""
        import os

        import pyspark.sql.functions as F

        from pgferry_spark.sources.laketable import LakeTable
        from pgferry_spark.streaming.events import loghist_store_stream

        schema = "id long, v double"
        src = str(tmp_path / "batches")
        ckpt = str(tmp_path / "ckpt")
        store_path = str(tmp_path / "histstore")
        spark.createDataFrame(
            [(i, 2.0 + i % 11) for i in range(300)], schema
        ).coalesce(1).write.parquet(src)

        def run():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            store = LakeTable(spark, store_path)
            loghist_store_stream(
                stream, store, "v", ckpt, query_name="t_loghist_foreign"
            ).awaitTermination()

        run()
        store = LakeTable(spark, store_path)
        # a foreign writer snapshots between crash and restart: hist[-1]
        # is no longer this run's op
        store.write_snapshot(store.read(), op="compact")
        # crash-before-commit: drop the batch-0 commit marker (and its
        # Hadoop checksum twin, which would otherwise fail the re-write)
        os.remove(os.path.join(ckpt, "commits", "0"))
        os.remove(os.path.join(ckpt, "commits", ".0.crc"))
        run()
        total = (
            store.read().agg(F.sum("cnt").alias("n")).collect()[0]["n"]
        )
        assert total == 300  # guard scanned past the foreign op

    def test_fresh_checkpoint_lineage_not_skipped(self, spark, tmp_path):
        """ADVICE r6 (the defect the path-hash run id had): wiping the
        checkpoint dir and restarting at the SAME path is a fresh
        lineage — the source genuinely re-reads everything as new
        batches 0.., and they must MERGE, not be silently skipped as
        fake redeliveries.  (Keeping the store across a checkpoint wipe
        therefore double-counts by design — the run token makes that
        explicit and loud instead of silently dropping new data.)"""
        import shutil

        import pyspark.sql.functions as F

        from pgferry_spark.sources.laketable import LakeTable
        from pgferry_spark.streaming.events import loghist_store_stream

        schema = "id long, v double"
        src = str(tmp_path / "batches")
        ckpt = str(tmp_path / "ckpt")
        store_path = str(tmp_path / "histstore")
        spark.createDataFrame(
            [(i, 2.0 + i % 11) for i in range(300)], schema
        ).coalesce(1).write.parquet(src)

        def run():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            store = LakeTable(spark, store_path)
            loghist_store_stream(
                stream, store, "v", ckpt, query_name="t_loghist_fresh"
            ).awaitTermination()

        run()
        shutil.rmtree(ckpt)  # fresh lineage: new run token, batch ids reset
        run()
        ops = [s.op for s in LakeTable(spark, store_path).history()]
        runs = {op.split(":run=")[1].split(":")[0] for op in ops}
        assert len(runs) == 2  # two distinct lineages recorded
        total = (
            LakeTable(spark, store_path)
            .read()
            .agg(F.sum("cnt").alias("n"))
            .collect()[0]["n"]
        )
        assert total == 600  # fresh-lineage batches merged, not skipped

    def test_checkpoint_does_not_double_count(self, spark, tmp_path):
        """Restarting with NO new data must not re-merge the already-
        committed batch (the checkpoint, not the store, carries exactly-
        once): the histogram's total count stays equal to the row count."""
        import pyspark.sql.functions as F

        from pgferry_spark.sources.laketable import LakeTable
        from pgferry_spark.streaming.events import loghist_store_stream

        schema = "id long, v double"
        src = str(tmp_path / "batches")
        ckpt = str(tmp_path / "ckpt")
        store_path = str(tmp_path / "histstore")
        spark.createDataFrame(
            [(i, 3.0 + i % 7) for i in range(250)], schema
        ).coalesce(1).write.parquet(src)

        for _ in range(2):  # second run = restart with nothing new
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            store = LakeTable(spark, store_path)
            q = loghist_store_stream(
                stream, store, "v", ckpt, query_name="t_loghist_store_once"
            )
            q.awaitTermination()

        total = (
            LakeTable(spark, store_path)
            .read()
            .agg(F.sum("cnt").alias("n"))
            .collect()[0]["n"]
        )
        assert total == 250
