"""Structured Streaming operators.

The reference is strictly batch (SURVEY §2.12) — this module is the
beyond-reference streaming surface: the same event aggregation as
``operators.queries.events_hourly`` expressed over an unbounded source with
watermarked late-data handling, so one logical operator serves both batch
and streaming (the Dataflow-model posture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def stream_events_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events table directory. With
    ``maxFilesPerTrigger`` each micro-batch is bounded; at scale this is the
    landing-zone pattern (object-store prefix → readStream)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation: events later than
    ``watermark`` behind the max seen ts are dropped and their windows
    finalized — bounded state, the requirement for an unbounded run."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a batch
    dimension table. Spark broadcasts/re-plans the static side per
    micro-batch (a planned-per-trigger join, no state store), so dimension
    updates between triggers are picked up — the standard landing-zone
    pattern of annotating a fact stream with slowly-changing reference
    data. Inner join: events without a dimension row are dropped (use a
    left join + null handling for keep-and-flag semantics)."""
    return events.join(dim, events[on_left] == dim[on_right], "inner").drop(on_right)


def run_to_completion(stream_df: DataFrame, query_name: str = "events_hourly") -> list:
    """Drain the stream with availableNow into an in-memory sink and return
    the rows — the test harness for streaming operators."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def sessionize_stream_native(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Gap sessionization via the BUILT-IN ``session_window`` aggregate —
    the declarative twin of :func:`sessionize_stream`: same gap rule,
    but the state machine is Spark's own session-window state store
    (merging, watermark expiry, spill) instead of our
    applyInPandasWithState loop.  Prefer this one when the per-session
    output is expressible as aggregates (it is here); the stateful
    variant remains for session logic aggregates can't express (e.g.
    emitting mid-session alerts).  One shuffle on (user, window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{int(gap_minutes)} minutes"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("window_end"),
            "n_events",
        )
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming sessionization via ``applyInPandasWithState`` —
    the custom-stateful-operator surface the built-in window aggregates
    can't express (variable-length gap sessions).

    State per user: (session_start_us, last_seen_us, n_events, sum_value).
    An event later than ``gap_minutes`` after last_seen closes the session
    (emitting one row) and opens a new one; the watermark bounds state by
    expiring users idle past the timeout (their final session flushes on
    timeout). Batch twin: ``operators.queries.sessionize``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((user_id, start_us, last_us, n))
                state.remove()
        else:
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = None
                n = 0
            # the group's rows arrive as MULTIPLE pandas chunks in arbitrary
            # order — gather all timestamps before the single sorted gap scan
            # (sorting per chunk would close sessions that a later chunk's
            # earlier timestamps actually bridge)
            all_ts: list = []
            for pdf in pdf_iter:
                all_ts.extend(pdf["ts"])
            for ts in sorted(all_ts):
                us = int(pd.Timestamp(ts).value // 1000)
                if last_us is None:
                    start_us, last_us, n = us, us, 1
                elif us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = us, us, 1
                else:
                    last_us, n = max(last_us, us), n + 1
            if start_us is not None:
                state.update((start_us, last_us, n))
                state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(events: DataFrame, id_col: str = "event_id", watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop re-delivered events **by id** within the
    watermark horizon — ``dropDuplicatesWithinWatermark`` keys on the id
    alone, so a redelivery whose timestamp was perturbed in flight still
    dedupes (plain dropDuplicates([id, ts]) would pass both copies). State
    holds only ids newer than the watermark, so memory is bounded by
    (arrival rate × horizon)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark([id_col])


def dedup_stream_by_content(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming CONTENT dedup: drop documents whose whitespace-normalized
    fingerprint (functions/text.py ``fingerprint``: md5 of the lowercased,
    run-collapsed text) was already seen inside the watermark horizon —
    the ingestion-time twin of the batch ``incremental_dedup`` operator.
    A crawler re-fetching the same page under a different URL/id, or a
    mirror serving byte-shifted whitespace, dedupes here; the id-keyed
    :func:`dedup_stream` would pass both.

    State is one (fingerprint → latest-ts) entry per distinct document in
    the horizon — bounded by (distinct-arrival rate × horizon), not corpus
    size. At 100 TB this is the cheap gate in FRONT of the landing zone;
    the batch MinHash/SimHash passes remain the periodic compaction behind
    it (near-dups with different fingerprints flow through)."""
    from ..functions.text import fingerprint

    fp = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    return (
        fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def sliding_event_rates(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window rates: each event lands in window/slide
    overlapping windows (4 here), giving a smoothed rate curve instead of
    tumbling steps. State per open window is one partial aggregate —
    sliding multiplies state by the overlap factor, which the watermark
    still bounds."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    within_minutes: int = 10,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: pair each ``left`` event with ``right``
    events for the same user arriving within ``within_minutes`` AFTER it
    (click→conversion attribution). Both sides are watermarked and the join
    carries the time-range predicate, so Spark can expire buffered rows
    once the watermark passes the interval — bounded state; an un-ranged
    stream-stream join would buffer forever."""
    lt = left.select(
        F.col("user_id").alias("l_user"),
        F.col("event_type").alias("l_type"),
        F.col("ts").alias("l_ts"),
    ).withWatermark("l_ts", watermark)
    rt = right.select(
        F.col("user_id").alias("r_user"),
        F.col("event_type").alias("r_type"),
        F.col("ts").alias("r_ts"),
    ).withWatermark("r_ts", watermark)
    return lt.join(
        rt,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")),
    )


def stream_to_target(
    stream_df: DataFrame,
    target,
    table: str,
    checkpoint_dir: str,
    query_name: str = "stream_sink",
):
    """Bridge a stream into a pipeline TargetBackend via ``foreachBatch``:
    each micro-batch appends through the same ``write(df, table,
    append=True)`` used by the batch movement path, so a landing-zone
    stream and a bulk migration share one sink implementation (and its
    per-partition transactional semantics). The streaming checkpoint makes
    delivery at-least-once into an idempotent sink, exactly-once for
    replay-safe ones."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        target.write(batch_df, table, append=True)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_to_laketable(
    stream_df: DataFrame,
    table,
    key_col: str,
    checkpoint_dir: str,
    query_name: str = "lake_sink",
):
    """Stream into a versioned ``LakeTable`` with EXACTLY-ONCE batches:
    each micro-batch commits one snapshot tagged
    ``batch:<query_name>:<id>``, and a replayed batch id (Structured
    Streaming re-delivers the in-flight batch after a crash between
    sink-write and checkpoint-commit) is detected from the snapshot log
    and SKIPPED — the foreachBatch idempotent-sink pattern, with the
    lake's own commit log as the transaction marker, so no side store is
    needed.  Batch ids are per-query, so the tag is scoped by
    ``query_name``: a RESTART of the same logical pipeline must reuse the
    same name (and checkpoint), while an unrelated pipeline writing to
    the same table needs its own.

    Each batch merges as an upsert keyed on ``key_col`` (op='I',
    seq=batch id): re-crawled keys overwrite, new keys append, and the
    snapshot history doubles as an audit trail of what each micro-batch
    changed (``table.diff``).  First batch on an empty table becomes the
    initial snapshot.

    Maintenance: a long-running drizzle of small batches fragments the
    current snapshot's file layout; run ``table.maybe_compact(max_files,
    target_bytes)`` between triggers (or on a schedule) — it is a no-op
    until fragmentation crosses the threshold, commits a row-identical
    ``op='compact'`` version otherwise, and never collides with the
    batch-tag replay check."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as SF

        tag = f"batch:{query_name}:{batch_id}"
        if any(s.op == tag for s in table.history()):
            return  # replayed batch — already committed
        if table.current_version() is None:
            snap = batch_df
        else:
            from pgferry_spark.operators.incremental import apply_changes

            changes = batch_df.withColumn("__op", SF.lit("I")).withColumn(
                "__seq", SF.lit(int(batch_id))
            )
            snap = apply_changes(
                table.read(), changes, key_col, "__seq", "__op"
            ).drop("__op", "__seq")
        table._commit(snap, tag)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def crawl_merge_stream(
    captures: DataFrame,
    table,
    checkpoint_dir: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    ts_col: str = "capture_ts",
    fp_col: str = "fp",
    query_name: str = "crawl_merge",
):
    """Streaming twin of
    :func:`~pgferry_spark.operators.domains.crawl_snapshot_merge`: a
    continuous crawl feed merged keep-newest into the persistent
    LakeTable URL index.  Each micro-batch of raw captures is reduced to
    its newest capture per canonical URL (batch-local ``snapshot_reduce``,
    O(batch)), then full-outer-merged against the CURRENT index with the
    same keep-newest rule — an arriving capture replaces the stored row
    ONLY if at least as new (max ts, ties to the batch), so out-of-order
    and replayed captures can never regress the index.  That ordering
    guarantee is what plain upsert-by-key (``stream_to_laketable``)
    cannot give: upsert trusts arrival order, a crawl trusts capture
    time.

    Exactly-once via the lake commit-log batch tag (the
    ``stream_to_laketable`` idempotent-sink pattern); each snapshot IS
    the post-batch URL index, so the lake history doubles as the
    re-crawl audit trail (``table.diff`` between versions = the
    changed/new rows of that batch).

    At scale the index is the artifact that persists between crawls and
    each micro-batch costs O(batch): the index side of the merge reads
    bucketed-by-nurl (the batch plan-pin in tests/test_domains.py), and
    the status column is dropped before commit (it is a per-batch
    delta label, not index state)."""
    from pgferry_spark.operators.domains import (
        crawl_snapshot_merge,
        snapshot_reduce,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"batch:{query_name}:{batch_id}"
        if any(s.op == tag for s in table.history()):
            return  # replayed batch — already committed
        if table.current_version() is None:
            snap = snapshot_reduce(batch_df, url_col, id_col, ts_col, fp_col)
        else:
            snap = crawl_snapshot_merge(
                table.read(), batch_df, url_col, id_col, ts_col, fp_col
            ).drop("status")
        table._commit(snap, tag)

    return (
        captures.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def warc_ingest_stream(
    containers: DataFrame,
    table,
    checkpoint_dir: str,
    query_name: str = "warc_ingest",
):
    """Continuous crawl-container ingest (round 9): a stream of raw WARC
    containers ``(container_id, container)`` indexed per micro-batch —
    :func:`~pgferry_spark.sources.warc.warc_record_index` parses real
    framing executor-side, so container bytes never shuffle and never
    land in the lake — and the ~100-byte index rows append to the
    persistent LakeTable record index with the exactly-once batch-tag
    protocol (the ``stream_to_laketable`` idempotent-sink pattern).
    The payload store stays wherever the containers live; the lake
    holds only (container_id, record_no, byte ranges, uri), which is
    what turns a later re-extraction into ranged reads.  Records are
    immutable (a re-crawl produces NEW containers), so each batch is a
    pure append — ``LakeTable.append`` hardlinks the previous version's
    files and writes only the batch's index rows: O(batch) per trigger,
    never O(index), the cost profile a long-running drizzle needs
    (run ``table.maybe_compact`` between triggers as usual)."""
    from pgferry_spark.sources.warc import warc_record_index

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"batch:{query_name}:{batch_id}"
        if any(s.op == tag for s in table.history()):
            return  # replayed batch — already committed
        table.append(warc_record_index(batch_df), tag)

    return (
        containers.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def http_ingest_stream(
    containers: DataFrame,
    table,
    checkpoint_dir: str,
    query_name: str = "http_ingest",
):
    """Continuous CommonCrawl-grade ingest (round 11): the
    :func:`warc_ingest_stream` pattern with the HTTP ENVELOPE parsed in
    the same per-batch walk —
    :func:`~pgferry_spark.sources.httpmsg.http_response_index` appends
    (status, media type, declared charset, body range, truncation,
    digest_ok) rows to the persistent LakeTable with the exactly-once
    batch-tag protocol.  Container bytes never shuffle and never land
    in the lake; downstream keep-200/transcode/quality stages read
    THESE rows instead of re-parsing containers, and a later body
    fetch is a bounded range read off the envelope's (offset, len).
    Each batch is a pure O(batch) append (captures are immutable)."""
    from pgferry_spark.sources.httpmsg import http_response_index

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"batch:{query_name}:{batch_id}"
        if any(s.op == tag for s in table.history()):
            return  # replayed batch — already committed
        table.append(http_response_index(batch_df), tag)

    return (
        containers.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def wet_publish_stream(
    docs: DataFrame,
    table,
    checkpoint_dir: str,
    query_name: str = "wet_publish",
    docs_per_container: int = 8,
    gzip_members: bool = False,
    batch_stride: int = 1 << 40,
):
    """Continuous WET publication (round 10, second wave) — the
    export-side twin of :func:`warc_ingest_stream`: a stream of
    extracted documents ``(doc_id, url, text)`` is packed per
    micro-batch into WET conversion containers
    (:func:`~pgferry_spark.sources.warc.wet_export`; ``gzip_members``
    emits the ``.warc.wet.gz`` transport) and the shards append to the
    persistent LakeTable with the exactly-once batch-tag protocol.
    Here the container bytes ARE the product — the lake is the
    published shard store a downstream text pipeline reads instead of
    re-parsing HTML — and each batch is a pure O(batch) append
    (documents are immutable; a re-extraction run publishes NEW
    shards).

    Container ids are made BATCH-unique by offsetting the exporter's
    ``doc_id div k`` grouping key with ``batch_id * batch_stride``
    (round-10 ADVICE: streaming batch composition is source-dependent,
    so a micro-batch boundary can split a div-k bucket and two batches
    would otherwise publish shards sharing a container_id with partial
    buckets — breaking (container_id, record_no) addressing).  The
    offset is applied INSIDE the exporter via ``cid_offset`` (round 12,
    r11 ADVICE) so the warcinfo record id embedded in the shard bytes
    (``urn:uuid:info-<cid>``) equals the published ``container_id`` —
    previously a post-build remap rewrote only the column and the two
    diverged.  Both factors are bound-checked before any byte lands: a
    batch whose offset container_id reaches the NEXT batch's stride
    window fails the job (executor-side raise_error on the actual
    column), and a batch_id that would overflow the 63-bit composition
    fails driver-side.  The WARC/WET shard-pairing property survives
    as ``container_id % batch_stride`` (the batch-invariant div-k key)
    when both streams see the same batch boundaries."""
    from pgferry_spark.sources.warc import wet_export

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"batch:{query_name}:{batch_id}"
        if any(s.op == tag for s in table.history()):
            return  # replayed batch — already committed
        if (int(batch_id) + 1) * batch_stride > (1 << 63) - 1:
            raise ValueError(
                f"batch_id {batch_id} overflows batch_stride "
                f"{batch_stride} in a 63-bit container id"
            )
        shards = wet_export(
            batch_df,
            docs_per_container=docs_per_container,
            gzip_members=gzip_members,
            cid_offset=int(batch_id) * int(batch_stride),
        )
        checked = shards.select(
            F.when(
                F.col("container_id")
                < F.lit((int(batch_id) + 1) * int(batch_stride)),
                F.col("container_id"),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        "wet_publish_stream: container_id reached "
                        "batch_stride — raise batch_stride"
                    )
                )
            )
            .cast("long")
            .alias("container_id"),
            "container",
        )
        table.append(checked, tag)

    return (
        docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_materialized_agg(
    stream_df: DataFrame,
    table,
    group_col: str,
    val_col: str,
    checkpoint_dir: str,
    query_name: str = "mv_sink",
):
    """Streaming MATERIALIZED VIEW: maintain a grouped count+sum
    aggregate incrementally, one lake snapshot per micro-batch, with the
    same exactly-once batch-tag protocol as :func:`stream_to_laketable`.
    Each batch pays one batch-sized aggregate plus a groups-sized merge
    join against the previous snapshot — never a re-aggregation of
    history (the streaming face of
    ``operators.incremental.maintain_grouped_agg``; an append-only
    stream needs no retraction term, which is why count/sum maintain
    with a plain merge).  Readers get a consistent view at every commit,
    and ``table.read(version=...)`` is the aggregate as-of any batch —
    a time-travelling dashboard table."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as SF

        tag = f"mv:{query_name}:{batch_id}"
        if any(s.op == tag for s in table.history()):
            return
        delta = batch_df.groupBy(group_col).agg(
            SF.count(SF.lit(1)).alias("n"),
            SF.sum(SF.col(val_col)).alias("total"),
        )
        if table.current_version() is None:
            snap = delta
        else:
            old = table.read()
            merged = old.join(
                delta.withColumnRenamed(group_col, "__g")
                .withColumnRenamed("n", "__dn")
                .withColumnRenamed("total", "__dv"),
                old[group_col] == SF.col("__g"),
                "full_outer",
            )
            snap = merged.select(
                SF.coalesce(old[group_col], SF.col("__g")).alias(group_col),
                (
                    SF.coalesce(SF.col("n"), SF.lit(0))
                    + SF.coalesce(SF.col("__dn"), SF.lit(0))
                ).alias("n"),
                (
                    SF.coalesce(SF.col("total"), SF.lit(0.0))
                    + SF.coalesce(SF.col("__dv"), SF.lit(0.0))
                ).alias("total"),
            )
        table._commit(snap, tag)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def curate_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    min_quality: float = 0.3,
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingestion-time curation gate: the batch curation Column functions
    (PII scrub → quality score → content dedup) applied AT THE EDGE, so
    raw PII never lands in the lake and junk/duplicate documents never
    cost downstream batch passes.

    Composition order matters and is load-bearing:

    1. **PII scrub first** — the scrubbed text is what everything
       downstream (including the dedup fingerprint) sees, so two crawls
       differing only in a rotating tracking email still dedup;
    2. **quality filter** on the scrubbed text (map-only, no state);
    3. **content dedup within the watermark horizon** (bounded state, the
       :func:`dedup_stream_by_content` machinery).

    Everything is the SAME Column expressions the batch operators use —
    one curation codebase, two execution modes; only the dedup step is
    streaming-specific (bounded-horizon instead of corpus-wide)."""
    from ..functions.text import pii_count, pii_scrub, quality_score

    scrubbed = docs.withColumn(
        "__scrubbed", pii_scrub(F.col(text_col))
    ).withColumn("n_pii", pii_count(F.col(text_col)).cast("int"))
    scored = (
        scrubbed.withColumn(text_col, F.col("__scrubbed"))
        .drop("__scrubbed")
        .withColumn("quality", F.round(quality_score(F.col(text_col)), 4))
        .filter(F.col("quality") >= min_quality)
    )
    return dedup_stream_by_content(
        scored, text_col=text_col, ts_col=ts_col, watermark=watermark
    )


def pii_card_gate_stream(
    docs: DataFrame,
    text_col: str = "text",
    mode: str = "redact",
) -> DataFrame:
    """Checksum-validated card gate AT THE EDGE: card-shaped digit runs
    are extracted, separator-stripped, length-gated, and Luhn-validated
    (functions.text.card_candidates / luhn_valid — the same expressions
    the batch ``pii_luhn_cards`` entry uses). A document carrying at
    least one Luhn-VALID number is the highest-severity PII case — the
    regex-only :func:`curate_stream` scrub can't distinguish it from a
    phone-shaped run, so this gate runs BEFORE it:

    - ``mode="redact"``: mask every card-shaped run in the offending
      document with ``<CARD>`` (conservative: once one validated number
      is present, all card-shaped runs in that doc are suspect) and keep
      the row, carrying ``n_valid_cards`` for audit;
    - ``mode="drop"``: quarantine the row entirely (keep only
      ``n_valid_cards == 0`` docs).

    Map-only Column expressions — no state, no watermark, identical on a
    stream or a batch frame; at 100 TB it rides the ingest scan inside
    whole-stage codegen."""
    from ..functions.text import PII_CARD_RUN, card_candidates, luhn_valid

    cands = card_candidates(F.col(text_col))
    n_valid = F.size(F.filter(cands, luhn_valid)).cast("int")
    flagged = docs.withColumn("n_valid_cards", n_valid)
    if mode == "drop":
        return flagged.filter(F.col("n_valid_cards") == 0)
    if mode != "redact":
        raise ValueError(f"unknown mode: {mode!r} (use 'redact' or 'drop')")
    return flagged.withColumn(
        text_col,
        F.when(
            F.col("n_valid_cards") > 0,
            F.regexp_replace(F.col(text_col), PII_CARD_RUN, "<CARD>"),
        ).otherwise(F.col(text_col)),
    )


def dedup_stream_vs_corpus(
    docs: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    fp_col: str = "fp",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup against the EXISTING corpus: drop arriving documents
    whose content fingerprint already exists in the batch fingerprint
    index, then dedup survivors against each other within the watermark
    horizon.  This is the missing bridge between
    :func:`dedup_stream_by_content` (stream-vs-stream only — a re-crawl of
    a years-old page sails through) and the batch ``incremental_dedup``
    (exact but runs on a schedule): the stream is filtered against history
    AT INGEST, and only genuinely-new fingerprints reach the lake.

    Shape: a stream-static LEFT ANTI join — Structured Streaming re-plans
    the static side each micro-batch, so a nightly-compacted fingerprint
    table is picked up without restarting the query.  At 100 TB the
    fingerprint index is the bucketed-by-fp layout the batch
    ``incremental_dedup`` proof writes (sources/layout.py): the anti join
    is then bucket-pruned on the static side and the micro-batch is the
    small probe side.  State afterwards is the same bounded
    (fingerprint → ts) map as :func:`dedup_stream_by_content` — history
    lives in the static index, NOT in stream state, which is what keeps
    state bounded by the horizon instead of the corpus.
    """
    from ..functions.text import fingerprint

    fp = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    fresh = fp.join(
        corpus_fps.select(F.col(fp_col).alias("__fp")),
        on="__fp",
        how="left_anti",
    )
    return (
        fresh.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    watermark: str = "1 hour",
    idle_minutes: int = 60,
) -> DataFrame:
    """Streaming ordered-funnel tracking via ``applyInPandasWithState`` —
    the real-time twin of the batch ``operators.temporal.funnel_steps``:
    emit ``(user_id, steps_completed, t_first, t_last)`` the moment a user
    COMPLETES the funnel, or when they go idle past ``idle_minutes``
    (their partial progress flushes on timeout).

    State per user is just the matched-step timestamp list (≤ len(steps)
    longs) — bounded regardless of traffic; the same strict-ts matching
    rule as the batch operator (each step strictly after the previous
    match), so a completed funnel reads identically in both modes. Late
    events beyond the watermark are dropped by the engine before they
    reach the fold, which is the streaming-correctness trade every
    event-time stateful op makes."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType, TimestampType,
    )

    n = len(steps)
    if n == 0:
        raise ValueError("steps must be non-empty")
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("steps_completed", IntegerType()),
        StructField("t_first", TimestampType()),
        StructField("t_last", TimestampType()),
    ])
    # fixed-width state: matched timestamps in micros, -1 = unmatched slot
    state_schema = StructType(
        [StructField(f"t{i}", LongType()) for i in range(n)]
    )

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key

        def emit(ts_us):
            done = [t for t in ts_us if t >= 0]
            return pd.DataFrame({
                "user_id": [user_id],
                "steps_completed": [len(done)],
                "t_first": [pd.Timestamp(done[0] * 1000) if done else pd.NaT],
                "t_last": [pd.Timestamp(done[-1] * 1000) if done else pd.NaT],
            })

        if state.hasTimedOut:
            if state.exists:
                ts_us = list(state.get)
                state.remove()
                yield emit(ts_us)
            return

        ts_us = list(state.get) if state.exists else [-1] * n
        rows = []
        for pdf in pdf_iter:
            rows.extend(zip(pdf["ts"], pdf["event_type"]))
        progress = sum(1 for t in ts_us if t >= 0)
        last = ts_us[progress - 1] if progress else -1
        for ts, et in sorted(rows, key=lambda r: r[0]):
            if progress >= n:
                break
            us = int(pd.Timestamp(ts).value // 1000)
            if et == steps[progress] and (progress == 0 or us > last):
                ts_us[progress] = us
                progress, last = progress + 1, us
        if progress >= n:
            if state.exists:
                state.remove()
            yield emit(ts_us)
        else:
            state.update(tuple(ts_us))
            state.setTimeoutTimestamp(
                (max(last, 0) // 1000) + idle_minutes * 60 * 1000
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def trending_tokens(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    min_count: int = 2,
) -> DataFrame:
    """Streaming trending-token counts: tokenize at the edge and count per
    tumbling window — the live twin of the batch ``vocab_topk`` report
    (what terms are spiking in the crawl RIGHT NOW).

    The explode multiplies rows ~tokens-per-doc BEFORE the stateful
    aggregation, but state is bounded by (windows in the watermark
    horizon) × (distinct tokens seen in them) — the explode itself is
    stateless map work. ``min_count`` prunes the long singleton tail at
    emit time; final ranking happens downstream on the (tiny) emitted
    window counts, because a global top-k inside the stream would need a
    single-partition sort per trigger."""
    from ..functions.text import tokens

    toks = docs.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("token"),
    ).filter(F.col("token").isNotNull() & (F.col("token") != ""))
    return (
        toks.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("token"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "token",
            "n",
        )
    )


def decontaminate_stream(
    docs: DataFrame,
    corpus_buckets: DataFrame,
    sink,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle: int = 3,
    query_name: str = "decontaminate",
):
    """Streaming NEAR-dup gate against the batch corpus LSH index — the
    ingest-time twin of :func:`~pgferry_spark.operators.dedup.
    cross_corpus_near_dup`, and the near-dup upgrade of
    :func:`dedup_stream_vs_corpus` (which only stops EXACT fingerprint
    matches — a lightly-edited re-crawl sails through it).

    Each micro-batch runs the BATCH banding code verbatim
    (``lsh_bucket_table`` — one curation codebase, two execution modes):
    the arriving documents bucket with the same MinHash parameters the
    corpus index was built with, a semi-join on (band_id, band_hash)
    finds arrivals colliding with ANY corpus bucket, and only
    non-colliding documents reach ``sink(clean_df, batch_id)``.

    ``foreachBatch`` rather than a stream-static join because the drop
    rule is per-DOCUMENT (any of its bands collides), which needs a
    post-join distinct + anti-join — per-batch batch semantics express
    that directly, where the pure streaming plan would either leak
    per-band rows or need a stateful aggregate.  The static index is
    re-read each micro-batch, so a nightly-rebuilt (and at scale,
    bucketed-by-(band_id, band_hash)) index is picked up live.  Banding
    recall rules are the batch family's: an edited near-dup collides
    with band probability, exact dups always."""
    from ..operators.dedup import lsh_bucket_table

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = lsh_bucket_table(
            batch_df, text_col, id_col, num_hashes, bands, shingle, "md5"
        )
        hits = (
            b.join(corpus_buckets, ["band_id", "band_hash"], "left_semi")
            .select(id_col)
            .distinct()
        )
        clean = batch_df.join(hits, id_col, "left_anti")
        sink(clean, batch_id)

    return (
        docs.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def dsir_gate_stream(
    docs: DataFrame,
    ratio_table: DataFrame,
    sink,
    checkpoint_dir: str,
    min_weight: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    query_name: str = "dsir_gate",
):
    """Streaming DSIR admission gate: arriving documents are scored
    against a PRE-TRAINED hashed-feature log-ratio table (built once by
    the batch :func:`~pgferry_spark.operators.filters.
    dsir_importance_weights` run over the reference corpora) and only
    documents whose mean log importance ratio clears ``min_weight``
    reach ``sink(passed_df_with_weight, batch_id)`` — domain-targeted
    ingestion instead of ingest-everything-filter-later.

    ``ratio_table`` is ``(__b, __lr)`` — ≤ n_buckets rows, re-read each
    micro-batch (a nightly re-train is picked up live, same posture as
    the decontamination gate's corpus index).  foreachBatch so the
    per-document mean is plain batch semantics; the scoring join is
    broadcast-sized by construction."""

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ..operators.filters import dsir_feature_buckets

        scored = (
            dsir_feature_buckets(batch_df, text_col, id_col, n_buckets)
            .join(F.broadcast(ratio_table), "__b")
            .groupBy(id_col)
            .agg(F.round(F.avg("__lr"), 6).alias("dsir_weight"))
            .filter(F.col("dsir_weight") >= min_weight)
        )
        passed = batch_df.join(scored, on=id_col)
        sink(passed, batch_id)

    return (
        docs.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def quality_gate_stream(
    docs: DataFrame,
    weight_table: DataFrame,
    sink,
    checkpoint_dir: str,
    min_score_micro: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    query_name: str = "quality_gate",
):
    """Streaming model-quality admission gate: arriving documents are
    scored against the PRE-TRAINED hashed-BoW log-odds weight table
    (built once by the batch
    :func:`~pgferry_spark.operators.classify.hashed_log_odds_weights`
    over a labeled seed set) and only documents whose integer
    micro-score clears ``min_score_micro`` reach
    ``sink(passed_df_with_score, batch_id)`` — the model-based sibling
    of the heuristic ``curate_stream`` filter and the third member of
    the ingest-guard trio (decontaminate / DSIR / quality).

    The SHARED batch scorer (``score_with_log_odds``) runs verbatim per
    micro-batch, so stream admission is calibrated to the batch model by
    construction — a threshold tuned on batch scores transfers exactly
    (integer micro-units, no float drift). ``weight_table`` is
    ≤ n_buckets rows, re-read each micro-batch (a nightly re-train is
    picked up live); the scoring join is broadcast-sized."""

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ..operators.classify import score_with_log_odds

        scored = score_with_log_odds(
            batch_df, weight_table, text_col, id_col, n_buckets
        ).filter(F.col("score_micro") >= min_score_micro)
        passed = batch_df.join(scored.select(id_col, "score_micro"), on=id_col)
        sink(passed, batch_id)

    return (
        docs.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def psi_drift_monitor_stream(
    stream_df: DataFrame,
    baseline: DataFrame,
    col: str,
    sink,
    checkpoint_dir: str,
    alert_threshold: float = 0.25,
    n_bins: int = 10,
    query_name: str = "psi_monitor",
):
    """Streaming distribution-drift monitor — the third ingest guard
    (dedup gates CONTENT, the DSIR gate gates DOMAIN, this one watches
    DISTRIBUTION): every micro-batch computes its PSI against the fixed
    baseline snapshot with the BATCH :func:`~pgferry_spark.plans.
    validation.psi_drift` verbatim, and ``sink(batch_id, psi_row,
    alerted)`` receives one scorecard row per batch with the standard
    >0.25 action threshold applied.

    The baseline is re-read per micro-batch (re-baselining after an
    accepted shift needs no restart); per-batch cost is two bounded
    histogram aggregates + an n_bins join — independent of how much
    history the stream has seen, because the monitor is stateless by
    design (state lives in the baseline table, not the stream)."""
    from ..plans.validation import psi_drift

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        row = psi_drift(baseline, batch_df, col, n_bins=n_bins).first()
        sink(batch_id, row, bool(row["psi"] > alert_threshold))

    return (
        stream_df.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def _sketch_store_stream(
    stream_df: DataFrame,
    store,
    checkpoint_dir: str,
    batch_sketch,
    merge,
    base_op: str,
    vacuum_keep_last: int | None,
    query_name: str,
):
    """Shared store-stream harness for mergeable sketches: per batch,
    ``batch_sketch(batch_df)`` builds the bounded sketch table and
    ``merge(current, batch)`` folds it into the versioned LakeTable
    snapshot (copy-on-write).

    REPLAY GUARD — ``foreachBatch`` is at-least-once: a crash after
    ``write_snapshot`` but before the streaming checkpoint commits
    redelivers the same batch on restart.  A max-merge (HLL registers)
    absorbs the replay idempotently, but a SUM-merge (log-histogram
    cells) would double-count it.  Each snapshot therefore records
    ``{base_op}:run=<token>:batch=<id>`` and a redelivered (same run,
    already-applied batch id) update is a no-op — the checkpoint then
    commits and the stream moves on.

    The run token is a create-if-absent UUID file INSIDE the checkpoint
    dir (ADVICE r6: hashing the checkpoint *path* tied the guard to the
    path, not the lineage — wiping the dir and restarting at the same
    path made genuine new batches 0..last look like redeliveries and
    silently skipped them).  The file shares the checkpoint's fate:
    survives a crash/restart (same lineage → redeliveries recognized),
    dies with a checkpoint wipe (fresh lineage → nothing skipped).  And
    the guard scans history for the NEWEST op matching this run — an
    interleaved foreign snapshot (``store.compact()``, another writer)
    no longer defeats it by displacing ``hist[-1]``."""
    import os
    import re as _re
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    token_path = os.path.join(checkpoint_dir, "_pgferry_run_token")
    try:
        with open(token_path, "x", encoding="utf-8") as fh:
            fh.write(uuid.uuid4().hex[:16])
    except FileExistsError:
        pass
    with open(token_path, encoding="utf-8") as fh:
        run_id = fh.read().strip()
    op_pat = _re.compile(
        _re.escape(base_op) + r":run=([0-9a-f]+):batch=(\d+)$"
    )

    def update(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            current = store.read()
            hist = store.history()
        except FileNotFoundError:
            current, hist = None, []
        applied = -1
        for snap in reversed(hist):
            m = op_pat.match(snap.op)
            if m and m.group(1) == run_id:
                applied = int(m.group(2))
                break
        if applied >= batch_id:
            return  # redelivered batch: snapshot already includes it
        batch = batch_sketch(batch_df)
        merged = (
            batch
            if current is None
            else merge(current.select(*batch.columns), batch)
        )
        store.write_snapshot(
            merged, op=f"{base_op}:run={run_id}:batch={batch_id}"
        )
        if vacuum_keep_last is not None:
            store.vacuum(keep_last=vacuum_keep_last)

    return (
        stream_df.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def hll_register_store_stream(
    stream_df: DataFrame,
    store,
    ts_col: str,
    key_col: str,
    checkpoint_dir: str,
    p: int = 8,
    vacuum_keep_last: int | None = None,
    query_name: str = "hll_register_store",
):
    """Streaming maintenance of a persistent per-day HLL register store —
    the ingest side of :func:`~pgferry_spark.operators.sketches.
    hll_rolling_distinct`'s "each day's events are sketched once" claim,
    wired to a versioned :class:`~pgferry_spark.sources.laketable.
    LakeTable`.

    Each micro-batch computes its (day, bucket, register) table with the
    BATCH ``hll_registers`` verbatim and max-merges it into the store as
    a new snapshot (copy-on-write; a crash between batches leaves the
    previous consistent version current, and the streaming checkpoint
    replays the batch). The store stays register-table-sized forever —
    days * 2^p rows — while the event stream it summarizes is unbounded;
    any trailing-window distinct (DAU/WAU/MAU) is then register
    arithmetic over the store, never a re-scan of events. Each batch
    commits a new snapshot, so a long-running drizzle accumulates
    near-identical versions: pass ``vacuum_keep_last`` to prune old
    snapshots after each commit (the CURRENT register state is always
    the newest version — history is only an audit trail here). Pinned by
    test_streaming_stateful: after the stream drains, rolling estimates
    read from the store equal the batch ``hll_rolling_distinct`` over
    all events.  (Register max-merge is replay-idempotent on its own;
    the shared harness's batch-id guard still applies, keeping both
    store streams on one code path.)"""
    from ..operators.sketches import hll_merge, hll_registers

    def batch_sketch(batch_df: DataFrame) -> DataFrame:
        day = F.to_date(F.col(ts_col)).alias("day")
        return hll_registers(
            batch_df.select(day, F.col(key_col)), key_col,
            group_cols=("day",), p=p,
        )

    return _sketch_store_stream(
        stream_df, store, checkpoint_dir, batch_sketch,
        lambda cur, batch: hll_merge(cur.union(batch), group_cols=("day",)),
        "hll_merge", vacuum_keep_last, query_name,
    )


def rolling_distinct_from_store(
    store, window_days: int = 7, p: int = 8
) -> DataFrame:
    """Trailing-window distinct estimates read from a register store
    maintained by :func:`hll_register_store_stream` — the query side of
    the split: map-only register explode + bounded merges, zero event
    data touched. Same output contract as ``hll_rolling_distinct``."""
    from ..operators.sketches import hll_rolling_from_registers

    return hll_rolling_from_registers(store.read(), window_days=window_days, p=p)


def loghist_store_stream(
    stream_df: DataFrame,
    store,
    col: str,
    checkpoint_dir: str,
    k: int = 16,
    decimals: int = 2,
    vacuum_keep_last: int | None = None,
    query_name: str = "loghist_store",
):
    """Restart-DURABLE streaming percentile state — the loghist twin of
    :func:`hll_register_store_stream` (VERDICT r5 Next #5): each
    micro-batch is sketched with the BATCH ``loghist_counts`` verbatim
    and cell-wise merged into a versioned :class:`~pgferry_spark.
    sources.laketable.LakeTable` snapshot (copy-on-write; a crash
    between batches leaves the previous consistent version current, and
    the streaming checkpoint replays the batch). Unlike
    :func:`loghist_monitor_stream`'s process-scoped accumulator, a
    restarted process resumes from the store + checkpoint and its
    running percentiles cover EVERYTHING ever streamed — pinned by
    test_streaming_stateful's kill-and-resume test.

    The store stays sketch-bounded forever (<= 63*k cells) while the
    stream is unbounded; read running quantiles at any time with
    :func:`quantiles_from_store`. ``vacuum_keep_last`` prunes old
    snapshots after each commit (the newest version IS the running
    state — history is an audit trail here).

    Unlike the HLL register store's max-merge, the cell-count SUM-merge
    is NOT replay-idempotent — the shared harness's batch-id guard is
    what keeps an at-least-once ``foreachBatch`` redelivery (crash
    between snapshot write and checkpoint commit) from double-counting
    a batch; pinned by the redelivery test."""
    from ..operators.sketches import loghist_counts, loghist_merge

    return _sketch_store_stream(
        stream_df, store, checkpoint_dir,
        lambda batch_df: loghist_counts(batch_df, col, k=k, decimals=decimals),
        lambda cur, batch: loghist_merge(cur.union(batch)),
        "loghist_merge", vacuum_keep_last, query_name,
    )


def quantiles_from_store(
    store,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    k: int = 16,
    decimals: int = 2,
) -> DataFrame:
    """Running quantile estimates read from a histogram store maintained
    by :func:`loghist_store_stream` — the query side of the split: a
    bounded aggregate over the <= 63*k-cell store, zero event data
    touched. Same output contract as the batch ``loghist_quantiles``."""
    from ..operators.sketches import loghist_quantiles

    return loghist_quantiles(store.read(), qs, k=k, decimals=decimals)


def loghist_monitor_stream(
    stream_df: DataFrame,
    col: str,
    sink,
    checkpoint_dir: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    k: int = 16,
    decimals: int = 2,
    query_name: str = "loghist_monitor",
):
    """Streaming running-percentile monitor — the stream twin of the
    batch log-histogram quantile sketch (:func:`~pgferry_spark.
    operators.sketches.loghist_counts` / ``loghist_quantiles``).

    Each micro-batch is sketched with the BATCH ``loghist_counts``
    verbatim and merged (cell-wise count sum — the sketch's
    mergeability law) into a driver-held accumulator; ``sink(batch_id,
    {q: est}, merged_rows)`` then receives the quantile estimates of
    EVERYTHING seen so far, read off the merged histogram. Because the
    sketch is mergeable, the running estimates are bit-identical to a
    batch run over the union of all batches — pinned by
    test_streaming_stateful.

    The accumulator is PROCESS-scoped: a restart from checkpoint
    resumes the stream but starts the histogram empty, so the
    estimates cover post-restart data only. That is the right contract
    for a session monitor; for restart-durable running state use
    :func:`loghist_store_stream`, which persists the histogram to a
    versioned LakeTable (same mergeability, kill-and-resume pinned).

    The driver state is bounded by the sketch, not the stream: at most
    63*k (octave, sub) cells ever exist regardless of how many events
    flow through, so the per-batch collect is bounded metadata (same
    posture as the centroid/vocab collects). Per-batch cost: one
    bounded aggregate + an in-memory merge — history-independent."""
    from ..operators.sketches import loghist_counts, loghist_quantiles

    state: dict = {}

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        for r in loghist_counts(batch_df, col, k=k, decimals=decimals).collect():
            key = (r["e"], r["sub"])
            state[key] = state.get(key, 0) + r["cnt"]
        merged = spark.createDataFrame(
            [(e, sub, cnt) for (e, sub), cnt in sorted(state.items())],
            "e int, sub int, cnt long",
        )
        ests = {
            r["q"]: r["est"]
            for r in loghist_quantiles(merged, qs, k=k, decimals=decimals).collect()
        }
        sink(batch_id, ests, len(state))

    return (
        stream_df.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
