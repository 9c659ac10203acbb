"""Temporal join and rollup operators.

Complements the window-based temporal ops in ``operators.queries``
(sessionize, as-of join) with the two shapes those can't express:

* **range join** — points matched to arbitrary, possibly-overlapping
  intervals. Spark has no native interval index; a naive theta-join
  becomes BroadcastNestedLoopJoin (quadratic work, and a non-broadcastable
  build side fails outright at scale). The standard fix implemented here:
  quantize both sides to coarse buckets, equi-join on the bucket key
  (hash shuffle, linear), then apply the exact BETWEEN as a post-filter.
* **multi-resolution rollup** — one pass producing minute/hour/day
  aggregates via GROUPING SETS (partial aggregation applies per set;
  three separate group-bys would scan the fact three times).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# step units accepted wherever a caller-supplied unit reaches date_trunc or
# an `interval 1 <unit>` SQL fragment — anything else (a typo, or an
# injection-shaped string) fails fast instead of parsing strangely
_STEP_UNITS = frozenset(
    {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}
)


def _check_step(step: str) -> str:
    s = step.lower()
    if s not in _STEP_UNITS:
        raise ValueError(
            f"step must be one of {sorted(_STEP_UNITS)}, got {step!r}"
        )
    return s


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi``, via bucket quantization.

    Each point maps to one bucket; each interval explodes to the buckets it
    overlaps (``ceil(len/bucket) + 1`` rows — choose ``bucket_seconds``
    near the typical interval length so the fan-out stays ~2×). The join is
    then a plain hash equi-join on the bucket id, and the exact boundary
    check filters the candidates. Work is linear in points + interval
    coverage, never |points| × |intervals|.

    Timestamps quantize through exact integer microseconds — no float
    rounding at bucket edges.
    """
    bus = F.lit(bucket_seconds).cast("long") * 1_000_000
    p_bucket = (F.unix_micros(F.col(point_col)) / bus).cast("long")
    i_buckets = F.sequence(
        (F.unix_micros(F.col(lo_col)) / bus).cast("long"),
        (F.unix_micros(F.col(hi_col)) / bus).cast("long"),
    )
    p = points.withColumn("__bucket", p_bucket)
    i = intervals.withColumn("__bucket", F.explode(i_buckets))
    return (
        p.join(i, on="__bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )


def time_bucket_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """Continuous-aggregate-style rollup: (resolution, bucket_start, group)
    → count at minute/hour/day resolutions in ONE scan.

    GROUPING SETS over three pre-truncated bucket columns; the resolution
    label is derived from the grouping id so each output row names its
    grain. Map-side partial aggregation applies to every set — the fact
    table is read once, vs once per resolution for naive unioned group-bys.
    """
    bucketed = events.select(
        F.col(group_col),
        F.date_trunc("minute", F.col(ts_col)).alias("b_minute"),
        F.date_trunc("hour", F.col(ts_col)).alias("b_hour"),
        F.date_trunc("day", F.col(ts_col)).alias("b_day"),
    )
    rolled = bucketed.groupingSets(
        [["b_minute", group_col], ["b_hour", group_col], ["b_day", group_col]],
        "b_minute",
        "b_hour",
        "b_day",
        group_col,
    ).agg(F.count(F.lit(1)).alias("n_events"))
    resolution = (
        F.when(F.col("b_minute").isNotNull(), F.lit("minute"))
        .when(F.col("b_hour").isNotNull(), F.lit("hour"))
        .otherwise(F.lit("day"))
    )
    bucket_start = F.coalesce("b_minute", "b_hour", "b_day")
    return rolled.select(
        resolution.alias("resolution"),
        bucket_start.alias("bucket_start"),
        F.col(group_col),
        "n_events",
    )


def fill_time_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    step: str = "day",
) -> DataFrame:
    """Dense per-key time spine with zero-filled counts: every ``step``
    bucket between each key's first and last event, ``n_events = 0``
    where the key was silent — the gap-filling resample behind rate
    dashboards and training-data time-coverage audits.

    One fact-table aggregate produces the per-(key, bucket) counts; it
    persists (bounded: one row per key per active bucket, far smaller
    than the facts) so the per-key bounds and the final left join both
    reuse it instead of re-scanning the fact table. The spine explodes a
    ``sequence(t0, t1, interval)`` per key — output is bounded by
    keys x time-range, independent of fact cardinality, and the join is
    keyed on (key, bucket) so it shuffles the small aggregated side
    only. Caller owns the cache lifecycle."""
    from pyspark.storagelevel import StorageLevel

    step = _check_step(step)
    b = F.date_trunc(step, F.col(ts_col))
    counts = (
        df.groupBy(F.col(key_col), b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bounds = counts.groupBy(key_col).agg(
        F.min("bucket").alias("t0"), F.max("bucket").alias("t1")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr(f"interval 1 {step}"))
        ).alias("bucket"),
    )
    return spine.join(counts, [key_col, "bucket"], "left").select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )


def rate_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    step: str = "day",
    trailing: int = 7,
    min_z: float = 0.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection on event rates: bucket
    counts per (group, step), then score each bucket against the mean and
    sample stddev of its previous ``trailing`` buckets.

    Two shuffles — the bucket aggregate, then one window per group over
    the (already tiny) bucket table; the window is over aggregated rows,
    so its cost is groups x buckets regardless of fact cardinality.
    Buckets with fewer than 2 trailing points or zero variance emit NULL
    z (explicitly guarded on both engines: double/0 is Inf, not NULL, in
    some engines)."""
    step = _check_step(step)
    b = F.date_trunc(step, F.col(ts_col))
    counts = df.groupBy(F.col(group_col), b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(-trailing, -1)
    )
    mu = F.avg(F.col("n_events").cast("double")).over(w)
    sd = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    z = F.when(
        sd.isNotNull() & (sd > 0.0),
        (F.col("n_events").cast("double") - mu) / sd,
    )
    return counts.select(
        group_col,
        "bucket",
        "n_events",
        F.round(z, 4).alias("z_score"),
    ).filter(F.col("z_score").isNull() | (F.abs(F.col("z_score")) >= min_z))


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: how far does each user progress through the
    step sequence (each step's event must occur strictly AFTER the previous
    step's matched event — first qualifying occurrence wins)?

    Returns one row per user: ``(user, steps_completed, t_first, t_last)``
    where ``t_first``/``t_last`` are the matched timestamps of the first
    and deepest completed steps (NULL when no step matched).

    Scale shape: ONE shuffle (groupBy user) collecting that user's
    (ts, type) events, then the sequential matching runs as a sort + HOF
    fold in register math — no iterative joins (the N-self-join funnel
    formulation shuffles the fact table once PER STEP; this shuffles it
    once, total). Per-user state is bounded by that user's event count —
    the same per-key bound any sessionization pays; a pathological
    single-user firehose would need a pre-filter on the step types, which
    is also the first thing to push down when the funnel types are a
    small subset of traffic."""
    if not steps:
        raise ValueError("steps must be non-empty")
    step_arr = F.array(*[F.lit(s) for s in steps])
    n = len(steps)

    events = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
    )
    # fold: acc = array of matched step timestamps (size = progress so far).
    # Each step must land STRICTLY after the previous matched timestamp —
    # the explicit tie rule keeps the fold identical to the SQL oracle's
    # min(ts WHERE ts > t_prev) chain when distinct event types share a
    # timestamp (the sort order of equal-ts structs would otherwise decide).
    # try_element_at throughout: ANSI mode (Spark 4 default) makes plain
    # element_at THROW on out-of-range, and boolean && does not short-
    # circuit evaluation of the probe beyond the guard
    matched = F.aggregate(
        events,
        F.array().cast("array<timestamp>"),
        lambda acc, e: F.when(
            (F.size(acc) < n)
            & (e["et"] == F.try_element_at(step_arr, F.size(acc) + 1))
            & ((F.size(acc) == 0) | (e["ts"] > F.try_element_at(acc, F.lit(-1)))),
            F.concat(acc, F.array(e["ts"])),
        ).otherwise(acc),
    )
    return (
        df.filter(F.col(type_col).isin(steps))  # pre-prune non-funnel traffic
        .groupBy(F.col(user_col))
        .agg(matched.alias("__m"))
        .select(
            F.col(user_col),
            F.size("__m").alias("steps_completed"),
            F.try_element_at("__m", F.lit(1)).alias("t_first"),
            F.try_element_at("__m", F.lit(-1)).alias("t_last"),
        )
    )


def funnel_report(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """The aggregate funnel table: for step k, how many users completed at
    least k steps (monotone non-increasing by construction). One extra
    tiny aggregation over :func:`funnel_steps`' per-user output."""
    per_user = funnel_steps(df, user_col, ts_col, type_col, steps)
    counts = per_user.groupBy("steps_completed").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    # counts has <= len(steps)+1 rows: the theta-join against the step list
    # is constant-sized however large the corpus — users reaching >= k is
    # the sum of per-depth counts at depth >= k
    steps_df = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_type string"
    )
    return (
        steps_df.join(counts, steps_df.step <= counts.steps_completed, "left")
        .groupBy("step", "step_type")
        .agg(F.coalesce(F.sum("n_users"), F.lit(0)).cast("bigint").alias("n_users"))
        .orderBy("step")
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Classic cohort-retention table: users grouped by first-seen day
    (cohort), counted by day offset of each later active day —
    ``(cohort_day, offset_days, n_users)``.

    ONE fact scan: the raw events reduce to distinct (user, day) first
    (map-side-combined aggregate — the only fact-sized shuffle; a chatty
    user is deduplicated before anything else), then the cohort day is a
    per-user window MIN over that already-small activity table, and the
    final (cohort, offset) count shuffles a table bounded by
    users × active-days.  The previous formulation computed the cohort
    MIN directly on the fact and joined back — a second full fact scan +
    fact-sized shuffle that the plan test now forbids."""
    from pyspark.sql.window import Window

    day = F.to_date(F.col(ts_col))  # DATE, matching SQL date_trunc('day')
    active = df.select(F.col(user_col), day.alias("__day")).distinct()
    cohort = F.min("__day").over(Window.partitionBy(user_col))
    return (
        active.select(
            cohort.alias("cohort_day"),
            F.col("__day"),
        )
        .select(
            "cohort_day",
            F.datediff(F.col("__day"), F.col("cohort_day")).alias("offset_days"),
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def transition_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Event-transition matrix: counts of consecutive (prev_type →
    next_type) steps within each user's timeline — the Markov-chain
    summary behind journey analysis and anomaly detection.

    ONE window shuffle (lag over the user key) + one count aggregate.
    ``order_col`` breaks timestamp ties deterministically (pass the event
    id); without it, equal-ts ordering is engine-dependent."""
    from pyspark.sql.window import Window

    order = [F.col(ts_col).asc()]
    if order_col is not None:
        order.append(F.col(order_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(type_col).over(w)
    return (
        df.withColumn("__prev", prev)
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev_type"), F.col(type_col).alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def last_touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion: str = "purchase",
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event credits the
    most recent PRECEDING non-conversion event in the same user's timeline
    — ``(conversion_id, user, conv_ts, attributed_type)``, NULL when the
    conversion had no prior touch.

    ONE window shuffle on the user key: ``last(non_conv_type,
    ignorenulls)`` over rows-preceding does the lookback in a single pass
    — no per-conversion self-join (which would shuffle the fact table
    once per conversion type). Ties on timestamp break by the event id,
    same determinism discipline as the funnel/transition operators."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion, F.col(type_col)), ignorenulls=True
    ).over(w)
    return (
        df.withColumn("__touch", touch)
        .filter(F.col(type_col) == conversion)
        .select(
            F.col(id_col).alias("conversion_id"),
            F.col(user_col),
            F.col(ts_col).alias("conv_ts"),
            F.col("__touch").alias("attributed_type"),
        )
    )


def inter_event_gaps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Per-user inter-event gap statistics: ``(user, n_gaps, min_gap_s,
    median_gap_s, max_gap_s)`` — the cadence profile behind session-gap
    tuning (pick the sessionize threshold FROM this table, not folklore)
    and bot detection (implausibly uniform or zero gaps).

    One window shuffle (lag over the user key, event-id tie rule) and the
    stats aggregate rides the same partitioning — Catalyst reuses the
    exchange, so the fact table shuffles once. Single-event users emit no
    row (they have no gaps), which keeps the output honest for downstream
    percentile pooling."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gap = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    ) / 1_000_000.0
    return (
        df.withColumn("__gap", gap)
        .filter(F.col("__gap").isNotNull())
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.min("__gap"), 3).alias("min_gap_s"),
            F.round(F.expr("percentile(__gap, 0.5)"), 3).alias("median_gap_s"),
            F.round(F.max("__gap"), 3).alias("max_gap_s"),
        )
    )


def concurrency_profile(
    sessions: DataFrame,
    start_col: str,
    end_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Peak concurrent sessions per time bucket — the classic sweep line
    (+1 at start, −1 at end, running sum), made distributed: a global
    running sum would need one ordered partition, so instead each bucket
    computes its LOCAL running sum (one shuffle keyed by bucket) and the
    cross-bucket carry comes from a cumulative sum over the per-bucket
    totals — a table of |buckets| rows, so its single-partition window is
    bounded by the time range, never by the session count (the same
    window-over-aggregated dispensation as ``rate_anomalies``).

    Tie rule: an end releases BEFORE a start claims at the same instant
    (ORDER BY t, delta ASC puts −1 first), so back-to-back sessions
    [a, t] and [t, b] never double-count.  Ties among identical (t, delta)
    rows permute freely, but all carry the same delta, so the per-bucket
    MAX of the running sum is permutation-invariant — the output is
    deterministic even though per-row prefix values are not.

    Each event contributes ``greatest(run, run − delta)`` — the running
    value AND the value just before the event — so the carry-in state
    counts: a bucket whose only event is a long session's end peaks at 1
    (the session was live until that instant), not at the post-release 0.

    Returns ``(bucket_ts, peak_concurrency)`` for buckets containing at
    least one boundary event; a bucket fully inside long sessions has no
    row (compose with :func:`fill_time_gaps` for a dense profile).
    """
    step = _check_step(bucket)
    deltas = (
        sessions.select(
            F.col(start_col).alias("t"), F.lit(1).alias("delta")
        ).unionAll(
            sessions.select(F.col(end_col).alias("t"), F.lit(-1).alias("delta"))
        )
    )
    b = F.date_trunc(step, F.col("t")).alias("bucket_ts")
    wloc = (
        Window.partitionBy("bucket_ts")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = deltas.select(b, "t", "delta").withColumn(
        "run_local", F.sum("delta").over(wloc)
    )
    per_bucket = local.groupBy("bucket_ts").agg(
        F.sum("delta").alias("tot"),
        F.max(
            F.greatest(F.col("run_local"), F.col("run_local") - F.col("delta"))
        ).alias("peak_local"),
    )
    wcarry = (
        Window.orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_bucket.withColumn(
            "carry", F.coalesce(F.sum("tot").over(wcarry), F.lit(0))
        )
        .select(
            "bucket_ts",
            (F.col("carry") + F.col("peak_local"))
            .cast("bigint")
            .alias("peak_concurrency"),
        )
    )


def debounce_events(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    cooldown_s: int = 300,
) -> DataFrame:
    """Greedy cooldown dedup: keep an event only if at least
    ``cooldown_s`` seconds passed since the user's last KEPT event — the
    alerting/notification throttle.  This is NOT expressible as a lag
    window: lag compares to the previous *raw* event, so a drizzle of
    sub-cooldown events would suppress everything after the first, while
    the greedy rule re-arms once the cooldown elapses (A@0 B@4 C@8 with
    cooldown 5 keeps A and C; lag-based keeps only A).

    Shape: the kept-set is sequential state per user, but a per-user
    ``applyInPandas`` is the WRONG grain at scale — millions of tiny
    pandas groups cost more in group assembly than in scanning (measured
    ~2x at sf0.1).  Instead: ONE shuffle onto the user key, sort within
    partitions by (user, us, id), and a single ``mapInPandas`` stream
    scan whose closure carries (last_user, last_kept) across Arrow batch
    boundaries — a user's rows are contiguous within its partition, so a
    batch split mid-user is safe.  State is O(1) per partition.  Tie
    order is (exact integer microseconds, event id), matching the
    engine's sessionize conventions.  The DuckDB oracle replays the
    greedy rule as a recursive LATERAL query — the gate certifies the
    sequential semantics, not just row counts."""
    import numpy as np

    cooldown_us = int(cooldown_s) * 1_000_000

    def scan(it):
        last_user, last_kept = None, 0
        for pdf in it:
            if pdf.empty:
                continue
            uids = pdf[user_col].to_numpy()
            uss = pdf["__us"].to_numpy()
            keep = np.zeros(len(uids), dtype=bool)
            lu, lk = last_user, last_kept
            for i in range(len(uids)):
                u = uids[i]
                if u != lu:
                    lu, lk = u, uss[i]
                    keep[i] = True
                elif uss[i] >= lk + cooldown_us:
                    lk = uss[i]
                    keep[i] = True
            last_user, last_kept = lu, lk
            yield pdf[keep]

    prepped = (
        events.select(
            F.col(user_col).cast("long").alias(user_col),
            F.col(id_col).cast("long").alias(id_col),
            F.unix_micros(F.col(ts_col)).alias("__us"),
        )
        .repartition(F.col(user_col))
        .sortWithinPartitions(user_col, "__us", id_col)
    )
    return prepped.mapInPandas(
        scan, f"{user_col} long, {id_col} long, __us long"
    ).select(
        user_col, id_col, F.timestamp_micros(F.col("__us")).alias(ts_col)
    )


def seasonal_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    min_slots: int = 2,
) -> DataFrame:
    """Hour-of-week seasonal anomaly detection — the complement of
    :func:`rate_anomalies` (trailing window): each (group, hour) bucket
    scores against the mean/stddev of the SAME hour-of-week slot across
    the whole history, so a quiet Sunday 3am is not "anomalously low"
    just because Friday noon preceded it.  Returns (group, bucket,
    n_events, slot, z_score); z is NULL when the slot has fewer than
    ``min_slots`` observations or zero variance (guarded on both engines
    — bare division would be Inf/NaN, not NULL, in some).  The baseline
    includes the scored bucket itself (simple population baseline; an
    exclude-self variant subtracts the point from the moments — not
    needed for flagging gross outliers).

    Shape: one fact aggregate to (group, bucket) counts; the slot
    moments aggregate the BUCKET table (groups × 168 rows at most —
    bounded); the join back is against that bounded table. Fact
    cardinality touches only the first aggregate."""
    b = F.date_trunc("hour", F.col(ts_col))
    counts = df.groupBy(F.col(group_col), b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    slot = (
        (F.dayofweek(F.col("bucket")) - 1) * 24 + F.hour(F.col("bucket"))
    ).cast("int")
    slotted = counts.withColumn("slot", slot)
    stats = slotted.groupBy(group_col, "slot").agg(
        F.avg(F.col("n_events").cast("double")).alias("__mu"),
        F.stddev_samp(F.col("n_events").cast("double")).alias("__sd"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    joined = slotted.join(F.broadcast(stats), [group_col, "slot"])
    z = F.when(
        (F.col("__cnt") >= int(min_slots))
        & F.col("__sd").isNotNull()
        & (F.col("__sd") > 0.0),
        (F.col("n_events").cast("double") - F.col("__mu")) / F.col("__sd"),
    )
    return joined.select(
        group_col, "bucket", "n_events", "slot",
        F.round(z, 4).alias("z_score"),
    )


def decayed_topk(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    as_of: str,
    half_life_hours: float = 24.0,
    k: int = 10,
) -> DataFrame:
    """Recency-weighted top-k: each event contributes
    ``2^(-age/half_life)`` and keys rank by the decayed sum — trending
    with a principled recency bias (a burst an hour ago outranks a
    larger total from last week), computed in ONE aggregate pass.

    The decay anchors to an explicit ``as_of`` timestamp, not the wall
    clock: the score is a pure function of the data, so runs reproduce
    and backfills agree with live computation.  ``pow(2, x)`` is
    IEEE-portable and ages are exact integer microseconds; the per-key
    SUM rounds to 6dp at the edge (float addition order, the logprob
    convention).  Map-side partial aggregation means the shuffle carries
    one row per key per task; the top-k is TakeOrderedAndProject."""
    age_h = (
        F.lit(1.0)
        * (
            F.unix_micros(F.lit(as_of).cast("timestamp"))
            - F.unix_micros(F.col(ts_col))
        )
        / F.lit(3_600_000_000.0)
    )
    w = F.pow(F.lit(2.0), -age_h / F.lit(float(half_life_hours)))
    return (
        events.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(w), 6).alias("decayed_score"),
        )
        .orderBy(F.col("decayed_score").desc(), F.col(key_col).asc())
        .limit(int(k))
    )
