"""Driver-side physical-plan advisor: turn the measured diagnostics
(:func:`~pgferry_spark.operators.checks.profile_table`,
:func:`~pgferry_spark.operators.skew.skew_profile`) into concrete knob
recommendations BEFORE an expensive job runs — the "measure, don't
guess" loop closed into advice.

Pure functions over plain numbers (no Spark session needed): they run in
a planning notebook, a CI gate, or the pipeline driver, and their rules
are the same arithmetic a human tuning session applies:

* shuffle partition count from data volume ÷ target partition size,
  snapped within sane bounds and to a multiple of the parallelism so no
  scheduling wave runs ragged;
* join strategy from the smaller side's estimated bytes vs the broadcast
  threshold, with skew salting recommended when the heaviest key's share
  makes one reducer a straggler.

These are ADVISORY defaults for static plans; AQE still re-plans at
runtime (and should stay on) — the advisor's job is to keep the initial
plan inside the envelope AQE can fix, e.g. not 200 partitions for 10 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

# Spark's own default broadcast threshold (spark.sql.autoBroadcastJoinThreshold)
DEFAULT_BROADCAST_THRESHOLD = 10 * 1024 * 1024
# 128 MiB shuffle partitions: big enough to amortize task overhead, small
# enough to fit comfortably in executor memory with room for hash tables
DEFAULT_TARGET_PARTITION_BYTES = 128 * 1024 * 1024


@dataclass(frozen=True)
class PartitionAdvice:
    shuffle_partitions: int
    est_bytes: int
    partition_bytes: int
    reason: str


@dataclass(frozen=True)
class JoinAdvice:
    strategy: str  # broadcast | shuffle_hash | salted_shuffle
    build_side: str | None  # left | right | None
    salt_factor: int  # 1 = no salting
    reason: str


def advise_shuffle_partitions(
    n_rows: int,
    avg_row_bytes: float,
    parallelism: int = 32,
    target_partition_bytes: int = DEFAULT_TARGET_PARTITION_BYTES,
    max_partitions: int = 200_000,
) -> PartitionAdvice:
    """Partition count from volume ÷ target size, rounded UP to a multiple
    of the parallelism (full final waves; a 33-partition job on 32 cores
    runs one straggler wave) and clamped to [parallelism, max]."""
    if n_rows < 0 or avg_row_bytes < 0:
        raise ValueError("negative inputs")
    est = int(n_rows * avg_row_bytes)
    raw = max(1, -(-est // target_partition_bytes))  # ceil div
    snapped = max(parallelism, -(-raw // parallelism) * parallelism)
    n = min(snapped, max_partitions)
    reason = (
        f"~{est / 1e9:.2f} GB at {target_partition_bytes >> 20} MiB/partition"
        f" -> {raw}, snapped to a multiple of parallelism {parallelism}"
    )
    if n == max_partitions:
        reason += f", clamped to {max_partitions}"
    return PartitionAdvice(n, est, target_partition_bytes, reason)


def advise_join(
    left_rows: int,
    left_row_bytes: float,
    right_rows: int,
    right_row_bytes: float,
    top_key_share: float = 0.0,
    parallelism: int = 32,
    broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
) -> JoinAdvice:
    """Join strategy from side sizes + measured key skew.

    * a side under the broadcast threshold -> broadcast it (no shuffle of
      the big side at all — the single biggest join lever);
    * otherwise shuffle join; if the heaviest key holds more than
      ``1 / parallelism`` of the rows (one reducer becomes the job's
      critical path), recommend salting with a factor that spreads that
      key across roughly the idle cores.

    ``top_key_share`` comes straight from ``skew_profile``'s top row."""
    lb, rb = int(left_rows * left_row_bytes), int(right_rows * right_row_bytes)
    if min(lb, rb) <= broadcast_threshold:
        side = "left" if lb <= rb else "right"
        return JoinAdvice(
            "broadcast", side, 1,
            f"{side} side ~{min(lb, rb) >> 20} MiB <= broadcast threshold "
            f"{broadcast_threshold >> 20} MiB",
        )
    if top_key_share > 1.0 / parallelism:
        # spread the hot key over enough salts that its share per reducer
        # drops to ~the average key's share
        factor = min(parallelism, max(2, round(top_key_share * parallelism)))
        return JoinAdvice(
            "salted_shuffle", None, factor,
            f"heaviest key holds {top_key_share:.1%} of rows"
            f" (> 1/{parallelism} straggler bound) -> salt x{factor}",
        )
    return JoinAdvice(
        "shuffle_hash", None, 1,
        "both sides exceed the broadcast threshold; keys are balanced",
    )
