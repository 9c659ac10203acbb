"""Physical-plan advisor rules (plans/advisor.py) — pure arithmetic, the
driver-side complement of profile_table/skew_profile."""

import pytest

from pgferry_spark.plans.advisor import (
    DEFAULT_BROADCAST_THRESHOLD,
    advise_join,
    advise_shuffle_partitions,
)


class TestShufflePartitions:
    def test_scales_with_volume(self):
        small = advise_shuffle_partitions(1_000_000, 100, parallelism=32)
        big = advise_shuffle_partitions(10_000_000_000, 100, parallelism=32)
        assert small.shuffle_partitions == 32  # floor at parallelism
        # 1 TB at 128 MiB -> ~7451, snapped to a multiple of 32
        assert big.shuffle_partitions % 32 == 0
        assert 7400 <= big.shuffle_partitions <= 7500

    def test_snaps_to_full_waves(self):
        a = advise_shuffle_partitions(50_000_000, 100, parallelism=32)
        assert a.shuffle_partitions % 32 == 0

    def test_clamps(self):
        a = advise_shuffle_partitions(10**13, 1000, parallelism=32,
                                      max_partitions=1000)
        assert a.shuffle_partitions == 1000
        assert "clamped" in a.reason

    def test_rejects_negatives(self):
        with pytest.raises(ValueError):
            advise_shuffle_partitions(-1, 10)


class TestJoinAdvice:
    def test_small_side_broadcasts(self):
        a = advise_join(10**9, 200, 10_000, 100)
        assert a.strategy == "broadcast" and a.build_side == "right"
        b = advise_join(10_000, 100, 10**9, 200)
        assert b.strategy == "broadcast" and b.build_side == "left"

    def test_balanced_big_sides_shuffle(self):
        a = advise_join(10**9, 200, 10**9, 200, top_key_share=0.001)
        assert a.strategy == "shuffle_hash" and a.salt_factor == 1

    def test_skewed_key_salts(self):
        a = advise_join(10**9, 200, 10**9, 200, top_key_share=0.25,
                        parallelism=32)
        assert a.strategy == "salted_shuffle"
        assert a.salt_factor == 8  # 0.25 * 32
        # heavier skew -> more salts, capped at parallelism
        b = advise_join(10**9, 200, 10**9, 200, top_key_share=0.9,
                        parallelism=32)
        assert b.salt_factor == 29 or b.salt_factor == round(0.9 * 32)

    def test_threshold_is_sparks_default(self):
        assert DEFAULT_BROADCAST_THRESHOLD == 10 * 1024 * 1024


def test_cms_join_size_feeds_partition_advice(spark):
    """measure→advise with the sketch in the measure seat: the CMS
    join-size estimate drives advise_shuffle_partitions for the join's
    OUTPUT stage, and with a wide-enough sketch the advice is identical
    to what the exact join size would give — without running the join."""
    from pyspark.sql import functions as F

    from pgferry_spark.operators.sketches import cms_join_size, cms_sketch
    from pgferry_spark.plans.advisor import advise_shuffle_partitions

    a = spark.range(5000).select((F.col("id") % 700).alias("k"))
    b = spark.range(2000).select((F.col("id") % 700).alias("k"))
    est = cms_join_size(
        cms_sketch(a, "k", depth=4, width=16384),
        cms_sketch(b, "k", depth=4, width=16384),
    ).collect()[0].est_join_size
    exact = a.join(b, "k").count()
    # guaranteed: never under; wide sketch keeps collision mass tiny
    assert exact <= est <= exact * 1.05

    from_est = advise_shuffle_partitions(
        est, avg_row_bytes=64_000, parallelism=32
    )
    from_exact = advise_shuffle_partitions(
        exact, avg_row_bytes=64_000, parallelism=32
    )
    # the overestimate can only push the advice UP, and by at most one
    # parallelism wave at the sketch's error level — never under-partitions
    assert from_est.shuffle_partitions >= from_exact.shuffle_partitions
    assert from_est.shuffle_partitions - from_exact.shuffle_partitions <= 32
