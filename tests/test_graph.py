"""propagate_scores (operators/graph.py) semantics pins on a hand graph."""

from __future__ import annotations

import pytest

from pgferry_spark.operators.graph import propagate_scores


@pytest.fixture(scope="module")
def toy(spark):
    # 1 (trusted, seed 1.0) <- 2's only neighbor; 3 isolated; 4's neighbors
    # carry a negative-weight edge that must be ignored
    edges = spark.createDataFrame(
        [
            (2, 1, 1.0),
            (4, 1, 0.5),
            (4, 2, -0.8),
        ],
        "src long, dst long, cosine_sim double",
    )
    seeds = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, 0.25), (4, 0.0)], "vec_id long, score double"
    )
    return edges, seeds


def test_one_round_hand_computed(spark, toy):
    edges, seeds = toy
    got = {
        r.vec_id: r.score
        for r in propagate_scores(edges, seeds, alpha=0.5, iters=1).collect()
    }
    # node 1: no out-edges -> keeps seed 1.0
    # node 2: 0.5*0 + 0.5*(1.0*1.0/1.0) = 0.5
    # node 3: isolated -> keeps seed 0.25
    # node 4: negative edge to 2 dropped -> 0.5*0 + 0.5*(0.5*1.0/0.5) = 0.5
    assert got == {1: 1.0, 2: 0.5, 3: 0.25, 4: 0.5}


def test_second_round_restarts_from_seed(spark, toy):
    edges, seeds = toy
    got = {
        r.vec_id: r.score
        for r in propagate_scores(edges, seeds, alpha=0.5, iters=2).collect()
    }
    # round 2 re-blends the ORIGINAL seed (0.0 for nodes 2 and 4) with the
    # round-1 neighbor scores: node 2 -> 0.5*0 + 0.5*1.0 = 0.5 (neighbor 1
    # kept 1.0); node 4 -> same. Trusted node 1 stays pinned at 1.0.
    assert got == {1: 1.0, 2: 0.5, 3: 0.25, 4: 0.5}


def test_alpha_zero_is_identity(spark, toy):
    edges, seeds = toy
    got = {
        r.vec_id: r.score
        for r in propagate_scores(edges, seeds, alpha=0.0, iters=3).collect()
    }
    assert got == {1: 1.0, 2: 0.0, 3: 0.25, 4: 0.0}


def test_weighted_mean_not_sum(spark):
    # two neighbors with different weights: result is the weighted MEAN
    # (sum would exceed the seed range)
    edges = spark.createDataFrame(
        [(10, 1, 3.0), (10, 2, 1.0)], "src long, dst long, cosine_sim double"
    )
    seeds = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (10, 0.0)], "vec_id long, score double"
    )
    got = {
        r.vec_id: r.score
        for r in propagate_scores(edges, seeds, alpha=1.0, iters=1).collect()
    }
    assert got[10] == 0.75  # (3*1 + 1*0) / 4


def test_name_match_verified_prunes_anagram_noise(spark):
    """Gram-set similarity can't separate shared-gram-but-distant names;
    the Levenshtein verify must."""
    from pgferry_spark.operators.dedup import (
        name_match_pairs, name_match_pairs_verified,
    )

    df = spark.createDataFrame(
        [
            (1, "widget alpha"),
            (2, "widget alphb"),   # 1 edit from id 1 -> kept
            (3, "alpha widget"),   # same gram set, many edits -> pruned
        ],
        "nid long, name string",
    )
    blocked = {(r.id_a, r.id_b) for r in name_match_pairs(df, "name", "nid", threshold=0.3).collect()}
    verified = {(r.id_a, r.id_b) for r in
                name_match_pairs_verified(df, "name", "nid", threshold=0.3, max_edit=3).collect()}
    assert (1, 3) in blocked      # blocking alone admits the transposition
    assert (1, 2) in verified
    assert (1, 3) not in verified # the verify stage prunes it
    row = [r for r in name_match_pairs_verified(df, "name", "nid", threshold=0.3, max_edit=3).collect()
           if (r.id_a, r.id_b) == (1, 2)][0]
    assert row.edit_dist == 1
