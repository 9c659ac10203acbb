"""Quality-classifier (operators/classify.py) semantics pins.

No SQL oracle exists (LBFGS floats), so these tests carry the semantic
load: the model must actually learn a separable signal, score map-only,
and agree with its own weak labels on clearly-separated data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgferry_spark.operators.classify import (
    score_quality,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def labeled(spark):
    good = [
        (i, "the quick brown fox jumps over the lazy dog near the river bank", 1.0)
        for i in range(30)
    ]
    bad = [
        (100 + i, "zzzz qqqq xxxx kkkk wwww vvvv jjjj zzzz qqqq xxxx", 0.0)
        for i in range(30)
    ]
    return spark.createDataFrame(
        good + bad, "doc_id long, text string, label double"
    )


def test_learns_separable_corpus(spark, labeled):
    model = train_quality_classifier(labeled, "text", "label")
    scored = {r.doc_id: r for r in score_quality(model, labeled, "text", "doc_id").collect()}
    assert all(scored[i].pred == 1 for i in range(30))
    assert all(scored[100 + i].pred == 0 for i in range(30))
    assert scored[0].prob_good > 0.9 > 0.1 > scored[100].prob_good


def test_generalizes_to_unseen_docs(spark, labeled):
    model = train_quality_classifier(labeled, "text", "label")
    unseen = spark.createDataFrame(
        [
            (1000, "a quick dog jumps near the brown river"),
            (1001, "qqqq wwww zzzz kkkk vvvv xxxx"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred for r in score_quality(model, unseen, "text", "doc_id").collect()}
    assert got == {1000: 1, 1001: 0}


def test_scoring_is_map_only(spark, labeled):
    model = train_quality_classifier(labeled, "text", "label")
    df = score_quality(model, labeled, "text", "doc_id")
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_feature_space_mismatch_is_callers_bug(spark, labeled):
    model = train_quality_classifier(labeled, "text", "label", n_features=4096)
    # scoring with a different hash width breaks the feature contract:
    # the transform must fail loudly, not silently misscore
    with pytest.raises(Exception):
        score_quality(model, labeled, "text", "doc_id", n_features=64).collect()
