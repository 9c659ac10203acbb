"""Model-based corpus curation: a fastText-style quality classifier.

The staple of web-scale pretraining pipelines: label a small
seed set (here: weak labels from the heuristic quality score — in
production, "looks like Wikipedia/books" vs "random crawl"), train a
linear classifier over hashed bag-of-tokens features, and score the whole
corpus with the model.  The classifier generalizes past the heuristic's
exact thresholds, and its probability becomes a ranking signal for
token-budget selection.

Scale shape: features are HashingTF over the engine's own tokenizer
output — vocabulary-free, O(n_features) memory per row, no fitted
dictionary to broadcast.  Training runs on a (sampled) labeled frame;
LBFGS iterations are MLlib's distributed aggregate loop (each iteration
one treeAggregate pass over the training set — sample-sized, not
corpus-sized).  SCORING is the part that must scale: a fitted
LogisticRegressionModel transform is a map-only expression against the
broadcast coefficient vector, so the corpus pays one scan, zero
shuffles.  Like the MLlib KMeans IVF variant, the learned floats are
iteration-order sensitive, so the driver row is rows-only (no SQL
oracle); the heuristic-vs-model agreement test pins the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgferry_spark.functions.text import tokens


def _featurize(df: DataFrame, text_col: str, n_features: int):
    from pyspark.ml.feature import HashingTF

    toks = df.withColumn("__toks", tokens(F.lower(F.col(text_col))))
    tf = HashingTF(
        inputCol="__toks", outputCol="__features", numFeatures=int(n_features)
    )
    return tf.transform(toks).drop("__toks")


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    n_features: int = 4096,
    max_iter: int = 20,
    reg_param: float = 0.01,
):
    """Fit the hashed-BoW logistic classifier; returns the fitted
    LogisticRegressionModel (coefficients = n_features floats, broadcast-
    sized by construction).  At 100 TB the labeled frame is a sample —
    training cost is sample-bound, never corpus-bound."""
    from pyspark.ml.classification import LogisticRegression

    feat = _featurize(labeled, text_col, n_features)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=int(max_iter),
        regParam=float(reg_param),
        standardization=False,
    )
    return lr.fit(feat)


def score_quality(
    model,
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_features: int = 4096,
) -> DataFrame:
    """Score the corpus: ``(id, prob_good, pred)``.  Map-only — tokenize,
    hash, dot the broadcast coefficients; one scan, zero shuffle,
    whatever the corpus size.  ``n_features`` must match training (the
    hash space IS the feature contract)."""
    from pyspark.ml.functions import vector_to_array

    feat = _featurize(df, text_col, n_features)
    scored = model.transform(feat)
    return scored.select(
        F.col(id_col),
        F.round(
            vector_to_array(F.col(model.getProbabilityCol())).getItem(1), 6
        ).alias("prob_good"),
        F.col(model.getPredictionCol()).cast("int").alias("pred"),
    )
