"""Graph propagation operators over neighbor tables.

Complements the connected-components machinery in ``operators/dedup.py``
(min-label propagation, large-star/small-star) with *weighted score*
propagation over a kNN/near-dup graph — the graph-based curation step:
seed a trust/quality signal on a small labeled subset and diffuse it to
lookalike neighbors, so curation decisions extend beyond the labeled set
without training a model.

Scale shape: one bounded loop of ``iters`` rounds, each round ONE
edge⋈score join (keyed by the neighbor id) plus ONE per-node aggregate
(keyed by the node id) — the edge table is N·k rows (kNN-bounded), never
corpus-quadratic, and no round depends on driver-side data.  The round
count is a fixed parameter (diffusion radius), not a convergence loop, so
the plan is a static composition AQE can see end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_scores(
    edges: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "cosine_sim",
    score_col: str = "score",
    alpha: float = 0.5,
    iters: int = 2,
) -> DataFrame:
    """Personalized score propagation: for each node ``v`` with out-edges
    to its neighbors, ``s_{t+1}(v) = (1−α)·seed(v) + α·Σ w(v,u)·s_t(u) /
    Σ w(v,u)``, rounded to 6dp per round; nodes with no (positive-weight)
    neighbors keep their seed.  The restart term always reads the ORIGINAL
    seed (personalized PageRank-style), so trusted seeds never wash out.

    Only positive-weight edges contribute — a weighted mean over negative
    cosine weights is meaningless and would let the weight sum hit zero
    (NULL/NaN divergence across engines).  ``alpha`` defaults to 0.5 (an
    exact binary double, same oracle-parity rationale as the bigram LM's
    λ).  Per-round 6dp rounding keeps the k-term float sums
    engine-portable without masking real signal.
    """
    pos = edges.filter(F.col(weight_col) > 0).select(
        F.col(src_col), F.col(dst_col), F.col(weight_col)
    )
    seeds = seeds.select(F.col(id_col), F.col(score_col).alias("__seed"))
    cur = seeds.select(F.col(id_col), F.col("__seed").alias(score_col))
    a = float(alpha)
    for _ in range(int(iters)):
        contrib = (
            pos.join(
                cur.select(
                    F.col(id_col).alias(dst_col), F.col(score_col).alias("__s")
                ),
                dst_col,
            )
            .groupBy(src_col)
            .agg(
                (
                    F.sum(F.col(weight_col) * F.col("__s"))
                    / F.sum(F.col(weight_col))
                ).alias("__nbr")
            )
        )
        cur = (
            seeds.join(
                contrib.select(F.col(src_col).alias(id_col), "__nbr"),
                id_col,
                "left",
            )
            .select(
                F.col(id_col),
                F.round(
                    F.when(F.col("__nbr").isNull(), F.col("__seed")).otherwise(
                        F.lit(1.0 - a) * F.col("__seed")
                        + F.lit(a) * F.col("__nbr")
                    ),
                    6,
                ).alias(score_col),
            )
        )
    return cur
