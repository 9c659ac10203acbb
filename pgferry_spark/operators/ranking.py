"""BM25 relevance ranking over the document corpus.

Full-text relevance the way a training-data curation pipeline ranks
retrieval candidates: Okapi BM25 with the Lucene idf variant,
``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``, expressed entirely as
DataFrame operations so the scoring runs JVM-side.

Scale shape (the part that matters at 100 TB):

- The corpus text is tokenized exactly ONCE. Because the query's term
  list is tiny, per-term term frequencies are computed as ``size(filter(
  toks, = term))`` columns in the same map-only projection that computes
  the document length — one scan emits a narrow (doc, dl, tf_0..tf_q)
  table, ~(2+|q|) integers per document. An exploded postings shuffle
  (the naive inverted-index formulation) would tokenize the corpus once
  per derived statistic and shuffle every matched posting; this shape
  shuffles nothing but two scalar aggregates.
- The narrow table is persisted (MEMORY_AND_DISK, spillable — integers,
  not text), so corpus statistics (N, avgdl), per-term document
  frequencies, and the scoring pass all read it instead of re-scanning
  text. Caller owns the lifecycle via ``spark.catalog.clearCache()``.
- N/avgdl/df_t together are TWO 1-row aggregates, attached with
  broadcast cross joins — no driver collect.
- The final top-k is an ordered take (TakeOrderedAndProject), not a
  full sort.

Scores are rounded to 6 decimals BEFORE the rank cut on both engines, so
an idf computed by Java's ``Math.log`` vs C's ``log`` (which may differ in
the last ulp) can never flip the top-k boundary; ties break on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from pgferry_spark.functions.text import tokens
from pgferry_spark.utils import fan_out


def _term_freq(toks, term: str):
    # NB: single-arg lambda on purpose — F.filter treats a 2-arg callable
    # as (element, index), so capturing `term` via a default arg would
    # silently compare against the position instead of the word.
    return F.size(F.filter(toks, lambda y: y == F.lit(term)))


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag-of-words query.

    Returns (id_col, n_terms, score) — ``n_terms`` is how many distinct
    query terms the document matched (disjunctive retrieval: any match
    scores; the conjunctive variant is ``text.keyword_search_all``).
    """
    # dedupe (order-preserving): the oracle's `token IN (...)` has set
    # semantics — a repeated query term must not double-count score/n_terms
    q = list(dict.fromkeys(t.lower() for t in terms))
    if not q:
        raise ValueError("bm25_topk requires at least one query term")
    toks = tokens(F.lower(F.col(text_col)))
    # fan_out: the |q| size(filter(...)) counters are per-row-expensive;
    # an under-partitioned input (single parquet file) would pin the
    # whole tokenizing pass to one core
    per_doc = fan_out(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.size(toks).alias("dl"),
        *[_term_freq(toks, t).alias(f"tf_{i}") for i, t in enumerate(q)],
    ).persist(StorageLevel.MEMORY_AND_DISK)

    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    dfreq = per_doc.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(q))
        ]
    )

    def term_score(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        # tf = 0 contributes exactly 0.0, so the unconditional sum equals
        # the matched-terms-only sum bit-for-bit
        return idf * (tf * (k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )

    score = term_score(0)
    n_terms = (F.col("tf_0") > 0).cast("long")
    for i in range(1, len(q)):
        score = score + term_score(i)
        n_terms = n_terms + (F.col(f"tf_{i}") > 0).cast("long")

    return (
        per_doc.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfreq))
        .select(
            F.col("doc"),
            n_terms.alias("n_terms"),
            F.round(score, 6).alias("score"),
        )
        .filter(F.col("n_terms") > 0)
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(k)
        .select(F.col("doc").alias(id_col), "n_terms", "score")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str,
    score_col: str = "score",
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (Cormack &
    Clarke 2009): ``rrf = Σ_lists 1/(k0 + rank)``, where ``rank`` is the
    1-based position within each list (score desc, id asc tie-break) and
    a list that missed the document contributes 0. The standard way a
    retrieval pipeline combines lexical (BM25) and semantic (embedding)
    candidates without score calibration — ranks, not raw scores, fuse.

    Each input must already be a bounded candidate list (a top-N), so at
    100 TB the inputs are tiny regardless of corpus size: fusion unions
    N·|lists| rows, ranks each list independently in one narrow window
    pass (partition key = list index, so no skew — each partition is one
    top-N), and aggregates per id. The expensive part of hybrid search
    is producing the candidate lists (bm25_topk / cosine_topk /
    ivf_pq_topk — each with its own scale story); fusion itself is
    metadata-sized by construction.

    Returns ``(id_col, n_lists, rrf_score)`` — ``n_lists`` = how many
    input lists retrieved the document. ``rrf_score`` is rounded to 6
    decimals before the final top-k cut so engine ulp differences can
    never flip the boundary; ties break on id.
    """
    if not ranked:
        raise ValueError("rrf_fuse requires at least one ranked list")
    tagged = None
    for i, df in enumerate(ranked):
        part = df.select(
            F.col(id_col).alias("__id"),
            F.col(score_col).cast("double").alias("__s"),
            F.lit(i).alias("__list"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    from pyspark.sql.window import Window

    w = Window.partitionBy("__list").orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    return (
        tagged.withColumn("__rank", F.row_number().over(w))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col("__rank"))), 6
            ).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col("__id").asc())
        .limit(k)
        .select(F.col("__id").alias(id_col), "n_lists", "rrf_score")
    )


def tfidf_similarity_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.3,
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs document similarity (APSS) by TF-IDF cosine: pairs of
    documents whose weighted-token vectors' cosine reaches ``threshold``
    — ``(id_a, id_b, cosine_sim)``. The similarity-join behind related-
    document linking and soft-dedup audits, complementary to MinHash
    (set overlap) and embeddings (semantic): this one is term-weighted
    lexical overlap.

    Shape: the sparse dot product decomposes over shared tokens, so the
    pair generation is a token-blocked self-join of the (doc, token,
    weight) postings — linear in collisions (sum over tokens of df²),
    never corpus-quadratic — with per-doc norms riding the posting rows
    (no norms-table join-back). ``max_df`` prunes high-df tokens BEFORE
    the join; for TF-IDF the cap is principled, not just pragmatic:
    ln(N/df) → 0 as df → N, so the tokens that explode the join are
    precisely the ones contributing nothing to the score.

    One tokenize scan → tf aggregate; df/idf from a second aggregate over
    the (already narrow) tf table; the join and pair aggregation shuffle
    postings, not documents."""
    toks = tokens(F.lower(F.col(text_col)))
    tf = (
        fan_out(df, id_col)
        .select(F.col(id_col).alias("id"), F.explode_outer(toks).alias("token"))
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    ).persist()
    n_docs = df.select(F.count(F.lit(1)).alias("n")).withColumnRenamed("n", "__n")
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    weighted = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id", "token",
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("w"),
        )
    )
    norms = weighted.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    # persisted: the pair generation reads posts TWICE (both self-join
    # sides); without the cache the idf join + norms aggregate execute once
    # per side (the plan literally contains the postings subtree twice)
    posts = (
        weighted.join(norms, "id")
        .filter(F.col("norm") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = posts.select(
        F.col("id").alias("id_a"), "token",
        F.col("w").alias("wa"), F.col("norm").alias("na"),
    )
    b = posts.select(
        F.col("id").alias("id_b"), "token",
        F.col("w").alias("wb"), F.col("norm").alias("nb"),
    )
    pairs = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    sim = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4)
    return (
        pairs.withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
