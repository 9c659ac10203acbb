"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01..r14 each contain exactly 50
keys equal to dict positions 1-50).

Round-15 (VERDICT r14 Next #1 — an OPTIMIZATION round, so the window is
held ~fixed rather than rotated): 45 of the 50 r14 window names stay
put.  The only change repairs the r14 composition weakness (42/50
oracle-backed): FIVE of the eight rows-only slots are swapped for the
five heaviest oracle-backed entries the r15 optimizations touch
(cross_corpus_near_dup_capped, dedup_method_agreement, ccnet_buckets,
kmeans_exact_assign, ivf_kmeans_exact_topk), so the driver
hash-verifies the rewritten plans directly.  THREE rows-only slots
remain — exactly the MLlib-float entries riding the r15 k-means work
(ivf_pq_kmeans_topk, ann_recall_ivfpq_kmeans, ivf_kmeans_assign), so
their spark_rows signal still covers the change.  Net: 47/50
oracle-backed, 45-name overlap with the r14 window, zero registry
drops.  The five displaced entries take the positions the five
promoted entries vacated (pure swaps), so every other entry's position
is byte-identical to r14.
"""

import importlib.util
from pathlib import Path

import pytest

_ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location("spark_entry", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Window head: the r14 births (driver-checked at birth, kept in place —
# zero churn against the r14 window for these).
NEW_R14 = [
    "ngram_perplexity", "exact_substring_spans_exact", "host_pagerank",
]

# Positions 4-11: five oracle-backed entries this round's optimizations
# touch (promoted so the driver hash-verifies the rewritten plans) +
# the three remaining rows-only slots (the MLlib-float k-means family,
# which the r15 k-means work also touches — their spark_rows signal
# covers it).
R15_TOUCHED_BLOCK = [
    "cross_corpus_near_dup_capped", "dedup_method_agreement",
    "ccnet_buckets", "ivf_pq_kmeans_topk", "ann_recall_ivfpq_kmeans",
    "kmeans_exact_assign", "ivf_kmeans_exact_topk", "ivf_kmeans_assign",
]

ROWS_ONLY_WINDOW = [
    "ivf_pq_kmeans_topk", "ann_recall_ivfpq_kmeans", "ivf_kmeans_assign",
]

# Positions 12-50: unchanged from the r14 window (held fixed per
# VERDICT r14 Next #1 so PERF_r15's round-over-round comparison is
# computable: 45-name overlap, zero dropped).
HELD_FROM_R14 = [
    "embedding_near_dup", "embedding_near_dup_lsh", "embedding_dedup",
    "cosine_topk", "pairwise_cosine_topk", "ivf_assign", "ivf_topk",
    "corpus_filter", "lsh_topk", "lsh_topk_multiprobe", "multimodal_meta",
    "frame_sample", "bm25_topk", "repetition_stats",
    "contamination_check", "length_outliers", "unigram_logprob",
    "approx_distinct_users", "fill_time_gaps", "token_budget_select",
    "quantize_embeddings", "stratified_split", "rate_anomalies",
    "incremental_dedup", "vocab_topk", "winnow_shared_pairs_capped",
    "chunked_scan", "mixture_sample", "shard_manifest", "semdedup",
    "pq_encode", "dup_rate_by_source", "knn_graph", "user_funnel",
    "q1_pricing_summary", "exact_dedup_groups", "gopher_quality_flags",
    "blockword_flags", "robots_noindex_flags",
]

# Positions 51+: unchanged; first in line for the r16 rotation.
NEXT_IN_LINE = [
    "robots_txt_rules",
    "robots_disallow_filter", "robots_crawl_delays", "crawl_frontier",
    "frontier_schedule", "sitemap_locs", "warc_record_index",
    "warc_payload_extract", "extract_anchors", "anchor_domain_stats",
    "html_extract", "line_quality_filter", "c4_clean_documents",
    "line_dedup", "web_curation_funnel", "funnel_report",
    "chunk_documents", "temperature_sample", "retention_cohorts",
    "transition_counts", "weighted_sample",
]


# Rows-only by design: xxhash64 fast paths carry no SQL oracle (their md5
# twins do), and KMeans/LBFGS floats are iteration-order dependent.
ROWS_ONLY = {
    "simhash_near_pairs",
    "ivf_kmeans_assign",
    # capped xxhash64 production posture: rows-only like its uncapped
    # sibling; lsh_candidate_pairs_md5_capped carries the oracle
    "lsh_candidate_pairs_capped",
    # LBFGS coefficients are iteration-order sensitive; pinned by
    # test_classify's separability/agreement checks
    "quality_classifier",
    # no SQL deflate exists; semantics pinned by test_ranking_filters'
    # repetitive<<prose<random ordering checks
    "compression_ratio",
    # MLlib KMeans centroid floats are iteration-order sensitive; pinned by
    # the ann_recall_ivfpq_kmeans scorecard + test_ivfpq configuration tests
    "ivf_pq_kmeans_topk", "ann_recall_ivfpq_kmeans",
    # LBFGS prob AUC inherits the float-boundness; quality_twin_auc is the
    # oracle-green deterministic yardstick it is compared against
    "quality_classifier_auc",
}

N_QUERIES = 297


def test_window_layout(entry_mod):
    names = list(entry_mod.queries().keys())
    assert names[:3] == NEW_R14
    assert names[3:11] == R15_TOUCHED_BLOCK
    assert names[11:50] == HELD_FROM_R14
    assert names[50:71] == NEXT_IN_LINE


def test_window_exactly_filled(entry_mod):
    # 3 + 8 + 39 == 50: no slot wasted
    first50 = set(list(entry_mod.queries().keys())[:50])
    assert first50 == set(NEW_R14) | set(R15_TOUCHED_BLOCK) | set(
        HELD_FROM_R14
    )


def test_window_composition_rule(entry_mod):
    """VERDICT r14 Next #1: >=45 oracle-backed slots, never more than 3
    rows-only slots, and >=45 names shared with the r14 window so the
    round-over-round comparison is computable."""
    first50 = list(entry_mod.queries().keys())[:50]
    oracles = set(entry_mod.oracle_sql())
    no_oracle_in_window = [n for n in first50 if n not in oracles]
    assert no_oracle_in_window == ROWS_ONLY_WINDOW
    assert len(no_oracle_in_window) <= 3
    assert sum(1 for n in first50 if n in oracles) >= 45
    # the r14 window (CORRECTNESS_r14.json keys): 45-name overlap
    import json

    r14_window = set(
        json.load(open(Path(__file__).resolve().parent.parent
                       / "CORRECTNESS_r14.json"))
    )
    assert len(set(first50) & r14_window) >= 45


def test_no_entries_lost_in_reorder(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) == N_QUERIES
    assert len(set(qs)) == N_QUERIES


def test_oracle_coverage_unchanged(entry_mod):
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs
    assert qs - oracles == ROWS_ONLY


def test_rotation_planner_agrees(entry_mod):
    """tools/plan_rotation.py (hash_match is True semantics) must agree
    that the window contains every never-checked oracle-backed entry."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/plan_rotation.py", "50"],
        capture_output=True, text=True,
        cwd=str(_ENTRY.parent),
    ).stdout
    assert "WARNING" not in out
