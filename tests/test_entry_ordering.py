"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01/r02 each contain exactly 50 keys
equal to dict positions 1-50).  Round 3 front-loads the 47 entries that have
no current driver correctness row; this test keeps that window arithmetic
from silently regressing when entries are added or reordered.
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


# The family with no driver-verified row as of CORRECTNESS_r02 (positions
# 51-97 in the round-2 ordering) plus the 13 entries whose implementation
# changed materially in round 2.  These MUST sit inside the driver's 50-row
# window this round.
NEEDS_DRIVER_ROW = [
    "winnow_shared_pairs", "pii_scrub", "dataset_split", "quota_sample",
    "pack_sequences", "range_join_incidents", "time_rollup", "cdc_merge",
    "scd2_history", "dedup_clusters", "inverted_index", "keyword_search",
    "fingerprint_dedup", "exact_dedup_groups", "minhash_buckets",
    "lsh_candidate_pairs", "minhash_buckets_md5", "lsh_candidate_pairs_md5",
    "jaccard_adjacent", "simhash_near_pairs", "simhash32",
    "simhash_near_pairs_md5", "embedding_near_dup", "embedding_near_dup_lsh",
    "embedding_dedup", "cosine_topk", "pairwise_cosine_topk", "ivf_assign",
    "ivf_topk", "corpus_filter", "lsh_topk", "lsh_topk_multiprobe",
    "ivf_kmeans_assign", "multimodal_meta", "frame_sample", "bm25_topk",
    "repetition_stats", "contamination_check", "length_outliers",
    "unigram_logprob", "approx_distinct_users", "fill_time_gaps",
    "token_budget_select", "quantize_embeddings", "stratified_split",
    "rate_anomalies", "incremental_dedup",
    # round-3 additions — never driver-checked either, so they take two of
    # the original three canary slots (the r2 advisor flagged appending new
    # entries past position 50 as a verification hole)
    "vocab_topk", "winnow_shared_pairs_capped",
]

CANARIES = ["chunked_scan"]

# Rows-only by design: xxhash64 fast paths carry no SQL oracle (their md5
# twins do), and KMeans centroids are iteration-order dependent.
ROWS_ONLY = {
    "minhash_buckets", "lsh_candidate_pairs", "simhash_near_pairs",
    "ivf_kmeans_assign",
    # iterative greedy BPE learning is not SQL-expressible; pinned instead
    # by test_vocab's independent-reference equivalence
    "bpe_merges", "bpe_encode",
    # LBFGS coefficients are iteration-order sensitive; pinned by
    # test_classify's separability/agreement checks
    "quality_classifier",
    # no SQL deflate exists; semantics pinned by test_ranking_filters'
    # repetitive<<prose<random ordering checks
    "compression_ratio",
}


def test_unverified_family_inside_driver_window(entry_mod):
    first50 = list(entry_mod.queries().keys())[:50]
    missing = [q for q in NEEDS_DRIVER_ROW if q not in first50]
    assert not missing, f"outside the driver's 50-row window: {missing}"


def test_canaries_inside_window(entry_mod):
    first50 = list(entry_mod.queries().keys())[:50]
    assert all(c in first50 for c in CANARIES)


def test_window_exactly_filled(entry_mod):
    # 49 + 1 == 50: no slot wasted, nothing needing a row pushed out.
    first50 = set(list(entry_mod.queries().keys())[:50])
    assert first50 == set(NEEDS_DRIVER_ROW) | set(CANARIES)


def test_no_entries_lost_in_reorder(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) == 157
    assert len(set(qs)) == 157


def test_late_round3_additions_sit_just_past_window(entry_mod):
    # Added after the 50-row window filled; first in line for the round-4
    # rotation, and positioned to be picked up by any wider driver window.
    names = list(entry_mod.queries().keys())
    assert names[50:81] == [
        "span_dedup", "mixture_sample", "shard_manifest", "semdedup",
        "pq_encode", "dup_rate_by_source", "knn_graph", "bpe_merges",
        "bpe_encode", "user_funnel", "funnel_report", "chunk_documents",
        "temperature_sample", "retention_cohorts", "transition_counts",
        "weighted_sample", "json_key_profile", "audio_segments",
        "name_match_pairs", "q16_adapted", "q20_adapted",
        "q2_adapted", "q11_adapted", "q21_adapted",
        "corpus_report", "token_histogram", "curate_corpus",
        "tfidf_pairs", "approx_quantile_flags", "last_touch_attribution",
        "inter_event_gaps",
    ]


def test_oracle_coverage_unchanged(entry_mod):
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs
    assert qs - oracles == ROWS_ONLY
