"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01..r12 each contain exactly 50
keys equal to dict positions 1-50).  Round-13 rotation (VERDICT r12
Next #7): the window head is this round's 3 births (WHATWG charset
sniffing, the end-to-end index-routed retrieval, the sniff-disagreement
audit — driver-checked at birth), then the 47 STALEST oracle-backed
entries in tools/plan_rotation.py order — the r7-green multimodal/
curation/winnowing block followed by the leading r8-green block.
No oracle-backed entry goes >6 rounds without a driver-green record
under this rotation.
The 10 rows-only entries are PERMANENTLY excluded from the window — a
slot spent on a ``no_oracle`` row can never produce a green driver row
(round 7 burned 4 slots that way); their md5/exact twins carry the hash
signal.  This test keeps the window arithmetic from silently regressing
when entries are added or reordered.
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


# Window head: round-13 births, driver-checked at birth.
NEW_R13 = [
    "http_charset_sniff", "index_routed_retrieval",
    "charset_sniff_disagreements", "cdx_closest_capture",
    "recrawl_change_rate", "sitemap_lastmod_entries",
    "sitemap_changed_since", "crawl_budget_allocate",
]

# Remaining window: the stalest oracle-backed entries, planner-stable
# order (the r7-green multimodal/curation/winnowing block, then the
# leading r8-green block).
ROTATED_STALEST = [
    "video_frame_index", "audio_segment_index", "hybrid_rrf_topk",
    "dedup_keep_best", "mmr_diversify", "pii_luhn_cards", "pii_card_gate",
    "mmr_diversify_ivf", "curate_corpus_best", "kmeans_exact_assign",
    "ivf_kmeans_exact_topk", "compressibility_entropy",
    "dedup_method_agreement", "packing_efficiency", "lang_id",
    "bpe_token_count", "winnow_summary", "winnow_shared_pairs",
    "pii_scrub", "dataset_split", "quota_sample", "pack_sequences",
    "range_join_incidents", "time_rollup", "cdc_merge", "scd2_history",
    "dedup_clusters", "inverted_index", "keyword_search",
    "fingerprint_dedup", "minhash_buckets_md5", "lsh_candidate_pairs_md5",
    "jaccard_adjacent", "script_profile", "url_keyword_filter",
    "extract_links", "link_graph_stats", "domain_token_budget",
    "crawl_snapshot_merge", "crawl_delta_counts", "simhash32",
    "simhash_near_pairs_md5",
]

# Positions 51+: next-stalest, first in line for the r14 rotation.
NEXT_IN_LINE = [
    "embedding_near_dup", "embedding_near_dup_lsh", "embedding_dedup",
    "cosine_topk", "pairwise_cosine_topk", "ivf_assign", "ivf_topk", "corpus_filter", "lsh_topk",
    "lsh_topk_multiprobe", "multimodal_meta", "frame_sample", "bm25_topk",
    "repetition_stats", "contamination_check", "length_outliers",
    "unigram_logprob", "approx_distinct_users", "fill_time_gaps",
    "token_budget_select", "quantize_embeddings", "stratified_split",
    "rate_anomalies", "incremental_dedup",
]


# Rows-only by design: xxhash64 fast paths carry no SQL oracle (their md5
# twins do), and KMeans/LBFGS floats are iteration-order dependent.
# Since round 8: PERMANENTLY post-window. r14 (VERDICT r13 Next #3): the
# superseded uncapped xxhash64 spellings minhash_buckets and
# lsh_candidate_pairs are RETIRED from the registry — their md5 twins are
# oracle-green and lsh_candidate_pairs_capped keeps the intrinsic-hash
# production posture driver-visible; the xxhash64 library path stays
# pytest-pinned (test_plan_shapes fast-path plan, test_dedup hash-family
# agreement).
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

N_QUERIES = 296


def test_window_layout(entry_mod):
    names = list(entry_mod.queries().keys())
    assert names[:8] == NEW_R13
    assert names[8:50] == ROTATED_STALEST
    assert names[50:74] == NEXT_IN_LINE


def test_window_exactly_filled(entry_mod):
    # 8 + 42 == 50: no slot wasted
    first50 = set(list(entry_mod.queries().keys())[:50])
    assert first50 == set(NEW_R13) | set(ROTATED_STALEST)


def test_rows_only_permanently_post_window(entry_mod):
    """Every window slot must be capable of a green driver row: no entry
    without an oracle_sql twin may appear in positions 1-50 (VERDICT r7
    Next #1 — done means zero no_oracle rows in the round CORRECTNESS)."""
    first50 = list(entry_mod.queries().keys())[:50]
    oracles = set(entry_mod.oracle_sql())
    assert all(n in oracles for n in first50)
    assert not (set(first50) & ROWS_ONLY)


def test_rows_only_pinned_last(entry_mod):
    """The rows-only block sits at the very END of the dict so it can
    never drift back into the window as entries are added."""
    names = list(entry_mod.queries().keys())
    tail = names[-len(ROWS_ONLY):]
    assert set(tail) == ROWS_ONLY


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
