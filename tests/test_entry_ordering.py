"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01..r08 each contain exactly 50
keys equal to dict positions 1-50).  Round-9 rotation (VERDICT r8 Next
#1): positions 1-18 are this round's NEW entries plus the five round-8
entries whose OUTPUT changed this round (charref decode + robots funnel
stage — their r8 green no longer attests the current code, so they are
driver-checked again at birth), positions 19-50 are the 32 stalest
oracle-backed entries (last driver-green r4); three r4 entries and
seasonal_anomalies (r5) were displaced to 51-54, first for r10.  The 10 rows-only entries are PERMANENTLY
excluded from the window — a slot spent on a ``no_oracle`` row can
never produce a green driver row (round 7 burned 4 slots that way);
their md5/exact twins carry the hash signal.  This test keeps the
window arithmetic from silently regressing when entries are added or
reordered.
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


# Positions 1-18: round-9 additions + changed-output round-8 entries,
# driver-checked at birth.
NEW_R9 = [
    "gopher_quality_flags", "blockword_flags",
    "robots_noindex_flags", "robots_txt_rules", "robots_disallow_filter",
    "robots_crawl_delays", "crawl_frontier",
    "frontier_schedule", "sitemap_locs",
    "warc_record_index", "warc_payload_extract",
    "extract_anchors", "anchor_domain_stats",
    "html_extract", "line_quality_filter", "c4_clean_documents",
    "line_dedup", "web_curation_funnel",
]

# Positions 19-50: stalest oracle-backed (32 of the 39 r4-stale; entries (last driver-green r4),
# planner-stable order from tools/plan_rotation.py).
STALE_R4 = [
    "funnel_report", "chunk_documents", "temperature_sample",
    "retention_cohorts", "transition_counts", "weighted_sample",
    "json_key_profile", "audio_segments", "name_match_pairs",
    "q16_adapted", "q20_adapted", "corpus_report", "token_histogram",
    "curate_corpus", "tfidf_pairs", "approx_quantile_flags",
    "last_touch_attribution", "inter_event_gaps", "ivf_pq_topk",
    "ann_recall_ivfpq", "bigram_logprob", "q21_adapted",
    "near_dup_verified", "rfm_features", "psi_drift", "trust_propagation",
    "session_concurrency", "ann_recall_lsh", "cube_pricing", "zorder_keys",
    "content_diff_summary", "name_match_verified",
]

# Positions 51+: the stale entries the 14-wide at-birth block displaced
# — they sit at the head of the post-window order, first in line for
# the r10 rotation.
DISPLACED = ["debounce_events", "ri_audit", "incremental_agg",
             "signal_percentiles",
             "lsh_knn_join", "dedup_pair_recall", "minhash_pair_recall",
             "seasonal_anomalies"]



# Rows-only by design: xxhash64 fast paths carry no SQL oracle (their md5
# twins do), and KMeans/LBFGS floats are iteration-order dependent.
# Since round 8: PERMANENTLY post-window.
ROWS_ONLY = {
    "minhash_buckets", "lsh_candidate_pairs", "simhash_near_pairs",
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

N_QUERIES = 246


def test_window_layout(entry_mod):
    names = list(entry_mod.queries().keys())
    assert names[:18] == NEW_R9
    assert names[18:50] == STALE_R4
    assert names[50:58] == DISPLACED


def test_window_exactly_filled(entry_mod):
    # 18 + 32 == 50: no slot wasted
    first50 = set(list(entry_mod.queries().keys())[:50])
    assert first50 == set(NEW_R9) | set(STALE_R4)


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
