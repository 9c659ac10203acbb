"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01..r06 each contain exactly 50
keys equal to dict positions 1-50).  Round-7 rotation (VERDICT r6 Next
#1, extended): positions 1-3 are this round's NEW entries — additions
now enter the window at birth instead of accruing post-window rotation
debt — positions 4-22 are the 19 never-driver-checked entries (17
post-window r6 additions + the bpe pair that graduated from rows-only
to oracle-backed in r6), positions 23-48 are the 26 stalest
driver-green entries, and positions 49-50 are two r6-green canaries.
This test keeps that window arithmetic from silently regressing when
entries are added or reordered.
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


# Positions 1-6: round-7 additions, driver-checked at birth.
NEW_R7 = [
    "domain_stats", "domain_quota_sample", "blocklist_filter", "url_dedup",
    "image_exif_meta", "exif_gps_scrub",
]

# Positions 4-22: no driver correctness row as of CORRECTNESS_r06 under
# current semantics (bpe pair graduated to oracle-backed; rest are the
# post-window round-6 additions — all judge-gate green last round).
NEVER_CHECKED = [
    "bpe_merges", "bpe_encode", "exact_substring_spans_chars",
    "image_meta_jpeg", "t_closeness", "video_frame_index",
    "audio_segment_index", "hybrid_rrf_topk", "dedup_keep_best",
    "mmr_diversify", "pii_luhn_cards", "pii_card_gate",
    "mmr_diversify_ivf", "curate_corpus_best", "kmeans_exact_assign",
    "ivf_kmeans_exact_topk", "compressibility_entropy",
    "dedup_method_agreement", "packing_efficiency",
]

# Positions 23-48: stalest driver-green entries (last green r2/r3),
# planner-stable order from tools/plan_rotation.py.
STALE = [
    "lang_id", "bpe_token_count", "winnow_summary", "simhash_near_pairs",
    "ivf_kmeans_assign", "minhash_buckets", "lsh_candidate_pairs",
    "winnow_shared_pairs", "pii_scrub", "dataset_split", "quota_sample",
    "pack_sequences", "range_join_incidents", "time_rollup", "cdc_merge",
    "scd2_history", "dedup_clusters", "inverted_index", "keyword_search",
    "fingerprint_dedup", "minhash_buckets_md5", "lsh_candidate_pairs_md5",
    "jaccard_adjacent",
]

# r6-green sentinels: if these fail in CORRECTNESS_r07 the harness (not
# the rotated-in entries) regressed.
CANARIES = ["q1_pricing_summary", "exact_dedup_groups"]

# Rows-only by design: xxhash64 fast paths carry no SQL oracle (their md5
# twins do), and KMeans/LBFGS floats are iteration-order dependent.
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

N_QUERIES = 221


def test_window_layout(entry_mod):
    names = list(entry_mod.queries().keys())
    assert names[:6] == NEW_R7
    assert names[6:25] == NEVER_CHECKED
    assert names[25:48] == STALE
    assert names[48:50] == CANARIES


def test_window_exactly_filled(entry_mod):
    # 6 + 19 + 23 + 2 == 50: no slot wasted, nothing needing a row
    # pushed out.
    first50 = set(list(entry_mod.queries().keys())[:50])
    assert first50 == (
        set(NEW_R7) | set(NEVER_CHECKED) | set(STALE) | set(CANARIES)
    )


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
    that the window contains every never-checked entry."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/plan_rotation.py", "50"],
        capture_output=True, text=True,
        cwd=str(_ENTRY.parent),
    ).stdout
    assert "WARNING" not in out
