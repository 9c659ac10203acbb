"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01..r13 each contain exactly 50
keys equal to dict positions 1-50).  Round-14 rotation (VERDICT r13
Next #5): the window head is this round's 2 births (KN trigram LM
perplexity, exact 50-char ExactSubstr), then the 8 standing rows-only
entries — VERDICT r13 Next #3 EXTENDED the >6-rounds-stale rotation
invariant to rows-only entries, whose last driver record dated to
r05/r07; a window slot on one re-records its ``no_oracle`` +
spark_rows row, the maximum-achievable driver signal for a
zlib/xxhash64/MLlib-float entry — then the 40 stalest oracle-backed
entries in tools/plan_rotation.py order (the r8-green embedding/ANN/
curation block, then the leading r9-green robots block).
No entry, oracle-backed or rows-only, goes >6 rounds without a fresh
driver record under this rotation.  This test keeps the window
arithmetic from silently regressing when entries are added or
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


# Window head: round-14 births, driver-checked at birth (host_pagerank
# is the post-closing third birth — §19-addendum precedent — slotted
# after the first two; robots_txt_rules slides to NEXT_IN_LINE head).
NEW_R14 = [
    "ngram_perplexity", "exact_substring_spans_exact", "host_pagerank",
]

# Positions 4-11: the 8 standing rows-only entries, rotated through the
# window this round to refresh their driver record (last contact
# r05/r07; VERDICT r13 Next #3 extended the staleness invariant to
# them).  Planner-stable order: the r5 block, then the r7 pair.
ROWS_ONLY_WINDOW = [
    "lsh_candidate_pairs_capped", "quality_classifier",
    "compression_ratio", "ivf_pq_kmeans_topk", "ann_recall_ivfpq_kmeans",
    "quality_classifier_auc", "simhash_near_pairs", "ivf_kmeans_assign",
]

# Positions 12-50: the stalest oracle-backed entries, planner-stable
# order (the r8-green embedding/ANN/curation block, then the leading
# r9-green robots block).
ROTATED_STALEST = [
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

# Positions 51+: next-stalest, first in line for the r15 rotation.
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
# r14 (VERDICT r13 Next #3): the superseded uncapped xxhash64 spellings
# minhash_buckets and lsh_candidate_pairs are RETIRED from the registry —
# their md5 twins are oracle-green and lsh_candidate_pairs_capped keeps
# the intrinsic-hash production posture driver-visible; the xxhash64
# library path stays pytest-pinned (test_plan_shapes fast-path plan,
# test_dedup hash-family agreement).  The 8 remaining entries rotate
# through the driver window like any other entry (their slot records the
# rows-only signal); this round they occupy positions 4-11.
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
    assert names[3:11] == ROWS_ONLY_WINDOW
    assert names[11:50] == ROTATED_STALEST
    assert names[50:71] == NEXT_IN_LINE


def test_window_exactly_filled(entry_mod):
    # 3 + 8 + 39 == 50: no slot wasted
    first50 = set(list(entry_mod.queries().keys())[:50])
    assert first50 == set(NEW_R14) | set(ROWS_ONLY_WINDOW) | set(
        ROTATED_STALEST
    )


def test_rows_only_window_block_is_exactly_the_rows_only_set(entry_mod):
    """This round's rows-only freshness pass (VERDICT r13 Next #3): ALL
    8 standing rows-only entries — and nothing else without an oracle —
    sit inside the window, so the driver re-records every one of their
    rows-only signals in a single round and the staleness invariant
    resets for the whole set at once."""
    first50 = list(entry_mod.queries().keys())[:50]
    oracles = set(entry_mod.oracle_sql())
    no_oracle_in_window = [n for n in first50 if n not in oracles]
    assert no_oracle_in_window == ROWS_ONLY_WINDOW
    assert set(ROWS_ONLY_WINDOW) == ROWS_ONLY


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
