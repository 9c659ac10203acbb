"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01..r04 each contain exactly 50
keys equal to dict positions 1-50).  Round 5's final rotation: ALL 48
entries no driver round has ever checked (11 round-3 leftovers, 17
round-4 operators, 20 round-5 additions) sit at positions 1-48, and two
r4-green canaries hold 49-50 — the never-checked block consumed every
stale-filler slot.  This test keeps that window arithmetic from
silently regressing when entries are added or reordered.
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


# Round-5 window: every entry here had NO driver correctness row as of
# CORRECTNESS_r04.  These MUST sit inside the driver's 50-row window
# this round, in this order (never-checked first, planner-stable).
NEVER_CHECKED = [
    "seasonal_anomalies", "containment_adjacent", "decayed_topk",
    "k_anonymity", "l_diversity", "q2_adapted", "q11_adapted",
    "quality_classifier", "compression_ratio", "ivf_pq_kmeans_topk",
    "ann_recall_ivfpq_kmeans", "ivf_pq_rerank_topk", "knn_graph_capped",
    "image_meta_real", "image_ahash_real", "image_near_dup",
    "cross_corpus_near_dup", "skew_profile", "cluster_safe_split",
    "profile_orders", "negative_samples", "hard_negatives", "margin_mine",
    "curation_funnel", "source_datasheet", "dsir_weights",
    # round-5 additions: capped production postures of the LSH /
    # decontamination flagships (never checked by construction)
    "lsh_candidate_pairs_capped", "lsh_candidate_pairs_md5_capped",
    "cross_corpus_near_dup_capped",
    # and the quality-classifier AUC scorecard pair: deterministic twin
    # (oracle-green) + LBFGS measured row (rows-only)
    "quality_twin_auc", "quality_classifier_auc",
    # corpus boilerplate profiler (n-gram doc-frequency heavy hitters)
    "boilerplate_ngrams",
    # fractional-epoch source repetition (LLaMA-style mixture knob)
    "mixture_epochs",
    # embedding-space PSI drift (cell-occupancy vs the baseline's IVF cells)
    "embedding_drift_psi",
    # late-round-5 additions: exact-substring span dedup, the sketch
    # family (HLL / CMS / Bloom / log-histogram quantiles / HLL
    # intersection), and the lake compaction planner
    "exact_substring_spans", "hll_registers", "hll_union_estimate",
    "cms_token_sketch", "cms_heavy_hitters", "bloom_custkey_probe",
    "loghist_price_quantiles", "hll_intersect_customers",
    "compaction_plan", "cms_join_size_custkey", "hll_rolling_users",
    "cms_weighted_spenders", "exact_substring_scrub",
    "sketch_validation_lineitem",
]

# Stalest driver-green family (last green in CORRECTNESS_r02): fills the
# window behind the never-checked block.
STALE_R2 = []  # window fully consumed by never-checked entries this round

# r4-green sentinels: if these fail in CORRECTNESS_r05 the harness (not
# the rotated-in entries) regressed.
CANARIES = ["span_dedup", "exact_dedup_groups"]

# Rows-only by design: xxhash64 fast paths carry no SQL oracle (their md5
# twins do), and KMeans/LBFGS floats are iteration-order dependent.
ROWS_ONLY = {
    "minhash_buckets", "lsh_candidate_pairs", "simhash_near_pairs",
    "ivf_kmeans_assign",
    # capped xxhash64 production posture: rows-only like its uncapped
    # sibling; lsh_candidate_pairs_md5_capped carries the oracle
    "lsh_candidate_pairs_capped",
    # iterative greedy BPE learning is not SQL-expressible; pinned instead
    # by test_vocab's independent-reference equivalence
    "bpe_merges", "bpe_encode",
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

N_QUERIES = 198


def test_window_layout(entry_mod):
    names = list(entry_mod.queries().keys())
    assert names[:48] == NEVER_CHECKED
    assert names[48:48] == STALE_R2
    assert names[48:50] == CANARIES


def test_window_exactly_filled(entry_mod):
    # 48 + 0 + 2 == 50: no slot wasted, nothing needing a row pushed out.
    first50 = set(list(entry_mod.queries().keys())[:50])
    assert first50 == set(NEVER_CHECKED) | set(STALE_R2) | set(CANARIES)


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
