"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01..r10 each contain exactly 50
keys equal to dict positions 1-50).  Round-11 rotation (VERDICT r10
Next #6): the window head is this round's 12 births (the HTTP envelope
layer + the zipnum secondary index — driver-checked at birth), then
the 38 STALEST oracle-backed entries in tools/plan_rotation.py order —
the r5-green block the r10 births displaced (dsir_weights through
sketch_validation_lineitem) followed by the leading r6-green entries
(the TPC-H shapes).  No oracle-backed entry goes >5 rounds without a
driver-green record under this rotation.
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


# Window head: round-11 births, driver-checked at birth.
NEW_R11 = [
    "http_response_index", "http_status_filter", "http_body_extract",
    "http_charset_transcode", "http_redirect_edges", "cdx_zipnum_index",
    "http_wire_decode", "http_revisit_resolve", "http_request_pairs",
    "cc_ingest_funnel", "http_truncated_audit", "recrawl_plan",
]

# Remaining window: the stalest oracle-backed entries, planner-stable
# order (r5-green block first, then the leading r6-green TPC-H shapes).
ROTATED_STALEST = [
    "dsir_weights", "lsh_candidate_pairs_md5_capped",
    "cross_corpus_near_dup_capped", "quality_twin_auc",
    "boilerplate_ngrams", "mixture_epochs", "embedding_drift_psi",
    "exact_substring_spans", "hll_registers", "hll_union_estimate",
    "cms_token_sketch", "cms_heavy_hitters", "bloom_custkey_probe",
    "loghist_price_quantiles", "hll_intersect_customers",
    "compaction_plan", "cms_join_size_custkey", "hll_rolling_users",
    "cms_weighted_spenders", "exact_substring_scrub",
    "sketch_validation_lineitem", "loghist_rolling_value",
    "hll_churn_customers", "transform_uuid", "q3_shipping_priority",
    "q5_local_supplier_volume", "q10_returned_revenue",
    "q12_priority_counts", "q17_small_quantity_revenue",
    "q6_forecast_revenue", "q14_promo_revenue", "q19_disjunctive_revenue",
    "q22_idle_customers", "q4_order_priority", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit",
    "q13_order_count_distribution",
]

# Positions 51+: next-stalest, first in line for the r12 rotation.
NEXT_IN_LINE = [
    "q15_top_supplier", "q18_large_volume_customers",
    "top_order_per_customer", "big_order_customers", "cheapest_supplier_per_part",
    "customer_set_ops", "sql_exists_subquery", "rollup_pricing",
    "distinct_orders_per_flag",
    "events_hourly", "events_json_stats", "events_pivot",
    "lineitem_column_stats", "revenue_percentiles", "sessionize",
    "asof_join", "minmax_probe", "row_counts", "sequence_reset",
    "orphan_anti_join", "orphan_set_null", "transform_strings",
    "transform_bool", "transform_set_split",
]


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

N_QUERIES = 284


def test_window_layout(entry_mod):
    names = list(entry_mod.queries().keys())
    assert names[:12] == NEW_R11
    assert names[12:50] == ROTATED_STALEST
    assert names[50:74] == NEXT_IN_LINE


def test_window_exactly_filled(entry_mod):
    # 12 + 38 == 50: no slot wasted
    first50 = set(list(entry_mod.queries().keys())[:50])
    assert first50 == set(NEW_R11) | set(ROTATED_STALEST)


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
