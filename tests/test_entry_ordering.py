"""Pin the queries() ordering contract.

The round driver oracle-checks only the FIRST 50 entries of
__spark_entry__.queries() (CORRECTNESS_r01..r05 each contain exactly 50
keys equal to dict positions 1-50).  Round 6's rotation (VERDICT r5
Next #2): positions 1-2 are the only never-checked entries
(loghist_rolling_value, hll_churn_customers), positions 3-48 are the 46
stalest driver-green entries (last green in CORRECTNESS_r02), and
positions 49-50 are two r5-green canaries.  This test keeps that window
arithmetic from silently regressing when entries are added or reordered.
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


# Round-6 window positions 1-2: the only entries with NO driver
# correctness row as of CORRECTNESS_r05 (both judge-green last round).
NEVER_CHECKED = [
    "loghist_rolling_value", "hll_churn_customers",
]

# Positions 3-48: stalest driver-green family (last green in
# CORRECTNESS_r02; their shared operator/transform code has changed
# across r3-r5).  Planner-stable order from tools/plan_rotation.py.
STALE_R2 = [
    "q1_pricing_summary", "transform_uuid", "q3_shipping_priority",
    "q5_local_supplier_volume", "q10_returned_revenue",
    "q12_priority_counts", "q17_small_quantity_revenue",
    "q6_forecast_revenue", "q14_promo_revenue", "q19_disjunctive_revenue",
    "q22_idle_customers", "q4_order_priority", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q13_order_count_distribution",
    "q15_top_supplier", "q18_large_volume_customers",
    "top_order_per_customer", "big_order_customers",
    "cheapest_supplier_per_part", "customer_set_ops",
    "sql_exists_subquery", "rollup_pricing", "distinct_orders_per_flag",
    "events_hourly", "events_json_stats", "events_pivot",
    "lineitem_column_stats", "revenue_percentiles", "sessionize",
    "asof_join", "minmax_probe", "row_counts", "sequence_reset",
    "orphan_anti_join", "orphan_set_null", "transform_strings",
    "transform_bool", "transform_set_split", "transform_bits",
    "transform_time_interval", "transform_year_money",
    "transform_zero_date", "quality_checks", "text_stats",
]

# r5-green sentinels: if these fail in CORRECTNESS_r06 the harness (not
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
    # round 6: bpe_merges AND bpe_encode both GRADUATED to oracle-backed
    # — the greedy loop unrolled as chained MATERIALIZED CTEs (the MMR
    # trick), with encode replaying the merges per distinct word
    # (sequential-by-rank ≡ priority encode for learned merge lists)
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

N_QUERIES = 215


def test_window_layout(entry_mod):
    names = list(entry_mod.queries().keys())
    assert names[:2] == NEVER_CHECKED
    assert names[2:48] == STALE_R2
    assert names[48:50] == CANARIES


def test_window_exactly_filled(entry_mod):
    # 2 + 46 + 2 == 50: no slot wasted, nothing needing a row pushed out.
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
