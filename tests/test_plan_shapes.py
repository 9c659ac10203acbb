"""Executed-plan regression guards for properties we engineered and then
watched Catalyst un-engineer.

These assert on physical-plan text after an action (post-AQE), catching:
* filter pushdown reaching the parquet scan (the point of declarative IO);
* the simhash pushdown pathology — a join null-filter once rewrote
  isnotnull(band_val) into isnotnull(<entire fingerprint expr>) and pushed
  it INTO the scan (O(bits²·tokens)/row); the pandas-UDF barrier must keep
  expensive derived keys out of FileScan DataFilters;
* corpus_filter staying a single-shuffle window plan, not a self-join.
"""

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _executed(df):
    df.count()  # force execution so AQE finalizes
    return df._jdf.queryExecution().executedPlan().toString()


def scan_lines(plan: str) -> list[str]:
    return [l for l in plan.splitlines() if "FileScan" in l]


class TestPlanShapes:
    def test_q1_filter_reaches_scan(self, spark):
        plan = _executed(E.queries()["q1_pricing_summary"](spark, SF))
        scans = scan_lines(plan)
        assert any("PushedFilters" in l and "l_shipdate" in l for l in scans)
        # column pruning: the scan reads only the 7 needed columns, not 11
        assert any("ReadSchema" in l and "l_partkey" not in l for l in scans)

    def test_q3_dims_broadcast(self, spark):
        plan = _executed(E.queries()["q3_shipping_priority"](spark, SF))
        assert "SortMergeJoin" not in plan  # dims broadcast at this scale
        assert "TakeOrderedAndProject" in plan  # top-k never full-sorts

    def test_simhash_expensive_expr_stays_out_of_scan(self, spark):
        plan = _executed(E.queries()["simhash_near_pairs"](spark, SF))
        for l in scan_lines(plan):
            assert "aggregate(" not in l and "xxhash64" not in l, (
                "fingerprint expression leaked into a scan filter: " + l[:200]
            )
        assert "ArrowEvalPython" in plan or "InMemoryTableScan" in plan

    def test_corpus_filter_single_shuffle_no_join(self, spark):
        plan = _executed(E.queries()["corpus_filter"](spark, SF))
        assert "Join" not in plan  # keeper via window-min, not semi-join
        assert plan.count("Window") >= 1
