"""Semantics pins for the adapted TPC-H q2/q11/q21 (operators/queries.py).

The DuckDB oracle gate verifies these end-to-end on the testdata; the tiny
fixtures here pin the *rules* — q21's sole-late-supplier counting, q2's
min-cost ties, q11's average-relative threshold — on hand-built inputs where
the right answer is checkable by eye.  q21 especially: the Spark side is a
decorrelated two-level aggregate, and these cases (single-supplier orders,
two late suppliers, multiple late lineitems from one supplier) are exactly
where a wrong decorrelation diverges from the textbook EXISTS/NOT-EXISTS
form (reference has no query engine; shapes follow TPC-H spec Q2/Q11/Q21).
"""

from __future__ import annotations

import datetime as dt

import pytest

from pgferry_spark.operators import queries as Q


def _ts(d: str) -> dt.datetime:
    return dt.datetime.fromisoformat(d)


@pytest.fixture(scope="module")
def q21_fixture(spark):
    # orders: o1 multi-supplier, only s1 late (counts; s1 has TWO late items
    # -> numwait 2); o2 multi-supplier, s1 and s2 both late (nobody counts);
    # o3 single-supplier, s3 late (no other supplier -> doesn't count);
    # o4 status 'O' (excluded); o5 multi-supplier, nobody late.
    orders = spark.createDataFrame(
        [
            (1, "F", _ts("1995-01-01")),
            (2, "F", _ts("1995-01-01")),
            (3, "F", _ts("1995-01-01")),
            (4, "O", _ts("1995-01-01")),
            (5, "F", _ts("1995-01-01")),
        ],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    )
    late, ontime = _ts("1995-06-01"), _ts("1995-01-15")
    lineitem = spark.createDataFrame(
        [
            (1, 1, late), (1, 1, late), (1, 2, ontime),
            (2, 1, late), (2, 2, late),
            (3, 3, late),
            (4, 1, late), (4, 2, ontime),
            (5, 1, ontime), (5, 2, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(1, "Supp#1"), (2, "Supp#2"), (3, "Supp#3")],
        "s_suppkey long, s_name string",
    )
    return supplier, orders, lineitem


def test_q21_sole_late_supplier_counts_lineitems(spark, q21_fixture):
    supplier, orders, lineitem = q21_fixture
    rows = Q.q21_waiting_suppliers(supplier, orders, lineitem).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("Supp#1", 2)]


def test_q21_late_days_threshold(spark, q21_fixture):
    supplier, orders, lineitem = q21_fixture
    # with a huge lateness threshold nothing is late
    out = Q.q21_waiting_suppliers(supplier, orders, lineitem, late_days=10000)
    assert out.count() == 0


def test_q2_min_cost_ties_return_both_suppliers(spark):
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey long, r_name string"
    )
    nation = spark.createDataFrame(
        [(10, "N_A", 0), (11, "N_E", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 10, 100.0), (2, "S2", 10, 50.0), (3, "S3", 11, 999.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(7, "partA", "B#1", 15), (8, "partB", "B#1", 20)],
        "p_partkey long, p_name string, p_brand string, p_size int",
    )
    # part 7: s1 and s2 tie at unit cost 2.0; s3 cheaper but out of region.
    # part 8: wrong size, excluded.
    lineitem = spark.createDataFrame(
        [
            (7, 1, 4.0, 2.0), (7, 1, 9.0, 3.0),
            (7, 2, 6.0, 3.0), (7, 3, 1.0, 1.0),
            (8, 1, 2.0, 1.0),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double",
    )
    rows = Q.q2_min_cost_supplier(
        part, supplier, nation, region, lineitem, region_name="ASIA", size=15
    ).collect()
    assert [(r.s_name, r.p_partkey, r.unit_cost) for r in rows] == [
        ("S1", 7, 2.0),
        ("S2", 7, 2.0),
    ]
    # ordered by acctbal desc: S1 (100) before S2 (50)
    assert [r.s_acctbal for r in rows] == [100.0, 50.0]


def test_q11_average_relative_threshold(spark):
    nation = spark.createDataFrame(
        [(10, "NATION_3", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 10, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    # part values: 100, 10, 10, 10 -> total 130, n=4; threshold value*4 > 260
    # -> only the 100-value part qualifies
    lineitem = spark.createDataFrame(
        [(1, 1, 100.0, 0.0), (2, 1, 10.0, 0.0), (3, 1, 10.0, 0.0), (4, 1, 10.0, 0.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    rows = Q.q11_important_parts(supplier, nation, lineitem).collect()
    assert [(r.partkey, r.part_value) for r in rows] == [(1, 100.0)]
