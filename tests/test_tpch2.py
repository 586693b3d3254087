"""Executed-plan shape tests for the TPC-H completion queries — the scale
claims in plans/tpch2.py and relational.py's Q6/Q12/Q15 tail, pinned the
same way test_scale_claims.py pins the q1/q19/q21 claims. Value
correctness is covered by test_oracle_parity; these lock the physical
plans that make the queries survive 100x.
"""

from __future__ import annotations

import re

from imdbmapreduce_spark import registry


def _executed_plan(spark, sf_dir, name: str) -> str:
    df = registry.get(name).fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    # keep only the final section so scans/exchanges aren't double-counted
    return plan.split("== Initial Plan ==")[0]


def _scans(plan: str) -> list[str]:
    """Split the plan into per-FileScan chunks (scan line + its details)."""
    parts = plan.split("FileScan parquet")
    return ["FileScan parquet" + p for p in parts[1:]]


def test_q6_is_scan_bound(spark, sf_dir):
    """Q6's whole point: every predicate reaches the parquet scan and the
    only exchange is the single-partition partial->final agg handoff."""
    plan = _executed_plan(spark, sf_dir, "q6_forecast_revenue")
    scan = _scans(plan)[0]
    pushed = scan.split("PushedFilters")[1][:300]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    read_schema = scan.split("ReadSchema:")[1][:300]
    for col in ("l_orderkey", "l_partkey", "l_returnflag"):
        assert col not in read_schema  # untouched columns pruned
    # exactly one exchange, and it's the single-row global-agg handoff
    assert plan.count("Exchange") == 1
    assert "SinglePartition" in plan


def test_q2_decorrelates_without_cartesian(spark, sf_dir):
    """The correlated MIN must decorrelate into agg + window — no
    cartesian/nested-loop anywhere, part filters pushed to its scan."""
    plan = _executed_plan(spark, sf_dir, "q2_min_cost_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    part_scan = next(s for s in _scans(plan) if "part.parquet" in s)
    pushed = part_scan.split("PushedFilters")[1][:300]
    assert "p_type" in pushed and "p_size" in pushed


def test_q8_single_fact_scan(spark, sf_dir):
    """The ratio-of-conditional-sums form needs NO self-join: lineitem
    must be scanned exactly once."""
    plan = _executed_plan(spark, sf_dir, "q8_market_share")
    fact_scans = [s for s in _scans(plan) if "lineitem.parquet" in s]
    assert len(fact_scans) == 1, len(fact_scans)


def test_q11_scalar_subquery_is_single_row_broadcast(spark, sf_dir):
    """The grand-total threshold joins back as a broadcast nested loop
    whose build side is ONE row — bounded by construction. The fact scan
    happens once; the total reuses the per-part aggregation."""
    df = registry.get("q11_important_stock").fn(spark, sf_dir)
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    final, _, initial = full.partition("== Initial Plan ==")
    # at tiny SFs the threshold can filter everything and AQE collapses
    # the final plan to EmptyRelation — assert structure on whichever
    # section still carries it
    plan = final if "Join" in final else initial
    assert "BroadcastNestedLoopJoin" in plan
    if "Join" in final:
        # exchange/stage reuse is an AQE runtime decision: only the FINAL
        # plan shows the per-part aggregation feeding both the threshold
        # scalar and the output from one fact scan
        fact_scans = [s for s in _scans(final) if "lineitem.parquet" in s]
        assert len(fact_scans) == 1, len(fact_scans)


def test_q15_max_revenue_ties_are_deterministic(spark, sf_dir):
    """Ties at the max are a row SET, not a race: equality on exact long
    cents. Also: single fact scan feeding both the view and its max."""
    df = registry.get("q15_top_supplier").fn(spark, sf_dir)
    rows = df.collect()
    assert rows == sorted(rows, key=lambda r: r.s_suppkey)
    assert len({r.total_revenue for r in rows}) == 1  # all rows AT the max
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    fact_scans = [s for s in _scans(plan) if "lineitem.parquet" in s]
    assert len(fact_scans) == 1, len(fact_scans)


def test_q20_threshold_compares_in_integers(spark, sf_dir):
    """The dominance predicate must be an integer comparison (qty*10 >=
    total*3) — no doubles in the gate — and the part-name prefix filter
    must prune the dim before the fact join (broadcast side)."""
    plan = _executed_plan(spark, sf_dir, "q20_dominant_suppliers")
    assert re.search(r"qty_cents#\d+L \* 10\)? >= \(?part_cents#\d+L \* 3", plan) or (
        "* 10" in plan and "* 3" in plan
    )
    part_scan = next(s for s in _scans(plan) if "part.parquet" in s)
    pushed = part_scan.split("PushedFilters")[1][:300]
    assert "StringStartsWith" in pushed or "p_name" in pushed


def test_price_band_bucketed_is_equi_join(spark, sf_dir):
    """The interval-bucketed variant must plan as a hash/broadcast
    EQUI-join on the bucket id — zero nested-loop operators — and agree
    exactly with the broadcast-nested-loop original."""
    bnl = registry.get("price_band_assignment").fn(spark, sf_dir)
    eq = registry.get("price_band_bucketed").fn(spark, sf_dir)
    a = {(r.band, r.n_lines, r.total_price) for r in bnl.collect()}
    b = {(r.band, r.n_lines, r.total_price) for r in eq.collect()}
    assert a == b
    plan = eq._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # it IS still a join, keyed on bkt


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    """The EXISTS must decorrelate to a LEFT SEMI equi-join on orderkey
    carrying the lateness predicate as a join filter — never a theta or
    nested-loop join — with the quarter filter pushed to the orders scan
    and lineitem pruned to (l_orderkey, l_shipdate). Since round 12 q4
    reads through the opportunistic bucketed seam, so in a session
    whose orderkey twins exist the scans are the full-column twins —
    also parquet, so pushdown and pruning must hold identically on
    whichever layout served the read."""
    plan = _executed_plan(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    orders_scan = next(
        s for s in _scans(plan) if "orders.parquet" in s or "b_orders_ok_full" in s
    )
    assert "o_orderdate" in orders_scan.split("PushedFilters")[1][:300]
    li_scan = next(
        s
        for s in _scans(plan)
        if "lineitem.parquet" in s or "b_lineitem_ok_full" in s
    )
    read_schema = li_scan.split("ReadSchema:")[1][:200]
    assert "l_orderkey" in read_schema and "l_shipdate" in read_schema
    assert "l_extendedprice" not in read_schema
