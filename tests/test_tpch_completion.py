"""Plan-shape pins for the TPC-H completion dozen
(plans/tpch_completion.py). Each test pins the ONE property that makes the
query's 100 TB story true: the decorrelation (no re-scan, no per-row
subquery), the broadcast of the scalar/dim side, or the pushdown that keeps
the fact scan minimal. Value correctness is the oracle's job
(tools/check_correctness.py / the driver); these guard the physical plan."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from kafka_streams_playground_spark.plans import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _scan_count(plan: str, table: str) -> int:
    # one "Location: ... <table>.parquet" detail line per scan node
    return len(re.findall(rf"Location:[^\n]*{table}", plan))


def test_q6_all_predicates_and_projection_pushed(spark, sf_dir):
    """Q6 is the pushdown probe: every predicate reaches PushedFilters and
    the ReadSchema is exactly the 4 referenced columns — if this breaks,
    the 100 TB claim ("reads the pruned row groups of 3 columns and
    nothing else") is false."""
    plan = _plan(spark, sf_dir, "q_forecast_revenue")
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(l_shipdate", plan), plan
    assert re.search(r"PushedFilters:.*LessThan\(l_quantity", plan), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_shipdate", "l_quantity", "l_extendedprice", "l_discount"}


def test_q2_min_decorrelates_to_partitioned_window(spark, sf_dir):
    """The correlated per-part MIN must be a partkey-PARTITIONED window
    over the pair aggregate — single lineage, exactly one lineitem scan,
    never a per-row re-scan; the three dims all broadcast."""
    plan = _plan(spark, sf_dir, "q_min_cost_supplier")
    assert _scan_count(plan, "lineitem") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all(s.startswith("p_partkey") for s in specs), plan
    assert "CartesianProduct" not in plan, plan


def test_q4_exists_is_left_semi(spark, sf_dir):
    """Q4's EXISTS must plan as a LeftSemi hash join on orderkey with the
    late-shipment residual at the join — a semi join emits each order at
    most once, so no post-join distinct appears in the plan."""
    plan = _plan(spark, sf_dir, "q_order_priority_checking")
    assert "LeftSemi" in plan, plan
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(o_orderdate", plan), plan


def test_q11_scalar_total_reads_persisted_aggregate(spark, sf_dir):
    """The 1/FRACTION threshold must be a 1-row broadcast over the
    PERSISTED per-part aggregate: exactly one lineitem scan plus
    InMemoryTableScan consumers (without the persist, Spark plans a second
    full fact scan for the total — ReuseExchange never fires across the
    pruning-de-canonicalized branches)."""
    plan = _plan(spark, sf_dir, "q_important_stock")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert _scan_count(plan, "lineitem") == 1, plan
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan


def test_q13_exclusion_stays_in_outer_join(spark, sf_dir):
    """The priority exclusion must filter the ORDERS side before the outer
    join (safe: non-preserved side) — pushed to the scan — while the join
    itself stays LeftOuter so zero-order customers survive."""
    plan = _plan(spark, sf_dir, "q_cust_order_distribution")
    assert "LeftOuter" in plan, plan
    assert re.search(r"PushedFilters:.*Not\(EqualTo\(o_orderpriority", plan), plan


def test_q14_part_dim_broadcasts_no_fact_shuffle(spark, sf_dir):
    """Q14 must be scan → broadcast probe → 1-row agg: no Exchange may sit
    between the lineitem scan and the part join (the fact never shuffles;
    the only exchanges are the broadcast and the single-partition final
    agg)."""
    plan = _plan(spark, sf_dir, "q_promo_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan


def test_q15_revenue_view_computed_once(spark, sf_dir):
    """Q15's revenue view feeds both the MAX scalar and the equality
    filter; the PERSISTED view means exactly one lineitem scan with both
    legs reading the cache, and the scalar broadcasts."""
    plan = _plan(spark, sf_dir, "q_top_supplier")
    assert _scan_count(plan, "lineitem") == 1, plan
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_q17_avg_decorrelates_and_brand_prunes_first(spark, sf_dir):
    """The per-part AVG is a partkey-partitioned window over the brand's
    slice — one lineitem scan, no re-scan per line — and the brand/size
    part filter pushes to the part scan below the broadcast."""
    plan = _plan(spark, sf_dir, "q_small_qty_revenue")
    assert _scan_count(plan, "lineitem") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all(s.startswith("l_partkey") for s in specs), plan
    assert re.search(r"PushedFilters:.*EqualTo\(p_brand", plan), plan
    assert "CartesianProduct" not in plan, plan


def test_q18_having_aggregate_is_reused_not_rescanned(spark, sf_dir):
    """Q18's trap: the IN-subquery aggregate must BE the output sum_qty —
    exactly one lineitem scan in the whole plan (the spec's literal plan
    scans it twice)."""
    plan = _plan(spark, sf_dir, "q_large_volume_customers")
    assert _scan_count(plan, "lineitem") == 1, plan
    assert "BroadcastHashJoin" in plan, plan  # customer dim


def test_q19_disjunction_stays_on_broadcast_probe(spark, sf_dir):
    """Q19's OR-of-ANDs spans both sides, so it evaluates at/after the
    broadcast probe — but there must be NO fact-side hash exchange at all
    (one scan, one broadcast, scalar agg)."""
    plan = _plan(spark, sf_dir, "q_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan


def test_q20_half_sum_is_partitioned_window(spark, sf_dir):
    """Q20's correlated half-sum is a partkey-partitioned window over the
    pair aggregate — one lineitem scan, no re-aggregate join-back — with
    the part-name prefix a broadcast LeftSemi."""
    plan = _plan(spark, sf_dir, "q_dominant_part_suppliers")
    assert _scan_count(plan, "lineitem") == 1, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all(s.startswith("l_partkey") for s in specs), plan
    assert "LeftSemi" in plan, plan


def test_q21_both_quantifiers_in_one_aggregate(spark, sf_dir):
    """Q21's EXISTS + NOT-EXISTS pair must collapse into ONE orderkey
    aggregate over ONE order-joined lineitem scan — the literal spec plan
    scans lineitem three times; this pin is the 1-shuffle-not-4 claim."""
    plan = _plan(spark, sf_dir, "q_waiting_suppliers")
    assert _scan_count(plan, "lineitem") == 1, plan
    assert re.search(r"PushedFilters:.*EqualTo\(o_orderstatus,F\)", plan), plan
