"""Physical-plan regression tests: the scale posture is part of the spec.

A correctness-green query that stops broadcasting its dims or stops
pushing filters into the scan is a regression at 100 TB even though every
row still comes out right — so the expected plan shapes are pinned here.
"""

from __future__ import annotations

from healthcare_data_warehouse_spark.plans import catalog

from conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = catalog.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_fact_dim_joins_broadcast(spark):
    plan = _plan(spark, "join_fact_dims")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "topk_highcost")
    assert "GreaterThan(o_totalprice,400000.0)" in plan


def test_point_lookup_pushdown(spark):
    plan = _plan(spark, "point_lookup")
    assert "EqualTo(c_custkey,42)" in plan


def test_column_pruning_join_3way(spark):
    plan = _plan(spark, "join_3way")
    # lineitem scan must read only the 3 needed columns of 11
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "topk_highcost")
    assert "TakeOrderedAndProject" in plan


def test_surrogate_keys_never_single_partition_window(spark):
    plan = _plan(spark, "window_rownumber_keys")
    assert "SinglePartition" not in plan


def test_global_pct_window_runs_on_aggregated_input(spark):
    # the W1 global window is allowed only above an Aggregate (tiny input)
    df = catalog.queries()["window_pct_of_total"](spark, SF_SMOKE)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" in logical


def test_anti_join_is_broadcast_or_hash(spark):
    plan = _plan(spark, "antijoin_incremental")
    assert "LeftAnti" in plan
