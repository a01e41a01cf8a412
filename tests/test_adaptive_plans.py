"""Size-gated physical-plan cutovers must be invisible to results.

join_3way picks between the direct join-then-aggregate plan (small
inputs: dims broadcast, fact never shuffles) and the staged
aggregate-below-join plan (large inputs: the fact is pre-reduced on the
join key before its first shuffle). The cutover is purely physical —
these tests force BOTH paths on the same data and assert identical
rows, and pin the plan shape each regime is expected to produce.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE
from healthcare_data_warehouse_spark import config
from healthcare_data_warehouse_spark.plans.catalog import queries


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def test_join_3way_paths_bit_identical(spark, monkeypatch):
    # pin the size-gated pair specifically: auto-routing onto the
    # bucketed layout (its own parity test below) would mask them
    monkeypatch.setattr(config, "BUCKETED_AUTO_ROUTE", False)
    q = queries()["join_3way"]
    direct = _rows(q(spark, SF_SMOKE))
    monkeypatch.setattr(config, "STAGED_JOIN_CUTOVER_BYTES", 0)
    staged = _rows(q(spark, SF_SMOKE))
    assert staged == direct  # bit-exact incl. the double revenue cast
    assert len(direct) > 0


def test_join_3way_staged_pre_reduces_before_shuffle(spark, monkeypatch):
    monkeypatch.setattr(config, "BUCKETED_AUTO_ROUTE", False)
    monkeypatch.setattr(config, "STAGED_JOIN_CUTOVER_BYTES", 0)
    q = queries()["join_3way"]
    plan = q(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    # the staged plan carries the per-order partial aggregate below the
    # orders join: its partial-agg columns appear in the plan
    assert "__cnt" in plan and "__rev" in plan
    # and lineitem's scan is still pruned to the 3 needed columns
    assert (
        "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"
        in plan
    )


def test_join_3way_small_input_keeps_direct_plan(spark, monkeypatch):
    monkeypatch.setattr(config, "BUCKETED_AUTO_ROUTE", False)
    q = queries()["join_3way"]
    plan = q(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "__cnt" not in plan  # no staged partials below the cutover


def test_join_3way_auto_routes_to_bucketed_layout(spark, monkeypatch):
    """When the order-bucketed layout is materialized (it is, for the
    smoke fixture), join_3way itself must resolve to the zero-fact-
    exchange bucketed plan — the ingest investment is the DEFAULT path —
    with rows bit-identical to the size-gated paths and the regime
    stamped for bench provenance."""
    from healthcare_data_warehouse_spark import decisions
    from healthcare_data_warehouse_spark.sources.bucketing import (
        ensure_order_bucketed_layout,
    )

    li_t, ord_t = ensure_order_bucketed_layout(spark, SF_SMOKE)
    q = queries()["join_3way"]

    decisions.drain()
    routed_df = q(spark, SF_SMOKE)
    d = decisions.drain()["join_3way"]
    assert d["plan"] == "bucketed"
    assert set(d["tables"]) == {li_t, ord_t}
    # the fact join runs bucket-local: no Exchange keyed on the order key
    plan = routed_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    routed = _rows(routed_df)
    monkeypatch.setattr(config, "BUCKETED_AUTO_ROUTE", False)
    direct = _rows(q(spark, SF_SMOKE))
    assert routed == direct and len(routed) > 0
