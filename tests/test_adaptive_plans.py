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
    q = queries()["join_3way"]
    direct = _rows(q(spark, SF_SMOKE))
    monkeypatch.setattr(config, "STAGED_JOIN_CUTOVER_BYTES", 0)
    staged = _rows(q(spark, SF_SMOKE))
    assert staged == direct  # bit-exact incl. the double revenue cast
    assert len(direct) > 0


def test_join_3way_staged_pre_reduces_before_shuffle(spark, monkeypatch):
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


def test_join_3way_small_input_keeps_direct_plan(spark):
    q = queries()["join_3way"]
    plan = q(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "__cnt" not in plan  # no staged partials below the cutover
