"""Aggregate navigator: rollup routing, monoid exactness, plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.plans.navigator import (
    Rollup,
    build_rollup,
    can_answer,
    month_of,
    navigate,
    pick_rollup,
)
from healthcare_data_warehouse_spark.sources.loaders import load_table

from conftest import SF_SMOKE


def _orders_with_month(spark):
    return load_table(spark, SF_SMOKE, "orders").withColumn(
        "month", month_of("o_orderdate"))


def test_navigated_equals_fact_aggregation_bitwise(spark, tmp_path):
    o = _orders_with_month(spark)
    r = build_rollup(o, ["month", "o_orderstatus"], "o_totalprice",
                     str(tmp_path / "r1"))

    got = {tuple(row) for row in navigate(spark, r, ["month"]).collect()}
    want = {tuple(row) for row in o.groupBy("month").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double").alias("sum_v"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
         / F.count(F.lit(1))).alias("avg_v"),
        F.min("o_totalprice").alias("min_v"),
        F.max("o_totalprice").alias("max_v"),
    ).collect()}
    assert got == want  # bit equality: decimal partials are associative


def test_rollup_selection_prefers_coarsest_that_fits(spark, tmp_path):
    fine = Rollup("fine", "x", ("month", "o_orderstatus", "o_orderpriority"))
    mid = Rollup("mid", "y", ("month", "o_orderstatus"))
    other = Rollup("other", "z", ("o_custkey",))
    assert pick_rollup([fine, mid, other], ["month"]) is mid
    assert pick_rollup([fine, mid, other], ["month", "o_orderpriority"]) is fine
    assert pick_rollup([mid, other], ["o_orderdate"]) is None  # fact fallback
    assert can_answer(mid, ["o_orderstatus"]) and not can_answer(mid, ["o_clerk"])


def test_navigated_plan_never_scans_the_fact(spark, tmp_path):
    o = _orders_with_month(spark)
    r = build_rollup(o, ["month", "o_orderstatus"], "o_totalprice",
                     str(tmp_path / "r2"))
    df = navigate(spark, r, ["o_orderstatus"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "r2" in plan                      # reads the rollup parquet
    assert "orders.parquet" not in plan      # never the fact


def test_incremental_rollup_maintenance_stays_exact(spark, tmp_path):
    """The full incremental MV loop: fact changes → CDC diff → targeted
    state refresh (only touched grain keys re-aggregate) → the navigated
    answer still equals a from-scratch fact aggregation, bit for bit."""
    from healthcare_data_warehouse_spark.operators.cdc import table_diff
    from healthcare_data_warehouse_spark.operators.incremental import (
        refresh_state_from_diff,
    )

    o_old = _orders_with_month(spark)
    # new fact version: drop some rows, reprice others, add a clone batch
    o_new = (
        o_old.filter(F.col("o_orderkey") % 7 != 0)
        .withColumn("o_totalprice",
                    F.when(F.col("o_orderkey") % 5 == 0,
                           F.col("o_totalprice") * 2).otherwise(
                               F.col("o_totalprice")))
    )

    grain = ["month", "o_orderstatus"]
    old_state = spark.read.parquet(
        build_rollup(o_old, grain, "o_totalprice", str(tmp_path / "s")).path)

    diff = table_diff(
        o_old.select("o_orderkey", *grain, "o_totalprice"),
        o_new.select("o_orderkey", *grain, "o_totalprice"),
        keys=["o_orderkey"], compare_cols=["o_totalprice"])
    # project the change feed to the grain keys it touched (old OR new
    # grain values of changed orderkeys)
    changed_keys = (
        o_old.join(diff.select("o_orderkey"), "o_orderkey", "left_semi")
        .select(*grain)
        .unionByName(
            o_new.join(diff.select("o_orderkey"), "o_orderkey", "left_semi")
            .select(*grain))
        .distinct()
    )

    new_state = refresh_state_from_diff(
        old_state, o_new.select(*grain, "o_totalprice"),
        changed_keys, keys=grain, measure="o_totalprice")
    new_state.write.mode("overwrite").parquet(str(tmp_path / "s2"))
    r2 = Rollup("refreshed", str(tmp_path / "s2"), tuple(grain))

    got = {tuple(r) for r in navigate(spark, r2, ["month"]).collect()}
    scratch = spark.read.parquet(
        build_rollup(o_new, grain, "o_totalprice",
                     str(tmp_path / "s3")).path)
    r3 = Rollup("scratch", str(tmp_path / "s3"), tuple(grain))
    want = {tuple(r) for r in navigate(spark, r3, ["month"]).collect()}
    assert got == want
