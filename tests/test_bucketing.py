"""Bucketed co-located join: correctness + the exchange-free plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.sources.bucketing import cobucketed_join, write_bucketed
from healthcare_data_warehouse_spark.sources.loaders import load_table

from conftest import SF_SMOKE


def test_cobucketed_join_has_no_exchange(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(li.select("o_orderkey", "l_extendedprice", "l_quantity"),
                   "b_lineitem", "o_orderkey", buckets=8)
    try:
        joined = cobucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join reads bucket files directly — no shuffle
        assert "Exchange hashpartitioning" not in plan
        # and it is still correct
        expect = (
            o.join(li, "o_orderkey")
            .agg(F.count("*"), F.sum(F.col("l_quantity").cast("decimal(18,4)")))
            .collect()[0]
        )
        got = (
            joined.agg(F.count("*"), F.sum(F.col("l_quantity").cast("decimal(18,4)")))
            .collect()[0]
        )
        assert tuple(expect) == tuple(got)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_order_layout_attach_reuses_completed_files(spark):
    """A NEW session forgets table metadata but the bucket files persist;
    the layout helper must re-ATTACH completed files (CREATE TABLE ...
    CLUSTERED BY ... LOCATION) instead of re-paying the write. Simulated
    by copying a completed managed write to a fresh warehouse name and
    asking the helper for it."""
    import os
    import shutil

    from healthcare_data_warehouse_spark.sources.bucketing import (
        _attach_or_write_bucketed,
        _warehouse_path,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice")
    write_bucketed(li, "bkt_attach_src", "l_orderkey", buckets=4)
    wh = _warehouse_path(spark)
    src, dst = os.path.join(wh, "bkt_attach_src"), os.path.join(wh, "bkt_attach_dst")
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst)
    calls = []

    def df_fn():
        calls.append(1)
        return li

    try:
        _attach_or_write_bucketed(spark, df_fn, "bkt_attach_dst",
                                  "l_orderkey", 4)
        assert spark.catalog.tableExists("bkt_attach_dst")
        # attached, not rewritten: df_fn consulted only for the schema,
        # and the attached table carries the bucket spec (exchange-free
        # self-join on the bucket key)
        j = cobucketed_join(spark, "bkt_attach_dst", "bkt_attach_src",
                            "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_attach_src")
        spark.sql("DROP TABLE IF EXISTS bkt_attach_dst")
        shutil.rmtree(dst, ignore_errors=True)
