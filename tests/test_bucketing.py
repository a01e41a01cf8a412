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
