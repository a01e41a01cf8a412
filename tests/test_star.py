"""Tests for the star-schema model DAG (plans.star).

Checks both semantics (PII never leaves staging, SCD2 shape, noise clamp)
and the physical plan (dims broadcast into the fact join; partitioned
write prunes).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.config import SCRATCH_DIR
from healthcare_data_warehouse_spark.plans.star import (
    dim_customer,
    dim_supplier,
    fact_orders,
    write_fact_partitioned,
)

from conftest import SF_SMOKE


def test_dim_customer_shape_and_pii(spark):
    dim = dim_customer(spark, SF_SMOKE)
    cols = set(dim.columns)
    # PII projection invariant (dim_patients.sql:10-17): raw name never
    # reaches the dimension — only the sha256 hash.
    assert "c_name" not in cols
    assert {"customer_key", "anonymized_name", "balance_group", "valid_from",
            "valid_to", "is_current"} <= cols
    # surrogate keys dense from 1
    n = dim.count()
    stats = dim.agg(F.min("customer_key"), F.max("customer_key"),
                    F.countDistinct("customer_key")).collect()[0]
    assert tuple(stats) == (1, n, n)


def test_fact_orders_broadcasts_dim(spark):
    # plan-shape assertion: clear cached fragments so a fact build cached
    # by another test under a different broadcast threshold (the
    # surrogate-key stage persists an intermediate) can't be substituted
    spark.catalog.clearCache()
    fact = fact_orders(spark, SF_SMOKE)
    plan = fact._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # DP noise clamp (fact_visits.sql:40-44)
    assert fact.filter(F.col("cost_with_privacy") < 0).count() == 0


def test_fact_partitioned_write_prunes(spark):
    path = os.path.join(SCRATCH_DIR, "fact_orders_test")
    shutil.rmtree(path, ignore_errors=True)
    fact = fact_orders(spark, SF_SMOKE)
    write_fact_partitioned(fact, path)
    assert any(d.startswith("order_year=") for d in os.listdir(path))
    back = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter reached the scan → pruning, not a full read
    assert "order_year" in plan
    assert back.count() > 0
    shutil.rmtree(path, ignore_errors=True)


def test_dim_supplier_keys(spark):
    dim = dim_supplier(spark, SF_SMOKE)
    n = dim.count()
    assert dim.filter(F.col("is_current")).count() == n
