"""Tests for erasure propagation and compaction."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.config import SCRATCH_DIR
from healthcare_data_warehouse_spark.runner import run_pipeline
from healthcare_data_warehouse_spark.sources.audit import audit_log_path
from healthcare_data_warehouse_spark.sources.maintenance import compact_table, forget_patients

from conftest import SF_SMOKE


def test_forget_patients_and_compact(spark):
    out = os.path.join(SCRATCH_DIR, "warehouse_gdpr")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(audit_log_path(), ignore_errors=True)
    run_pipeline(spark, SF_SMOKE, out)

    victims = [1, 2, 3]
    fact_before = spark.read.parquet(os.path.join(out, "fact_orders"))
    expected_fact_removed = fact_before.filter(F.col("o_custkey").isin(victims)).count()

    removed = forget_patients(spark, out, victims)
    assert removed["dim_customer"] == 3
    assert removed["fact_orders"] == expected_fact_removed > 0

    dim_after = spark.read.parquet(os.path.join(out, "dim_customer"))
    fact_after = spark.read.parquet(os.path.join(out, "fact_orders"))
    assert dim_after.filter(F.col("c_custkey").isin(victims)).count() == 0
    assert fact_after.filter(F.col("o_custkey").isin(victims)).count() == 0
    # partitioning survived the rewrite
    assert any(d.startswith("order_year=") for d in os.listdir(os.path.join(out, "fact_orders")))

    # compaction: down to ~1 file per partition, data intact
    # (snapshot counts BEFORE the rewrite — the old DataFrame's file
    # listing goes stale once compaction replaces the directory)
    n_rows = fact_after.count()
    years = fact_after.select("order_year").distinct().count()
    n_files = compact_table(spark, os.path.join(out, "fact_orders"), "order_year")
    assert n_files <= years + 1
    assert spark.read.parquet(os.path.join(out, "fact_orders")).count() == n_rows

    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(audit_log_path(), ignore_errors=True)
