"""Tests for the serving layer (budget enforcement + audit + limit)."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from healthcare_data_warehouse_spark.plans.serving import BudgetExhaustedError, QueryService
from healthcare_data_warehouse_spark.sources.audit import audit_log_path, read_audit_log

from conftest import SF_SMOKE


def test_run_query_with_limit_and_audit(spark):
    shutil.rmtree(audit_log_path(), ignore_errors=True)
    svc = QueryService(spark, SF_SMOKE, user="alice")
    df = svc.run("topk_diagnoses", limit=2)
    assert df.count() == 2
    log = read_audit_log(spark)
    rows = log.filter((F.col("table_name") == "topk_diagnoses")
                      & (F.col("user_name") == "alice")).collect()
    assert len(rows) == 1 and rows[0]["action_type"] == "READ"
    shutil.rmtree(audit_log_path(), ignore_errors=True)


def test_dp_budget_enforced(spark):
    shutil.rmtree(audit_log_path(), ignore_errors=True)
    svc = QueryService(spark, SF_SMOKE)
    # epsilon budget 1.0, each DP query costs 0.1 → 10 runs allowed
    for _ in range(10):
        svc.run("fn_laplace_noise").count()
    assert svc.budget.remaining < 1e-9
    with pytest.raises(BudgetExhaustedError):
        svc.run("fn_laplace_noise")
    # non-DP queries still served after exhaustion
    assert svc.run("point_lookup").count() == 1
    shutil.rmtree(audit_log_path(), ignore_errors=True)


def test_unknown_query_rejected(spark):
    svc = QueryService(spark, SF_SMOKE)
    with pytest.raises(KeyError):
        svc.run("no_such_query")
    assert "agg_by_agegroup" in svc.available_queries()


def test_gold_materialization_roundtrip(spark):
    import os

    from healthcare_data_warehouse_spark.config import SCRATCH_DIR
    from healthcare_data_warehouse_spark.plans.catalog import queries
    from healthcare_data_warehouse_spark.plans.gold import materialize_gold, read_gold

    gold_dir = os.path.join(SCRATCH_DIR, "gold_test")
    shutil.rmtree(gold_dir, ignore_errors=True)
    manifest = materialize_gold(spark, SF_SMOKE, gold_dir,
                                queries=("agg_by_agegroup", "topk_diagnoses"))
    assert set(manifest["tables"]) == {"agg_by_agegroup", "topk_diagnoses"}
    # gold read equals a fresh computation
    live = {tuple(r) for r in queries()["agg_by_agegroup"](spark, SF_SMOKE).collect()}
    gold = {tuple(r) for r in read_gold(spark, gold_dir, "agg_by_agegroup").collect()}
    assert live == gold
    # dashboard read never scans the fact tables
    plan = read_gold(spark, gold_dir, "agg_by_agegroup")._jdf.queryExecution().executedPlan().toString()
    assert "orders.parquet" not in plan and "customer.parquet" not in plan
    shutil.rmtree(gold_dir, ignore_errors=True)
