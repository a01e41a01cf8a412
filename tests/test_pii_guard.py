"""Tests for the PII plan-scan guard."""

from __future__ import annotations

import pytest

from healthcare_data_warehouse_spark.operators.pii_guard import (
    PIILeakError,
    assert_no_pii_scan,
    pii_scan_report,
)
from healthcare_data_warehouse_spark.plans import catalog
from healthcare_data_warehouse_spark.plans.star import dim_customer
from healthcare_data_warehouse_spark.sources.loaders import load_table

from conftest import SF_SMOKE

# Serving/gold queries that must never physically read the raw name.
GOLD_QUERIES = [
    "agg_by_agegroup", "agg_monthly_trend", "topk_diagnoses", "leftjoin_agg",
    "join_3way", "privacy_k_anon", "privacy_l_div", "privacy_t_close",
    "geo_distribution", "case_visit_cohorts",
]


@pytest.mark.parametrize("name", GOLD_QUERIES)
def test_gold_queries_never_scan_pii(spark, name):
    df = catalog.queries()[name](spark, SF_SMOKE)
    assert_no_pii_scan(df)  # raises on leak


def test_raw_select_is_flagged(spark):
    leaky = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    assert pii_scan_report(leaky) == {"c_name"}
    with pytest.raises(PIILeakError):
        assert_no_pii_scan(leaky)


def test_dim_builder_licensed_to_hash(spark):
    # the dim builder must read c_name (to sha2 it) — explicit allow
    dim = dim_customer(spark, SF_SMOKE)
    assert_no_pii_scan(dim, allow=("c_name",))
    # and its OUTPUT carries no raw name column
    assert "c_name" not in dim.columns


def test_pruning_removes_unused_pii(spark):
    # selecting around PII means the scan never reads it — the Catalyst
    # property the guard is built on
    df = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_acctbal")
    assert pii_scan_report(df) == set()


def test_materialize_gold_blocks_pii_plan(spark, tmp_path, monkeypatch):
    # the gold materializer must refuse to write a card whose physical
    # plan scans a PII column (SURVEY §7.3: enforced, not conventional)
    from healthcare_data_warehouse_spark.plans import gold

    def leaky(spark, sf_dir):
        return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")

    real = catalog.queries()
    monkeypatch.setattr(gold.catalog, "queries",
                        lambda: {**real, "leaky_names": leaky})
    gold_dir = str(tmp_path / "gold")
    with pytest.raises(PIILeakError):
        gold.materialize_gold(spark, SF_SMOKE, gold_dir,
                              queries=("leaky_names",))
    import os
    assert not os.path.exists(os.path.join(gold_dir, "leaky_names"))


def test_materialize_gold_pii_check_on_real_cards(spark, tmp_path):
    # the default card set passes the enforced check end-to-end
    from healthcare_data_warehouse_spark.plans import gold

    manifest = gold.materialize_gold(
        spark, SF_SMOKE, str(tmp_path / "gold"),
        queries=("agg_by_agegroup",))
    assert manifest["tables"]["agg_by_agegroup"]["rows"] > 0


def test_fact_builder_output_carries_no_pii(spark):
    # the ETL builder is licensed to SCAN c_name (staging validity
    # filter + dim hashing) but its output must never carry it — the
    # guard inside fact_orders raises if a future edit threads it through
    from healthcare_data_warehouse_spark.plans.star import fact_orders

    fact = fact_orders(spark, SF_SMOKE)
    assert "c_name" not in fact.columns
