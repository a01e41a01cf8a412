"""MLlib pipeline tests (reference model configs: RF 100 trees,
depth 10/15, seeded splits, 5% contamination analog)."""

from __future__ import annotations

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.ml.pipeline import (
    anomaly_scores,
    build_features,
    predict_readmission,
    train_cost_model,
    train_readmission_model,
)

from conftest import SF_SMOKE


def test_features_complete(spark):
    feats = build_features(spark, SF_SMOKE)
    n = feats.count()
    assert n > 0
    nulls = feats.filter(
        F.col("visit_count").isNull() | F.col("avg_cost").isNull()
        | F.col("days_since_visit").isNull() | F.col("readmitted_30d").isNull()
    ).count()
    assert nulls == 0
    assert set(r["readmitted_30d"] for r in feats.select("readmitted_30d").distinct().collect()) <= {0, 1}


def test_readmission_model_trains_and_scores(spark):
    feats = build_features(spark, SF_SMOKE)
    model, assembler, test = train_readmission_model(feats)
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    scored = model.transform(test)
    auc = BinaryClassificationEvaluator(labelCol="readmitted_30d").evaluate(scored)
    assert 0.0 <= auc <= 1.0  # synthetic uniform dates → no signal expected


def test_predict_readmission_output_shape(spark):
    preds = predict_readmission(spark, SF_SMOKE)
    assert preds.filter(
        (F.col("readmission_risk") < 0) | (F.col("readmission_risk") > 1)
    ).count() == 0
    assert set(preds.columns) == {
        "customer_id", "visit_id", "readmission_risk", "predicted_readmit"
    }


def test_cost_model_rmse_reasonable(spark):
    feats = build_features(spark, SF_SMOKE)
    model, assembler, test = train_cost_model(feats)
    from pyspark.ml.evaluation import RegressionEvaluator

    scored = model.transform(test)
    rmse = RegressionEvaluator(labelCol="cost", metricName="rmse").evaluate(scored)
    assert rmse > 0


def test_anomaly_rate_about_one_percent(spark):
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    total = load_table(spark, SF_SMOKE, "orders").count()
    flagged = anomaly_scores(spark, SF_SMOKE, q=0.99).count()
    assert 0 < flagged <= total * 0.02


def test_ml_predictions_upsert_roundtrip(spark, tmp_path):
    """The reference's score -> upsert ml_predictions -> requery loop
    (ml_pipeline.py:350-361, api.py:388-400), pinned end to end."""
    from healthcare_data_warehouse_spark.sources.sinks import upsert_to_path

    path = str(tmp_path / "ml_predictions")
    preds = predict_readmission(spark, SF_SMOKE)
    stored = upsert_to_path(spark, path, preds, ["visit_id"])
    n = stored.count()
    assert n == preds.count()

    # Idempotent re-upsert: same keys, same count
    again = upsert_to_path(spark, path, preds, ["visit_id"])
    assert again.count() == n

    # Updated scores win on conflict: bump one visit's risk to 1.0.
    # NOTE: handles from before a rewrite are stale (plain parquet has no
    # snapshot isolation) — always use the frame the last upsert returned.
    one = again.orderBy("visit_id").limit(1)
    vid = one.collect()[0]["visit_id"]
    update = one.withColumn("readmission_risk", F.lit(1.0))
    merged = upsert_to_path(spark, path, update, ["visit_id"])
    assert merged.count() == n
    got = merged.filter(F.col("visit_id") == vid).collect()[0]
    assert got["readmission_risk"] == 1.0

    # Requery path: top-risk listing reads the stored table only
    top = spark.read.parquet(path).orderBy(
        F.desc("readmission_risk"), F.asc("visit_id")).limit(5).collect()
    assert top[0]["visit_id"] == vid


def test_anomaly_listing_roundtrip_matches_quantile(spark):
    from healthcare_data_warehouse_spark.plans.catalog import queries

    listing = queries()["anomaly_listing"](spark, SF_SMOKE).collect()
    direct = (
        anomaly_scores(spark, SF_SMOKE)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20).collect()
    )
    assert [r["o_orderkey"] for r in listing] == [r["o_orderkey"] for r in direct]


def test_kpi_block_single_fact_scan(spark):
    from healthcare_data_warehouse_spark.plans.catalog import queries

    df = queries()["kpi_block"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one pass over the fact: exactly one orders scan (the reference's
    # 4-subquery KPI card scans fact_visits twice)
    assert plan.count("orders.parquet") == 1
    row = df.collect()[0]
    assert row["total_visits"] > 0 and row["total_patients"] > 0


def test_patient_segments_shape_and_coverage(spark):
    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    rows = entrymod.queries()["ml_patient_segments"](spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 4                      # k=4, some may be empty
    assert sum(r["n_patients"] for r in rows) > 0   # every patient assigned
    for r in rows:
        assert r["avg_frequency"] >= 1.0


def test_model_eval_reports_sane_metrics(spark):
    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    row = entrymod.queries()["ml_model_eval"](spark, SF_SMOKE).collect()[0]
    assert row["n_test"] > 0
    assert 0.0 <= row["auc"] <= 1.0
    assert 0.0 <= row["accuracy"] <= 1.0
    assert 0.0 <= row["base_rate"] <= 1.0
