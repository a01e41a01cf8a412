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
