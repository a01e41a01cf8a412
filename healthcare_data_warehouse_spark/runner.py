"""End-to-end warehouse pipeline runner — the engine's "master DAG".

Reference analog: the Airflow orchestration (airflow_dags.py:127-162)
sequencing ETL (scripts/etl.py) → dbt transform → privacy audit
(privacy_engine.py) → ML (ml_pipeline.py). Here the whole DAG is one
Spark driver program; each stage materializes a layer (bronze dims/fact →
gold reports), audit events are appended per stage, and the run emits a
single JSON summary.

    python -m healthcare_data_warehouse_spark.runner \
        [--sf-dir /root/testdata/sf0.001] [--out .scratch/warehouse]

On a cluster the identical program is a spark-submit job triggered by any
scheduler; cadence (hourly ETL / daily transform / weekly ML,
airflow_dags.py:39-108) stays in the scheduler, not in engine code.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F

from .config import SCRATCH_DIR, SMOKE_SF_DIR
from .operators.privacy import privacy_audit_report
from .plans.star import dim_customer, dim_supplier, fact_orders, write_fact_partitioned
from .session import get_spark
from .sources.audit import log_audit, read_audit_log


def run_pipeline(spark, sf_dir: str, out_dir: str) -> dict:
    summary: dict = {"sf_dir": sf_dir, "out_dir": out_dir, "stages": {}}

    # --- Stage 1: ETL + dimensions (etl.py / dim_*.sql analog) ----------
    dim_c = dim_customer(spark, sf_dir)
    dim_s = dim_supplier(spark, sf_dir)
    dim_c.write.mode("overwrite").parquet(os.path.join(out_dir, "dim_customer"))
    dim_s.write.mode("overwrite").parquet(os.path.join(out_dir, "dim_supplier"))
    log_audit(spark, "LOAD", "dim_customer", details=f"sf_dir={sf_dir}")
    log_audit(spark, "LOAD", "dim_supplier", details=f"sf_dir={sf_dir}")
    summary["stages"]["dims"] = {
        "dim_customer_rows": dim_c.count(),
        "dim_supplier_rows": dim_s.count(),
    }

    # --- Stage 2: fact build, partitioned by year (fact_visits.sql) -----
    dim_c_back = spark.read.parquet(os.path.join(out_dir, "dim_customer"))
    fact = fact_orders(spark, sf_dir, dim_c=dim_c_back)
    write_fact_partitioned(fact, os.path.join(out_dir, "fact_orders"))
    log_audit(spark, "LOAD", "fact_orders", details=f"sf_dir={sf_dir}")
    fact_back = spark.read.parquet(os.path.join(out_dir, "fact_orders"))
    summary["stages"]["fact"] = {
        "rows": fact_back.count(),
        "partitions": sorted(
            r["order_year"] for r in fact_back.select("order_year").distinct().collect()
        ),
        "noise_clamped_negative_rows": fact_back.filter(
            F.col("cost_with_privacy") < 0
        ).count(),
    }

    # --- Stage 3: privacy audit (privacy_engine.py analog) --------------
    from .sources.loaders import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "c_mktsegment", "c_nationkey", "o_orderpriority"
    )
    summary["stages"]["privacy_audit"] = privacy_audit_report(
        joined, ["c_mktsegment", "c_nationkey"], "o_orderpriority"
    )

    # --- Stage 4: ML (ml_pipeline.py analog) ----------------------------
    from .ml.pipeline import anomaly_scores, predict_readmission
    from .sources.sinks import upsert_to_path

    preds = predict_readmission(spark, sf_dir)
    stored = upsert_to_path(
        spark, os.path.join(out_dir, "ml_predictions"), preds, ["visit_id"]
    )
    anomalies = anomaly_scores(spark, sf_dir)
    summary["stages"]["ml"] = {
        "predictions": stored.count(),
        "anomalies_flagged": anomalies.count(),
    }

    # --- Stage 5: audit trail summary (Q10 analog) ----------------------
    audit = read_audit_log(spark)
    summary["stages"]["audit_log"] = {
        "events": audit.count(),
        "by_action": {
            r["action_type"]: r["count"]
            for r in audit.groupBy("action_type").count().collect()
        },
    }
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=SMOKE_SF_DIR)
    ap.add_argument("--out", default=os.path.join(SCRATCH_DIR, "warehouse"))
    args = ap.parse_args()
    spark = get_spark("hdw-pipeline")
    summary = run_pipeline(spark, args.sf_dir, args.out)
    print(json.dumps(summary, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
