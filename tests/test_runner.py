"""End-to-end pipeline runner test (the master-DAG analog)."""

from __future__ import annotations

import os
import shutil

from healthcare_data_warehouse_spark.config import SCRATCH_DIR
from healthcare_data_warehouse_spark.runner import run_pipeline
from healthcare_data_warehouse_spark.sources.audit import audit_log_path

from conftest import SF_SMOKE


def test_pipeline_end_to_end_and_rerun(spark):
    out = os.path.join(SCRATCH_DIR, "warehouse_test")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(audit_log_path(), ignore_errors=True)

    s1 = run_pipeline(spark, SF_SMOKE, out)
    assert s1["stages"]["dims"]["dim_customer_rows"] == 150
    assert s1["stages"]["fact"]["rows"] == 1500
    assert s1["stages"]["fact"]["noise_clamped_negative_rows"] == 0
    assert len(s1["stages"]["fact"]["partitions"]) >= 4
    assert set(s1["stages"]["privacy_audit"]) == {"k_anonymity", "l_diversity", "t_closeness"}
    assert s1["stages"]["ml"]["predictions"] == 1500
    assert s1["stages"]["audit_log"]["by_action"].get("LOAD") == 3

    # rerun: idempotent outputs (overwrite + upsert), audit appends
    s2 = run_pipeline(spark, SF_SMOKE, out)
    assert s2["stages"]["fact"]["rows"] == 1500
    assert s2["stages"]["ml"]["predictions"] == 1500      # upsert, not append
    assert s2["stages"]["audit_log"]["events"] == 6       # append-only trail

    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(audit_log_path(), ignore_errors=True)
