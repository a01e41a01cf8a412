"""Scheduling recipe tests: the cron-native DAG layer
(reference airflow_dags.py:35-162)."""

from __future__ import annotations

import json

from healthcare_data_warehouse_spark.scheduler import (
    JOBS,
    crontab_lines,
    run_job,
)

from conftest import SF_SMOKE


def test_job_registry_mirrors_reference_dags():
    # five DAGs, reference-cited, cron schedules preserved
    assert set(JOBS) == {"hourly_etl", "daily_gold_refresh",
                         "weekly_ml_retrain", "daily_corpus_funnel",
                         "weekly_master"}
    for j in JOBS.values():
        assert len(j.schedule.split()) == 5  # valid 5-field cron
        assert "airflow_dags.py" in j.ref
        assert j.stages
    # master sequences every other job's stage, in dependency order
    assert JOBS["weekly_master"].stages == (
        "etl_pipeline", "gold_refresh", "ml_predictions", "corpus_funnel")


def test_crontab_lines_are_deployable():
    lines = crontab_lines()
    assert len(lines) == len(JOBS)
    for line in lines:
        # schedule, module invocation, job name, logging — all present
        assert "python -m healthcare_data_warehouse_spark.scheduler" in line
        assert ">>" in line


def test_run_job_executes_stages_and_reports(spark, tmp_path):
    status = run_job(spark, "daily_gold_refresh", SF_SMOKE, str(tmp_path))
    assert status["ok"] is True
    assert [s["stage"] for s in status["stages"]] == ["gold_refresh"]
    assert status["stages"][0]["seconds"] >= 0
    json.dumps(status, default=str)  # CLI-printable


def test_run_job_fail_fast_stops_downstream(spark, tmp_path, monkeypatch):
    # a failing first stage must record the error and skip the rest
    from healthcare_data_warehouse_spark import scheduler

    real = scheduler._stage_impls

    def broken(spark, sf_dir, out_dir):
        impls = real(spark, sf_dir, out_dir)

        def boom():
            raise RuntimeError("stage exploded")

        impls["etl_pipeline"] = boom
        return impls

    monkeypatch.setattr(scheduler, "_stage_impls", broken)
    status = run_job(spark, "weekly_master", SF_SMOKE, str(tmp_path))
    assert status["ok"] is False
    assert len(status["stages"]) == 1  # fail-fast: gold/ml/corpus skipped
    assert "stage exploded" in status["stages"][0]["error"]


def test_run_job_ml_retrain_stage_e2e(spark, tmp_path):
    # the weekly retrain job end-to-end: model fit, score, idempotent
    # predictions upsert — rerunning the job must not duplicate rows
    status = run_job(spark, "weekly_ml_retrain", SF_SMOKE, str(tmp_path))
    assert status["ok"] is True, status
    import os

    path = os.path.join(str(tmp_path), "ml_predictions")
    n1 = spark.read.parquet(path).count()
    assert n1 > 0
    status2 = run_job(spark, "weekly_ml_retrain", SF_SMOKE, str(tmp_path))
    assert status2["ok"] is True
    assert spark.read.parquet(path).count() == n1  # upsert, not append
