"""Scheduling recipe: the reference's Airflow DAG layer, cron-native.

Reference analog: airflow_dags.py:35-162 defines five DAGs whose tasks
only shell out to pipeline entry points (BashOperator over etl.py /
dbt run / ml scripts) on cron schedules. The faithful Spark-side
equivalent is therefore NOT an orchestrator daemon — it is a declarative
job registry (name → schedule → ordered stages over the engine's real
entry points) plus a tiny runner that executes one job's stages in
order, stops on the first failure (Airflow's default trigger rule), and
emits a JSON status line per stage for the surrounding scheduler (cron,
systemd timers, or a real Airflow install pointing BashOperator at
``python -m healthcare_data_warehouse_spark.scheduler <job>``).

At 100 TB nothing changes: each stage is already a distributed Spark
job; the scheduler layer only sequences driver processes.

``crontab_lines()`` renders the reference's five schedules verbatim so
the deployment recipe is copy-pasteable (RUNBOOK "Scheduling").
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass, field
from typing import Callable


@dataclass(frozen=True)
class Job:
    name: str
    schedule: str           # standard 5-field cron expression
    description: str
    stages: tuple[str, ...]  # ordered stage names; fail-fast sequencing
    ref: str                 # reference DAG this mirrors (file:line)


# The five reference DAGs (airflow_dags.py), mapped onto engine
# entry points. `daily_data_generation` maps to the scale-fixture
# generator — the driver owns the real testdata, so it regenerates
# derived scale points rather than synthesizing new source data.
JOBS: dict[str, Job] = {
    j.name: j for j in (
        Job("hourly_etl", "0 * * * *",
            "dims + fact + gold-ready warehouse parquet",
            ("etl_pipeline",), "airflow_dags.py:59-78 (hourly_etl_pipeline)"),
        Job("daily_gold_refresh", "0 2 * * *",
            "materialize the dashboard card set from the warehouse",
            ("gold_refresh",), "airflow_dags.py:81-103 (daily dbt refresh)"),
        Job("weekly_ml_retrain", "0 3 * * 0",
            "refit readmission model, upsert predictions store",
            ("ml_predictions",), "airflow_dags.py:106-126 (weekly retrain)"),
        Job("daily_corpus_funnel", "0 1 * * *",
            "LLM-corpus clean/dedup/decontaminate/pack funnel",
            ("corpus_funnel",), "airflow_dags.py:35-56 (daily generation slot)"),
        Job("weekly_master", "0 4 * * 0",
            "full sequence: ETL -> gold -> ML -> corpus",
            ("etl_pipeline", "gold_refresh", "ml_predictions",
             "corpus_funnel"),
            "airflow_dags.py:129-162 (master_pipeline)"),
    )
}


def _stage_impls(spark, sf_dir: str, out_dir: str) -> dict[str, Callable[[], dict]]:
    """Stage name → thunk running one engine entry point. Imports are
    deferred so listing jobs / rendering crontabs never starts Spark."""
    import os

    def etl_pipeline() -> dict:
        from .runner import run_pipeline
        return run_pipeline(spark, sf_dir, os.path.join(out_dir, "warehouse"))

    def gold_refresh() -> dict:
        from .plans.gold import materialize_gold
        return materialize_gold(spark, sf_dir, os.path.join(out_dir, "gold"))

    def ml_predictions() -> dict:
        from .ml.pipeline import predict_readmission
        from .sources.sinks import upsert_to_path
        preds = predict_readmission(spark, sf_dir)
        path = os.path.join(out_dir, "ml_predictions")
        merged = upsert_to_path(spark, path, preds,
                                keys=["customer_id", "visit_id"])
        return {"rows": merged.count(), "path": path}

    def corpus_funnel() -> dict:
        from .corpus_runner import run_corpus_pipeline
        return run_corpus_pipeline(spark, sf_dir,
                                   os.path.join(out_dir, "corpus"))

    return {f.__name__: f for f in
            (etl_pipeline, gold_refresh, ml_predictions, corpus_funnel)}


def run_job(spark, job_name: str, sf_dir: str, out_dir: str) -> dict:
    """Execute one job's stages in order, fail-fast. Returns (and the
    CLI prints) a JSON-able status: per-stage ok/seconds, first error."""
    job = JOBS[job_name]
    impls = _stage_impls(spark, sf_dir, out_dir)
    status: dict = {"job": job.name, "stages": [], "ok": True}
    for stage in job.stages:
        t0 = time.perf_counter()
        try:
            result = impls[stage]()
            status["stages"].append({
                "stage": stage, "ok": True,
                "seconds": round(time.perf_counter() - t0, 2),
                "summary_keys": sorted(result)[:8] if isinstance(result, dict) else [],
            })
        except Exception as exc:  # fail-fast: downstream stages don't run
            status["stages"].append({
                "stage": stage, "ok": False,
                "seconds": round(time.perf_counter() - t0, 2),
                "error": f"{type(exc).__name__}: {exc}",
            })
            status["ok"] = False
            break
    return status


def crontab_lines(repo_root: str = "/root/repo",
                  sf_dir: str = "/root/testdata/sf0.1",
                  out_dir: str = "/tmp/hdw_out") -> list[str]:
    """The deployable recipe: one crontab line per job, schedules taken
    from the reference DAGs."""
    return [
        f"{j.schedule} cd {repo_root} && python -m "
        f"healthcare_data_warehouse_spark.scheduler {j.name} "
        f"--sf-dir {sf_dir} --out {out_dir} >> /var/log/hdw_{j.name}.log 2>&1"
        for j in JOBS.values()
    ]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("job", nargs="?", choices=sorted(JOBS) + ["crontab"],
                    default="crontab")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/hdw_out")
    args = ap.parse_args()
    if args.job == "crontab":
        print("\n".join(crontab_lines(sf_dir=args.sf_dir, out_dir=args.out)))
        return
    from .session import get_spark
    spark = get_spark(f"hdw-sched-{args.job}")
    status = run_job(spark, args.job, args.sf_dir, args.out)
    print(json.dumps(status, default=str))
    spark.stop()
    sys.exit(0 if status["ok"] else 1)


if __name__ == "__main__":
    main()
