"""Per-query fixed-overhead profile: wall, Spark JOB and STAGE counts.

At sf0.1 every headline query is seconds or less, so wall clock is
dominated by per-job scheduling + planning + per-stage task launch, not
data. This tool maps that overhead: for each query it times a noop-sink
materialization (bench methodology) and counts how many jobs and stages
the query submitted via the status tracker — the direct measure of the
fixed costs a query pays before a single byte moves.

    python tools/job_profile.py <sf_dir> [query ...]   (default: bench HEADLINE)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    import bench
    from healthcare_data_warehouse_spark.plans.catalog import queries
    from healthcare_data_warehouse_spark.session import get_spark

    registry = queries()
    if not names:
        names = list(bench.HEADLINE)
    unknown = [n for n in names if n not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("job-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(name: str, d: str) -> None:
        registry[name](spark, d).write.format("noop").mode("overwrite").save()

    for n in names:  # warm JIT/codegen like bench.py
        run(n, "/root/testdata/sf0.001")

    print(f"{'query':32s} {'wall_s':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    rows = []
    for n in names:
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        # second warm run at target SF so timing matches bench's min-of-2
        t0 = time.perf_counter()
        run(n, sf_dir)
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n, sf_dir)
        wall = min(w1, time.perf_counter() - t0)
        jobs1 = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs1 - jobs0)
        n_stages = n_tasks = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        # counts cover BOTH timed runs — report per-run halves
        rows.append((n, wall, len(new_jobs) / 2, n_stages / 2, n_tasks / 2))
        print(f"{n:32s} {wall:7.3f} {len(new_jobs)/2:5.1f} "
              f"{n_stages/2:7.1f} {n_tasks/2:6.0f}", flush=True)
    rows.sort(key=lambda r: -r[1])
    print("\n# sorted by wall")
    for n, wall, j, s, t in rows:
        print(f"{n:32s} {wall:7.3f} {j:5.1f} {s:7.1f} {t:6.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
