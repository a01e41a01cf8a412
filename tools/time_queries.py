"""Ad-hoc wall-clock timing for arbitrary catalog queries.

Usage: python tools/time_queries.py <sf_dir> <query> [query ...]

Times a noop-sink write of each named catalog query — the same full
materialization bench.py uses (a count() would let Catalyst prune the
whole projection on map-only queries) — without the bench HEADLINE
subset restriction. For back-to-back A/B runs while iterating on a
single query's plan (bench.py stays the official headline gate).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from healthcare_data_warehouse_spark.plans.catalog import queries
    from healthcare_data_warehouse_spark.session import get_spark

    registry = queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; see plans/catalog.py")

    spark = get_spark("time-queries")

    def run(name: str, d: str) -> None:
        registry[name](spark, d).write.format("noop").mode("overwrite").save()

    # Same methodology as bench.py: warm JIT/codegen at the smallest SF,
    # then min-of-2 timed runs at the target SF.
    for n in names:
        run(n, "/root/testdata/sf0.001")
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run(n, sf_dir)
            best = min(best, time.time() - t0)
        print(f"{n}: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
