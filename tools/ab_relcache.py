"""Interleaved same-session A/B for the load_table relation cache.

Full-run before/after comparisons on this host are weather-dominated
(multi-second slow windows smear bands of consecutive queries, r9/r10
provenance notes). This harness removes the weather: for every headline
query it alternates no-cache / cache runs back-to-back in ONE session —
both arms see the same windows — and reports min-of-2 per arm.

    python tools/ab_relcache.py <sf_dir> [query ...]
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

    spark = get_spark("ab-relcache")

    def run(name: str, d: str) -> float:
        t0 = time.perf_counter()
        registry[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for n in names:  # warm JIT/codegen
        run(n, "/root/testdata/sf0.001")

    tot_a = tot_b = 0.0
    print(f"{'query':28s} {'nocache':>8s} {'cache':>8s} {'ratio':>6s}")
    for n in names:
        a = b = float("inf")
        for _ in range(2):
            os.environ["SPARK_GRAFT_NO_RELCACHE"] = "1"
            a = min(a, run(n, sf_dir))
            os.environ.pop("SPARK_GRAFT_NO_RELCACHE", None)
            b = min(b, run(n, sf_dir))
        tot_a += a
        tot_b += b
        print(f"{n:28s} {a:8.3f} {b:8.3f} {b/a:6.2f}", flush=True)
    print(f"{'TOTAL':28s} {tot_a:8.3f} {tot_b:8.3f} {tot_b/tot_a:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
