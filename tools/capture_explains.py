"""Capture .explain('formatted') for named catalog queries to files.

    python tools/capture_explains.py <out_dir> <suffix> <sf_dir> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: the bench
HEADLINE list). The round's plan-evidence deliverable.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir, suffix, sf_dir = sys.argv[1:4]
    names = sys.argv[4:]
    import bench
    from healthcare_data_warehouse_spark.plans.catalog import queries
    from healthcare_data_warehouse_spark.session import get_spark

    registry = queries()
    if not names:
        names = list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-explains")
    for n in names:
        df = registry[n](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as fh:
            fh.write(f"# {n} @ {sf_dir} — explain('formatted')\n")
            fh.write(buf.getvalue())
        print(n, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
