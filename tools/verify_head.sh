#!/usr/bin/env bash
# verify_head.sh — "artifacts reflect HEAD" pre-flight (r8 verdict item 8).
#
# One command that every perf/plan commit can run before landing bench
# evidence: the 50-query driver-window subset of the DuckDB oracle gate
# at sf0.01, plus the plan-shape pytest pins (the tests that assert
# HashAggregate/TakeOrderedAndProject/broadcast regimes survived the
# change). Fast (~4-5 min) vs the full 235-query gate (~11 min) — run
# the full gate per round, this per commit.
#
# Usage: tools/verify_head.sh [sf_dir]     (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"

echo "== verify_head @ $(git rev-parse --short HEAD)$(git status --porcelain --untracked-files=no | grep -q . && echo '+dirty' || true) =="

# 1. Driver-window oracle subset: the exact 50 rows the external gate
#    hash-checks, against DuckDB over the same parquet.
WINDOW="$(python - <<'PY'
from healthcare_data_warehouse_spark.plans.catalog import DRIVER_WINDOW
print(" ".join(DRIVER_WINDOW))
PY
)"
# shellcheck disable=SC2086
python tools/oracle_check.py "$SF_DIR" $WINDOW

# 2. Plan-shape pins: the pytest module that greps physical plans for
#    the regimes the bench numbers depend on (HashAggregate not
#    SortAggregate, TakeOrderedAndProject, broadcast thresholds).
python -m pytest tests/test_plan_shapes.py tests/test_catalog_oracle.py -x -q

echo "== verify_head: PASS =="
