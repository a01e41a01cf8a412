from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Isolate mutable scratch state (audit log, upsert rewrites) from any
# concurrently running oracle_check/bench process, which uses the default
# .scratch — tests that count audit events must own their log. Must be set
# before healthcare_data_warehouse_spark.config is imported.
os.environ.setdefault("SPARK_GRAFT_SCRATCH", os.path.join(REPO, ".scratch-pytest"))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from healthcare_data_warehouse_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("hdw-tests")
    yield spark
    spark.stop()
