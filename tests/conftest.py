from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Isolate mutable scratch state (audit log, upsert rewrites) from any
# concurrently running process — including a SECOND pytest run: two
# suites sharing one scratch dir race on the append-only audit log (one
# suite's rmtree deletes the other's events mid-test). PID-unique, so
# every pytest process owns its scratch; removed at session end below.
# Must be set before healthcare_data_warehouse_spark.config is imported.
os.environ.setdefault(
    "SPARK_GRAFT_SCRATCH",
    os.path.join(REPO, f".scratch-pytest-{os.getpid()}"),
)


def _sweep_stale_scratch() -> None:
    """Remove .scratch-pytest-<pid> dirs left by killed/crashed runs:
    a dir is stale iff its PID is no longer alive (kill -0 semantics).
    Runs once at collection start, before any test touches scratch."""
    import re
    import shutil

    for name in os.listdir(REPO):
        m = re.fullmatch(r"\.scratch-pytest-(\d+)", name)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(REPO, name), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid — not ours to sweep


_sweep_stale_scratch()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from healthcare_data_warehouse_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("hdw-tests")
    yield spark
    spark.stop()


def pytest_sessionfinish(session, exitstatus):
    # Remove this process's scratch dir (only if it is the PID-unique one
    # set above — never a user-provided SPARK_GRAFT_SCRATCH).
    import shutil

    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "")
    if scratch.endswith(f".scratch-pytest-{os.getpid()}"):
        shutil.rmtree(scratch, ignore_errors=True)
