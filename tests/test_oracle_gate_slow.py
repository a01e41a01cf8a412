"""Driver-scale oracle gate as an opt-in pytest suite.

The default suite already oracle-checks every catalog query at sf0.001
(tests/test_catalog_oracle.py). This marked suite repeats the identical
comparison at the DRIVER's scale factor (sf0.01, overridable via
SPARK_GRAFT_ORACLE_SF — e.g. the once-per-round sf0.1 sweep), so any
driver re-sample of the 208-query registry lands green before it happens:

    python -m pytest -m oracle_slow -q                       # sf0.01, ~10 min
    SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1 \
        python -m pytest -m oracle_slow -q                   # sf0.1, ~25 min

Runbook: docs/RUNBOOK.md.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tools.oracle_check import check_query

from conftest import SF_CORRECT

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", SF_CORRECT)

ALL_QUERIES = sorted(entrymod.queries())


@pytest.mark.oracle_slow
@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle_at_driver_sf(spark, name):
    problems = check_query(spark, name, SF_DIR)
    assert not problems, f"{name} @ {SF_DIR}: {problems}"
