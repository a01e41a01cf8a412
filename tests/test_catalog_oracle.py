"""The golden-oracle gate, locally: every catalog query vs DuckDB.

Mirrors the driver's CORRECTNESS check (row count + column set +
order-insensitive canonical values) at sf0.001 for speed; the driver runs
the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.oracle_check import check_query

from conftest import SF_SMOKE

ALL_QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, name):
    problems = check_query(spark, name, SF_SMOKE)
    assert not problems, f"{name}: {problems}"


def test_every_query_has_entry_or_rows_only():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "balance_group" in df.columns
