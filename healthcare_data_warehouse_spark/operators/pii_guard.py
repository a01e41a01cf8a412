"""PII-leak plan validation (SURVEY.md §7.3 stretch goal).

The reference enforces "PII never leaves staging" purely by convention —
dim_patients.sql:10-17 just doesn't select phone/email/address, and
nothing stops a new query from joining the raw table back in. Here the
invariant is *checked against the physical plan*: Catalyst's column
pruning means a query that doesn't need a PII column won't scan it, so
inspecting the parquet ``ReadSchema`` of every scan in the executed plan
tells us exactly which PII columns a query would physically read.

``assert_no_pii_scan`` is the gate: call it on any gold/serving query
before shipping it; it raises if the plan reads a PII column. (A full
Catalyst rule would hook the same check into the optimizer; plan
inspection gives the identical guarantee without a JVM extension.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# PII columns of the driver schema (c_name is the patient_name analog;
# the reference's phone/email/address have no driver-table counterpart).
DEFAULT_PII = ("c_name",)


class PIILeakError(Exception):
    pass


def scanned_columns(df: DataFrame) -> set[str]:
    """Columns physically read from parquet by this plan (post-pruning)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def pii_scan_report(df: DataFrame, pii_cols: tuple[str, ...] = DEFAULT_PII) -> set[str]:
    """Which PII columns would this plan physically read?"""
    return scanned_columns(df) & set(pii_cols)


def assert_no_pii_scan(df: DataFrame, pii_cols: tuple[str, ...] = DEFAULT_PII,
                       allow: tuple[str, ...] = ()) -> DataFrame:
    """Raise PIILeakError if the plan reads a PII column not in ``allow``.

    ``allow`` whitelists columns a pipeline is licensed to read (the dim
    builder must read c_name to hash it; serving queries must not)."""
    leaked = pii_scan_report(df, pii_cols) - set(allow)
    if leaked:
        raise PIILeakError(
            f"plan physically reads PII columns {sorted(leaked)}; "
            "project them away (or hash at the staging boundary) so column "
            "pruning removes them from the scan"
        )
    return df
