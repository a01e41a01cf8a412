"""Declarative data-quality rules engine (dbt tests, engine-side).

The reference's DQ layer is dbt schema tests (dbt_project/models:
``not_null`` / ``unique`` / ``accepted_values`` / ``relationships`` per
column) — each compiled to its own SELECT. This module is the same
declarative contract evaluated Spark-side, with the row-local rules
FUSED: every not_null / range / accepted_values / regex check over one
table is a single conditional aggregation over ONE scan, however many
rules there are. Only rules that genuinely need their own shuffle
(unique → groupBy, relationships → anti-join) get one.

Rule = ``(rule_type, column, param)``; report = one row per rule:
``(rule, col_name, n_violations, passed)``.

At 100 TB: the fused row-local pass is scan-bound (and column-pruned to
just the checked columns); each ``unique`` is a two-phase count-over-key;
each ``relationships`` is one join where the dimension side broadcasts
while it fits. Run it per arriving partition instead of per table and
the same rules become the ingest gate.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative expectation on a column."""

    rule: str           # not_null | unique | accepted_values | in_range | matches
    column: str
    param: Any = None   # values list / (lo, hi) / regex

    @property
    def name(self) -> str:
        return f"{self.rule}:{self.column}"


def _violation_expr(r: Rule) -> Column:
    """Row-local violation predicate (NULL passes every rule except
    not_null — same semantics as dbt/SQL checks)."""
    c = F.col(r.column)
    if r.rule == "not_null":
        return c.isNull()
    if r.rule == "accepted_values":
        return c.isNotNull() & ~c.isin(list(r.param))
    if r.rule == "in_range":
        lo, hi = r.param
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if r.rule == "matches":
        return c.isNotNull() & ~c.rlike(r.param)
    raise ValueError(f"unknown row-local rule {r.rule!r}")


def dq_check(df: DataFrame, rules: list[Rule],
             ref_tables: dict[str, DataFrame] | None = None) -> DataFrame:
    """Evaluate ``rules`` against ``df``; one report row per rule.

    ``relationships`` rules take ``param=(ref_name, ref_column)`` and
    resolve the referenced table from ``ref_tables``.
    """
    if not rules:
        raise ValueError("dq_check: no rules")
    row_local = [r for r in rules
                 if r.rule in ("not_null", "accepted_values", "in_range", "matches")]
    uniques = [r for r in rules if r.rule == "unique"]
    rels = [r for r in rules if r.rule == "relationships"]
    known = {r.name for r in row_local + uniques + rels}
    unknown = [r for r in rules if r.name not in known]
    if unknown:
        raise ValueError(f"unknown rule type(s): {[r.rule for r in unknown]}")

    reports: list[DataFrame] = []

    if row_local:
        # ONE fused pass: every row-local rule is a conditional count in
        # the same aggregate (scan reads only the checked columns).
        agg = df.agg(*[
            F.sum(_violation_expr(r).cast("long")).alias(r.name)
            for r in row_local
        ])
        stack = ", ".join(f"'{r.rule}', '{r.column}', `{r.name}`"
                          for r in row_local)
        reports.append(agg.select(F.expr(
            f"stack({len(row_local)}, {stack}) AS (rule, col_name, n_violations)"
        )))

    for r in uniques:
        dup = (
            df.filter(F.col(r.column).isNotNull())
            .groupBy(r.column).count().filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum("count"), F.lit(0)).alias("n_violations"))
            .select(F.lit("unique").alias("rule"),
                    F.lit(r.column).alias("col_name"), "n_violations")
        )
        reports.append(dup)

    for r in rels:
        ref_name, ref_col = r.param
        if not ref_tables or ref_name not in ref_tables:
            raise ValueError(f"relationships rule needs ref_tables[{ref_name!r}]")
        ref = ref_tables[ref_name].select(F.col(ref_col).alias(r.column)).distinct()
        orphans = (
            df.filter(F.col(r.column).isNotNull())
            .join(ref, r.column, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit("relationships").alias("rule"),
                    F.lit(r.column).alias("col_name"), "n_violations")
        )
        reports.append(orphans)

    out = reduce(DataFrame.unionByName, reports)
    return out.select("rule", "col_name",
                      F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
                      (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"))
