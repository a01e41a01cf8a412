"""Aggregate navigator: materialized-rollup query routing.

The warehouse capability commercial engines call materialized-view
rewrite (Snowflake MVs, BigQuery BI Engine, Oracle query rewrite):
queries whose grain is a SUBSET of a materialized rollup's grain are
answered from the (tiny) rollup instead of scanning the fact. Spark's
Catalyst has no MV matching, so the routing decision is made here,
explicitly — the Spark-first shape is a deliberate materialization
boundary plus monoid re-aggregation, not an optimizer hook.

Correct by construction, not approximately: rollups store MERGEABLE
partial states (operators/incremental.py discipline — count, exact
DECIMAL sum, min, max), and any coarser grain re-aggregates those
partials with the monoid ops (sum of counts, sum of decimal sums, min
of mins, max of maxes). Exact decimal sums are associative, so the
navigated answer is bit-identical to aggregating the fact directly —
the oracle for a navigated query is the plain fact-level SQL.

At 100 TB: the fact is scanned once per refresh to build each rollup
(incremental CDC maintenance via refresh_state_from_diff composes);
every routed query then touches only rollup rows — grain cardinality,
not fact cardinality. The navigator picks the smallest registered
rollup that can answer (fewest grain columns ⇒ coarsest ⇒ cheapest).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import partial_agg

STATE_COLS = ("cnt", "sum_dec", "min_v", "max_v")


@dataclass(frozen=True)
class Rollup:
    """A materialized rollup: partial states of one measure at a grain."""

    name: str
    path: str
    grain: tuple[str, ...]


def build_rollup(df: DataFrame, grain: list[str], measure: str,
                 path: str, name: str | None = None) -> Rollup:
    """Materialize the partial-state rollup of ``df`` at ``grain``.

    ``df`` must already carry the grain columns (derive month/bucket
    columns before calling — the rollup stores them as plain columns, so
    the navigator never needs the derivation logic). One groupBy over
    the fact; output size = grain cardinality."""
    state = partial_agg(df.select(*grain, measure), list(grain), measure)
    state.write.mode("overwrite").parquet(path)
    return Rollup(name or os.path.basename(path), path, tuple(grain))


def can_answer(rollup: Rollup, want_grain: list[str]) -> bool:
    """A rollup answers any grain that is a subset of its own."""
    return set(want_grain) <= set(rollup.grain)


def pick_rollup(rollups: list[Rollup], want_grain: list[str]) -> Rollup | None:
    """Smallest (coarsest) registered rollup that can answer, or None —
    the caller falls back to the fact scan."""
    fits = [r for r in rollups if can_answer(r, want_grain)]
    return min(fits, key=lambda r: len(r.grain)) if fits else None


def navigate(spark: SparkSession, rollup: Rollup,
             want_grain: list[str]) -> DataFrame:
    """Answer ``want_grain`` from the rollup: monoid re-aggregation of
    the stored partials, then finalization (n / exact-sum-as-double /
    avg / min / max). No fact scan appears anywhere in this plan."""
    if not can_answer(rollup, want_grain):
        raise ValueError(
            f"rollup {rollup.name} (grain {rollup.grain}) cannot answer "
            f"grain {want_grain}")
    state = spark.read.parquet(rollup.path)
    merged = state.groupBy(*want_grain).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
    return merged.select(
        *want_grain,
        F.col("cnt").alias("n"),
        F.col("sum_dec").cast("double").alias("sum_v"),
        (F.col("sum_dec").cast("double") / F.col("cnt")).alias("avg_v"),
        "min_v",
        "max_v",
    )


def month_of(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("month", c.cast("date")).cast("date")
