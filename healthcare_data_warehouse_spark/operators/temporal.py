"""Temporal join operators: as-of join and interval-range join.

Beyond-reference extensions (SURVEY.md §2.3 "not present" list). Spark has
no native ASOF JOIN; the scalable formulation is the union+window trick:

    tag both sides, union, one window per key ordered by time, carry the
    last right-side timestamp forward — a SINGLE shuffle on the key,
    instead of the naive range self-join (which explodes) or a sort-merge
    interval join. This is the standard large-scale as-of pattern
    (time-series stores implement exactly this under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str = "ts",
              right_ts_alias: str = "matched_ts") -> DataFrame:
    """For every left row, attach the latest right-row timestamp at or
    before it (per ``on`` key). Left columns are preserved.

    Tie at equal timestamps: the right row sorts first (tag 0), so an
    exactly-simultaneous right row IS matched — the usual as-of
    convention.
    """
    lcols = left.columns
    l_tag = left.withColumn("__tag", F.lit(1))
    r_tag = right.select(
        on, ts_col, *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                      for c in lcols if c not in (on, ts_col)]
    ).withColumn("__tag", F.lit(0))
    u = l_tag.select(*lcols, "__tag").unionByName(r_tag.select(*lcols, "__tag"))
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        right_ts_alias,
        F.last(F.when(F.col("__tag") == 0, F.col(ts_col)), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("__tag") == 1).drop("__tag")


def range_join_count(left: DataFrame, right: DataFrame, on: str, ts_col: str,
                     lookback: str, count_alias: str = "matches") -> DataFrame:
    """Count right-side rows within (left.ts - lookback, left.ts) per left
    row — an interval join. Expressed as a plain join with a range
    predicate so Catalyst can choose broadcast (small right) or, at scale,
    a bucketed join on the key where the range predicate filters
    post-match (same-key co-location means no extra shuffle)."""
    l = left.alias("l")
    r = right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{ts_col}") < F.col(f"l.{ts_col}"))
    )
    lcols = [F.col(f"l.{c}") for c in left.columns]
    return (
        l.join(r, cond, "left")
        .groupBy(*lcols)
        .agg(F.count(F.col(f"r.{ts_col}")).alias(count_alias))
    )
