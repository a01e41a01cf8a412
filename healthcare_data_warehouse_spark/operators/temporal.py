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


def grouped_ewma(df: DataFrame, value_col: str, order_cols: list[str],
                 group_col: str, alpha: float = 0.3,
                 beta: float | None = None,
                 out_col: str = "ewma") -> DataFrame:
    """Per-group exponentially weighted moving average of the FINAL state:
    s_1 = x_1, s_i = alpha*x_i + beta*s_{i-1} over the group's rows in
    ``order_cols`` order — the classic smoothed-trend signal Spark has no
    window frame for (the recurrence is order-sequential by definition).

    Plan: one groupBy collects each group's ordered value array
    (sort_array over structs — deterministic, tie-broken by the full
    order_cols tuple), then a native ``aggregate`` lambda folds it.
    Sequential work is per-GROUP (bounded: a patient's visit history),
    groups themselves parallelize freely, so at 100 TB this scales as
    long as no single group is corpus-sized — same contract as any
    per-entity history operator. Bit-parity note: pass ``beta`` as an
    explicit literal (default 1-alpha computed in Python can land a
    half-ulp off the decimal literal an oracle would parse); identical
    literals make the fold IEEE-identical in any engine (DuckDB
    ``list_reduce`` folds with the same left-to-right order).
    """
    if beta is None:
        beta = 1.0 - alpha
    ordered = F.sort_array(F.collect_list(F.struct(
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).cast("double").alias("v"),
    )))
    vals = F.transform(ordered, lambda s: s["v"])
    agg = df.groupBy(group_col).agg(vals.alias("__vals"))
    n = F.size("__vals")
    folded = F.aggregate(
        F.slice(F.col("__vals"), 2, F.greatest(n - 1, F.lit(0))),
        F.element_at(F.col("__vals"), 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(beta) * acc,
    )
    return agg.select(
        group_col,
        n.cast("int").alias("n_points"),
        folded.alias(out_col),
    )
