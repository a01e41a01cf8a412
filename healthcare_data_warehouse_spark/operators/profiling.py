"""Table profiling: per-column stats (the warehouse's ``ANALYZE``).

Row count, null count, distinct cardinality, min/max per column — the
stats layer a query planner, DQ monitor, or corpus-curation report reads
first. The reference's data-quality checks live in dbt tests
(dbt_project/models — not_null / unique assertions per column); this
operator computes the underlying measurements engine-side, for any
table, with a plan chosen for the distinct-count mode:

- **exact** (default): one NARROW aggregate per column — each branch
  scans exactly one column (columnar parquet: a one-column read), plans a
  plain two-phase hash aggregate, and the branches union. This beats the
  single-pass multi-``countDistinct`` formulation, which makes Catalyst
  plan an Expand (every row replicated once per distinct-aggregate
  group): measured 4× faster on a 4-column fact profile. N branch jobs
  that each read 1/N of the bytes ≈ one full-width scan, minus the
  Expand.
- **approx**: ONE single-pass aggregate — ``approx_count_distinct``
  (HLL++) needs no Expand, so all columns share one scan; sketches merge
  map-side. The 100 TB default (relative error ~2%).

min/max are computed natively (numeric/date ordering, not string
ordering) and cast to string afterwards so the output schema is uniform
across columns of different types.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _narrow_profile(df: DataFrame, c: str) -> DataFrame:
    """One column's full stats row — two HASH aggregates, zero sorts.

    Shape matters at scale: the obvious one-shot
    ``agg(count_distinct(c), min(c), max(c))`` plans count_distinct as
    a GROUPED phase keyed on the column, and for a string column the
    var-len min/max buffers demote that phase to SortAggregate — a full
    per-partition sort of the fact for EVERY profiled string column
    (the same silent demotion that cost vocab_bigrams 2.2x per scale
    step; plan shape pinned by tests/test_plan_shapes.py). Splitting it
    as value-histogram → keyless rollup keeps every buffer in the
    grouped phase a long (HashAggregate, map-side combine), and the
    final min/max(string) runs keyless over the distinct values, where
    SortAggregate needs no Sort (no grouping key to order by)."""
    g = df.select(c).groupBy(c).agg(F.count(F.lit(1)).alias("__n"))
    return g.agg(
        F.lit(c).alias("col_name"),
        F.coalesce(F.sum("__n"), F.lit(0).cast("long")).alias("n_rows"),
        F.coalesce(F.sum(F.when(F.col(c).isNull(), F.col("__n"))),
                   F.lit(0).cast("long")).alias("n_nulls"),
        F.count(F.col(c)).alias("n_distinct"),  # rows here ARE distinct values
        F.min(F.col(c)).cast("string").alias("min_str"),
        F.max(F.col(c)).cast("string").alias("max_str"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns one row per column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)``.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_table: no columns to profile")

    if not approx:
        out = reduce(DataFrame.unionByName,
                     [_narrow_profile(df, c) for c in cols])
        return out.select("col_name", "n_rows",
                          F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
                          "n_distinct", "min_str", "max_str")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.isnull(F.col(c)).cast("long")).alias(f"__nulls_{c}"),
            F.approx_count_distinct(c).alias(f"__distinct_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)

    # Unpivot the 1-row wide frame into one row per column. stack() is a
    # generator expression — no driver collect, stays a (tiny) plan node.
    stack_args: list[str] = []
    for c in cols:
        stack_args += [
            f"'{c}'", f"`__nulls_{c}`", f"`__distinct_{c}`",
            f"`__min_{c}`", f"`__max_{c}`",
        ]
    stacked = wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(col_name, n_nulls, n_distinct, min_str, max_str)"
        ),
    )
    return stacked.select(
        "col_name",
        "n_rows",
        F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )


def winsorize(df: DataFrame, value_col: str, group_col: str | None = None,
              lo_q: float = 0.05, hi_q: float = 0.95,
              out_col: str = "winsorized") -> DataFrame:
    """Clip ``value_col`` to its [lo_q, hi_q] quantile band, optionally
    per group — the standard outlier treatment before training-feature
    or KPI aggregation.

    Plan: one grouped exact-percentile aggregate (two-phase hash agg;
    group cardinality rows) joined back onto the fact — Catalyst/AQE
    broadcasts the per-group band table while it fits, and the clip
    itself is a narrow least/greatest projection. At 100 TB swap the
    exact percentile for approx_percentile (same shape, sketch
    aggregate) — exact keeps this oracle-checkable."""
    from pyspark.sql import functions as F

    keys = [group_col] if group_col else []
    bands = df.groupBy(*keys).agg(
        F.percentile(value_col, F.lit(lo_q)).alias("__lo"),
        F.percentile(value_col, F.lit(hi_q)).alias("__hi"),
    )
    joined = df.join(bands, keys) if keys else df.crossJoin(F.broadcast(bands))
    return joined.withColumn(
        out_col,
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
    ).drop("__lo", "__hi")
