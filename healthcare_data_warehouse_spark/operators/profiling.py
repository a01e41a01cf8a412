"""Table profiling: per-column stats in a single aggregation pass.

The warehouse's ``ANALYZE``-style operator — row count, null count,
distinct cardinality, min/max per column — the stats layer a query
planner, DQ monitor, or corpus-curation report reads first. The
reference's data-quality checks live in dbt tests (dbt_project/models —
not_null / unique assertions per column); this operator computes the
underlying measurements engine-side, for any table, in one job.

Plan shape (the part that matters at 100 TB):

- ONE pass: all per-column aggregates go into a single ``df.agg(...)`` —
  one scan of the table, whatever the column count. The wide 1-row result
  is then unpivoted driver-free with ``F.stack`` into (column, stats)
  rows.
- Exact ``countDistinct`` over N columns makes Catalyst plan an Expand
  (each input row replicated N times, one copy per distinct-aggregate
  group). That is the exact-answer cost. At corpus scale use
  ``profile_table(df, approx=True)``: ``approx_count_distinct`` (HLL++)
  needs no Expand, keeps the scan single-width, and merges sketches
  map-side — the standard trade.
- min/max are computed natively (so numeric/date ordering is real) and
  cast to string afterwards, making the schema uniform across columns of
  different types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one aggregation.

    Returns one row per column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)``.

    ``approx=True`` swaps exact COUNT(DISTINCT) for HLL++ — the 100 TB
    mode (no Expand in the plan; relative error ~2%).
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_table: no columns to profile")

    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.isnull(F.col(c)).cast("long")).alias(f"__nulls_{c}"),
            distinct(c).alias(f"__distinct_{c}"),
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
