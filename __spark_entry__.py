"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``healthcare_data_warehouse_spark`` (see SURVEY.md
§2 for the operator inventory each query exercises).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from healthcare_data_warehouse_spark.config import SMOKE_SF_DIR  # noqa: E402
from healthcare_data_warehouse_spark.plans import catalog  # noqa: E402
from healthcare_data_warehouse_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full star pipeline (staging → dims with surrogate keys →
    fact with broadcast key resolution + DP noise) and then the Q1-analog
    aggregate over it (SURVEY.md §7.1).
    """
    from pyspark.sql import functions as F

    from healthcare_data_warehouse_spark.functions.expressions import davg
    from healthcare_data_warehouse_spark.plans.star import dim_customer, fact_orders

    tune_session(spark)
    dim = dim_customer(spark, SMOKE_SF_DIR)
    fact = fact_orders(spark, SMOKE_SF_DIR, dim_c=dim)
    return (
        dim.join(fact, "customer_key", "left")
        .groupBy("balance_group")
        .agg(
            F.count("order_key").alias("visit_count"),
            F.countDistinct("customer_key").alias("patient_count"),
            F.round(davg("o_totalprice"), 2).alias("avg_cost"),
            F.round(davg("cost_with_privacy"), 2).alias("avg_cost_with_privacy"),
        )
        .orderBy("balance_group")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return catalog.oracle_sql()
