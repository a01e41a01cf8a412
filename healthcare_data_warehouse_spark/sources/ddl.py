"""Warehouse DDL: managed-table creation (reference S6, init.sql:8-124).

The reference's CREATE TABLE star schema becomes Spark catalog tables
(``USING parquet PARTITIONED BY``) so downstream spark.sql queries resolve
names through the catalog and partition pruning applies. At 100 TB the
same statements target an external metastore (Hive/Glue/Unity) — the DDL
shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_star_schema(spark: SparkSession, db: str = "hdw",
                       location: str | None = None) -> None:
    """Create the warehouse database + empty star-schema tables.

    ``location`` overrides the database path — the default resolves
    against ``spark.sql.warehouse.dir`` (cwd-relative in a bare
    session), which an embedding harness may not be able to write;
    side-effect queries pass a SCRATCH_DIR path instead."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}{loc}")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {db}.dim_customer (
            customer_key BIGINT, c_custkey BIGINT, anonymized_name STRING,
            balance_group STRING, c_nationkey INT, c_mktsegment STRING,
            valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN
        ) USING parquet
        """
    )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {db}.dim_supplier (
            supplier_key BIGINT, s_suppkey BIGINT, s_name STRING,
            s_nationkey INT, valid_from TIMESTAMP, valid_to TIMESTAMP,
            is_current BOOLEAN
        ) USING parquet
        """
    )
    # The fact mirrors init.sql:83-109's RANGE partitioning as a
    # partitioned parquet table (year grain; month at 100 TB).
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {db}.fact_orders (
            order_key BIGINT, o_orderkey BIGINT, o_custkey BIGINT,
            customer_key BIGINT, o_orderstatus STRING, o_totalprice DOUBLE,
            o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING,
            cost_with_privacy DOUBLE, order_year INT
        ) USING parquet PARTITIONED BY (order_year)
        """
    )


def save_as_table(df: DataFrame, name: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.saveAsTable(name)
