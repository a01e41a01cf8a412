"""healthcare_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo mhr-212/Healthcare-Data-Warehouse (a Postgres/pandas/dbt
star-schema healthcare warehouse; see SURVEY.md). Everything here is
declarative DataFrame/SQL so Catalyst + Tungsten pick the physical plan:
broadcast joins for the small dimensions, partition-pruned parquet scans,
whole-stage codegen expressions instead of the reference's row-at-a-time
Python UDF loops.

Layout
------
- ``config``      — deterministic constants (as-of date, DP epsilon, k/l/t).
- ``session``     — SparkSession factory tuned for the driver harness.
- ``sources``     — loaders (parquet/CSV), sinks (upsert, partitioned write),
                    audited reads.
- ``functions``   — pure Column-expression library (anonymize, age buckets,
                    Laplace noise, cohorts) replacing the reference's UDFs.
- ``operators``   — distributed building blocks Spark lacks natively:
                    dense surrogate keys, privacy audits (k-anon/l-div/
                    t-closeness), dedup (exact/MinHash/SimHash), similarity
                    search, text analysis, multimodal plumbing.
- ``plans``       — the star-schema model DAG (staging → dims → fact) and the
                    full query catalog with DuckDB oracle SQL for every
                    SQL-expressible query.
- ``streaming``   — Structured Streaming pipelines over the events table.
- ``ml``          — Spark MLlib pipeline mirroring the reference's sklearn one.
"""

__version__ = "0.1.0"
