"""Parquet / CSV sources for the engine.

Reference analog: the CSV ingest in scripts/etl.py:98,155,199 (pd.read_csv)
and the pd.read_sql pulls scattered across dashboard.py/ml_pipeline.py.
Here every source is a lazy DataFrame scan so Catalyst can push filters and
prune columns all the way into the parquet reader (check .explain() for
PushedFilters / ReadSchema).

Scale notes:
- Scans stay unresolved until an action; no eager pandas materialization.
- The events table ships nanosecond INT64 timestamps; Spark reads them as
  long under ``spark.sql.legacy.parquet.nanosAsLong`` and we rebuild a
  microsecond timestamp column (sub-microsecond precision is truncated,
  matching what any Spark pipeline at scale would store).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_SF_DIR, TABLES


def _events_ts_fixup(df: DataFrame) -> DataFrame:
    """Convert a nanosecond-epoch long ``ts`` back to a timestamp.

    Cast to TIMESTAMP_NTZ: the driver parquet stores naive timestamps
    (isAdjustedToUTC=false) and Spark 4 reads them as NTZ elsewhere —
    keeping events NTZ too means window starts / truncations compare
    naive-to-naive with the DuckDB oracle.
    """
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts",
            F.timestamp_micros((F.col("ts") / 1000).cast("long")).cast("timestamp_ntz"),
        )
    return df


def load_table(spark: SparkSession, sf_dir: str | None, name: str) -> DataFrame:
    """Load one driver table as a DataFrame (lazy parquet scan)."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _events_ts_fixup(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every driver table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# CSV (reference S1/S2: pd.read_csv / df.to_csv)
# ---------------------------------------------------------------------------

def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header, mirroring df.to_csv(index=False)."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV source with an explicit schema (no inference job at 100 TB)."""
    return spark.read.option("header", "true").schema(schema).csv(path)
