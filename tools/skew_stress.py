"""Skew stress run: measure the engine's hot-key behavior on data where
one key owns a large share of the fact table.

The uniform sf-scaled test data never exercises the skew machinery under
real pressure, so this tool builds a skewed variant of sf0.1 (30% of
orders remapped to ONE hot customer; same schema, same row count) and
measures, with SQLMetrics-level timings:

  1. plain groupBy(custkey) agg         — Spark's map-side partial
     aggregation absorbs hot-key skew in AGGREGATION (the partials for
     the hot key shrink to one row per task before the shuffle)
  2. explode_salted_agg                 — the explicit two-phase salted
     form, same result
  3. orders JOIN customer plain         — hot PROBE side is harmless for
     broadcast; with broadcast disabled (the 100 TB case) the hot key
     lands in one shuffle partition and one task drags
  4. salted_join                        — salt the big side, replicate
     the small side: the hot key spreads over salt_buckets tasks
  5. AQE skewJoin                       — Spark's own runtime skew split
     (spark.sql.adaptive.skewJoin), partition-size driven

Usage:  python tools/skew_stress.py [src_sf_dir] [hot_share]
Writes a markdown block suitable for docs/SHUFFLES.md to stdout.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_skewed(spark, src: str, dest: str, hot_share: float) -> None:
    """orders with `hot_share` of rows remapped to customer 1; other
    tables copied as-is (only orders' FK distribution changes)."""
    from pyspark.sql import functions as F

    os.makedirs(dest, exist_ok=True)
    o = spark.read.parquet(os.path.join(src, "orders.parquet"))
    skewed = o.withColumn(
        "o_custkey",
        F.when(F.pmod(F.xxhash64("o_orderkey"), F.lit(1000))
               < F.lit(int(hot_share * 1000)), F.lit(1).cast("long"))
        .otherwise(F.col("o_custkey")),
    )
    skewed.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(dest, "orders.parquet"))
    for t in ("customer", "lineitem"):
        srcp = os.path.join(src, f"{t}.parquet")
        dstp = os.path.join(dest, f"{t}.parquet")
        if os.path.isfile(srcp):
            shutil.copyfile(srcp, dstp)
        else:
            shutil.copytree(srcp, dstp, dirs_exist_ok=True)


def timed(label, fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"| {label} | {best:.3f} |")
    return best


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    dest = os.path.join(REPO, ".testdata", "skew")

    from pyspark.sql import functions as F

    from healthcare_data_warehouse_spark.operators.skew import (
        explode_salted_agg,
        hot_key_share,
        salted_join,
    )
    from healthcare_data_warehouse_spark.session import get_spark

    spark = get_spark("skew-stress")
    build_skewed(spark, src, dest, hot_share)

    o = spark.read.parquet(os.path.join(dest, "orders.parquet"))
    c = spark.read.parquet(os.path.join(dest, "customer.parquet"))
    share = hot_key_share(o, "o_custkey", sample_fraction=1.0)
    print(f"hot-key share measured: {share:.3f} (built with {hot_share})")
    print("| shape | sec |\n|---|---|")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    timed("plain groupBy agg (map-side partials absorb skew)",
          lambda: noop(o.groupBy("o_custkey").agg(
              F.count("*").alias("cnt"),
              F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"))))
    timed("explode_salted_agg (explicit two-phase)",
          lambda: noop(explode_salted_agg(o, "o_custkey", "o_totalprice")))

    nobc = {"spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}

    def with_confs(confs, fn):
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            fn()
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    join_cols = ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]

    timed("join, broadcast allowed (hot probe side harmless)",
          lambda: noop(o.join(c, o.o_custkey == c.c_custkey)
                       .select(*join_cols)))
    timed("join, no broadcast + AQE skewJoin ON (runtime split)",
          lambda: with_confs(
              {**nobc, "spark.sql.adaptive.skewJoin.enabled": "true",
               "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
               "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                   "1MB"},
              lambda: noop(o.join(c, o.o_custkey == c.c_custkey)
                           .select(*join_cols))))
    timed("join, no broadcast + AQE skewJoin OFF (hot key = one task)",
          lambda: with_confs(
              {**nobc, "spark.sql.adaptive.skewJoin.enabled": "false"},
              lambda: noop(o.join(c, o.o_custkey == c.c_custkey)
                           .select(*join_cols))))
    timed("salted_join, no broadcast (explicit salt spread)",
          lambda: with_confs(
              nobc,
              lambda: noop(salted_join(o, c.withColumnRenamed(
                  "c_custkey", "o_custkey"), on="o_custkey", salt_buckets=16)
                  .select(*join_cols))))
    spark.stop()


if __name__ == "__main__":
    main()
