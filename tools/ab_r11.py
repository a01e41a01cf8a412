"""Interleaved same-session A/Bs for the r11 optimizations.

Full-run before/after comparisons on this host are weather-dominated
(multi-second slow windows smear bands of consecutive queries — r9/r10
provenance notes; the r11-start canary read 2.3x the r10 run on
identical code). This harness removes the weather the same way
ab_relcache.py (r10's gold standard) did: both arms alternate
back-to-back in ONE session and share the slow windows; min-of-2 per
arm.

Arms are flipped by rebinding the engine's config-module attributes
in-session (the operators read them at call time):

    python tools/ab_r11.py spread <sf_dir> [query ...]
        A: SPREAD_MIN_TASK_BYTES=0 (r10 core-count floor)
        B: 64 KB/task data-derived floor (r11)
    python tools/ab_r11.py annwide <sf_dir> [query ...]
        A: ANN_WIDE_OVERRIDE=r10 formula width (max(min(bw,4L), min(bw*8,
           probe_bytes/4MB))) -- pass the width as the 4th arg
        B: derived (r11)
    python tools/ab_r11.py cutover <sf_dir> [query ...]
        A: ANN_JOIN_FIXED_LIST_CUTOVER_ROWS=100000 (the r9 threshold)
        B: cost model (r10/r11)
    python tools/ab_r11.py lshpairs <sf_dir>
        A: the pre-r11 capped-bucket SELF-JOIN pair formulation (built
           inline — byte-identical to the removed code path)
        B: HEAD's array-native pairing (lsh_candidate_pairs)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = {
    "spread": ["dedup_minhash_lsh", "chunk_documents", "vocab_bpe_segment",
               "corpus_clean", "bm25_topk", "hybrid_search_rrf",
               "dedup_substring_spans", "quality_bigram_lm",
               "dedup_rare_shingle_pairs", "token_heavy_hitters"],
    "annwide": ["ann_knn_join", "dedup_embedding_topk"],
    "cutover": ["ann_knn_join", "dedup_embedding_topk"],
}


def main() -> None:
    mode = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    extra = sys.argv[3:]
    from healthcare_data_warehouse_spark import config
    from healthcare_data_warehouse_spark.plans.catalog import queries
    from healthcare_data_warehouse_spark.session import get_spark

    if mode == "annwide":
        width_a = int(extra[0])
        names = extra[1:] or DEFAULT_QUERIES[mode]
    else:
        names = extra or DEFAULT_QUERIES.get(mode, [])

    registry = queries()
    spark = get_spark(f"ab-r11-{mode}")

    if mode == "lshpairs":
        _ab_lshpairs(spark, sf_dir)
        spark.stop()
        return

    def set_arm(arm: str) -> None:
        if mode == "spread":
            b_val = int(os.environ.get("AB_SPREAD_B", str(64 << 10)))
            config.SPREAD_MIN_TASK_BYTES = 0 if arm == "A" else b_val
        elif mode == "annwide":
            config.ANN_WIDE_OVERRIDE = width_a if arm == "A" else None
        elif mode == "cutover":
            config.ANN_JOIN_FIXED_LIST_CUTOVER_ROWS = (
                100_000 if arm == "A" else None)
        else:
            raise SystemExit(f"unknown mode {mode}")

    def release_blocks() -> None:
        # bench.py's eviction discipline: checkpoint/persist blocks from
        # a prior run otherwise ACCUMULATE over the session, and since
        # the arms alternate A-then-B the pressure lands harder on B —
        # a systematic bias, not noise (caught at sf10 where
        # quality_bigram_lm's localCheckpoint is live: 1.75x "regression"
        # that vanished with eviction).
        import gc as _gc

        _gc.collect()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def run(name: str, d: str) -> float:
        t0 = time.perf_counter()
        registry[name](spark, d).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        release_blocks()  # outside the timed region
        return elapsed

    for n in names:  # warm JIT/codegen
        run(n, "/root/testdata/sf0.001")

    tot_a = tot_b = 0.0
    print(f"# mode={mode} sf={sf_dir}")
    print(f"{'query':28s} {'A(r10)':>8s} {'B(r11)':>8s} {'B/A':>6s}")
    for n in names:
        a = b = float("inf")
        for _ in range(2):
            set_arm("A")
            a = min(a, run(n, sf_dir))
            set_arm("B")
            b = min(b, run(n, sf_dir))
        tot_a += a
        tot_b += b
        print(f"{n:28s} {a:8.3f} {b:8.3f} {b/a:6.2f}", flush=True)
    print(f"{'TOTAL':28s} {tot_a:8.3f} {tot_b:8.3f} {tot_b/tot_a:6.2f}")
    spark.stop()


def _ab_lshpairs(spark, sf_dir: str) -> None:
    import time as _t

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from healthcare_data_warehouse_spark.functions.expressions import hash52
    from healthcare_data_warehouse_spark.operators.dedup import (
        BAND_SALT, lsh_candidate_pairs, minhash_signatures_df)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def old_join_form():
        sig = minhash_signatures_df(docs, "text", "doc_id", 16)
        bs = [F.struct(F.lit(b).alias("band"),
                       hash52(F.concat_ws(",", *[F.col(f"h{b*4+r}")
                                                 for r in range(4)]),
                              BAND_SALT).alias("band_hash"))
              for b in range(4)]
        banded = (sig.select("doc_id", F.explode(F.array(*bs)).alias("bb"))
                  .select("doc_id", "bb.band", "bb.band_hash"))
        w = Window.partitionBy("band", "band_hash")
        banded = (banded.withColumn("n", F.count("*").over(w))
                  .filter(F.col("n") <= 64).drop("n"))
        a, b = banded.alias("a"), banded.alias("b")
        return (a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.band_hash") == F.col("b.band_hash"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("id_a"),
                        F.col("b.doc_id").alias("id_b"))
                .distinct())

    def run(df) -> float:
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return _t.perf_counter() - t0

    run(old_join_form())  # warm both shapes
    run(lsh_candidate_pairs(docs))
    a = b = float("inf")
    for _ in range(3):
        a = min(a, run(old_join_form()))
        b = min(b, run(lsh_candidate_pairs(docs)))
    print(f"# mode=lshpairs sf={sf_dir}")
    print(f"{'dedup_minhash_lsh pairs':28s} {a:8.3f} {b:8.3f} {b/a:6.2f}")


if __name__ == "__main__":
    main()
