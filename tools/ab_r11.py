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
    python tools/ab_r11.py arraypairs <sf_dir>
        Same protocol for the pair generators examined later in r11.
        dedup_rare_shingle_pairs / dedup_simhash_near: A = the removed
        self-join formulation built inline, B = HEAD's array pairing.
        market_basket_pairs: A = HEAD's join form (KEPT — the array
        prototype measured 1.7-2.6x slower at sf1 because the
        groupBy(l_orderkey) collect_list pays a partitioning+sort the
        old plan never had), B = the REJECTED array prototype inline.
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

    if mode == "arraypairs":
        _ab_arraypairs(spark, sf_dir)
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


def _ab_arraypairs(spark, sf_dir: str) -> None:
    """A/B the three later-r11 array-pairing rewrites against the
    removed self-join formulations, interleaved in one session. Arms
    build their DataFrame INSIDE the timed region (rare_feature_pairs
    checkpoints eagerly at build time) and evict checkpoint/persist
    blocks between runs, per the harness discipline above."""
    import gc as _gc
    import time as _t

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from healthcare_data_warehouse_spark.operators import dedup as D
    from healthcare_data_warehouse_spark.operators.skew import spread
    from healthcare_data_warehouse_spark.plans.catalog import queries
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    registry = queries()

    def release_blocks() -> None:
        _gc.collect()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def old_simhash(d: str):
        docs = load_table(spark, d, "documents")
        bits, max_hamming, max_bucket_size = 48, 3, 64
        chunks = max_hamming + 1
        width = bits // chunks
        mask = (1 << width) - 1
        sig = D.simhash_signatures_df(docs, "text", "doc_id", bits)
        cs = [F.struct(F.lit(c).alias("chunk"),
                       F.shiftright("simhash", c * width)
                       .bitwiseAND(F.lit(mask)).alias("chunk_val"))
              for c in range(chunks)]
        banded = (sig.select("doc_id", "simhash",
                             F.explode(F.array(*cs)).alias("cc"))
                  .select("doc_id", "simhash", "cc.chunk", "cc.chunk_val"))
        w = Window.partitionBy("chunk", "chunk_val")
        banded = (banded.withColumn("n", F.count("*").over(w))
                  .filter(F.col("n") <= max_bucket_size).drop("n"))
        a, b = banded.alias("a"), banded.alias("b")
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        return (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                       & (F.col("a.chunk_val") == F.col("b.chunk_val"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("id_a"),
                        F.col("b.doc_id").alias("id_b"),
                        ham.alias("hamming"))
                .filter(F.col("hamming") <= max_hamming)
                .distinct())

    def old_rare(d: str):
        docs = load_table(spark, d, "documents")
        n, max_df = 3, 3
        t = spread(docs, "doc_id").select(
            F.col("doc_id"),
            F.transform(D.shingles("text", n),
                        lambda s: F.xxhash64(s)).alias("__sh"),
        ).localCheckpoint(eager=True)
        ds = t.select(F.col("doc_id"), F.explode("__sh").alias("f"))
        rare = (ds.groupBy("f").agg(F.count(F.lit(1)).alias("__df"))
                .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
                .select("f"))
        rd = ds.join(rare, "f")
        a, b = rd.alias("a"), rd.alias("b")
        pairs = (a.join(b, (F.col("a.f") == F.col("b.f"))
                        & (F.col("a.doc_id") < F.col("b.doc_id")))
                 .select(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b"))
                 .distinct())
        sa = t.select(F.col("doc_id").alias("id_a"),
                      F.col("__sh").alias("sh_a"))
        sb = t.select(F.col("doc_id").alias("id_b"),
                      F.col("__sh").alias("sh_b"))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
        return (pairs.join(sa, "id_a").join(sb, "id_b")
                .select("id_a", "id_b",
                        (inter.cast("double") / union).alias("jaccard")))

    def basket_array_prototype(d: str):
        # The REJECTED market_basket_pairs rewrite (output-identical,
        # measured slower: see docstring). Kept inline so the committed
        # A/B artifact stays reproducible against HEAD's join form.
        li = load_table(spark, d, "lineitem").select("l_orderkey",
                                                     "l_partkey")
        p = load_table(spark, d, "part").select("p_partkey", "p_brand")
        ob = (li.join(p, li.l_partkey == p.p_partkey)
              .select("l_orderkey", "p_brand").distinct())
        n_orders = ob.agg(F.countDistinct("l_orderkey").alias("n"))
        brand_n = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_b"))
        basket = (ob.groupBy("l_orderkey")
                  .agg(F.sort_array(F.collect_list("p_brand"))
                       .alias("__brands"))
                  .filter(F.size("__brands") >= 2))
        pair_structs = F.flatten(F.transform(
            F.col("__brands"),
            lambda x, i: F.transform(
                F.slice(F.col("__brands"), i + F.lit(2),
                        F.size(F.col("__brands"))),
                lambda y: F.struct(x.alias("brand_a"),
                                   y.alias("brand_b")),
            ),
        ))
        pairs = (basket.select(F.explode(pair_structs).alias("__p"))
                 .select(F.col("__p.brand_a").alias("brand_a"),
                         F.col("__p.brand_b").alias("brand_b"))
                 .filter(F.col("brand_a") < F.col("brand_b"))
                 .groupBy("brand_a", "brand_b")
                 .agg(F.count(F.lit(1)).alias("n_ab")))
        na = brand_n.select(F.col("p_brand").alias("brand_a"),
                            F.col("n_b").alias("n_a_cnt"))
        nb = brand_n.select(F.col("p_brand").alias("brand_b"),
                            F.col("n_b").alias("n_b_cnt"))
        return (pairs.join(F.broadcast(na), "brand_a")
                .join(F.broadcast(nb), "brand_b")
                .crossJoin(F.broadcast(n_orders))
                .select("brand_a", "brand_b", "n_ab",
                        ((F.col("n_ab").cast("double") * F.col("n"))
                         / (F.col("n_a_cnt").cast("double")
                            * F.col("n_b_cnt"))).alias("lift"))
                .orderBy(F.desc("lift"), "brand_a", "brand_b")
                .limit(25))

    cases = [
        ("dedup_simhash_near", old_simhash,
         lambda d: registry["dedup_simhash_near"](spark, d)),
        ("dedup_rare_shingle_pairs", old_rare,
         lambda d: registry["dedup_rare_shingle_pairs"](spark, d)),
        ("market_basket_pairs",
         lambda d: registry["market_basket_pairs"](spark, d),
         basket_array_prototype),
    ]

    def run(build, d: str) -> float:
        t0 = _t.perf_counter()
        build(d).write.format("noop").mode("overwrite").save()
        elapsed = _t.perf_counter() - t0
        release_blocks()
        return elapsed

    for name, old, new in cases:  # warm JIT/codegen on the tiny SF
        run(old, "/root/testdata/sf0.001")
        run(new, "/root/testdata/sf0.001")

    print(f"# mode=arraypairs sf={sf_dir}")
    print(f"{'query':28s} {'A(join)':>8s} {'B(array)':>8s} {'B/A':>6s}")
    tot_a = tot_b = 0.0
    for name, old, new in cases:
        a = b = float("inf")
        for _ in range(3):
            a = min(a, run(old, sf_dir))
            b = min(b, run(new, sf_dir))
        tot_a += a
        tot_b += b
        print(f"{name:28s} {a:8.3f} {b:8.3f} {b/a:6.2f}", flush=True)
    print(f"{'TOTAL':28s} {tot_a:8.3f} {tot_b:8.3f} {tot_b/tot_a:6.2f}")


if __name__ == "__main__":
    main()
