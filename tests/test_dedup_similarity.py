"""Tests for dedup (exact / MinHash-LSH / SimHash / Jaccard) and
similarity search (brute-force + SRP-LSH) operators."""

from __future__ import annotations

import pytest

import numpy as np
import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.operators.dedup import (
    drop_exact_dups,
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    simhash_groups,
    simhash_near_pairs,
    simhash64,
)
from healthcare_data_warehouse_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_topk,
)

from conftest import SF_SMOKE

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight with friends")


def _docs(spark):
    near_dup = BASE.replace("tonight", "today")  # one-token change
    distinct = "completely different words about spark query engines and shuffles everywhere"
    rows = [(1, BASE, "en"), (2, BASE, "en"), (3, near_dup, "en"), (4, distinct, "en")]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup(spark):
    df = _docs(spark)
    groups = {r["keep_id"]: r["dup_count"] for r in exact_dedup_groups(df).collect()}
    assert groups[1] == 2  # docs 1,2 identical
    kept = sorted(r["doc_id"] for r in drop_exact_dups(df).collect())
    assert kept == [1, 3, 4]


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(_docs(spark)).collect()}
    assert (1, 2) in pairs          # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup shares most shingles
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_simhash_identical_and_near(spark):
    df = _docs(spark)
    sigs = {r["doc_id"]: r["sh"] for r in
            df.select("doc_id", simhash64("text").alias("sh")).collect()}
    assert sigs[1] == sigs[2]
    # near-dup hamming distance small, distinct doc far
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(sigs[1], sigs[3]) <= 8
    assert ham(sigs[1], sigs[4]) > 8
    groups = {r["simhash"]: r["doc_count"] for r in simhash_groups(df).collect()}
    assert 2 in groups.values()


def test_lsh_degenerate_bucket_capped(spark):
    # 1000 identical docs → every band hash collides into one bucket of
    # 1000; uncapped that is ~500k pairs per band. The skew guard must drop
    # the degenerate buckets entirely (identical docs are exact-dedup's
    # job), while normal-sized buckets keep producing pairs.
    degenerate = [(i, "", "en") for i in range(1000)]
    normal = [(2001, BASE, "en"), (2002, BASE, "en")]
    df = spark.createDataFrame(degenerate + normal, ["doc_id", "text", "lang"])
    pairs = {(r["id_a"], r["id_b"])
             for r in lsh_candidate_pairs(df, max_bucket_size=64).collect()}
    assert (2001, 2002) in pairs
    degenerate_pairs = [p for p in pairs if p[0] < 2000 and p[1] < 2000]
    assert degenerate_pairs == []  # bounded: the 1000-doc bucket was dropped


def test_simhash_near_pairs_hamming(spark):
    df = _docs(spark)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_pairs(df, max_hamming=8).collect()}
    assert got[(1, 2)] == 0          # identical docs
    assert 0 < got[(1, 3)] <= 8      # one-token change: small hamming
    assert (1, 4) not in got         # distinct doc beyond the threshold


@pytest.mark.slow
def test_simhash_near_pairs_pigeonhole_recall(spark):
    # Plant signature-level near-dups by perturbing tokens until we get a
    # pair within hamming<=3, then assert the chunk-banded path finds every
    # such pair that a brute-force comparison of signatures finds.
    from healthcare_data_warehouse_spark.operators.dedup import simhash_signatures_df

    rows = [(i, BASE + (" extra" * (i % 3)), "en") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures_df(df).collect()}
    want = {
        (a, b)
        for a in sigs for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {(r["id_a"], r["id_b"])
           for r in simhash_near_pairs(df, max_hamming=3, max_bucket_size=1000).collect()}
    assert got == want  # pigeonhole chunks: perfect recall, exact filter


def test_jaccard_pairs_values(spark):
    df = _docs(spark)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in jaccard_pairs(df, F.lit(True)).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 3)] < 1.0
    assert pairs[(1, 4)] == 0.0


def test_brute_force_topk_matches_numpy(spark):
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = brute_force_topk(emb, query_vec_id=0, k=5).collect()

    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items() if vid != 0
    }
    want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["vec_id"] for r in got] == [vid for vid, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["cosine_sim"] - s) < 1e-9


def test_lsh_topk_scores_are_exact_cosines(spark):
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    approx = lsh_topk(emb, query_vec_id=0, k=5)
    rows = approx.collect()
    assert 0 < len(rows) <= 5
    # every returned similarity must equal the exact cosine for that id
    exact = {r["vec_id"]: r["cosine_sim"] for r in
             brute_force_topk(emb, query_vec_id=0, k=10**6).collect()}
    for r in rows:
        assert abs(r["cosine_sim"] - exact[r["vec_id"]]) < 1e-12


def test_rare_feature_pairs_blocking_boundary(spark):
    """A pair sharing a RARE shingle is always found (deterministic
    recall, jaccard exact); a pair sharing only corpus-common shingles
    is excluded by construction — the blocking boundary that keeps the
    candidate set linear in rare-feature count."""
    from healthcare_data_warehouse_spark.operators.dedup import rare_feature_pairs

    common = "alpha beta gamma delta epsilon"   # shared by MANY docs
    rows = [(i, f"{common} filler{i} x{i} y{i}") for i in range(10)]
    rows += [(100, common + " unique marker phrase one"),
             (101, common + " unique marker phrase two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in rare_feature_pairs(df, max_df=3).collect()}
    # 100/101 share rare shingles ("unique marker phrase", ...) -> found
    assert (100, 101) in got
    assert 0 < got[(100, 101)] < 1
    # docs 0..9 share only the common prefix shingles (df=12 > max_df):
    # no pair among them survives the rare filter
    assert not any(a < 100 and b < 100 for a, b in got)


def test_cosine_pairs_blas_matches_naive_pair_join(spark):
    """The GEMM-prescreened pair search must return exactly the pairs (and
    bit-identical scores) of the naive blocked pair join + expression dot,
    including with chunking forced (chunk_rows smaller than the block, so
    diagonal AND off-diagonal chunk-pair code paths both run)."""
    from healthcare_data_warehouse_spark.operators.similarity import (
        cosine_pairs_blas, dot, norm)
    from healthcare_data_warehouse_spark.operators.skew import blocked_pair_join
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")

    e = emb.select("vec_id", "label", "embedding",
                   norm(F.col("embedding")).alias("__norm"))
    pairs = blocked_pair_join(e, "label", "vec_id",
                              payload=["embedding", "__norm"])
    sim = dot(F.col("embedding_a"), F.col("embedding_b")) / (
        F.col("__norm_a") * F.col("__norm_b"))
    naive = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in pairs.select("id_a", "id_b", sim.alias("cosine_sim"))
                           .filter(F.col("cosine_sim") >= 0.3).collect()}

    for chunk_rows in (7, 100000):  # multi-chunk and single-chunk regimes
        got = {(r["id_a"], r["id_b"]): r["cosine_sim"]
               for r in cosine_pairs_blas(
                   emb, "label", "vec_id", "embedding",
                   threshold=0.3, chunk_rows=chunk_rows).collect()}
        assert set(got) == set(naive), f"chunk_rows={chunk_rows}: pair set differs"
        for k in naive:
            assert got[k] == naive[k], (
                f"chunk_rows={chunk_rows}: score not bit-identical at {k}")


def test_nn_top1_blas_matches_naive_argmax(spark):
    """GEMM candidate generation + exact re-score must produce exactly
    the naive all-pairs argmax edges (score desc, dst asc tie-break),
    for both the single-chunk and multi-chunk regimes."""
    from pyspark.sql import Window
    from healthcare_data_warehouse_spark.operators.similarity import (
        dot, nn_top1_blas, norm)
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    e = emb.select("vec_id", "label", "embedding",
                   norm(F.col("embedding")).alias("__n"))
    a, b = e.alias("a"), e.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.__n") * F.col("b.__n"))
    sym = (a.join(b, (F.col("a.label") == F.col("b.label"))
                  & (F.col("a.vec_id") != F.col("b.vec_id")))
           .select(F.col("a.vec_id").alias("src"),
                   F.col("b.vec_id").alias("dst"), sim.alias("s")))
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    naive = {(r["src"], r["dst"]) for r in (
        sym.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).select("src", "dst").collect())}

    for chunk_rows in (11, 100000):
        got = {(r["src"], r["dst"]) for r in nn_top1_blas(
            emb, "label", "vec_id", "embedding",
            chunk_rows=chunk_rows).collect()}
        assert got == naive, f"chunk_rows={chunk_rows}"


def test_nn_top1_blas_exact_ties_break_on_lowest_id(spark):
    """Cloned vectors make cosine EXACTLY 1.0 against multiple partners —
    the argmax must break ties on the lowest neighbor id, in both chunk
    regimes (ties land in the same and in different chunk-pair groups)."""
    from healthcare_data_warehouse_spark.operators.similarity import nn_top1_blas

    v = [1.0, 2.0, 3.0, 4.0]
    w = [4.0, -3.0, 2.0, -1.0]  # orthogonal-ish distractor
    rows = [(0, 1, v), (1, 1, v), (2, 1, v), (3, 1, w)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    for chunk_rows in (1, 2, 100):
        got = {r["src"]: r["dst"] for r in nn_top1_blas(
            df, "label", "vec_id", "embedding", chunk_rows=chunk_rows).collect()}
        assert got[0] == 1 and got[1] == 0 and got[2] == 0, (chunk_rows, got)


def test_lsh_multitable_scores_exact_and_beats_single_table(spark):
    """Multi-table SRP-LSH: candidate scores are exact cosines, the
    result is a subset of the brute-force ordering, and the L-table
    OR-construction recalls at least as much of the true top-10 as one
    table (the measured reason it exists: one table starves)."""
    from healthcare_data_warehouse_spark.operators.similarity import (
        brute_force_topk, lsh_topk, lsh_topk_multitable)
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {r["vec_id"]: r["cosine_sim"]
             for r in brute_force_topk(emb, 0, k=10**6).collect()}
    top10 = set(list({k: v for k, v in sorted(
        exact.items(), key=lambda kv: (-kv[1], kv[0]))})[:10])

    multi = lsh_topk_multitable(emb, 0, k=10, n_planes=5, n_tables=4).collect()
    single = lsh_topk(emb, 0, k=10, n_planes=8, probe_hamming=1).collect()
    for r in multi:
        assert abs(r["cosine_sim"] - exact[r["vec_id"]]) < 1e-12
    rec_m = len({r["vec_id"] for r in multi} & top10)
    rec_s = len({r["vec_id"] for r in single} & top10)
    assert rec_m >= rec_s
    assert rec_m >= 3  # 4-table probed recall is far above starvation


def test_duplicated_spans_plants_and_merges(spark):
    from healthcare_data_warehouse_spark.operators.dedup import duplicated_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        # doc 1: shared span at start, unique tail
        (1, shared + " uniq1a uniq1b uniq1c uniq1d uniq1e uniq1f"),
        # doc 2: unique head, shared span at end — the only cross-doc dup
        (2, "uniq2a uniq2b uniq2c uniq2d uniq2e uniq2f " + shared),
        # doc 3: fully unique, above k tokens
        (3, "u3a u3b u3c u3d u3e u3f u3g u3h u3i u3j u3k u3l"),
        # doc 4: below k tokens — no grams at all
        (4, "short doc only five tokens here"),
        # doc 5: WITHIN-doc repeat — shared-with-itself 8-gram twice,
        # adjacent occurrences merge into ONE maximal span
        (5, "papa quebec romeo sierra tango uniform victor whiskey "
            "papa quebec romeo sierra tango uniform victor whiskey"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in duplicated_spans(df, k=8).collect()}

    assert set(out) == {1, 2, 3, 4, 5}          # every input row kept
    assert out[1]["n_dup_spans"] == 1 and out[1]["dup_tokens"] == 8
    assert out[2]["n_dup_spans"] == 1 and out[2]["dup_tokens"] == 8
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert out[4]["n_dup_spans"] == 0 and out[4]["n_tokens"] == 6
    # the 16-token doc is one maximal duplicated span, not 9 window hits
    assert out[5]["n_dup_spans"] == 1 and out[5]["dup_tokens"] == 16
    assert out[5]["dup_fraction"] == 1.0
    assert abs(out[1]["dup_fraction"] - 8 / 14) < 1e-12


def test_duplicated_spans_boilerplate_hot_gram(spark):
    # Every doc shares one boilerplate 8-gram (the hot-key regime the
    # aggregate+semijoin form exists for): all docs must report exactly
    # the boilerplate span, nothing more.
    from healthcare_data_warehouse_spark.operators.dedup import duplicated_spans

    boiler = "this content is provided for informational purposes only"  # 8 tokens
    rows = [(i, boiler + " " + " ".join(f"u{i}w{j}" for j in range(8)))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicated_spans(df, k=8).collect()
    assert len(out) == 200
    assert all(r["n_dup_spans"] == 1 and r["dup_tokens"] == 8 for r in out)
    assert all(r["n_tokens"] == 16 for r in out)


@pytest.mark.slow
def test_duplicated_spans_partition_invariant(spark):
    from healthcare_data_warehouse_spark.operators.dedup import duplicated_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [(i, (shared + f" tail{i}a tail{i}b tail{i}c") if i % 3 == 0
             else f"solo{i} " + " ".join(f"w{i}x{j}" for j in range(10)))
            for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {r["doc_id"]: tuple(r)[1:] for r in duplicated_spans(df, k=8).collect()}
    b = {r["doc_id"]: tuple(r)[1:]
         for r in duplicated_spans(df.repartition(17), k=8).collect()}
    assert a == b and len(a) == 60


@pytest.mark.slow
def test_cut_duplicated_spans_scrubs_boilerplate(spark):
    from healthcare_data_warehouse_spark.operators.dedup import cut_duplicated_spans

    boiler = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, boiler + " uniq1a uniq1b uniq1c"),
        (2, "uniq2a uniq2b " + boiler),
        (3, "clean3a clean3b clean3c clean3d clean3e clean3f clean3g "
            "clean3h clean3i"),
        (4, boiler + " " + boiler),  # fully boilerplate (one merged span)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in cut_duplicated_spans(df, k=8).collect()}
    assert out[1]["clean_text"] == "uniq1a uniq1b uniq1c"
    assert out[1]["n_removed_tokens"] == 8
    assert out[2]["clean_text"] == "uniq2a uniq2b"
    assert out[3]["clean_text"].startswith("clean3a")  # untouched
    assert out[3]["n_removed_tokens"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed_tokens"] == 16


@pytest.mark.slow
def test_duplicated_spans_keeps_null_text_docs(spark):
    """A NULL-text doc posexplodes to zero token rows; the base relation
    must still carry it (oracle's LEFT JOIN keeps it with NULL n_tokens)."""
    from healthcare_data_warehouse_spark.operators.dedup import (
        cut_duplicated_spans,
        duplicated_spans,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, f"{boiler} unique one"), (2, f"{boiler} other tail"),
         (3, None)],
        "doc_id long, text string",
    )
    rep = {r["doc_id"]: r for r in duplicated_spans(df, k=8).collect()}
    assert set(rep) == {1, 2, 3}
    assert rep[3]["n_tokens"] is None
    assert rep[3]["n_dup_spans"] == 0 and rep[3]["dup_tokens"] == 0
    assert rep[3]["dup_fraction"] is None
    assert rep[1]["n_dup_spans"] == 1  # the planted boilerplate still found

    cut = {r["doc_id"]: r for r in cut_duplicated_spans(df, k=8).collect()}
    assert set(cut) == {1, 2, 3}
    assert cut[3]["clean_text"] is None  # NULL in, NULL out
    assert cut[3]["n_removed_tokens"] is None
    assert cut[1]["clean_text"] == "unique one"


def test_cosine_pairs_oversized_block_routes_bounded(spark):
    """VERDICT r03 item 1: a pathological single-label corpus (every row
    one block, block size > max_block_rows) must complete via SRP-LSH
    routing with bounded per-bucket candidate sets — and report planted
    duplicate pairs with bit-exact scores."""
    import numpy as np

    from healthcare_data_warehouse_spark.operators.similarity import (
        _srp_subblock,
        cosine_pairs_blas,
        srp_route_params,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    n, dim = 600, 16
    vecs = rng.standard_normal((n, dim)).astype("float32")
    # plant 5 exact-duplicate pairs (cos=1): rows i and i+300 identical
    for i in range(5):
        vecs[300 + i] = vecs[i]
    rows = [(i, "one_label", [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")

    kw = dict(block_col="label", id_col="vec_id", vec_col="embedding",
              threshold=0.9, chunk_rows=64)
    exact = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in cosine_pairs_blas(df, max_block_rows=None, **kw).collect()}
    routed = {(r["id_a"], r["id_b"]): r["cosine_sim"]
              for r in cosine_pairs_blas(df, max_block_rows=500, **kw).collect()}

    planted = {(i, 300 + i) for i in range(5)}
    assert planted <= set(routed)            # exact dups always recalled
    assert set(routed) <= set(exact)         # no false positives
    for pair, s in routed.items():
        assert s == exact[pair]              # bit-exact re-score

    # Bounded per-task candidate sets: the largest (table, bucket) group
    # is far below the block size (the quadratic is subdivided).
    n_planes, n_tables = srp_route_params(0.9)
    e = df.select(F.col("label").alias("__blk"), F.col("vec_id").alias("__id"),
                  F.col("embedding").alias("__vec"), F.lit(1.0).alias("__norm"))
    sizes = (_srp_subblock(e, n_planes, n_tables, 42)
             .groupBy("__t", "__b").count().agg(F.max("count")).first()[0])
    assert sizes < n / 4


def test_cosine_pairs_oversize_error_and_low_threshold(spark):
    """on_oversize='error' (and 'route' at thresholds too low for LSH)
    raises at runtime ONLY when an oversized block exists."""
    import numpy as np
    import pytest
    from pyspark.errors import PythonException

    from healthcare_data_warehouse_spark.operators.similarity import (
        cosine_pairs_blas,
        srp_route_params,
    )

    assert srp_route_params(0.3) is None     # low threshold: routing refused
    assert srp_route_params(0.9) is not None

    rng = np.random.default_rng(11)
    rows = [(i, "L", [float(x) for x in rng.standard_normal(8)])
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")
    kw = dict(block_col="label", id_col="vec_id", vec_col="embedding")

    # under the cap: all three modes agree with the unbounded exact path
    base = set((r["id_a"], r["id_b"]) for r in cosine_pairs_blas(
        df, threshold=0.3, max_block_rows=None, **kw).collect())
    for mode in ("route", "error", "exact"):
        got = set((r["id_a"], r["id_b"]) for r in cosine_pairs_blas(
            df, threshold=0.3, max_block_rows=100, on_oversize=mode,
            **kw).collect())
        assert got == base

    # over the cap at a routable threshold, 'error' still raises
    with pytest.raises(PythonException, match="max_block_rows"):
        cosine_pairs_blas(df, threshold=0.9, max_block_rows=10,
                          on_oversize="error", **kw).collect()
    # over the cap at a low threshold (un-routable for SRP), 'route'
    # degrades to the output-CAPPED per-doc form: a non-empty SUBSET of
    # the true pair set, every pair genuinely >= threshold, canonical
    # (id_a < id_b), at most cap_k pairs sourced per doc
    capped_rows = cosine_pairs_blas(df, threshold=0.3, max_block_rows=10,
                                    on_oversize="route", **kw).collect()
    got = set((r["id_a"], r["id_b"]) for r in capped_rows)
    assert got and got <= base
    assert all(r["cosine_sim"] >= 0.3 for r in capped_rows)
    assert all(r["id_a"] < r["id_b"] for r in capped_rows)
    assert len(capped_rows) <= len(rows) * 5  # k=5 per doc, canonicalized
    # explicit opt-in to the quadratic still matches exact
    got = set((r["id_a"], r["id_b"]) for r in cosine_pairs_blas(
        df, threshold=0.3, max_block_rows=10, on_oversize="exact",
        **kw).collect())
    assert got == base


def test_routed_ivf_params_cost_model_cutover():
    """The recall_fraction → fixed_list_size cutover is the per-block
    COST MODEL (r10, closing the r9 superlinear pocket): whichever
    regime estimates fewer scored candidates per row wins. Fraction
    cost is linear in rows (0.75·rows), fixed-list cost is a constant
    (12 × 1,250 = 15,000), so they cross at exactly 20,000 rows — far
    below the old 100k row threshold whose pocket the committed r9
    curve measured (sf3 ann_knn_join 28.2 s > sf10 25.1 s)."""
    import math

    from healthcare_data_warehouse_spark.operators.similarity import (
        ann_regime_costs,
        routed_ivf_params,
    )

    # below/at the crossover the knobless fraction defaults stay
    assert routed_ivf_params(500) == {}
    assert routed_ivf_params(20_000) == {}
    c = ann_regime_costs(20_000)
    assert c["fraction_cand_per_row"] == c["fixed_cand_per_row"] == 15_000
    # just above, fixed-list is strictly cheaper and engages — the old
    # threshold left 20k–100k in the fraction regime (the pocket)
    k21 = routed_ivf_params(21_250)
    assert k21["n_lists"] == math.ceil(21_250 / 1250)
    assert ann_regime_costs(60_000)["fraction_cand_per_row"] == 45_000
    k130 = routed_ivf_params(130_000)
    assert k130["n_lists"] == math.ceil(130_000 / 1250)
    assert k130["n_probe"] == 12
    assert k130["sample_cap"] == max(4096, 4 * k130["n_lists"])
    # constant rows/list: doubling the block doubles the list count
    assert routed_ivf_params(260_000)["n_lists"] == 2 * k130["n_lists"]
    # the env/config override still forces a row threshold for A/B
    from healthcare_data_warehouse_spark import config

    old = config.ANN_JOIN_FIXED_LIST_CUTOVER_ROWS
    try:
        config.ANN_JOIN_FIXED_LIST_CUTOVER_ROWS = 100_000
        assert routed_ivf_params(60_000) == {}
        config.ANN_JOIN_FIXED_LIST_CUTOVER_ROWS = 0
        assert routed_ivf_params(500)["n_lists"] == 1
    finally:
        config.ANN_JOIN_FIXED_LIST_CUTOVER_ROWS = old


def test_nn_top1_oversize_guard(spark):
    """nn_top1_blas fails fast on an oversized block (exact top-1 has no
    sub-quadratic complete path) and matches the unguarded result under
    explicit opt-in."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors import PythonException

    from healthcare_data_warehouse_spark.operators.similarity import (
        nn_top1_blas,
    )

    rng = np.random.default_rng(13)
    rows = [(i, "L", [float(x) for x in rng.standard_normal(8)])
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")
    kw = dict(block_col="label", id_col="vec_id", vec_col="embedding")

    base = sorted((r["src"], r["dst"]) for r in nn_top1_blas(
        df, max_block_rows=None, **kw).collect())
    under = sorted((r["src"], r["dst"]) for r in nn_top1_blas(
        df, max_block_rows=100, **kw).collect())
    assert under == base
    with pytest.raises(PythonException, match="max_block_rows"):
        nn_top1_blas(df, max_block_rows=10, **kw).collect()
    opt_in = sorted((r["src"], r["dst"]) for r in nn_top1_blas(
        df, max_block_rows=10, on_oversize="exact", **kw).collect())
    assert opt_in == base


def test_nn_top1_blas_drops_zero_norm_rows(spark):
    """A zero vector has undefined cosine against everything: its GEMM
    row is all zeros (row_max 0 would emit EVERY partner) and its exact
    re-score is 0/0 = NaN, which Spark orders as the LARGEST double —
    without the guard the window argmax picks a NaN-scored arbitrary
    partner. Zero-norm rows must appear neither as src nor as dst, and
    the remaining rows' edges must be unaffected."""
    from healthcare_data_warehouse_spark.operators.similarity import nn_top1_blas

    v = [1.0, 2.0, 3.0, 4.0]
    w = [4.0, 3.0, 2.0, 1.0]
    z = [0.0, 0.0, 0.0, 0.0]
    rows = [(0, 1, v), (1, 1, w), (2, 1, z), (3, 1, z)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    for chunk_rows in (1, 100):
        got = {r["src"]: r["dst"] for r in nn_top1_blas(
            df, "label", "vec_id", "embedding",
            chunk_rows=chunk_rows).collect()}
        assert got == {0: 1, 1: 0}, (chunk_rows, got)

    # a block left with <2 usable rows after the zero-norm drop emits
    # nothing rather than a degenerate edge
    only_zero = spark.createDataFrame(
        [(0, 1, z), (1, 1, v)], "vec_id long, label int, embedding array<float>")
    assert nn_top1_blas(only_zero, "label", "vec_id", "embedding").count() == 0


def test_cosine_topk_per_row_matches_naive_window(spark):
    """GEMM group-top-k candidates + exact re-score must equal the naive
    all-pairs top-k (threshold, score desc, dst asc) in both single- and
    multi-chunk regimes — including tiny chunk sizes that maximize the
    number of chunk-pair groups a true neighbor can hide in."""
    from pyspark.sql import Window
    from healthcare_data_warehouse_spark.operators.similarity import (
        cosine_topk_per_row_blas, dot, norm)
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    k, thr = 3, 0.3
    e = emb.select("vec_id", "label", "embedding",
                   norm(F.col("embedding")).alias("__n"))
    a, b = e.alias("a"), e.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.__n") * F.col("b.__n"))
    sym = (a.join(b, (F.col("a.label") == F.col("b.label"))
                  & (F.col("a.vec_id") != F.col("b.vec_id")))
           .select(F.col("a.vec_id").alias("src"),
                   F.col("b.vec_id").alias("dst"), sim.alias("s"))
           .filter(F.col("s") >= thr))
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    naive = {(r["src"], r["dst"], r["s"]) for r in (
        sym.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k).collect())}

    for chunk_rows in (7, 100000):
        for reduction in ("aggregate", "window"):
            got = {(r["src"], r["dst"], r["cosine_sim"]) for r in
                   cosine_topk_per_row_blas(
                       emb, "label", "vec_id", "embedding", k=k,
                       threshold=thr, chunk_rows=chunk_rows,
                       reduction=reduction).collect()}
            assert got == naive, (chunk_rows, reduction)


def test_cosine_topk_per_row_output_is_linear_bounded(spark):
    """<= k rows per source, exact ties broken on lowest dst, zero-norm
    rows absent from both sides."""
    from healthcare_data_warehouse_spark.operators.similarity import (
        cosine_topk_per_row_blas)

    v = [1.0, 2.0, 3.0, 4.0]
    z = [0.0, 0.0, 0.0, 0.0]
    rows = [(i, 1, v) for i in range(6)] + [(6, 1, z)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    out = cosine_topk_per_row_blas(
        df, "label", "vec_id", "embedding", k=2, threshold=0.5,
        chunk_rows=2).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r["dst"])
    assert 6 not in by_src
    assert all(6 not in d for d in by_src.values())
    for src, dsts in by_src.items():
        assert len(dsts) == 2
        # all cosines tie at exactly 1.0 -> the two LOWEST other ids win
        expect = sorted(i for i in range(6) if i != src)[:2]
        assert sorted(dsts) == expect, (src, dsts)


def test_ivf_knn_join_recall_and_contract(spark):
    """Bulk approximate k-NN join: <= k rows per source, no self-pairs,
    exact cosine scores on emitted pairs, recall >= 0.9 vs brute force
    at the knobless defaults (the 0.9 recall-target calibration), and
    EXACTLY the brute-force result at exhaustive probing (probe ==
    n_lists reads every list — any shortfall would be an assignment
    bug, not an approximation)."""
    from pyspark.sql import Window
    from healthcare_data_warehouse_spark.operators.similarity import (
        dot, ivf_knn_join, norm)
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    k = 5
    e = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("__n"))
    a, b = e.alias("a"), e.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.__n") * F.col("b.__n"))
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    exact_rows = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("src"),
                F.col("b.vec_id").alias("dst"), sim.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k).collect())
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["src"], set()).add(r["dst"])
    total = sum(len(v) for v in exact.values())

    got_rows = ivf_knn_join(emb, k=k, n_lists=16).collect()
    got = {}
    for r in got_rows:
        assert r["src"] != r["dst"]
        got.setdefault(r["src"], []).append(r["dst"])
    assert all(len(v) <= k for v in got.values())
    hits = sum(len(exact[s] & set(got.get(s, []))) for s in exact)
    assert hits / total >= 0.9, hits / total

    # exhaustive probing == brute force, exactly
    full = {}
    for r in ivf_knn_join(emb, k=k, n_lists=16, n_probe=16).collect():
        full.setdefault(r["src"], set()).add(r["dst"])
    assert full == exact


def test_simhash_arrow_path_bit_matches_expression(spark):
    """simhash_signatures_arrow (the stream-compatible mapInPandas
    formulation) must produce bit-identical signatures to both the
    expression (simhash64) and exploded (simhash_signatures_df) paths —
    same tokens, same md5 hash family, same vote signs."""
    from healthcare_data_warehouse_spark.operators.dedup import (
        simhash64,
        simhash_signatures_arrow,
        simhash_signatures_df,
    )
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    expr = {r["doc_id"]: r["sig"] for r in
            docs.select("doc_id", simhash64("text").alias("sig")).collect()}
    exploded = {r["doc_id"]: r["simhash"] for r in
                simhash_signatures_df(docs).collect()}
    arrow = {r["doc_id"]: r["simhash"] for r in
             simhash_signatures_arrow(docs).collect()}
    assert arrow == expr == exploded

    # edge rows: empty / None text, plus whitespace edges where Python
    # str.strip()/\s semantics DIVERGE from Spark's trim/Java-\s —
    # leading tab and newline (F.trim keeps them ⇒ leading "" token from
    # Java split; Python .strip() would eat them), NBSP (Java \s does
    # NOT match U+00A0, Python \s does), trailing tab, and a
    # tab-separated body. The Arrow path must replicate the EXPRESSION
    # semantics on all of these, not Python's.
    edge = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b a"),
         (4, "\tleading tab"), (5, "\nleading newline"),
         (6, "nbsp joined tokens"), (7, "trailing tab\t"),
         (8, "tab\tsep\tbody"), (9, "  spaces only  padded  "),
         (10, " "), (11, "\t\n mixed   ws \r\n")],
        "doc_id long, text string")
    e_expr = {r["doc_id"]: r["sig"] for r in
              edge.select("doc_id", simhash64("text").alias("sig")).collect()}
    e_arrow = {r["doc_id"]: r["simhash"] for r in
               simhash_signatures_arrow(edge).collect()}
    assert e_arrow == e_expr


def test_cosine_topk_oversized_blocks_route_through_ivf(spark):
    """on_oversize='route': blocks over the cap take the ivf_knn_join
    decomposition (block-scoped) — bounded blocks stay EXACT, routed
    blocks must hit >=0.9 recall vs the exact answer, report true
    cosines, respect the threshold and the <=k bound, and never leak
    neighbors across blocks."""
    from healthcare_data_warehouse_spark.operators.similarity import (
        cosine_topk_per_row_blas)
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    k, thr = 3, 0.3
    # exact reference (no cap)
    exact_rows = cosine_topk_per_row_blas(
        emb, "label", "vec_id", "embedding", k=k, threshold=thr).collect()
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["src"], set()).add(r["dst"])

    # block sizes at smoke scale are ~50; cap at 40 so SOME blocks route
    # and (if any are under 40) some stay exact
    routed_rows = cosine_topk_per_row_blas(
        emb, "label", "vec_id", "embedding", k=k, threshold=thr,
        max_block_rows=40, on_oversize="route").collect()
    got = {}
    for r in routed_rows:
        assert r["cosine_sim"] >= thr
        got.setdefault(r["src"], []).append(r["dst"])
    assert all(len(d) <= k for d in got.values())

    # block containment: every neighbor shares the source's label
    label_of = {r["vec_id"]: r["label"]
                for r in emb.select("vec_id", "label").collect()}
    for s, ds in got.items():
        for d in ds:
            assert label_of[s] == label_of[d]

    hits = sum(len(exact[s] & set(got.get(s, []))) for s in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.9, hits / total

    # reported scores are true cosines (cross-check against the exact
    # run's scores for overlapping pairs)
    exact_score = {(r["src"], r["dst"]): r["cosine_sim"] for r in exact_rows}
    for r in routed_rows:
        key = (r["src"], r["dst"])
        if key in exact_score:
            assert abs(r["cosine_sim"] - exact_score[key]) < 1e-9


def test_cosine_topk_on_oversize_error_still_raises(spark):
    """Default on_oversize='error' keeps the fail-loud guard."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from healthcare_data_warehouse_spark.operators.similarity import (
        cosine_topk_per_row_blas)
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(Exception, match="max_block_rows"):
        cosine_topk_per_row_blas(
            emb, "label", "vec_id", "embedding", k=3, threshold=0.3,
            max_block_rows=10).collect()


def test_ann_knn_join_regime_gate_stamps_and_holds_output_contract(spark, monkeypatch):
    """ann_knn_join is size-gated like join_3way: the gate must stamp
    which regime ran, and BOTH regimes must hold the output contract
    (<= k neighbors per src, true-cosine scores, no self-pairs) on the
    same corpus. Forcing the cutover to 0 exercises the fixed-list-size
    branch at test scale."""
    from healthcare_data_warehouse_spark import config, decisions
    from healthcare_data_warehouse_spark.plans import catalog

    q = catalog.queries()["ann_knn_join"]

    decisions.drain()
    rows_frac = q(spark, SF_SMOKE).collect()
    d = decisions.drain()["ann_knn_join"]
    assert d["plan"] == "recall_fraction" and d["n_rows"] > 0

    monkeypatch.setattr(config, "ANN_JOIN_FIXED_LIST_CUTOVER_ROWS", 0)
    rows_fls = q(spark, SF_SMOKE).collect()
    d = decisions.drain()["ann_knn_join"]
    assert d["plan"] == "fixed_list_size"
    assert d["n_lists"] == -(-d["n_rows"] // 1250) and d["n_probe"] == 12

    for rows in (rows_frac, rows_fls):
        per_src = {}
        for r in rows:
            assert r["src"] != r["dst"]
            assert -1.0 - 1e-9 <= r["cosine_sim"] <= 1.0 + 1e-9
            per_src.setdefault(r["src"], []).append(r["dst"])
        assert per_src and all(len(v) <= 5 for v in per_src.values())


def test_array_pairing_matches_self_join_formulation(spark):
    """r11 regression lock: the array-native pair fan-out in
    simhash_near_pairs and rare_feature_pairs is output-identical to
    the within-bucket SELF-JOIN formulation it replaced (including the
    strict id_a < id_b boundary). The corpus mixes exact dups, a
    near-dup, and distinct docs so buckets of size 2..4 actually occur."""
    from pyspark.sql import Window

    from healthcare_data_warehouse_spark.operators.dedup import (
        rare_feature_pairs, shingles, simhash_signatures_df)

    near_dup = BASE.replace("tonight", "today")
    rows = [(1, BASE), (2, BASE), (3, near_dup), (4, BASE + " extra"),
            (5, "completely different words about spark engines"),
            (6, "completely different words about spark engines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # --- simhash: HEAD vs the old join built inline -------------------
    got = {(r.id_a, r.id_b, r.hamming)
           for r in simhash_near_pairs(df, max_hamming=8).collect()}
    bits, max_hamming, cap = 48, 8, 64
    chunks, width = max_hamming + 1, 48 // (max_hamming + 1)
    mask = (1 << width) - 1
    sig = simhash_signatures_df(df, "text", "doc_id", bits)
    cs = [F.struct(F.lit(c).alias("chunk"),
                   F.shiftright("simhash", c * width)
                   .bitwiseAND(F.lit(mask)).alias("chunk_val"))
          for c in range(chunks)]
    banded = (sig.select("doc_id", "simhash",
                         F.explode(F.array(*cs)).alias("cc"))
              .select("doc_id", "simhash", "cc.chunk", "cc.chunk_val"))
    w = Window.partitionBy("chunk", "chunk_val")
    banded = (banded.withColumn("n", F.count("*").over(w))
              .filter(F.col("n") <= cap).drop("n"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    want = {(r.id_a, r.id_b, r.hamming) for r in (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"), ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming).distinct().collect())}
    assert got == want and (1, 2) in {(x, y) for x, y, _ in got}

    # --- rare shingles: HEAD vs the old join built inline --------------
    got = {(r.id_a, r.id_b, round(r.jaccard, 12))
           for r in rare_feature_pairs(df, max_df=4).collect()}
    t = df.select(
        "doc_id",
        F.transform(shingles("text", 3),
                    lambda s: F.xxhash64(s)).alias("sh"))
    ds = t.select("doc_id", F.explode("sh").alias("f"))
    rare = (ds.groupBy("f").agg(F.count(F.lit(1)).alias("c"))
            .filter((F.col("c") >= 2) & (F.col("c") <= 4)).select("f"))
    rd = ds.join(rare, "f")
    a, b = rd.alias("a"), rd.alias("b")
    pairs = (a.join(b, (F.col("a.f") == F.col("b.f"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b")).distinct())
    sa = t.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = t.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
           / F.size(F.array_union("sh_a", "sh_b")))
    want = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard")).collect())}
    assert got == want and (1, 2) in {(x, y) for x, y, _ in got}
