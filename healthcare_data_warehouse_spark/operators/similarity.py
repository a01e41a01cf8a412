"""Similarity search over embedding columns (array<float>).

north_star scope: brute-force cosine top-k as the exact baseline, plus a
random-hyperplane LSH-bucketed variant as the 100 TB path (candidates from
one bucket join instead of scoring every vector).

Dot products use native array expressions (``zip_with`` + ``aggregate``):
elementwise float→double cast then sequential double accumulation, which
matches DuckDB's double-precision ``list_cosine_similarity`` bit-for-bit
for oracle checking.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(df: DataFrame, query_vec_id: int, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k against one stored vector.

    The 1-row query side broadcasts; scoring is a single scan with no
    shuffle; orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-k, then a k-row merge on the driver) — the exact-search plan you
    want even at 100 TB. The scan side is width-guarded
    (ensure_min_partitions): the per-vector fold is pure CPU, so a
    row-group-starved file (sf60 fixture: 2 groups → 2 tasks on 32
    cores, 14-17 s) repartitions to the core budget first (4.9 s
    measured at sf60 post-guard+relayout); already-wide scans skip the
    exchange entirely."""
    from .skew import ensure_min_partitions

    q = df.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("__qv"))
    scored = (
        ensure_min_partitions(df.filter(F.col(id_col) != query_vec_id))
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            "label",
            cosine(F.col(vec_col), F.col("__qv")).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def random_hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def srp_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bucket id: one sign bit per hyperplane.
    Planes are literal arrays baked into the plan (deterministic, tiny)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        bucket = bucket + F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return bucket


# ---------------------------------------------------------------------------
# ANN accuracy defaults: recall targets, not magic constants.
#
# The recall/latency curves were MEASURED by tools/ann_quality.py on the
# sf0.1 embeddings corpus (k=10, 16 lists / m=8 PQ), and latency is
# near-flat across each sweep (the scan dominates; the knob only widens
# the scored subset). The old constants (probe 4, refine 50) silently
# served 0.62-recall neighbors; the calibration tables below let callers
# say what they actually want — "give me >= this recall" — and default
# to 0.9, the point users stop noticing missing neighbors in dedup /
# retrieval work. Entries are (knob-as-fraction, measured recall),
# ascending; resolution picks the SMALLEST knob whose measured recall
# meets the target (conservative: measured values round down).
# ---------------------------------------------------------------------------

#: (n_probe / n_lists, recall@10) measured round 4/5: probe 4/8/12/16 of
#: 16 lists → 0.62 / 0.88 / 0.97 / 1.00.
IVF_RECALL_BY_PROBE_FRACTION: tuple[tuple[float, float], ...] = (
    (0.25, 0.62), (0.50, 0.88), (0.75, 0.97), (1.00, 1.00),
)

#: (refine / k, recall@10) measured round 4/5: shortlist 100/200/400/800
#: at k=10 → 0.62 / 0.76 / 0.88 / 0.96.
PQ_RECALL_BY_REFINE_PER_K: tuple[tuple[int, float], ...] = (
    (10, 0.62), (20, 0.76), (40, 0.88), (80, 0.96),
)

DEFAULT_TARGET_RECALL = 0.9


def resolve_n_probe(n_lists: int, target_recall: float = DEFAULT_TARGET_RECALL) -> int:
    """Smallest probe count whose MEASURED recall meets the target
    (fraction-of-lists calibration transfers across n_lists choices).
    target_recall > the largest measured point degrades to exhaustive
    probing (recall 1.0 by construction)."""
    import math

    for frac, rec in IVF_RECALL_BY_PROBE_FRACTION:
        if rec >= target_recall:
            return max(1, math.ceil(frac * n_lists))
    return n_lists


def resolve_refine(k: int, target_recall: float = DEFAULT_TARGET_RECALL) -> int | None:
    """Smallest exact-rerank shortlist whose MEASURED recall meets the
    target (refine scales with k: the sweep was run at k=10).

    Targets ABOVE the largest measured recall (0.96) return ``None`` —
    "no shortlist cap": the caller exact-re-ranks the FULL candidate
    set, which is recall 1.0 by construction at brute-force cost. This
    mirrors ``resolve_n_probe``'s degrade-to-exhaustive so the
    "give me >= this recall" contract genuinely holds instead of
    silently capping at 0.96."""
    for mult, rec in PQ_RECALL_BY_REFINE_PER_K:
        if rec >= target_recall:
            return mult * k
    return None


def _adc_shortlist(cand: DataFrame, refine: int | None,
                   id_col: str) -> DataFrame:
    """Order candidates by ADC distance and cap at ``refine``;
    ``refine=None`` (unattainable-target degrade from resolve_refine)
    skips BOTH the sort and the cap — every candidate goes to the exact
    re-rank, so the ADC pass costs nothing and recall is exact."""
    if refine is None:
        return cand
    return cand.orderBy(F.asc("__adc"), F.asc(id_col)).limit(refine)


def ivf_topk(df: DataFrame, query_vec_id: int, k: int = 10, n_lists: int = 16,
             n_probe: int | None = None, vec_col: str = "embedding",
             id_col: str = "vec_id",
             seed: int = 42,
             target_recall: float = DEFAULT_TARGET_RECALL) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    assigns every vector to a list; queries score only the ``n_probe``
    lists whose centroids are closest to the query vector.

    At 100 TB the assignment happens once at ingest (the list id is a
    partition column → probing is partition pruning, not a filter); here
    the quantizer trains on the fly with a fixed seed.

    ``n_probe=None`` (default) resolves from ``target_recall`` against
    the measured calibration table (see resolve_n_probe).
    """
    if n_probe is None:
        n_probe = resolve_n_probe(n_lists, target_recall)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    # Backfill edge: KMeans.fit refuses an empty dataset, and a missing
    # query id has no vector to probe with — both mean "no neighbors",
    # not an error. Empty result, stable schema.
    if df.filter(F.col(id_col) == query_vec_id).isEmpty():
        return df.select(
            id_col, "label", F.lit(0.0).alias("cosine_sim")).limit(0)

    spark = df.sparkSession
    vecs = df.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="__v", predictionCol="__list")
    model = km.fit(vecs)
    assigned = model.transform(vecs).drop("__v")

    import numpy as np

    centers = model.clusterCenters()
    qrow = df.filter(F.col(id_col) == query_vec_id).select(vec_col).first()
    q = np.array(qrow[0], dtype=np.float64)
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centers]
    probe_lists = sorted(range(len(centers)), key=lambda i: dists[i])[:n_probe]

    qdf = df.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("__qv"))
    scored = (
        assigned.filter(F.col("__list").isin(probe_lists) & (F.col(id_col) != query_vec_id))
        .crossJoin(F.broadcast(qdf))
        .select(id_col, "label", cosine(F.col(vec_col), F.col("__qv")).alias("cosine_sim"))
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def ivf_build_index(df: DataFrame, index_dir: str, n_lists: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 42) -> list[list[float]]:
    """Ingest-time IVF index build: train the KMeans coarse quantizer ONCE,
    assign every vector a ``list_id``, and materialize the table
    partitioned by it — so probing at query time is partition PRUNING
    (n_probe directories read) instead of a full-corpus filter. Centroids
    (n_lists × dim floats — driver-tiny at any corpus size) persist as
    JSON next to the vectors.

    This is the 100 TB shape: the O(corpus) quantizer work happens once per
    ingest, not per query (ivf_topk's train-per-call is the small-data
    convenience path only).
    """
    import json
    import os

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="__v", predictionCol="list_id")
    model = km.fit(vecs)
    assigned = model.transform(vecs).drop("__v")

    os.makedirs(index_dir, exist_ok=True)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(
        os.path.join(index_dir, "vectors")
    )
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        json.dump(centers, f)
    return centers


def ivf_probe_lists(centers: list[list[float]], query_vec, n_probe: int) -> list[int]:
    """The n_probe list ids whose centroids are nearest the query (driver
    side — the centroid table is n_lists rows, never data-scale)."""
    q = np.asarray(query_vec, dtype=np.float64)
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centers]
    return sorted(range(len(centers)), key=lambda i: (dists[i], i))[:n_probe]


def ivf_topk_indexed(spark, index_dir: str, query_vec, k: int = 10,
                     n_probe: int | None = None,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     exclude_id: int | None = None,
                     target_recall: float = DEFAULT_TARGET_RECALL) -> DataFrame:
    """Query a materialized IVF index: pick n_probe lists from the stored
    centroids, scan ONLY those partitions (PartitionFilters: list_id IN
    (...) — pruning, not filtering), score with the exact cosine, top-k via
    TakeOrderedAndProject.

    ``n_probe=None`` (default) resolves from ``target_recall`` against
    the measured calibration table (see resolve_n_probe) — probe 12 of
    16 lists at the 0.9 default, 0.97 measured recall at ~1.15x the
    probe-4 latency; the old probe-4 constant silently served
    0.62-recall neighbors."""
    import json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centers = json.load(f)
    if n_probe is None:
        n_probe = resolve_n_probe(len(centers), target_recall)
    probe = ivf_probe_lists(centers, query_vec, n_probe)

    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    scan = spark.read.parquet(os.path.join(index_dir, "vectors")).filter(
        F.col("list_id").isin(probe)
    )
    if exclude_id is not None:
        scan = scan.filter(F.col(id_col) != exclude_id)
    scored = scan.select(
        id_col, "label", cosine(F.col(vec_col), qv).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def lsh_topk(df: DataFrame, query_vec_id: int, k: int = 10, n_planes: int = 8,
             vec_col: str = "embedding", id_col: str = "vec_id", dim: int = 64,
             probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k with MULTI-PROBE SRP-LSH: candidates come from
    the query's bucket plus every bucket within ``probe_hamming`` sign
    flips (Lv et al. 2007, "Multi-Probe LSH") — the near-miss buckets a
    true neighbor most likely fell into when one projection's sign
    disagreed. probe_hamming=1 probes 1 + n_planes of the 2^n_planes
    buckets: the round-3 quality harness (tools/ann_quality.py) measured
    single-bucket recall@10 at 0.02 on the sf0.1 corpus — one bucket
    simply holds fewer rows than k — vs 0.37 with Hamming-1 probing at
    ~9x bucket selectivity still intact. At scale the bucket column is
    precomputed at ingest and probing is partition/bucket pruning over
    the probe list instead of a filter."""
    planes = random_hyperplanes(dim, n_planes)
    with_bucket = df.withColumn("__bucket", srp_bucket(F.col(vec_col), planes))
    qrow = with_bucket.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qv"), F.col("__bucket").alias("__qbucket")
    )
    # buckets within probe_hamming sign flips of the query's bucket
    hamming = F.bit_count(F.col("__bucket").bitwiseXOR(F.col("__qbucket")))
    scored = (
        with_bucket.crossJoin(F.broadcast(qrow))
        .filter((hamming <= probe_hamming) & (F.col(id_col) != query_vec_id))
        .select(id_col, "label", cosine(F.col(vec_col), F.col("__qv")).alias("cosine_sim"))
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def lsh_topk_multitable(df: DataFrame, query_vec_id: int, k: int = 10,
                        n_planes: int = 5, n_tables: int = 4,
                        probe_hamming: int = 1,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        dim: int = 64) -> DataFrame:
    """Multi-TABLE SRP-LSH: ``n_tables`` independent plane sets; a row is
    a candidate if ANY table places it within ``probe_hamming`` flips of
    the query — the standard recall lever (Indyk–Motwani style L-table
    OR-construction) when one table's all-signs-agree probability
    starves. Recall ≈ 1 - (1 - p_table)^L for per-table hit rate
    p_table, at the cost of L× the candidate sets.

    Shape: all L buckets ride in ONE projection pass (L bucket columns,
    one scan), the candidate predicate is an OR over per-table Hamming
    tests against the broadcast 1-row query, and every candidate is
    scored with the exact cosine. At ingest the L bucket columns are
    stored; probing is L bucket-pruned scans unioned before the exact
    re-rank."""
    rng_tables = [random_hyperplanes(dim, n_planes, seed=42 + 1000 * t)
                  for t in range(n_tables)]
    out = df
    for t, planes in enumerate(rng_tables):
        out = out.withColumn(f"__b{t}", srp_bucket(F.col(vec_col), planes))
    qrow = out.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qv"),
        *[F.col(f"__b{t}").alias(f"__qb{t}") for t in range(n_tables)],
    )
    hit = None
    for t in range(n_tables):
        h = F.bit_count(F.col(f"__b{t}").bitwiseXOR(F.col(f"__qb{t}"))) <= probe_hamming
        hit = h if hit is None else (hit | h)
    scored = (
        out.crossJoin(F.broadcast(qrow))
        .filter(hit & (F.col(id_col) != query_vec_id))
        .select(id_col, "label",
                cosine(F.col(vec_col), F.col("__qv")).alias("cosine_sim"))
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def _kmeans_np(X: np.ndarray, k: int, seed: int, iters: int = 25) -> np.ndarray:
    """Seeded Lloyd's k-means with k-means++ init, driver-side numpy —
    the PQ codebook trainer. Deterministic (Generator-seeded), and at
    codebook scale (≤ a few thousand sample rows × dim/m features × 16
    centroids) it runs in milliseconds where an MLlib KMeans fit pays
    seconds of fixed distributed-job cost."""
    rng = np.random.default_rng(seed)
    n = len(X)
    k = min(k, n)
    C = np.empty((k, X.shape[1]))
    C[0] = X[int(rng.integers(n))]
    d2 = ((X - C[0]) ** 2).sum(1)
    for j in range(1, k):
        tot = float(d2.sum())
        if tot <= 0.0:  # fewer distinct points than centroids
            C[j:] = X[rng.integers(n, size=k - j)]
            break
        C[j] = X[rng.choice(n, p=d2 / tot)]
        d2 = np.minimum(d2, ((X - C[j]) ** 2).sum(1))
    for _ in range(iters):
        D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = D.argmin(1)
        newC = C.copy()
        for j in range(k):
            mask = a == j
            if mask.any():
                newC[j] = X[mask].mean(0)
        if np.allclose(newC, C):
            return newC
        C = newC
    return C


def _pq_codebooks(df: DataFrame, m: int, codebook_k: int, vec_col: str,
                  id_col: str, seed: int,
                  sample_cap: int = 2048) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks on a DETERMINISTIC hash-sample
    (orderBy md5(id) LIMIT cap — TakeOrderedAndProject, bounded at any
    corpus size): k-means quality depends on the sample's coverage, not
    its count, and 2048 rows per 16-centroid/8-dim codebook is already
    ~16 points per centroid per dimension. This is the round-4 fix for
    the 34 s MLlib-KMeans build (8 sequential distributed fits of
    per-job overhead for milliseconds of actual math)."""
    # Arrow transfer (toPandas), not a pickled-row collect — same rows,
    # same order, measured ~0.4 s cheaper at sf0.1 (guide §6).
    sample = (
        df.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_cap).select(vec_col).toPandas()[vec_col]
    )
    X = np.array([np.asarray(v, dtype=np.float64) for v in sample])
    dim = X.shape[1]
    sub = dim // m
    assert sub * m == dim, f"dim {dim} not divisible by m={m}"
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    return [
        [[float(x) for x in c]
         for c in _kmeans_np(X[:, j * sub:(j + 1) * sub], codebook_k, seed + j)]
        for j in range(m)
    ]


def _pq_assign(df: DataFrame, books: list[list[list[float]]],
               vec_col: str) -> DataFrame:
    """Assign every row its m-subspace PQ code in ONE Arrow pass
    (vectorized nearest-centroid per subspace; codebooks ride in the
    closure — m×k×dim/m floats). Appends ``pq_code array<int>``; no
    shuffle, replaces the former m sequential KMeans.transform jobs."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    schema = StructType(list(df.schema.fields)
                        + [StructField("pq_code", ArrayType(IntegerType()))])
    B = [np.asarray(b, dtype=np.float64) for b in books]
    sub = B[0].shape[1]

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            codes = np.empty((len(V), len(B)), dtype=np.int64)
            for j, Bj in enumerate(B):
                S = V[:, j * sub:(j + 1) * sub]
                D = ((S[:, None, :] - Bj[None, :, :]) ** 2).sum(-1)
                codes[:, j] = D.argmin(1)
            out = pdf.copy()
            out["pq_code"] = [list(map(int, c)) for c in codes]
            yield out

    return df.mapInPandas(gen, schema)


def pq_topk(df: DataFrame, query_vec_id: int, k: int = 10, m: int = 8,
            codebook_k: int = 16, refine: int | None = None,
            vec_col: str = "embedding", id_col: str = "vec_id",
            seed: int = 42,
            target_recall: float = DEFAULT_TARGET_RECALL) -> DataFrame:
    """Product-quantization (PQ) approximate top-k with ADC scoring and
    exact re-rank — the memory-bound ANN path (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011).

    Index side: every vector is L2-normalized (so L2 ranking ≡ cosine
    ranking: ‖a−b‖² = 2−2·cos when ‖a‖=‖b‖=1), split into ``m``
    subvectors, and each subspace gets a ``codebook_k``-centroid KMeans
    codebook; a vector's code is its m nearest-centroid ids — 64 dims
    of float32 compress to m bytes. At 100 TB the codes are computed
    ONCE at ingest and stored as an array<int> column; only the
    codebooks (m × k × dim/m floats — driver-tiny) persist off-table.

    Query side (asymmetric distance computation): the query's exact
    distance to every centroid of every subspace forms an m×k lookup
    table, baked into the plan as literal arrays; a candidate's
    approximate distance is m array lookups summed — no per-row float
    vector math, no shuffle, one scan. The best ``refine`` candidates
    get exact cosine re-ranked, which recovers most of the recall PQ
    loses to quantization.

    Training is driver-side seeded numpy k-means on a deterministic
    hash-sample (``_pq_codebooks``) and assignment one Arrow pass
    (``_pq_assign``) — identical codebooks to ``pq_build_index``, so
    this per-call path and the materialized index return the same
    results.
    """
    if df.filter(F.col(id_col) == query_vec_id).isEmpty():
        return df.select(
            id_col, "label", F.lit(0.0).alias("cosine_sim")).limit(0)
    if refine is None:
        refine = resolve_refine(k, target_recall)

    books = _pq_codebooks(df, m, codebook_k, vec_col, id_col, seed)
    assigned = _pq_assign(df, books, vec_col)

    qrow = df.filter(F.col(id_col) == query_vec_id).select(vec_col).first()
    tables = pq_adc_tables(books, qrow[0])
    approx = F.lit(0.0)
    for j, tbl in enumerate(tables):
        lit_tbl = F.array(*[F.lit(v) for v in tbl])
        approx = approx + F.element_at(lit_tbl, F.element_at("pq_code", j + 1) + 1)

    cand = _adc_shortlist(
        assigned.filter(F.col(id_col) != query_vec_id)
        .select(id_col, "label", vec_col, approx.alias("__adc")),
        refine, id_col)
    qdf = df.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qv"))
    return (
        cand.crossJoin(F.broadcast(qdf))
        .select(id_col, "label",
                cosine(F.col(vec_col), F.col("__qv")).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def pq_build_index(df: DataFrame, index_dir: str, m: int = 8,
                   codebook_k: int = 16, vec_col: str = "embedding",
                   id_col: str = "vec_id", seed: int = 42) -> list[list[list[float]]]:
    """Ingest-time PQ index build — the 100 TB shape the per-call
    ``pq_topk`` only approximates (mirrors ``ivf_build_index``): train the
    m per-subspace KMeans codebooks ONCE over the corpus, assign every
    vector its m-byte code, and materialize the table with the code as an
    ``array<int>`` column. Only the codebooks (m × codebook_k × dim/m
    doubles — driver-tiny at any corpus size) persist off-table as JSON.

    Query time then does zero training and zero per-row vector math until
    the final exact re-rank of ``refine`` candidates — see
    ``pq_topk_indexed``. The O(corpus) quantizer work happens once per
    ingest, not per query.

    Round-4 build-cost fix (VERDICT r03 item 6): codebooks train as
    seeded numpy k-means++ on a deterministic hash-sample
    (``_pq_codebooks``) instead of m sequential MLlib KMeans fits — the
    former 34 s build at sf0.1 was per-job JVM overhead, not math — and
    code assignment is ONE Arrow ``mapInPandas`` pass over the corpus
    (``_pq_assign``) instead of m transform jobs. The corpus-sized work
    (one scan + one write) is unchanged in shape.
    """
    import json
    import os

    books = _pq_codebooks(df, m, codebook_k, vec_col, id_col, seed)
    coded = _pq_assign(df, books, vec_col)

    os.makedirs(index_dir, exist_ok=True)
    coded.write.mode("overwrite").parquet(os.path.join(index_dir, "vectors"))
    with open(os.path.join(index_dir, "codebooks.json"), "w") as f:
        json.dump(books, f)
    return books


def pq_adc_tables(books: list[list[list[float]]], query_vec) -> list[list[float]]:
    """Driver-side ADC lookup tables: exact squared-L2 from each normalized
    query subvector to every centroid of its subspace codebook — m×k
    doubles, baked into the query plan as literals."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    m = len(books)
    sub = len(books[0][0])
    tables = []
    for j, book in enumerate(books):
        qs = q[j * sub:(j + 1) * sub]
        tables.append([float(np.sum((qs - np.asarray(c)) ** 2)) for c in book])
    assert m * sub == len(q)
    return tables


def pq_topk_indexed(spark, index_dir: str, query_vec, k: int = 10,
                    refine: int | None = None, vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    exclude_id: int | None = None,
                    target_recall: float = DEFAULT_TARGET_RECALL) -> DataFrame:
    """Query a materialized PQ index (mirrors ``ivf_topk_indexed``): load
    the stored codebooks, build the query's m×k ADC table driver-side, and
    score candidates as m array lookups summed over the STORED
    ``pq_code`` column — no KMeans fit, no per-row float vector math, one
    scan. The best ``refine`` candidates get exact cosine re-ranked.

    ``refine=None`` (default) resolves from ``target_recall`` against
    the measured calibration table (see resolve_refine) — shortlist 80*k
    at the 0.9 default; the old refine-50 constant silently served
    ~0.62-recall neighbors."""
    import json
    import os

    if refine is None:
        refine = resolve_refine(k, target_recall)
    with open(os.path.join(index_dir, "codebooks.json")) as f:
        books = json.load(f)
    tables = pq_adc_tables(books, query_vec)

    approx = F.lit(0.0)
    for j, tbl in enumerate(tables):
        lit_tbl = F.array(*[F.lit(v) for v in tbl])
        approx = approx + F.element_at(lit_tbl, F.element_at("pq_code", j + 1) + 1)

    scan = spark.read.parquet(os.path.join(index_dir, "vectors"))
    if exclude_id is not None:
        scan = scan.filter(F.col(id_col) != exclude_id)
    cand = _adc_shortlist(
        scan.select(id_col, "label", vec_col, approx.alias("__adc")),
        refine, id_col)
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(id_col, "label",
                    cosine(F.col(vec_col), qv).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def _gemm_pair_survivors(e: DataFrame, group_cols: list[str],
                         chunk_rows: int, thr: float,
                         pre_margin: float = 1e-4) -> DataFrame:
    """Chunk-pair GEMM core shared by the exact and the routed paths of
    ``cosine_pairs_blas``: complete within-group pair enumeration over
    ``e`` (``group_cols…, __id, __vec, __norm``), prescreened as float32
    GEMM batches and finalized IN-TASK with the exact sequential-double
    cosine. Returns (id_a, id_b, cosine_sim) with exact cosine >=
    ``thr``, oriented id_a < id_b; each pair is emitted by exactly ONE
    chunk-pair group of its own group key (a pair may still recur across
    DIFFERENT group keys — the multi-table routed caller dedups).

    Two-precision discipline: the quadratic part runs as float32 GEMM
    over UNIT-NORMALIZED copies (normalized in double, rounded to
    float32 — half the bandwidth and ~2x the FLOPS of float64), so every
    GEMM entry is a cosine with error bounded by ~dim·eps32 ≈ 3.9e-6
    regardless of vector scale (normalizing first is what makes the
    bound scale-free: raw-product GEMM underflows near-FLT_MIN vectors
    to dot 0 and drops true matches). A ``pre_margin`` of 1e-4 thus
    makes the prescreen a >25x-safety superset.
    Prescreen survivors — a set ~the OUTPUT size, not the candidate
    count — are then scored with numpy ``cumsum`` over the exact double
    products: cumsum is a strict left-to-right IEEE double fold, i.e.
    bit-identical to the Catalyst ``aggregate(zip_with(...))`` dot the
    naive form (and the DuckDB oracle) computes, and the row's stored
    ``__norm`` doubles are reused verbatim — so the emitted score needs
    no join-back re-score stage at all.

    Per-task memory is bounded at ~2·chunk_rows·dim vectors + a
    stripe×chunk_rows float32 G slab + a score-batch of exact products,
    regardless of group size (chunk_rows trades shuffle replication —
    one copy per partner chunk — against task count, not memory)."""
    import pandas as pd

    counts = e.groupBy(*group_cols).agg(F.count("*").alias("__n"))
    e = e.join(F.broadcast(counts), group_cols)
    nchunks = F.greatest(F.lit(1), F.ceil(F.col("__n") / F.lit(chunk_rows))).cast("int")
    chunk = F.pmod(F.xxhash64("__id"), nchunks).cast("int")
    # One entry per partner chunk p: the row joins group (min(c,p), max(c,p)).
    tagged = (
        e.withColumn("__c", chunk)
        .withColumn("__p", F.explode(F.sequence(F.lit(0), nchunks - 1)))
        .select(
            *group_cols,
            F.least("__c", "__p").alias("__i"),
            F.greatest("__c", "__p").alias("__j"),
            "__c", "__id", "__vec", "__norm",
        )
    )

    # GEMM stripe height (rows of G per slab) and exact-score batch
    # (pairs per cumsum call): both bound peak memory independent of
    # chunk_rows and of how dense the survivor set is.
    stripe = 512
    score_batch = 1 << 18
    pre = thr - pre_margin

    def _pairs(A32, B32, A64, B64, na, nb, aid, bid, same):
        out_a, out_b, out_s = [], [], []
        for s in range(0, len(A32), stripe):
            t = s + stripe
            # A32/B32 are pre-NORMALIZED: entries of g are already
            # cosines, O(1) magnitude at any vector scale.
            g = (A32[s:t] @ B32.T).astype(np.float64)
            ia, ib = np.nonzero(g >= pre)
            if same:
                keep = aid[s:t][ia] < bid[ib]
                ia, ib = ia[keep], ib[keep]
            for u in range(0, len(ia), score_batch):
                v = u + score_batch
                iau, ibu = ia[u:v], ib[u:v]
                # exact sequential double fold == aggregate(zip_with(...))
                prods = A64[s:t][iau] * B64[ibu]
                dots = np.cumsum(prods, axis=1)[:, -1]
                cs = dots / (na[s:t][iau] * nb[ibu])
                m = cs >= thr
                x, y = aid[s:t][iau][m], bid[ibu][m]
                if not same:
                    x, y = np.minimum(x, y), np.maximum(x, y)
                out_a.append(x); out_b.append(y); out_s.append(cs[m])
        if not out_a:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.float64))
        return (np.concatenate(out_a), np.concatenate(out_b),
                np.concatenate(out_s))

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "cosine_sim": pd.Series([], dtype="float64")})

    def _score(key, pdf):
        ci, cj = key[-2], key[-1]
        raw = np.stack(pdf["__vec"].to_numpy())
        m64 = raw.astype(np.float64)
        ids = pdf["__id"].to_numpy()
        norms = pdf["__norm"].to_numpy(dtype=np.float64)
        # Normalize in DOUBLE, then round to float32 for the GEMM: the
        # prescreen matrix holds unit vectors, so its entries are true
        # cosines with error ~dim·eps32 at ANY vector scale. GEMM-ing the
        # RAW float32 values and dividing by the norm product afterwards
        # is NOT scale-free: a pair of tiny vectors (components near
        # FLT_MIN) underflows the float32 dot to 0 while its true cosine
        # is 1.0, and the prescreen silently drops a qualifying pair
        # (hypothesis-found). Zero-norm vectors divide by 1 instead: the
        # normalized row stays all-zero and no pair involving it can
        # reach any positive prescreen threshold; if thr <= pre_margin
        # lets one through, the exact 0/0 = NaN re-score still drops it
        # exactly like the naive expression path.
        safe = np.where(norms == 0.0, 1.0, norms)
        m32 = (m64 / safe[:, None]).astype(np.float32)
        if ci == cj:
            id_a, id_b, cs = _pairs(m32, m32, m64, m64, norms, norms,
                                    ids, ids, same=True)
        else:
            a_mask = (pdf["__c"] == ci).to_numpy()
            A32, B32 = m32[a_mask], m32[~a_mask]
            A64, B64 = m64[a_mask], m64[~a_mask]
            na, nb = norms[a_mask], norms[~a_mask]
            aid, bid = ids[a_mask], ids[~a_mask]
            if len(A32) == 0 or len(B32) == 0:
                return empty
            id_a, id_b, cs = _pairs(A32, B32, A64, B64, na, nb,
                                    aid, bid, same=False)
        return pd.DataFrame({"id_a": id_a.astype("int64"),
                             "id_b": id_b.astype("int64"),
                             "cosine_sim": cs})

    return tagged.groupBy(*group_cols, "__i", "__j").applyInPandas(
        _score, schema="id_a long, id_b long, cosine_sim double")


#: rows per IVF list in the fixed-list regime (the r5 scaling-measurement
#: shape: constant rows/list ⇒ constant per-row scoring cost).
ROUTED_LIST_ROWS = 1250
#: n_lists of the knobless recall_fraction regime (ivf_knn_join default).
ROUTED_DEFAULT_LISTS = 16
#: fixed probe count of the fixed-list regime.
ROUTED_FIXED_PROBE = 12


def ann_regime_costs(rows: int,
                     target_recall: float = DEFAULT_TARGET_RECALL) -> dict:
    """Estimated scored candidates PER ROW under each bulk-ANN regime —
    the cost model the cutover decides on (r9 verdict item 1: the old
    row-count threshold left a superlinear mid-scale pocket where the
    fraction regime kept running after the fixed-list regime was
    already cheaper).

    - ``recall_fraction`` (knobless default): 16 lists, probe count from
      the measured recall table (12 at the 0.9 target) — candidates/row
      ≈ rows × n_probe/16, a fixed 0.75 FRACTION of the quadratic.
    - ``fixed_list_size``: n_lists = ceil(rows / 1250) at probe 12 —
      candidates/row ≈ 12 × 1250 = 15,000, CONSTANT.

    The regimes cross where rows × probe/16 = probe × rows/n_lists,
    i.e. where ceil(rows/1250) exceeds 16: rows = 20,000 — far below
    the old 100k threshold, which is exactly the measured pocket
    (sf3 ann_knn_join 28.2 s > sf10 25.1 s; dedup_embedding_topk sf30
    103.5 s > sf60 66.1 s on the committed r9 curve)."""
    import math

    n_probe_frac = resolve_n_probe(ROUTED_DEFAULT_LISTS, target_recall)
    n_lists = max(1, math.ceil(rows / ROUTED_LIST_ROWS))
    return {
        "rows": int(rows),
        "fraction_cand_per_row": rows * n_probe_frac / ROUTED_DEFAULT_LISTS,
        "fixed_cand_per_row": ROUTED_FIXED_PROBE * rows / n_lists,
        "fixed_n_lists": n_lists,
    }


def routed_ivf_params(max_big_rows: int,
                      target_recall: float = DEFAULT_TARGET_RECALL) -> dict:
    """IVF knobs for routed oversized blocks / bulk k-NN corpora: the
    regime cutover is the PER-BLOCK COST MODEL in ``ann_regime_costs``
    — whichever regime estimates fewer scored candidates per row wins,
    so the wall curve is monotone in data size by construction (min of
    a linear and a constant per-row cost). Empty dict = keep the
    knobless recall_fraction defaults; otherwise the fixed-list knobs
    (n_lists scaled to ~1,250 rows/list on the LARGEST routed block —
    ``ivf_knn_join`` shares one quantizer across blocks, and smaller
    routed blocks just see fewer members per list, never more).

    ``config.ANN_JOIN_FIXED_LIST_CUTOVER_ROWS`` (env
    SPARK_GRAFT_ANN_JOIN_CUTOVER_ROWS) remains as an explicit OVERRIDE
    row threshold for A/B probes and regime tests; unset (the default)
    means the cost model decides."""
    from ..config import ANN_JOIN_FIXED_LIST_CUTOVER_ROWS

    costs = ann_regime_costs(max_big_rows, target_recall)
    if ANN_JOIN_FIXED_LIST_CUTOVER_ROWS is not None:
        use_fixed = max_big_rows > ANN_JOIN_FIXED_LIST_CUTOVER_ROWS
    else:
        use_fixed = costs["fixed_cand_per_row"] < costs["fraction_cand_per_row"]
    if use_fixed:
        n_lists = costs["fixed_n_lists"]
        return {"n_lists": n_lists, "n_probe": ROUTED_FIXED_PROBE,
                "sample_cap": max(4096, 4 * n_lists)}
    return {}


def srp_route_params(threshold: float, n_planes: int = 8,
                     recall: float = 0.95) -> tuple[int, int] | None:
    """(n_planes, n_tables) for SRP-LSH candidate routing at ``threshold``,
    or None when routing cannot beat exact enumeration.

    SRP bit-agreement probability for a pair at cosine t is
    p = 1 − arccos(t)/π (Charikar 2002); a pair lands in the same bucket
    of one table with p^n_planes, and in ≥1 of L tables with
    1−(1−p^n_planes)^L. L is the smallest table count reaching ``recall``
    for a pair EXACTLY AT the threshold (higher cosine ⇒ higher recall;
    exact duplicates are found with probability 1). Expected quadratic
    work shrinks by ~2^n_planes/L under uniform buckets — when that
    factor falls below 4× (low thresholds need too many tables), routing
    is refused: all-pairs at low cosine thresholds has a near-quadratic
    OUTPUT, so no candidate generator can make it sub-quadratic."""
    import math

    p = 1.0 - math.acos(min(max(float(threshold), -1.0), 1.0)) / math.pi
    if p >= 1.0 - 1e-12:
        return n_planes, 1
    if p <= 0.0:
        return None
    hit = p ** n_planes
    tables = math.ceil(math.log(1.0 - recall) / math.log(1.0 - hit))
    if tables * 4 > 2 ** n_planes:
        return None
    return n_planes, max(1, tables)


def _srp_subblock(big: DataFrame, n_planes: int, n_tables: int,
                  seed: int) -> DataFrame:
    """Fan each oversized-block row out to its (table, SRP-bucket) keys:
    one Arrow pass computes all L tables' sign-bucket ids per row as
    numpy GEMM against seeded Gaussian hyperplanes (deterministic per
    table — same planes on every partition, so bucketing is
    partition-invariant). Output replicates each row L× with ``__t``
    (table) and ``__b`` (bucket) appended — the routed candidate space is
    complete pairs WITHIN each (block, table, bucket)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema = StructType(
        list(big.schema.fields)
        + [StructField("__t", IntegerType()), StructField("__b", LongType())]
    )
    pow2 = np.power(2.0, np.arange(n_planes))

    def gen(batches):
        planes: dict[tuple[int, int], np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf["__vec"]])
            dim = V.shape[1]
            for t in range(n_tables):
                P = planes.get((t, dim))
                if P is None:
                    rng = np.random.default_rng(seed + 1000 * t)
                    P = planes.setdefault((t, dim),
                                          rng.standard_normal((n_planes, dim)))
                b = ((V @ P.T) >= 0).astype(np.float64) @ pow2
                out = pdf.copy()
                out["__t"] = np.int32(t)
                out["__b"] = b.astype(np.int64)
                yield out

    return big.mapInPandas(gen, schema)


def cosine_pairs_blas(df: DataFrame, block_col: str, id_col: str,
                      vec_col: str, threshold: float,
                      chunk_rows: int = 4096,
                      pre_margin: float = 1e-4,
                      max_block_rows: int | None = 100_000,
                      on_oversize: str = "route",
                      srp_seed: int = 42,
                      cap_k: int = 5) -> DataFrame:
    """All within-block pairs with cosine >= ``threshold`` — EXACT result,
    BLAS-speed candidate scoring.

    The naive shape (``blocked_pair_join`` + per-pair ``zip_with`` dot)
    scores every candidate pair through a Catalyst higher-order function:
    correct, but the per-pair interpreter cost dominates once blocks are
    thousands of rows (candidates grow quadratically in block size —
    sf10 measures 2G candidates for 24M output pairs).
    Here the quadratic part runs as float32 numpy GEMM and only the
    prescreen survivors (~output-sized) pay the exact sequential score,
    computed IN the same task (no join-back stage):

    1. Chunk each block into ``ceil(n_block / chunk_rows)`` hash-chunks
       (``xxhash64(id) % nchunks`` — no global row_number window, so no
       per-block single-task sort at scale).
    2. Explode each row to every chunk-pair group it participates in
       ((block, i, j), i <= j) — replication factor = nchunks per row,
       the standard blocked all-pairs matrix shape. Each group is one
       Arrow batch to one task: parallelism = blocks x nchunks^2/2.
    3. ``applyInPandas`` per group (``_gemm_pair_survivors``): float32
       GEMM prescreen at threshold - 1e-4 (a proven superset: float32
       GEMM cosine error is bounded by ~dim·eps32 ≈ 3.9e-6), then the
       exact left-to-right double fold via ``cumsum`` — bit-identical
       to the ``aggregate(zip_with(...))`` expression and to DuckDB's
       ``list_cosine_similarity`` — on survivors only, filtered at the
       true threshold. Output is bit-identical to the naive form.

    At 100 TB the replication factor (nchunks per block) is the knob:
    chunk_rows sets the replication (shuffled bytes = input x nchunks)
    while the striped GEMM keeps per-task memory at ~stripe x chunk_rows
    x 4B for G; nothing downstream shuffles more than the output itself.

    OVERSIZED-BLOCK GUARD (``max_block_rows``, default 100k): complete
    enumeration is O(n²) per block, so one hot block (every doc under a
    single label) is a job-killer at corpus scale no matter how fast each
    candidate scores. Blocks at or under the cap take the exact path
    above; larger blocks are governed by ``on_oversize``:

    - ``"route"`` (default): candidates come from SRP-LSH multi-table
      sub-blocking instead of complete enumeration — each oversized-block
      row fans out to L (table, sign-bucket) keys (``_srp_subblock``) and
      only within-bucket pairs are scored, with (n_planes, L) derived
      from the threshold by ``srp_route_params`` (recall ≥0.95 for pairs
      at the threshold, ~2^n_planes/L expected work reduction). Survivors
      dedup across tables, then re-score through the same bit-exact
      expression — so routed pairs that ARE reported carry exact scores;
      the approximation is bounded RECALL on oversized blocks only.
      Thresholds too low for LSH to pay (see ``srp_route_params``) fall
      back to the output-CAPPED per-doc form: the complete listing at a
      low threshold has near-quadratic OUTPUT, so oversized blocks emit
      each row's top-``cap_k`` neighbors at or above the threshold via
      the block-scoped ``ivf_knn_join`` decomposition (the
      ``dedup_embedding_topk`` semantics — linear output, IVF-bounded
      recall), canonicalized to undirected pairs; the ``capped_topk``
      regime is stamped into decisions so artifacts can't pass the
      capped output off as complete.
    - ``"error"``: raise at RUNTIME if an oversized block exists (plans
      on corpora with bounded blocks run unaffected).
    - ``"exact"``: explicit opt-in to the unbounded quadratic.
    """
    if on_oversize not in ("route", "error", "exact"):
        raise ValueError(f"on_oversize must be route|error|exact, got {on_oversize!r}")

    e = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        norm(F.col(vec_col)).alias("__norm"),
    )
    thr = float(threshold)
    pm = float(pre_margin)

    if max_block_rows is None:
        survivors = _gemm_pair_survivors(e, ["__blk"], chunk_rows, thr, pm)
    else:
        bc = e.groupBy("__blk").agg(F.count("*").alias("__bn"))
        sized = e.join(F.broadcast(bc), "__blk")
        small = sized.filter(F.col("__bn") <= max_block_rows).drop("__bn")
        big = sized.filter(F.col("__bn") > max_block_rows).drop("__bn")
        survivors = _gemm_pair_survivors(small, ["__blk"], chunk_rows, thr, pm)
        route = srp_route_params(threshold) if on_oversize == "route" else None
        if on_oversize == "exact":
            survivors = survivors.unionByName(
                _gemm_pair_survivors(big, ["__blk"], chunk_rows, thr, pm))
        elif route is not None:
            n_planes, n_tables = route
            sub = _srp_subblock(big, n_planes, n_tables, srp_seed)
            # distinct: a pair found by several tables must score once
            # distinct is safe WITH the score: the exact fold gives the
            # same bits for the same pair in every table
            routed = _gemm_pair_survivors(
                sub, ["__blk", "__t", "__b"], chunk_rows, thr, pm).distinct()
            survivors = survivors.unionByName(routed)
        elif on_oversize == "route":
            # Threshold too low for SRP routing (near-quadratic OUTPUT —
            # no candidate generator can make the complete listing
            # sub-quadratic). Instead of refusing, oversized blocks
            # degrade to the output-CAPPED per-doc form: each row emits
            # its top-``cap_k`` neighbors at cosine >= threshold via the
            # block-scoped ``ivf_knn_join`` decomposition (linear, the
            # ``dedup_embedding_topk`` semantics), canonicalized to
            # undirected pairs. Bounded blocks stay EXACT and complete;
            # the capped regime is stamped into decisions so a bench
            # artifact can't pass it off as the complete listing. The
            # block stats collect is one tiny agg job (block-cardinality
            # rows) and doubles as the empty-check: with no oversized
            # block, nothing is added and no quantizer job runs.
            big_stats = bc.filter(F.col("__bn") > max_block_rows).collect()
            if big_stats:
                max_big = max(r["__bn"] for r in big_stats)
                knobs = routed_ivf_params(max_big)
                from .. import decisions
                decisions.record(
                    oversize_regime="capped_topk", cap_k=int(cap_k),
                    capped_blocks=len(big_stats), capped_max_block=max_big,
                    **{f"route_{k_}": v for k_, v in knobs.items()})
                knn = ivf_knn_join(
                    big.select("__blk", "__id", "__vec"),
                    id_col="__id", vec_col="__vec", block_col="__blk",
                    k=cap_k, threshold=thr,
                    # exact stats (the derived frame's Catalyst estimate
                    # inflates — r10 advice; counts already in hand)
                    rows_hint=sum(r["__bn"] for r in big_stats),
                    n_blocks_hint=len(big_stats), **knobs)
                # A pair can be reported from both endpoints' top-k with
                # (rarely) different GEMM bits — canonicalize on the id
                # pair and keep the max, a deterministic reduction.
                capped = (
                    knn.select(F.least("src", "dst").alias("id_a"),
                               F.greatest("src", "dst").alias("id_b"),
                               "cosine_sim")
                    .groupBy("id_a", "id_b")
                    .agg(F.max("cosine_sim").alias("cosine_sim")))
                survivors = survivors.unionByName(capped)
        else:
            msg = (
                f"cosine_pairs_blas: a block exceeds max_block_rows="
                f"{max_block_rows} (on_oversize='error'). Raise "
                "max_block_rows, use a finer block_col, on_oversize="
                "'route' (SRP sub-blocking at routable thresholds, "
                "output-capped top-k otherwise), or on_oversize='exact' "
                "to accept the quadratic."
            )

            def _boom(key, pdf):  # runs only if an oversized block EXISTS
                raise ValueError(msg)

            survivors = survivors.unionByName(
                big.groupBy("__blk").applyInPandas(
                    _boom, schema="id_a long, id_b long, cosine_sim double"))

    # scores are already exact (in-task sequential fold) and filtered at
    # the true threshold — no join-back stage
    return survivors.select("id_a", "id_b", "cosine_sim")


def nn_top1_blas(df: DataFrame, block_col: str, id_col: str,
                 vec_col: str, chunk_rows: int = 1024,
                 margin: float = 1e-9,
                 max_block_rows: int | None = 100_000,
                 on_oversize: str = "error") -> DataFrame:
    """Each row's EXACT top-1 cosine neighbor within its block
    (deterministic argmax: score desc, neighbor id asc) — GEMM-speed
    candidate generation, bit-exact final scoring.

    Same chunk-pair decomposition as ``cosine_pairs_blas``, different
    reduction: each chunk-pair GEMM emits, per row, every partner in the
    group whose GEMM cosine is within ``margin`` of that row's group
    maximum (normally exactly one row; more only under near-ties). The
    margin argument mirrors cosine_pairs_blas: GEMM and the sequential
    exact dot differ by < ~1.5e-14, so the row's true argmax is always
    within margin of its group's GEMM max and therefore always emitted
    by its group. The union of per-group candidates (~nchunks per row)
    is re-scored with the exact expression and reduced by one window
    argmax with the deterministic tie-break — identical output to
    scoring all pairs exactly, at GEMM cost per candidate.

    Returns (src, dst): src = every row id that has a neighbor in its
    block, dst = its exact top-1 neighbor. The output feeds NN-graph
    consumers (clustering, PageRank).

    Oversized-block guard (mirrors ``cosine_pairs_blas``): complete
    enumeration is O(n²) per block, so blocks beyond ``max_block_rows``
    fail fast by default (``on_oversize="error"``) rather than silently
    job-killing at corpus scale — EXACT top-1 has no sub-quadratic
    complete algorithm (the nearest neighbor can sit at any cosine, so
    LSH bucketing cannot guarantee it); route genuinely hot blocks
    through the ANN index paths (IVF/PQ per-query top-k) and accept
    approximate neighbors, or opt into the quadratic with
    ``on_oversize="exact"``.
    """
    import pandas as pd
    from pyspark.sql import Window

    if on_oversize not in ("error", "exact"):
        raise ValueError(f"on_oversize must be error|exact, got {on_oversize!r}")

    e = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        norm(F.col(vec_col)).alias("__norm"),
    )
    # cosine is undefined against a zero vector: as a source its GEMM row
    # is all zeros (row_max 0 emits EVERY partner), and its exact re-score
    # is 0/0 = NaN, which Spark orders as the LARGEST double — the window
    # argmax would pick a NaN-scored arbitrary partner. Drop zero-norm
    # rows up front; they have no defined neighbor in either direction.
    e = e.filter(F.col("__norm") > 0.0)
    counts = e.groupBy("__blk").agg(F.count("*").alias("__n"))
    e = e.join(F.broadcast(counts), "__blk")

    guard = None
    if max_block_rows is not None and on_oversize == "error":
        msg = (
            f"nn_top1_blas: a block exceeds max_block_rows={max_block_rows}; "
            "exact all-pairs top-1 is quadratic per block. Use a finer "
            "block_col, the ANN index paths (ivf_topk_indexed/"
            "pq_topk_indexed) for approximate neighbors, or pass "
            "on_oversize='exact' to accept the quadratic."
        )

        def _boom(key, pdf):  # runs only if an oversized block EXISTS
            raise ValueError(msg)

        guard = (
            e.filter(F.col("__n") > max_block_rows)
            .groupBy("__blk").applyInPandas(_boom, schema="src long, dst long")
        )
    nchunks = F.greatest(F.lit(1), F.ceil(F.col("__n") / F.lit(chunk_rows))).cast("int")
    chunk = F.pmod(F.xxhash64("__id"), nchunks).cast("int")
    tagged = (
        e.withColumn("__c", chunk)
        .withColumn("__p", F.explode(F.sequence(F.lit(0), nchunks - 1)))
        .select(
            "__blk",
            F.least("__c", "__p").alias("__i"),
            F.greatest("__c", "__p").alias("__j"),
            "__c", "__id", "__vec", "__norm",
        )
    )

    mg = float(margin)

    def _cands(key, pdf):
        _, ci, cj = key
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
        ids = pdf["__id"].to_numpy()
        norms = pdf["__norm"].to_numpy(dtype=np.float64)
        # normalize BEFORE the GEMM (see _gemm_pair_survivors): entries
        # become true cosines at any vector scale instead of raw dots
        # that can under/overflow ahead of the norm-product division
        mat = mat / np.where(norms == 0.0, 1.0, norms)[:, None]

        def emit(g, src_ids, dst_ids):
            # per source row: all partners within margin of its row max
            if g.size == 0:
                return [], []
            row_max = g.max(axis=1, keepdims=True)
            ia, ib = np.nonzero(g >= row_max - mg)
            return src_ids[ia], dst_ids[ib]

        srcs, dsts = [], []
        if ci == cj:
            if len(ids) < 2:
                return pd.DataFrame({"src": [], "dst": []}).astype("int64")
            g = mat @ mat.T
            np.fill_diagonal(g, -np.inf)  # a row is not its own neighbor
            s, d = emit(g, ids, ids)
            srcs.append(s); dsts.append(d)
        else:
            a_mask = (pdf["__c"] == ci).to_numpy()
            A, B = mat[a_mask], mat[~a_mask]
            if len(A) and len(B):
                aid, bid = ids[a_mask], ids[~a_mask]
                g = A @ B.T
                s, d = emit(g, aid, bid)
                srcs.append(s); dsts.append(d)
                s, d = emit(g.T, bid, aid)
                srcs.append(s); dsts.append(d)
        if not srcs:
            return pd.DataFrame({"src": [], "dst": []}).astype("int64")
        return pd.DataFrame({
            "src": np.concatenate(srcs).astype("int64"),
            "dst": np.concatenate(dsts).astype("int64"),
        })

    cands = tagged.groupBy("__blk", "__i", "__j").applyInPandas(
        _cands, schema="src long, dst long")
    if guard is not None:
        cands = cands.unionByName(guard)

    keyed = e.select("__id", "__vec", "__norm")
    exact = dot(F.col("a.__vec"), F.col("b.__vec")) / (
        F.col("a.__norm") * F.col("b.__norm"))
    scored = (
        cands.join(keyed.alias("a"), cands.src == F.col("a.__id"))
        .join(keyed.alias("b"), cands.dst == F.col("b.__id"))
        .select("src", "dst", exact.alias("s"))
    )
    # belt-and-braces: zero-norm rows are filtered above, but a NaN score
    # must never reach the argmax window (Spark sorts NaN as largest)
    scored = scored.filter(~F.isnan(F.col("s")))
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("src", "dst")
    )


def cosine_topk_per_row_blas(df: DataFrame, block_col: str, id_col: str,
                             vec_col: str, k: int = 5,
                             threshold: float = 0.0,
                             chunk_rows: int = 1024,
                             margin: float = 1e-9,
                             max_block_rows: int | None = 100_000,
                             target_chunks_per_block: int = 16,
                             reduction: str = "window",
                             on_oversize: str = "error",
                             route_target_recall: float = DEFAULT_TARGET_RECALL) -> DataFrame:
    """Each row's EXACT top-k cosine neighbors within its block, at or
    above ``threshold`` — the LINEAR-output near-dup listing (output ≤
    k rows per input row) that replaces the all-pairs variant when the
    pair count would be quadratic by semantics. Deterministic ordering:
    score desc, neighbor id asc.

    Same chunk-pair GEMM decomposition as ``nn_top1_blas``, generalized
    reduction: each chunk-pair group emits, per row, every partner whose
    GEMM cosine is within ``margin`` of the row's k-th largest IN THAT
    GROUP (a true global top-k partner ranks ≤ k within any group that
    contains it — a subset rank never exceeds the global rank — so it is
    always emitted by its group), intersected with the threshold
    prescreen (GEMM ≥ threshold − margin, a superset of the exact
    filter). Candidates are scored IN-TASK with the exact sequential
    double fold (``cumsum`` — bit-identical to the
    ``aggregate(zip_with(...))`` expression and the DuckDB oracle; same
    discipline as ``_gemm_pair_survivors``, no join-back stage), then
    one bounded per-source window keeps the global top-k. Identical
    output to exact all-pairs scoring + top-k, at GEMM cost.

    Scale shape: candidate volume is O(rows · nchunks · k) — LINEAR in
    corpus size for fixed block sizes — and the final window partitions
    by source id over ≤ nchunks·k rows each, so no stage holds more than
    a bounded multiple of the output. chunk_rows stays at 1024 — the A/B
    at sf10 (200k vectors, warmed, same session) measured 17.7 s at 1024
    vs 21.1 s at 4096: larger chunks DO cut candidate duplication
    (nchunks·k per row) but cost more in task granularity (fewer,
    lumpier GEMM groups under-use the 32 cores) than the smaller window
    input saves. Zero-norm rows are dropped up
    front (cosine undefined; same discipline as nn_top1_blas).

    Returns (src, dst, cosine_sim). Oversized blocks (``max_block_rows``)
    are governed by ``on_oversize``:

    - ``"error"`` (default): raise at RUNTIME if an oversized block
      exists — exact top-k has no sub-quadratic complete algorithm.
    - ``"route"``: hot blocks take the ``ivf_knn_join`` decomposition
      (block-scoped, shared quantizer, candidates bounded at
      n_probe·k per row — no corpus-wide candidate window, so the
      window-sort spill this exact path measures at its guard edge
      disappears) at ``route_target_recall`` (default 0.9; measured
      0.947 at the knobless probe). Bounded blocks stay EXACT; the
      approximation is recall on oversized blocks only, and every
      reported score is a true cosine.
    - ``"exact"``: explicit opt-in to the unbounded quadratic.
    """
    import pandas as pd
    from pyspark.sql import Window

    if on_oversize not in ("route", "error", "exact"):
        raise ValueError(
            f"on_oversize must be route|error|exact, got {on_oversize!r}")

    e = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        norm(F.col(vec_col)).alias("__norm"),
    )
    e = e.filter(F.col("__norm") > 0.0)
    counts = e.groupBy("__blk").agg(F.count("*").alias("__n"))
    e = e.join(F.broadcast(counts), "__blk")

    guard = None
    routed = None
    if max_block_rows is not None and on_oversize == "route":
        # Size the routed IVF from the actual oversized-block stats (one
        # tiny agg job — block_col cardinality rows; replaces the eager
        # quantizer-sample job ivf_knn_join used to run even when no
        # block was oversized). The regime comes from routed_ivf_params'
        # COST MODEL (r10): every routable block (> 32,768 rows) sits
        # above the 20k fraction/fixed-list cost crossover, so routed
        # blocks always get fixed-list knobs — the r9 row-count threshold
        # (100k) left 32k–100k blocks in the fraction regime and the
        # committed sf30 point (65k blocks) measured 103.5 s vs 66.1 s at
        # sf60 under fixed-list: a non-monotone pocket, now closed.
        big_stats = counts.filter(F.col("__n") > max_block_rows).collect()
        if big_stats:
            big = e.filter(F.col("__n") > max_block_rows)
            e = e.filter(F.col("__n") <= max_block_rows)
            knobs = routed_ivf_params(max(r["__n"] for r in big_stats))
            from .. import decisions
            decisions.record(
                route_regime=("fixed_list_size" if knobs
                              else "recall_fraction"),
                route_blocks=len(big_stats),
                route_max_block=max(r["__n"] for r in big_stats),
                **{f"route_{k_}": v for k_, v in knobs.items()})
            routed = ivf_knn_join(
                big.select("__blk", "__id", "__vec"),
                id_col="__id", vec_col="__vec", block_col="__blk",
                k=k, threshold=threshold,
                target_recall=route_target_recall,
                # exact stats from the block agg: the routed input is a
                # derived frame (post-join/filter) whose Catalyst size
                # estimate inflates — r10 advice — and the real counts
                # are already in hand
                rows_hint=sum(r["__n"] for r in big_stats),
                n_blocks_hint=len(big_stats), **knobs)
    elif max_block_rows is not None and on_oversize == "error":
        msg = (
            f"cosine_topk_per_row_blas: a block exceeds "
            f"max_block_rows={max_block_rows}; exact all-pairs top-k is "
            "quadratic per block. Use a finer block_col, "
            "on_oversize='route' (ivf_knn_join decomposition), or the ANN "
            "index paths (ivf_topk_indexed/pq_topk_indexed) for "
            "approximate neighbors."
        )

        def _boom(key, pdf):  # runs only if an oversized block EXISTS
            raise ValueError(msg)

        guard = (
            e.filter(F.col("__n") > max_block_rows)
            .groupBy("__blk").applyInPandas(
                _boom, schema="src long, dst long, cosine_sim double")
        )
    # Adaptive chunk sizing: every chunk-pair group a row participates
    # in emits ~k candidates for it, so the window's input is
    # rows x nchunks x k — with a FIXED chunk size, nchunks (and the
    # shuffle) grows linearly with block size (measured sf30: 60k-row
    # blocks -> 59 chunks -> 177M candidate rows -> 20 GB of window-sort
    # spill at a 12g heap). Target ~16 chunks per block instead, floored
    # at the caller's chunk_rows (small blocks keep their task
    # granularity — the sf10 A/B showed finer chunks win when groups are
    # scarce) and capped at 4096 so a group's GEMM matrix stays bounded
    # (4096^2 doubles = 134 MB per Arrow task, Python-side).
    eff_chunk = F.least(
        F.greatest(F.ceil(F.col("__n") / F.lit(int(target_chunks_per_block))),
                   F.lit(chunk_rows)),
        F.lit(4096))
    nchunks = F.greatest(F.lit(1), F.ceil(F.col("__n") / eff_chunk)).cast("int")
    chunk = F.pmod(F.xxhash64("__id"), nchunks).cast("int")
    tagged = (
        e.withColumn("__c", chunk)
        .withColumn("__p", F.explode(F.sequence(F.lit(0), nchunks - 1)))
        .select(
            "__blk",
            F.least("__c", "__p").alias("__i"),
            F.greatest("__c", "__p").alias("__j"),
            "__c", "__id", "__vec", "__norm",
        )
    )

    mg = float(margin)
    thr = float(threshold)
    kk = int(k)

    def _cands(key, pdf):
        _, ci, cj = key
        raw = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
        ids = pdf["__id"].to_numpy()
        norms = pdf["__norm"].to_numpy(dtype=np.float64)
        # unit-normalized GEMM prescreen (scale-free error bound); raw
        # doubles kept for the in-task exact fold
        mat = raw / norms[:, None]

        def emit(g, src_ids, dst_ids, A64, B64, na, nb):
            # per source row: every partner within margin of the row's
            # group k-th largest, above the threshold prescreen
            if g.size == 0:
                return [], [], []
            w = g.shape[1]
            if w > kk:
                kth = np.partition(g, w - kk, axis=1)[:, w - kk:w - kk + 1]
            else:
                kth = np.full((g.shape[0], 1), -np.inf)
            cut = np.maximum(kth - mg, thr - mg)
            ia, ib = np.nonzero(g >= cut)
            if not len(ia):
                return [], [], []
            # exact sequential double fold == aggregate(zip_with(...))
            prods = A64[ia] * B64[ib]
            dots = np.cumsum(prods, axis=1)[:, -1]
            cs = dots / (na[ia] * nb[ib])
            m = cs >= thr
            return src_ids[ia][m], dst_ids[ib][m], cs[m]

        srcs, dsts, sims = [], [], []
        if ci == cj:
            if len(ids) < 2:
                return pd.DataFrame({
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                    "cosine_sim": pd.Series([], dtype="float64")})
            g = mat @ mat.T
            np.fill_diagonal(g, -np.inf)  # a row is not its own neighbor
            s, d, c = emit(g, ids, ids, raw, raw, norms, norms)
            srcs.append(s); dsts.append(d); sims.append(c)
        else:
            a_mask = (pdf["__c"] == ci).to_numpy()
            A, B = mat[a_mask], mat[~a_mask]
            if len(A) and len(B):
                aid, bid = ids[a_mask], ids[~a_mask]
                A64, B64 = raw[a_mask], raw[~a_mask]
                na, nb = norms[a_mask], norms[~a_mask]
                g = A @ B.T
                s, d, c = emit(g, aid, bid, A64, B64, na, nb)
                srcs.append(s); dsts.append(d); sims.append(c)
                s, d, c = emit(g.T, bid, aid, B64, A64, nb, na)
                srcs.append(s); dsts.append(d); sims.append(c)
        if not srcs:
            return pd.DataFrame({
                "src": pd.Series([], dtype="int64"),
                "dst": pd.Series([], dtype="int64"),
                "cosine_sim": pd.Series([], dtype="float64")})
        return pd.DataFrame({
            "src": np.concatenate(srcs).astype("int64"),
            "dst": np.concatenate(dsts).astype("int64"),
            "cosine_sim": np.concatenate(sims).astype("float64"),
        })

    cands = tagged.groupBy("__blk", "__i", "__j").applyInPandas(
        _cands, schema="src long, dst long, cosine_sim double")
    if guard is not None:
        cands = cands.unionByName(guard)

    def _with_routed(out: DataFrame) -> DataFrame:
        # routed blocks are already top-k-reduced per src by ivf_knn_join
        # and block-disjoint from the exact rows — plain union
        return out if routed is None else out.unionByName(routed)

    if reduction == "window":
        w = Window.partitionBy("src").orderBy(F.desc("cosine_sim"),
                                              F.asc("dst"))
        return _with_routed(
            cands.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= kk)
            .select("src", "dst", "cosine_sim")
        )
    if reduction != "aggregate":
        raise ValueError(f"reduction must be window|aggregate, got {reduction!r}")
    # Aggregate reduction (alternative, MEASURED WORSE here): the
    # plausible theory was that collect_list+array_sort+slice avoids the
    # window's partition sort and therefore its spill. The sf30/12g A/B
    # (same session, bench-style eviction between runs) refuted it:
    # aggregate shuffles 4.1 GB vs the window's 2.6 GB (partial
    # collect_list arrays carry struct overhead the window's flat rows
    # don't) and spills 19.3 GB vs 7.1 GB (ObjectHashAggregate's
    # fallback spills harder than the sort), wall 126-146 s vs 120-122 s.
    # Kept as an option because the trade can invert on hash-friendly
    # shapes (few sources, huge candidate fan-in); output is bit-identical
    # either way: array_sort on (-cosine, dst) == window (cosine desc,
    # dst asc), and every (src, dst) pair is emitted by exactly one
    # chunk-pair group so no dedup is needed.
    item = F.struct((-F.col("cosine_sim")).alias("__negs"),
                    F.col("dst").alias("dst"),
                    F.col("cosine_sim").alias("cosine_sim"))
    return _with_routed(
        cands.groupBy("src")
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, kk).alias("__t"))
        .select("src", F.explode("__t").alias("__i"))
        .select("src", F.col("__i.dst").alias("dst"),
                F.col("__i.cosine_sim").alias("cosine_sim"))
    )


def ivf_knn_join(df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 5,
                 n_lists: int = 16, n_probe: int | None = None,
                 seed: int = 42, sample_cap: int = 4096,
                 stripe_rows: int = 1024,
                 target_recall: float = DEFAULT_TARGET_RECALL,
                 block_col: str | None = None,
                 threshold: float | None = None,
                 rows_hint: int | None = None,
                 n_blocks_hint: int | None = None) -> DataFrame:
    """Bulk APPROXIMATE k-NN self-join: every row's top-k cosine
    neighbors in ONE pass over an IVF decomposition — the 100 TB path
    for corpus-wide neighbor listings where the exact operators
    (``cosine_topk_per_row_blas``) hit their quadratic-block guard.

    Shape (all stages linear in corpus size for fixed knobs):

    1. Coarse centroids train on a deterministic hash-sample
       (``orderBy md5(id) LIMIT sample_cap`` → driver numpy k-means++,
       the ``_pq_codebooks`` discipline — n_lists × dim floats, tiny).
    2. ONE Arrow pass assigns each row its ``n_probe`` nearest lists
       (rank 0 = membership list) and explodes to n_probe probe rows —
       the only data inflation, n_probe × (id, vec) ≈ n_probe × 300 B.
    3. ``groupBy(list)`` + grouped-map GEMM: each list-group scores its
       probe rows against its MEMBER rows (rank-0 subset) in
       ``stripe_rows`` slabs — per-task memory is stripe × |members|
       doubles, bounded by the list-size balance of the quantizer, never
       by corpus size. Total flops ≈ (n_probe / n_lists) × the full
       quadratic — the knob pair IS the accuracy/cost dial.
    4. Per-source window over ≤ n_probe·k candidates picks the global
       top-k (score desc, dst asc — deterministic ties).

    APPROXIMATE by construction (a true neighbor assigned to a list the
    query never probes is missed): recall is measured, not assumed —
    the sf0.1 sweep reads 0.576 / 0.82 / 0.947 / 1.0 at probe 4/8/12/16
    of 16 lists (probe = n_lists is exhaustive and must read exactly
    1.0 — the built-in bucketing check), matching the per-query IVF
    calibration, so ``n_probe=None`` (default) resolves through the same
    ``resolve_n_probe`` table against ``target_recall`` (0.9 → probe
    12/16, 0.947 measured). tests pin recall at the defaults vs brute
    force; self-pairs are excluded; zero-norm rows are dropped (cosine
    undefined).

    Returns (src, dst, cosine_sim), ≤ k rows per src. Reference analog:
    the bulk variant of ann_index queries (SURVEY §2 similarity family).

    ``block_col`` (optional) scopes neighbors WITHIN each block: the
    quantizer is shared (one sample fit across blocks — same
    distribution, no per-block driver loop) but scoring groups on
    (block, list), so a row's candidates come only from its own block's
    probed lists. This is the oversized-block escape path
    ``cosine_topk_per_row_blas(on_oversize="route")`` uses: the exact
    operator keeps bounded blocks, hot blocks take this linear
    decomposition. ``threshold`` (optional) filters the final neighbor
    list to cosine >= threshold, matching the exact operator's contract.

    ``rows_hint`` / ``n_blocks_hint`` (optional, r11): exact input row /
    block counts the caller already holds (the catalog entry runs a
    count() for the regime cost model; the routed path has per-block
    stats). When present they size the two pinned exchanges from REAL
    numbers instead of Catalyst's size-only estimate — which, on the
    derived frames the route path passes (post-join, post-filter),
    inflates orders of magnitude and pinned both exchanges at the
    base_w·8 cap for tiny routed blocks (r10 advice).
    """
    import pandas as pd

    blk = (F.col(block_col) if block_col is not None
           else F.lit(0)).alias("__blk")
    blk_ddl = (df.schema[block_col].dataType.simpleString()
               if block_col is not None else "int")
    e = df.select(
        blk,
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        norm(F.col(vec_col)).alias("__norm"),
    ).filter(F.col("__norm") > 0.0)

    # toPandas, not collect: the sample is a few thousand array<double>
    # rows, and the py4j row path pickles every element (measured 0.4 s
    # slower than the Arrow transfer at sf0.1 for bit-identical values;
    # guide §6 "Arrow for driver transfers"). Row order (the md5
    # hash-sample order that seeds k-means++) is preserved either way.
    sample = (
        e.orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(sample_cap).select("__vec").toPandas()["__vec"]
    )
    if len(sample) == 0:
        return df.sparkSession.createDataFrame(
            [], "src long, dst long, cosine_sim double")
    X = np.array([np.asarray(v, dtype=np.float64) for v in sample])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = _kmeans_np(X, n_lists, seed)
    if n_probe is None:
        n_probe = resolve_n_probe(len(C), target_recall)
    # argmax of (u·c − |c|²/2) == argmin L2 distance on unit query rows
    half_c2 = 0.5 * (C ** 2).sum(1)
    npb = min(int(n_probe), len(C))

    def _probe(it):
        for pdf in it:
            V = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            norms = pdf["__norm"].to_numpy(dtype=np.float64)
            U = V / norms[:, None]
            aff = U @ C.T - half_c2[None, :]
            # deterministic n_probe ranking: affinity desc, list id asc
            order = np.lexsort((np.arange(len(C))[None, :].repeat(len(U), 0),
                                -aff), axis=1)[:, :npb]
            n = len(U)
            # ndarray rows, not Python float lists: Arrow converts numpy
            # element arrays natively — the list(map(float, ...)) form
            # measured as the wall-clock dominator at sf30 (7.2M rows x
            # 64 boxed floats of pure CPython work)
            out = pd.DataFrame({
                "__blk": pdf["__blk"].to_numpy().repeat(npb),
                "__id": pdf["__id"].to_numpy().repeat(npb),
                "__vec": list(np.repeat(U, npb, axis=0)),
                "list": order.reshape(-1).astype("int32"),
                "rank": np.tile(np.arange(npb, dtype="int32"), n),
            })
            yield out

    probed = e.mapInPandas(
        _probe,
        schema=(f"__blk {blk_ddl}, __id long, __vec array<double>, "
                "list int, rank int"))

    kk = int(k)
    sr = int(stripe_rows)

    # Pin the grouped-map exchange explicitly: probe rows are fat
    # (vector payload × n_probe duplication) and the grouping sort below
    # applyInPandas spills when the default shuffle width packs ~100 MB+
    # per task (measured sf30/12g: 1.09 GB of sort spill at width 32,
    # zero at 8x). The conf may be non-numeric on AQE-managed platforms
    # ("auto") — parse defensively.
    try:
        base_w = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        base_w = 200
    # Width is SIZE-AWARE (r10/r11, guide §2.2): the pre-r10 flat
    # max(base_w, n_lists*4) pinned BOTH exchanges at 64 for the default
    # 16 lists regardless of data — at gate scale (2k rows, ~13 MB of
    # probe rows) that is 64 grouped-map tasks of which 48 are EMPTY,
    # and an empty applyInPandas task still pays its Arrow/worker
    # round-trip (measured: the two 64-task stages dominate the query's
    # sf0.1 wall). Post-explode probe bytes at ~4 MB/task reproduce the
    # r9-measured zero-spill point exactly — at sf30 (2.4 GB of probe
    # rows) the cap lands at the SAME base_w*8 = 256 the r9 fix measured
    # spill-free.
    #
    # r11 (verdict item 5 — the 8c/32c inversion): the r10 floor
    # min(base_w, n_lists*4) still pinned 32 tasks under tiny inputs, so
    # running on FEWER cores was faster (8c/32c ratio 0.74 — pure
    # per-task Arrow/worker round-trips on mostly-empty tasks). The
    # core-count floor is gone: width comes from the DATA (bytes/4 MB,
    # capped by base_w·8 for the spill bound and by 4 partitions per
    # scoring group — a grouped-map exchange wider than its group count
    # is guaranteed empty tasks). CPU per 4 MB task stays bounded
    # because the regime cost model bounds members/list (~1,250 in the
    # fixed regime), so flops scale with bytes. probe_bytes comes from
    # rows_hint × the real row width when the caller knows its count
    # (catalog/route paths — exact, immune to the derived-frame
    # estimate inflation the r10 advice flagged), else from the
    # scan-adjacent Catalyst estimate as before.
    from ..config import ANN_WIDE_OVERRIDE
    from .skew import relation_size_bytes

    dim = X.shape[1]
    vec_row_bytes = 8 * dim + 48  # id + norm + list/rank + row slack
    if rows_hint is not None:
        probe_bytes = int(rows_hint) * vec_row_bytes * npb
    else:
        probe_bytes = relation_size_bytes(e) * npb
    n_groups = max(int(n_lists), 1) * max(
        int(n_blocks_hint) if n_blocks_hint is not None else 1, 1)
    n_wide = max(1, min(base_w * 8,
                        probe_bytes // (4 << 20),
                        4 * n_groups))
    if ANN_WIDE_OVERRIDE is not None:  # A/B escape hatch (r11 item 4)
        n_wide = ANN_WIDE_OVERRIDE

    def _score(key, pdf):
        mem = pdf[pdf["rank"] == 0]
        if len(mem) == 0 or len(pdf) == 0:
            return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                 "dst": pd.Series([], dtype="int64"),
                                 "cosine_sim": pd.Series([], dtype="float64")})
        B = np.stack(mem["__vec"].to_numpy())
        bid = mem["__id"].to_numpy()
        A = np.stack(pdf["__vec"].to_numpy())
        aid = pdf["__id"].to_numpy()
        srcs, dsts, sims = [], [], []
        for s0 in range(0, len(A), sr):
            a = A[s0:s0 + sr]
            ai = aid[s0:s0 + sr]
            g = a @ B.T  # unit rows: entries ARE cosines
            g[ai[:, None] == bid[None, :]] = -np.inf  # self-exclusion
            w = g.shape[1]
            take = min(kk, w)
            # deterministic per-stripe top-k: score desc, dst asc
            ordk = np.lexsort((bid[None, :].repeat(len(a), 0), -g),
                              axis=1)[:, :take]
            rows_idx = np.arange(len(a))[:, None].repeat(take, 1)
            sel = g[rows_idx, ordk]
            m = np.isfinite(sel)
            srcs.append(ai[:, None].repeat(take, 1)[m])
            dsts.append(bid[ordk][m])
            sims.append(sel[m])
        return pd.DataFrame({
            "src": np.concatenate(srcs).astype("int64"),
            "dst": np.concatenate(dsts).astype("int64"),
            "cosine_sim": np.concatenate(sims).astype("float64"),
        })

    cands = (
        probed.repartition(n_wide, "__blk", "list")
        .groupBy("__blk", "list").applyInPandas(
            _score, schema="src long, dst long, cosine_sim double"))

    from pyspark.sql import Window

    # a (src, dst) pair can recur: dst's list may be probed by src at
    # several ranks? No — lists are distinct per src; but dst appears in
    # exactly ONE member list, so each (src, dst) scores at most once.
    # (src ids are globally unique and each src lives in one block, so
    # the window needs no block key even in block-scoped mode.)
    #
    # Explicit-N repartition before the window: the candidate stream is
    # narrow (24 B/row) and compresses ~10x, so AQE's byte-based
    # coalescing packs it into a few fat partitions whose window sorts
    # then spill (measured sf30/12g: 1.09 GB of sort spill at the
    # coalesced width). A user repartition pins the width — the window's
    # clustered distribution is satisfied by ANY hashpartitioning(src),
    # so this REPLACES the window's own exchange rather than adding one.
    w = Window.partitionBy("src").orderBy(F.desc("cosine_sim"), F.asc("dst"))
    out = (
        cands.repartition(n_wide, "src")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= kk)
        .select("src", "dst", "cosine_sim")
    )
    if threshold is not None:
        out = out.filter(F.col("cosine_sim") >= float(threshold))
    return out
