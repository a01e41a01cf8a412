"""Isolation Forest anomaly scoring — functional parity with the
reference's sklearn model (ml_pipeline.py:250-253: IsolationForest(
contamination=0.05, random_state=42) over standardized per-visit
features), re-built for Spark without sklearn (absent from this
container): the algorithm itself (Liu, Ting & Zhou 2008, "Isolation
Forest") is implemented in numpy.

Spark-first split of the work — the same split sklearn-on-a-driver would
force, but made explicit and deterministic:

- **Fit is driver-side and O(trees × ψ log ψ), data-size independent.**
  iForest trains each tree on a ψ=256 subsample BY DESIGN (the paper's
  empirically-optimal setting) — so the fit input is a bounded
  deterministic hash-sample of the corpus (orderBy md5(id) LIMIT n:
  TakeOrderedAndProject, no full sort), never the corpus itself. 100
  trees × 256 rows of float64 fit in microseconds at ANY corpus scale.
- **Score is distributed, one Arrow pass.** The fitted forest is ~100
  flat node arrays (≤511 nodes each — kilobytes); it ships in the
  mapInPandas closure and every executor scores its batches with
  vectorized level-by-level tree routing. No shuffle: scoring is a
  narrow map over the feature relation.
- **Standardization** mirrors the reference's StandardScaler: one tiny
  global aggregate (mean/std per feature) collected to the driver and
  folded into both fit and score as constants.

Determinism: the sample is content-keyed (md5 order), tree randomness is
a seeded numpy Generator, and scoring is a pure function of (row,
forest) — partition-invariant, rerun-stable, no RNG state on executors.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42
N_TREES = 100
SAMPLE_SIZE = 256          # ψ — the paper's default subsample per tree
FIT_POOL = 4096            # driver-side hash-sample the trees draw from
CONTAMINATION = 0.05       # reference ml_pipeline.py:251

_EULER_GAMMA = 0.5772156649015329


def _c(n: float) -> float:
    """Average path length of an unsuccessful BST search over n points —
    the iForest normalization constant c(n) (Liu 2008 eq. 1)."""
    if n <= 1.0:
        return 0.0
    if n == 2.0:
        return 1.0
    h = math.log(n - 1.0) + _EULER_GAMMA
    return 2.0 * h - 2.0 * (n - 1.0) / n


def build_forest(X: np.ndarray, n_trees: int = N_TREES,
                 sample_size: int = SAMPLE_SIZE,
                 seed: int = SEED) -> list[np.ndarray]:
    """Fit an isolation forest on X (n × d float64). Each tree is a flat
    structured array of nodes ``(feat, thresh, left, right, size)`` —
    feat = −1 marks a leaf holding ``size`` training rows. Height limit
    ceil(log2(ψ)) per the paper (isolation happens early for anomalies;
    deeper structure is noise)."""
    rng = np.random.default_rng(seed)
    n = len(X)
    psi = min(sample_size, n)
    limit = max(1, math.ceil(math.log2(max(psi, 2))))
    forest = []
    for _ in range(n_trees):
        take = rng.choice(n, size=psi, replace=False)
        nodes: list[tuple[int, float, int, int, int]] = []

        def grow(rows: np.ndarray, depth: int) -> int:
            my = len(nodes)
            m = len(rows)
            if depth >= limit or m <= 1:
                nodes.append((-1, 0.0, -1, -1, m))
                return my
            sub = X[rows]
            f = int(rng.integers(sub.shape[1]))
            lo, hi = float(sub[:, f].min()), float(sub[:, f].max())
            if lo == hi:  # constant feature in this node: try isolation done
                nodes.append((-1, 0.0, -1, -1, m))
                return my
            s = float(rng.uniform(lo, hi))
            nodes.append((f, s, -1, -1, m))  # children patched below
            left = grow(rows[sub[:, f] < s], depth + 1)
            right = grow(rows[sub[:, f] >= s], depth + 1)
            nodes[my] = (f, s, left, right, m)
            return my

        grow(take, 0)
        forest.append(np.array(
            nodes,
            dtype=[("feat", "i4"), ("thresh", "f8"), ("left", "i4"),
                   ("right", "i4"), ("size", "i4")],
        ))
    return forest


def score_block(X: np.ndarray, forest: list[np.ndarray],
                psi: int = SAMPLE_SIZE) -> np.ndarray:
    """Anomaly scores s(x) = 2^(−E[h(x)]/c(ψ)) for a block of rows —
    vectorized level-synchronous routing (all rows advance one tree level
    per step; ≤ ceil(log2 ψ) steps per tree)."""
    n = len(X)
    if n == 0:
        return np.zeros(0)
    total = np.zeros(n)
    for tree in forest:
        feat, thr = tree["feat"], tree["thresh"]
        left, right, size = tree["left"], tree["right"], tree["size"]
        idx = np.zeros(n, dtype=np.int64)
        depth = np.zeros(n)
        active = feat[idx] >= 0
        while active.any():
            ai = idx[active]
            f = feat[ai]
            go_left = X[active, f] < thr[ai]
            idx[active] = np.where(go_left, left[ai], right[ai])
            depth[active] += 1.0
            active = feat[idx] >= 0
        leaf_adjust = np.array([_c(float(s)) for s in size])[idx]
        total += depth + leaf_adjust
    e_h = total / len(forest)
    return np.exp2(-e_h / max(_c(float(psi)), 1e-12))


def fit_sample(df: DataFrame, feature_cols: list[str], id_col: str,
               pool: int = FIT_POOL) -> np.ndarray:
    """Deterministic driver-side fit pool: the ``pool`` rows whose
    md5(id) sorts first — TakeOrderedAndProject (per-partition top-k +
    k-row driver merge), bounded at any corpus size, content-keyed so
    reruns and repartitions fit the identical forest. NULL feature rows
    are dropped (reference: X.dropna())."""
    cond = F.lit(True)
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    rows = (
        df.filter(cond)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(pool)
        .select(*feature_cols)
        .collect()
    )
    return np.array([[float(r[c]) for c in feature_cols] for r in rows])


def score_df(df: DataFrame, feature_cols: list[str],
             forest: list[np.ndarray], psi: int,
             means: np.ndarray, stds: np.ndarray,
             out: str = "iforest_score") -> DataFrame:
    """Append per-row iForest scores: one Arrow mapInPandas pass, forest
    and scaler constants in the closure (kilobytes), no shuffle."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(list(df.schema.fields)
                        + [StructField(out, DoubleType())])
    cols = list(feature_cols)
    mu, sd = means.copy(), stds.copy()

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = pdf[cols].to_numpy(dtype=np.float64)
            ok = ~np.isnan(X).any(axis=1)
            s = np.full(len(pdf), np.nan)
            if ok.any():
                Z = (X[ok] - mu) / sd
                s[ok] = score_block(Z, forest, psi)
            outp = pdf.copy()
            outp[out] = s
            yield outp

    return df.mapInPandas(gen, schema)


def iforest_anomalies(spark, sf_dir: str, n_trees: int = N_TREES,
                      sample_size: int = SAMPLE_SIZE,
                      contamination: float = CONTAMINATION) -> DataFrame:
    """End-to-end reference parity (ml_pipeline.py:230-269): per-visit
    features → StandardScaler → IsolationForest(contamination=0.05,
    random_state=42) → per-row anomaly score + flag. The flag threshold
    is the (1−contamination) quantile of the FIT POOL's own scores —
    sklearn's offset_ mechanism, computed on the driver from the same
    bounded sample the forest trained on."""
    from .pipeline import build_features

    feats = ["cost", "visit_count", "avg_cost", "days_since_visit"]
    df = build_features(spark, sf_dir)
    pool = fit_sample(df, feats, id_col="visit_id")
    if len(pool) == 0:
        return df.select(
            "customer_id", "visit_id",
            F.lit(0.0).alias("iforest_score"),
            F.lit(0).cast("int").alias("is_anomaly"),
        ).limit(0)
    mu = pool.mean(axis=0)
    sd = pool.std(axis=0)
    sd[sd == 0.0] = 1.0  # constant feature: standardize to 0, not NaN
    forest = build_forest((pool - mu) / sd, n_trees=n_trees,
                          sample_size=sample_size)
    psi = min(sample_size, len(pool))
    pool_scores = score_block((pool - mu) / sd, forest, psi)
    threshold = float(np.quantile(pool_scores, 1.0 - contamination))
    scored = score_df(df, feats, forest, psi, mu, sd)
    return scored.select(
        "customer_id", "visit_id",
        F.col("iforest_score"),
        (F.col("iforest_score") >= threshold).cast("int").alias("is_anomaly"),
    )
