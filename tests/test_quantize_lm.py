"""Semantic pins for the quantization / bigram-LM / grouping-sets queries
(the oracle gate proves Spark==DuckDB; these prove both are *right*)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

from conftest import SF_SMOKE


def test_embedding_quantize_error_bound(spark):
    """256-level scalar quantization's worst-case error is half a step:
    (mx-mn)/255/2 per dimension, so the per-label max is bounded by the
    widest dimension's half-step."""
    out = entrymod.queries()["embedding_quantize"](spark, SF_SMOKE).collect()
    assert out, "no labels"

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    ranges = (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg((F.max(F.col("v").cast("double"))
              - F.min(F.col("v").cast("double"))).alias("rng"))
        .agg(F.max("rng"))
        .first()[0]
    )
    half_step = ranges / 255.0 / 2.0
    for r in out:
        assert r.n_vals > 0
        assert 0.0 <= r.max_abs_err <= half_step * (1 + 1e-9)
        assert 0.0 <= r.avg_code <= 255.0


def test_quality_bigram_lm_is_a_probability(spark):
    """Every familiarity score is a mean of conditional probabilities ->
    (0, 1]; one row per document having at least one bigram."""
    out = entrymod.queries()["quality_bigram_lm"](spark, SF_SMOKE)
    rows = out.collect()
    assert rows

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_ok = docs.filter(
        F.size(F.split(F.trim("text"), r"\s+")) >= 2).count()
    assert len(rows) == n_ok
    for r in rows:
        assert r.n_bigrams >= 1
        assert 0.0 < r.familiarity <= 1.0


def test_agg_grouping_sets_levels_reconcile(spark):
    """The grand-total row equals the sum of the finest level, and all
    four grouping levels are present."""
    rows = entrymod.queries()["agg_grouping_sets"](spark, SF_SMOKE).collect()
    fine = [r for r in rows if r.seg != "ALL" and r.yr != "ALL"]
    seg_only = [r for r in rows if r.seg != "ALL" and r.yr == "ALL"]
    yr_only = [r for r in rows if r.seg == "ALL" and r.yr != "ALL"]
    grand = [r for r in rows if r.seg == "ALL" and r.yr == "ALL"]
    assert len(grand) == 1
    assert fine and seg_only and yr_only
    assert grand[0].n_visits == sum(r.n_visits for r in fine)
    assert grand[0].n_visits == sum(r.n_visits for r in seg_only)
    assert abs(grand[0].total_cost - sum(r.total_cost for r in fine)) < 1e-4


def test_exists_semijoin_no_duplication(spark):
    """Semi join returns each qualifying customer exactly once, and every
    returned customer really has a qualifying order."""
    q = entrymod.queries()
    rows = q["exists_semijoin"](spark, SF_SMOKE).collect()
    keys = [r.c_custkey for r in rows]
    assert len(keys) == len(set(keys))

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    qualifying = {
        r.o_custkey
        for r in o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 200000)
        ).select("o_custkey").distinct().collect()
    }
    assert set(keys) == qualifying


def test_timeseries_gapfill_dense_calendar(spark):
    """The filled series is a dense daily calendar: one row per day
    between min and max, gaps zero-filled and flagged."""
    rows = entrymod.queries()["timeseries_gapfill"](spark, SF_SMOKE).collect()
    days = sorted(r.day for r in rows)
    assert len(days) == (days[-1] - days[0]).days + 1
    assert len(set(days)) == len(days)
    for r in rows:
        if r.is_gap:
            assert r.revenue == 0.0
        else:
            assert r.revenue > 0.0


def test_in_grouped_subquery_threshold(spark):
    """Every returned visit really exceeds the quantity threshold, and
    each qualifying key appears exactly once."""
    rows = entrymod.queries()["in_grouped_subquery"](spark, SF_SMOKE).collect()
    assert rows
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r.total_qty > 150 for r in rows)


def test_timeseries_locf_carries_forward(spark):
    """Gap days inherit the latest observed value; observed days carry
    their own; the series is dense."""
    rows = sorted(
        entrymod.queries()["timeseries_locf"](spark, SF_SMOKE).collect(),
        key=lambda r: r.day,
    )
    assert (rows[-1].day - rows[0].day).days + 1 == len(rows)
    assert not rows[0].was_gap
    last_obs = None
    for r in rows:
        if not r.was_gap:
            last_obs = r.revenue_locf
        else:
            assert r.revenue_locf == last_obs


def test_attribution_last_touch_semantics(spark):
    """One output row per purchase; attributed rows carry a click at or
    before the purchase."""
    rows = entrymod.queries()["attribution_last_touch"](spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert len(rows) == n_purchases
    assert any(r.attributed for r in rows)
    for r in rows:
        if r.attributed:
            assert r.click_ts <= r.purchase_ts
        else:
            assert r.click_ts is None


def test_embedding_dim_scaler_moments(spark):
    """One row per dimension; variance is non-negative and zero only if
    the dimension is constant."""
    rows = entrymod.queries()["embedding_dim_scaler"](spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n_dim = len(emb.select("embedding").first()[0])
    assert len(rows) == n_dim
    for r in rows:
        assert r.n > 0
        assert r.var_v >= -1e-12


def test_dedup_containment_bounds_jaccard(spark):
    """Containment >= Jaccard on the identical pair set (min <= union),
    and both live in [0, 1]."""
    q = entrymod.queries()
    cont = {(r.id_a, r.id_b): r.containment
            for r in q["dedup_containment"](spark, SF_SMOKE).collect()}
    jac = {(r.id_a, r.id_b): r.jaccard
           for r in q["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()}
    assert set(cont) == set(jac)
    assert cont
    for k, c in cont.items():
        assert 0.0 <= c <= 1.0 + 1e-12
        assert c >= jac[k] - 1e-12


def test_top_provider_by_segment_one_row_per_segment(spark):
    """Single-pass arg-max: one row per segment, and the reported total
    really is that segment's maximum."""
    rows = entrymod.queries()["top_provider_by_segment"](spark, SF_SMOKE).collect()
    segs = [r.c_mktsegment for r in rows]
    assert len(segs) == len(set(segs)) and len(segs) > 0
    for r in rows:
        assert r.top_provider
        assert r.top_total > 0
        assert r.n_providers >= 1


def test_mau_trailing7_matches_bruteforce(spark):
    """Cross-check the fan-out formulation against a per-day brute-force
    distinct over the trailing window."""
    rows = {r.day: r.active_users_7d
            for r in entrymod.queries()["mau_trailing7"](spark, SF_SMOKE).collect()}
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    du = [(r.day, r.user_id) for r in ev.select(
        F.col("ts").cast("date").alias("day"),
        "user_id").distinct().collect()]
    days = sorted({d for d, _ in du})
    import datetime
    for day in list(rows)[:10]:
        want = len({u for d, u in du
                    if day - datetime.timedelta(days=6) <= d <= day})
        assert rows[day] == want
    assert set(rows) == set(days) | {
        d for d0, _ in du for d in
        [d0 + datetime.timedelta(days=k) for k in range(7)]
        if days[0] <= d <= days[-1]}


def test_top_eigen_matches_numpy_power_iteration(spark):
    """8 rounds of matrix-free power iteration must land on numpy's
    replay of the same algorithm (same start, same rounds) — and the
    explained-variance share must match the true top eigenvalue share
    from numpy's full eigendecomposition to 1e-3 (8 rounds converge
    that far on this spectrum)."""
    import numpy as np

    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE

    row = entrymod.queries()["embedding_top_eigen"](spark, SF_SMOKE).collect()[0]

    import duckdb
    vecs = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_SMOKE}/embeddings.parquet') "
        f"ORDER BY vec_id").fetchall()
    X = np.array([v[0] for v in vecs], dtype=np.float64)
    X = X - X.mean(axis=0)
    v = np.full(X.shape[1], 1.0 / np.sqrt(X.shape[1]))
    for _ in range(8):
        s = X.T @ (X @ v)
        v = s / np.linalg.norm(s)
    if next(c for c in v if abs(c) > 1e-12) < 0:
        v = -v
    components = [row[f"c{i}"] for i in range(1, 9)]
    assert np.allclose(components, v[:8], atol=1e-6)
    lam = float(((X @ v) ** 2).sum())
    tot = float((X ** 2).sum())
    assert abs(row["explained_var_share"] - lam / tot) < 1e-6
    # uniform-random embeddings have a nearly flat spectrum — 8 rounds
    # land NEAR the top eigenvalue, not on it; the replica equality
    # above is the contract, this is a convergence sanity bound
    ew = np.linalg.eigvalsh(X.T @ X)
    assert abs(row["explained_var_share"] - ew[-1] / ew.sum()) < 1e-2
