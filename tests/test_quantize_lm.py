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
