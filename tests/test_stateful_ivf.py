"""Tests for the stateful streaming operator and IVF ANN."""

from __future__ import annotations

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.sources.loaders import load_table

from conftest import SF_SMOKE


def test_stateful_profiles_match_batch_totals(spark):
    from healthcare_data_warehouse_spark.plans.catalog import queries
    from healthcare_data_warehouse_spark.streaming.stateful import batch_user_profiles

    stream_out = queries()["stream_user_profiles"](spark, SF_SMOKE)
    batch = batch_user_profiles(load_table(spark, SF_SMOKE, "events"))
    s = {(r["user_id"], r["total_events"], round(r["total_value"], 4))
         for r in stream_out.collect()}
    b = {(r["user_id"], r["total_events"], round(r["total_value"], 4))
         for r in batch.collect()}
    assert s == b


def test_ivf_topk_scores_are_exact_cosines_and_good_recall(spark):
    from healthcare_data_warehouse_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = brute_force_topk(emb, query_vec_id=0, k=10).collect()
    approx = ivf_topk(emb, query_vec_id=0, k=10, n_lists=8, n_probe=4).collect()
    assert 0 < len(approx) <= 10
    exact_sims = {r["vec_id"]: r["cosine_sim"]
                  for r in brute_force_topk(emb, query_vec_id=0, k=10**6).collect()}
    for r in approx:
        assert abs(r["cosine_sim"] - exact_sims[r["vec_id"]]) < 1e-12
    # recall against exact top-10 (random data → probing half the lists
    # should still recover a decent fraction)
    recall = len({r["vec_id"] for r in approx} & {r["vec_id"] for r in exact}) / 10
    assert recall >= 0.3
