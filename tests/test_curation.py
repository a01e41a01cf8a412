"""Corpus-curation operators: deterministic sampling, packing, clean
pipeline, mixture stats (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_warehouse_spark.operators.curation import (
    corpus_clean,
    hex_threshold,
    mixture_stats,
    pack_token_budget,
    stratified_sample,
)
from healthcare_data_warehouse_spark.sources.loaders import load_table

from conftest import SF_CORRECT, SF_SMOKE


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "0000"
    assert hex_threshold(0.25) == "4000"
    assert hex_threshold(0.5) == "8000"
    # rate=1.0 saturates at the max key (stratified_sample special-cases
    # it to keep-all before the compare)
    assert hex_threshold(1.0) == "ffff"


def test_stratified_sample_deterministic_and_calibrated(spark):
    d = load_table(spark, SF_CORRECT, "documents").select("doc_id", "lang")
    s1 = stratified_sample(d, rates={"en": 0.25}, default_rate=0.5)
    s2 = stratified_sample(d, rates={"en": 0.25}, default_rate=0.5)
    ids1 = sorted(r.doc_id for r in s1.collect())
    assert ids1 == sorted(r.doc_id for r in s2.collect())  # no RNG

    totals = dict(d.groupBy("lang").count().collect())
    kept = dict(s1.groupBy("lang").count().collect())
    en_rate = kept["en"] / totals["en"]
    assert 0.15 < en_rate < 0.35
    for lang in totals:
        if lang != "en":
            assert 0.35 < kept[lang] / totals[lang] < 0.65


def test_stratified_sample_rate_one_keeps_all(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    assert stratified_sample(d, rates={}, default_rate=1.0).count() == d.count()
    assert stratified_sample(d, rates={}, default_rate=0.0).count() == 0


def test_pack_respects_budget_and_order(spark):
    budget = 512
    d = load_table(spark, SF_SMOKE, "documents")
    packed = pack_token_budget(d, budget=budget)
    rows = packed.orderBy("lang", "shard", "doc_id").collect()

    # within each (lang, shard): pack ids non-decreasing in doc order, and
    # a pack's token total exceeds budget only via its LAST doc (greedy
    # start-bin rule) unless a single doc is itself oversized
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[(r.lang, r.shard)].append(r)
    assert len(groups) > 1
    for grp in groups.values():
        pids = [r.pack_id for r in grp]
        assert pids == sorted(pids)
        by_pack = defaultdict(list)
        for r in grp:
            by_pack[r.pack_id].append(r.n_tokens)
        for toks in by_pack.values():
            # every doc except the last STARTED inside the budget
            assert sum(toks[:-1]) <= budget


def test_corpus_clean_invariants(spark):
    budget = 5000
    d = load_table(spark, SF_CORRECT, "documents")
    kept = corpus_clean(d, budget_per_stratum=budget)
    rows = kept.collect()
    assert 0 < len(rows) < d.count()
    assert all(10 <= r.n_tokens <= 5000 for r in rows)
    # per-stratum kept token totals respect the budget
    for lang, tot in kept.groupBy("lang").agg(
        F.sum("n_tokens").alias("t")
    ).collect():
        assert tot <= budget
    # no two kept docs share a content fingerprint
    fps = (
        d.join(kept.select("doc_id"), "doc_id", "left_semi")
        .select(F.md5("text").alias("fp"))
    )
    assert fps.distinct().count() == fps.count()


def test_mixture_shares_sum_to_one(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    rows = mixture_stats(d).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    assert all(r.doc_count > 0 and r.token_count > 0 for r in rows)


def test_decontaminate_drops_only_contaminated(spark):
    from healthcare_data_warehouse_spark.operators.decontamination import (
        contamination_report,
        decontaminate,
        eval_ngrams,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated training text with no overlap here"),
            (3, "short doc"),  # fewer than n tokens -> no grams, clean
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "we ask whether the quick brown fox jumps over anything")],
        "doc_id long, text string",
    )
    grams = eval_ngrams(evals, n=5)
    rep = {r["doc_id"]: r["n_hits"]
           for r in contamination_report(train, grams, n=5).collect()}
    assert 1 in rep and rep[1] >= 1      # shares "the quick brown fox jumps"
    assert 2 not in rep and 3 not in rep

    clean = decontaminate(train, evals, n=5)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]


def test_chunk_documents_windows(spark):
    from healthcare_data_warehouse_spark.operators.curation import chunk_documents

    d = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))),  # 10 toks: chunks @1,@5,@9
         (2, "a b"),                                 # fits in one chunk
         (3, "")],                                   # split('') == [''] -> 1 chunk
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.chunk_id): r
            for r in chunk_documents(d, chunk_tokens=6, overlap=2).collect()}
    assert {k for k in rows} == {(1, 0), (1, 1), (1, 2), (2, 0), (3, 0)}
    assert rows[(1, 0)].chunk_text == "w0 w1 w2 w3 w4 w5"
    # overlap: chunk 1 starts at token 4 (stride 4), re-covering w4 w5
    assert rows[(1, 1)].chunk_text == "w4 w5 w6 w7 w8 w9"
    assert rows[(1, 2)].chunk_text == "w8 w9"
    assert rows[(1, 2)].n_chunk_tokens == 2
    assert rows[(2, 0)].n_chunk_tokens == 2
    assert rows[(3, 0)].chunk_text == ""

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=4, overlap=4)


def test_chunk_documents_no_shuffle(spark):
    from healthcare_data_warehouse_spark.operators.curation import chunk_documents

    d = load_table(spark, SF_SMOKE, "documents")
    plan = chunk_documents(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sample_k_per_group_deterministic(spark):
    from healthcare_data_warehouse_spark.operators.curation import sample_k_per_group

    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    s1 = sample_k_per_group(d, k=7)
    sizes = {r.lang: r["count"] for r in s1.groupBy("lang").count().collect()}
    full = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
    for lang, n in sizes.items():
        assert n == min(7, full[lang])
    # partition-layout independence: same ids under a different layout
    ids1 = sorted(r.doc_id for r in s1.collect())
    ids2 = sorted(r.doc_id for r in sample_k_per_group(d.repartition(13), k=7).collect())
    assert ids1 == ids2

    import pytest as _pytest
    with _pytest.raises(ValueError):
        sample_k_per_group(d, k=0)


def test_temperature_weights_flatten_toward_uniform(spark):
    from healthcare_data_warehouse_spark.operators.curation import temperature_weights

    d = load_table(spark, SF_SMOKE, "documents")
    rows = temperature_weights(d, alpha=0.5).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-12
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-12
    # temperature < 1 compresses: every weight sits between its natural
    # share and the uniform 1/n (strictly, unless already uniform)
    n = len(rows)
    for r in rows:
        lo, hi = sorted((r.token_share, 1.0 / n))
        assert lo - 1e-12 <= r.weight <= hi + 1e-12


def test_ngrams_order_and_empty(spark):
    from healthcare_data_warehouse_spark.operators.text import ngrams

    d = spark.createDataFrame([(1, "a b a b"), (2, "x"), (3, "")],
                              "doc_id long, text string")
    got = {r.doc_id: r.g for r in d.select("doc_id", ngrams("text", 2).alias("g")).collect()}
    assert got[1] == ["a b", "b a", "a b"]   # duplicates preserved, in order
    assert got[2] == []
    assert got[3] == []


def test_assign_split_stable_under_growth(spark):
    from healthcare_data_warehouse_spark.operators.curation import assign_split

    d = load_table(spark, SF_CORRECT, "documents").select("doc_id")
    full = {r.doc_id: r.split for r in assign_split(d).collect()}
    frac = sum(1 for s in full.values() if s == "train") / len(full)
    assert 0.74 < frac < 0.86
    # growing the corpus never reassigns an existing doc
    half = {r.doc_id: r.split
            for r in assign_split(d.filter(F.col("doc_id") % 2 == 0)).collect()}
    assert all(full[k] == v for k, v in half.items())

    import pytest as _pytest
    with _pytest.raises(ValueError):
        assign_split(d, {"train": 0.5, "val": 0.1})


def test_common_phrase_report_flags_boilerplate(spark):
    from healthcare_data_warehouse_spark.operators.decontamination import (
        common_phrase_report,
    )

    footer = "all rights reserved by the example corporation today"
    docs = [(i, f"unique words number {i} alpha beta gamma " + footer)
            for i in range(5)]
    docs.append((99, "entirely original content with no shared passages at all"))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in
            common_phrase_report(d, n=5, common_df=5).collect()}
    # footer grams appear in 5 docs -> flagged common; unique doc scores 0
    assert all(rows[i].n_common > 0 for i in range(5))
    assert rows[99].n_common == 0 and rows[99].common_share == 0.0
    assert all(0.0 < rows[i].common_share < 1.0 for i in range(5))


def test_weighted_sample_prefers_heavy_docs_and_is_deterministic(spark):
    from healthcare_data_warehouse_spark.operators.curation import weighted_sample
    from healthcare_data_warehouse_spark.sources.loaders import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "n_chars")
    s1 = weighted_sample(d, "n_chars", n_per_group=20, group_col="lang")
    s2 = weighted_sample(d, "n_chars", n_per_group=20, group_col="lang")
    r1 = sorted(tuple(r) for r in s1.collect())
    assert r1 == sorted(tuple(r) for r in s2.collect())  # no RNG state
    # per-group cap respected
    caps = s1.groupBy("lang").count().collect()
    assert all(r["count"] <= 20 for r in caps)
    # weighting works: the sample is longer-doc-biased vs the corpus
    mean_all = d.agg(F.avg("n_chars")).first()[0]
    mean_smp = s1.agg(F.avg("n_chars")).first()[0]
    assert mean_smp > mean_all


def test_weighted_sample_rejects_negative_and_null_weights(spark):
    # A-ES is undefined for w < 0 (u^(1/w) >= 1 outranks every honest
    # row) and NULL; those must fail loudly instead of silently
    # inverting the sample.
    import pytest

    from healthcare_data_warehouse_spark.operators.curation import weighted_sample

    for bad in (-3.5, None):
        df = spark.createDataFrame(
            [("a", "g", 2.0), ("b", "g", bad)],
            "doc_id string, lang string, w double")
        with pytest.raises(Exception, match="must be >= 0"):
            weighted_sample(df, "w", n_per_group=5, group_col="lang").collect()


def test_weighted_sample_zero_weight_excluded_not_fatal(spark):
    # w=0 has a well-defined A-ES limit: priority 0, never sampled. An
    # empty document (n_chars=0) must not abort the whole job.
    from healthcare_data_warehouse_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [("a", "g", 2.0), ("b", "g", 0.0), ("c", "g", 1.0)],
        "doc_id string, lang string, w double")
    got = {r["doc_id"]
           for r in weighted_sample(df, "w", n_per_group=5,
                                    group_col="lang").collect()}
    assert got == {"a", "c"}  # zero-weight row excluded, others kept


def test_shuffle_shards_deterministic_and_partition_invariant(spark):
    from healthcare_data_warehouse_spark.operators.curation import shuffle_shards

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
         for r in shuffle_shards(df).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
         for r in shuffle_shards(df.repartition(13)).collect()}
    assert a == b                       # layout independent of partitioning
    assert len(a) == 500                # every row assigned exactly once
    shards = {}
    for shard, pos in a.values():
        shards.setdefault(shard, []).append(pos)
    assert set(shards) == set(range(8))
    for positions in shards.values():
        # positions are dense 1..n within each shard
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # roughly uniform: no shard more than 2x the expected size
    assert max(len(p) for p in shards.values()) < 2 * 500 / 8
