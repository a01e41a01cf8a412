"""Count-min sketch: overestimate guarantee, error bound, merge law,
heavy-hitter recovery, plan shape."""

import pytest
from pyspark.sql import functions as F

from healthcare_data_warehouse_spark.operators.sketches import (
    build_cms,
    estimate_counts,
    heavy_hitters,
    merge_cms,
)


@pytest.fixture(scope="module")
def zipf(spark):
    # Zipf-ish: value v appears ~1000/v times, v in 1..50 → N≈4500.
    rows = [(v,) for v in range(1, 51) for _ in range(1000 // v)]
    return spark.createDataFrame(rows, "v int")


def test_never_underestimates_and_error_bounded(zipf):
    exact = {r["v"]: r["c"] for r in
             zipf.groupBy("v").agg(F.count("*").alias("c")).collect()}
    n = sum(exact.values())
    est = {r["v"]: r["est_count"] for r in
           estimate_counts(build_cms(zipf, "v"), zipf, "v").collect()}
    assert set(est) == set(exact)
    for v, true in exact.items():
        assert est[v] >= true                       # CMS never undercounts
        assert est[v] <= true + (2.71828 / 2048) * n + 1  # eps·N bound


def test_merge_equals_whole(zipf):
    left = zipf.filter(F.col("v") <= 25)
    right = zipf.filter(F.col("v") > 25)
    merged = merge_cms(build_cms(left, "v"), build_cms(right, "v"))
    whole = build_cms(zipf, "v")
    # Deterministic hashing → counter-exact equality.
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_sketch_size_bounded(zipf):
    assert build_cms(zipf, "v", depth=3, width=64).count() <= 3 * 64


def test_heavy_hitters_top_values(zipf):
    top = [r["v"] for r in heavy_hitters(zipf, "v", k=5).collect()]
    assert top == [1, 2, 3, 4, 5]  # true frequency order recovered


def test_heavy_hitters_sampled_candidates(zipf):
    top = [r["v"] for r in
           heavy_hitters(zipf, "v", k=3, candidate_fraction=0.5).collect()]
    assert top[:3] == [1, 2, 3]  # heavy values survive candidate sampling


def test_unseen_value_estimates_from_sketch(spark, zipf):
    cms = build_cms(zipf, "v")
    items = spark.createDataFrame([(999999,)], "v int")
    [row] = estimate_counts(cms, items, "v").collect()
    # Unseen value: collisions may inflate it, but ≤ eps·N.
    assert 0 <= row["est_count"] <= (2.71828 / 2048) * 4500 + 1


def test_estimate_plan_broadcasts_sketch_not_scan(zipf):
    est = estimate_counts(build_cms(zipf, "v"), zipf, "v")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bounded sketch is the build side


def test_merge_empty_rejected():
    with pytest.raises(ValueError):
        merge_cms()


def test_hll_daily_rollup_close_to_exact(spark):
    from pyspark.sql import functions as F

    from healthcare_data_warehouse_spark.operators.sketches import (
        build_hll_sketches,
        hll_estimates,
        hll_rollup,
    )
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts"))
    daily = build_hll_sketches(ev, "user_id", ["day"])

    est = {r["day"]: r["n_distinct_est"] for r in hll_estimates(daily).collect()}
    exact = {r["day"]: r["n"] for r in
             ev.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for d, n in exact.items():
        assert abs(est[d] - n) <= max(1, 0.05 * n)

    # Rollup: merge ALL daily sketches -> overall distinct users, no
    # rescan of events. Compare to the exact global count.
    [total] = hll_rollup(daily, []).collect()
    exact_total = ev.agg(F.countDistinct("user_id")).first()[0]
    assert abs(total["n_distinct_est"] - exact_total) <= max(1, 0.05 * exact_total)

    # Merge law: union of two half-period sketches == sketch of the union
    # (same estimate).
    first_half = build_hll_sketches(
        ev.filter(F.dayofmonth("day") <= 15), "user_id", [])
    second_half = build_hll_sketches(
        ev.filter(F.dayofmonth("day") > 15), "user_id", [])
    merged = hll_rollup(first_half.unionByName(second_half), [])
    assert abs(merged.first()["n_distinct_est"]
               - total["n_distinct_est"]) < 1e-9 + 0.02 * exact_total


def test_hll_md5_distinct_accuracy_and_merge(spark):
    """md5-HLL estimate within the sketch's error envelope of exact
    distinct counts, in BOTH estimator regimes (linear counting at small
    n, raw HLL at n > 2.5m), and register-mergeable across unions."""
    from pyspark.sql import functions as F

    from healthcare_data_warehouse_spark.operators.sketches import (
        hll_md5_distinct,
    )

    # two groups: one small (linear-counting regime), one ~3x m (raw)
    small = [("s", i) for i in range(500)]
    large = [("l", i) for i in range(12_000)]
    df = spark.createDataFrame(small + large, "g string, v long")
    est = {r["g"]: r["n_distinct_est"]
           for r in hll_md5_distinct(df, ["g"], "v").collect()}
    assert abs(est["s"] - 500) / 500 < 0.05        # rsd ~1.6%, 3σ margin
    assert abs(est["l"] - 12_000) / 12_000 < 0.05

    # determinism + union-merge: the estimate over A∪B equals the
    # estimate over the concatenated input (hashing is content-keyed)
    a = spark.createDataFrame(large[:6000], "g string, v long")
    b = spark.createDataFrame(large[5000:], "g string, v long")  # overlap
    merged = {r["g"]: r["n_distinct_est"]
              for r in hll_md5_distinct(a.union(b), ["g"], "v").collect()}
    assert merged["l"] == est["l"]


def test_hash_sample_percentile_tracks_exact(spark):
    """Hash-sample P90 lands near the exact P90 (uniform-coreset error),
    deterministically across partitionings."""
    from pyspark.sql import functions as F

    from healthcare_data_warehouse_spark.operators.sketches import (
        hash_sample_percentile,
    )

    df = spark.range(20_000).select(
        F.lit("g").alias("g"), F.col("id"),
        (F.col("id").cast("double")).alias("x"))
    got = hash_sample_percentile(
        df, ["g"], "x", 0.9, id_col="id").first()["pctl_est"]
    assert abs(got - 18_000) / 18_000 < 0.02
    again = hash_sample_percentile(
        df.repartition(13), ["g"], "x", 0.9, id_col="id").first()["pctl_est"]
    assert again == got
