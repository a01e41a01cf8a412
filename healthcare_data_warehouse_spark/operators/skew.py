"""Skew-handling join: key salting.

At 100 TB, healthcare-shaped data skews hard on categorical keys (a few
diagnoses dominate; one hospital system produces half the visits). AQE's
skew-join splitting handles sort-merge cases automatically; explicit
salting is the tool when the hot key is known and the join must stay
hash-partitioned (e.g. followed by a keyed aggregation).

Pattern: add a random salt 0..S-1 to the big side's key; replicate the
small side S times (one row per salt); join on (key, salt). The hot key's
rows spread over S tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(big: DataFrame, small: DataFrame, on: str, salt_buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``on`` with the big side salted.

    Semantically identical to ``big.join(small, on, how)`` for ``how`` in
    {'inner', 'left', 'left_semi', 'left_anti'} — the salt is an internal
    fan-out column, dropped on return; each big-side row meets exactly one
    replica of its small-side match, so big-side multiplicity is
    preserved. ``small`` is replicated ``salt_buckets``× (keep it the
    dimension side).

    'right'/'full' are REJECTED: an unmatched small-side row exists once
    per salt replica, so those modes would emit salt_buckets null-padded
    duplicates instead of one."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — the replicated small "
            f"side duplicates unmatched rows under right/full outer joins; "
            f"use one of {sorted(allowed)}"
        )
    big_s = big.withColumn(_SALT, (F.rand(seed=7) * salt_buckets).cast("int"))
    salts = big.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias(_SALT))
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, [on, _SALT], how).drop(_SALT)


def relation_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated size of a relation in bytes (for file
    sources: the sum of data-file sizes after partition pruning). Pure
    metadata — no job runs — so it is cheap enough to gate a physical
    plan choice on, the same way AQE gates broadcast decisions on stats.
    Estimates, not gospel: use for order-of-magnitude cutovers only."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def spread(df: DataFrame, key_col: str, n_partitions: int | None = None) -> DataFrame:
    """Repartition by ``key_col`` with the partition count PINNED to the
    cluster's defaultParallelism, ahead of a CPU-amplifying stage
    (explode/tokenize/pairwise scoring/Pandas UDF).

    Why pinning matters: AQE sizes shuffle partitions by BYTES, so a
    byte-wise-tiny-but-CPU-heavy input (a few MB of documents about to be
    exploded into 50× the rows through tokenize+hash) gets coalesced back
    onto one core. An explicit count opts that one exchange out of AQE
    coalescing. Keying (rather than round-robin) lets a downstream
    groupBy/join on the same key reuse the partitioning shuffle-free.

    Use ONLY before work whose CPU is much larger than its bytes — for
    ordinary scans/joins, AQE's sizing is correct.

    Width is SIZE-AWARE, not a flat core count: the stages this feeds
    typically fan each input row out ~5-10× (tokenize-explode, shingle,
    chunk-pair), so the downstream per-partition sort/aggregate holds
    far more than the input bytes suggest. At defaultParallelism=32 the
    sf60 documents fixture put ~9.4M exploded gram rows into each
    doc-window sort of duplicated_spans — 4.9 GB of sort spill that was
    ZERO at sf30 (audit r9: spill_mb 0 → 4857 for 2× data, shuffle
    bytes exactly linear). One partition per ~8 MB of INPUT bytes keeps
    the post-explode sort runs ~64 MB — in-memory at any SF — while the
    defaultParallelism floor leaves every gate-scale plan unchanged.
    The 4096 cap bounds task-launch overhead; this is the one exchange
    AQE cannot size (it sees bytes, not the CPU/fan-out ahead).

    Placement constraint (default width only): the size probe is
    Catalyst's size-ONLY estimator, which passes filters through
    un-reduced and MULTIPLIES across joins — above a join or a selective
    filter it can estimate orders of magnitude high and silently pin the
    exchange at the 4096 cap for tiny data. Call with the default width
    only directly above a scan (+ narrow projections); for post-join or
    post-filter inputs pass ``n_partitions`` explicitly. (Same class of
    constraint as ``ensure_min_partitions``, different mechanism: there
    the probe finalizes the plan, here the estimate inflates.)

    Width floor is DATA-derived too (r11, verdict item 5): the r10
    defaultParallelism floor gave a byte-tiny input one task per core
    regardless of size — at gate scale that is 32 tasks of ~20 KB each,
    and the per-task fixed cost (launch + codegen state + worker
    round-trips on the Arrow consumers) exceeded the CPU those tasks
    carry, which is exactly what the driver's 8-core run exposed
    (chunk_documents / vocab_bpe_segment / ann-family ran FASTER on 8
    cores than 32). The floor is now min(defaultParallelism, est //
    SPREAD_MIN_TASK_BYTES): inputs below ~1 task-quantum per core stop
    fanning to every core, while anything ≥ cores × quantum (every
    mid/large SF) keeps the exact r10 width. SPREAD_MIN_TASK_BYTES is
    env-tunable (SPARK_GRAFT_SPREAD_MIN_TASK_BYTES; 0 restores the
    unconditional core floor) for interleaved A/B probes."""
    if n_partitions:
        n = n_partitions
    else:
        from ..config import SPREAD_MIN_TASK_BYTES

        est = relation_size_bytes(df)
        cores = df.sparkSession.sparkContext.defaultParallelism
        floor = (min(cores, max(1, est // SPREAD_MIN_TASK_BYTES))
                 if SPREAD_MIN_TASK_BYTES > 0 else cores)
        n = max(floor, min(4096, est // (8 << 20)))
    return df.repartition(n, F.col(key_col))


def semi_reduce(fact: DataFrame, keys: DataFrame, fact_col: str,
                key_col: str, cap_bytes: int = 64 << 20) -> DataFrame:
    """Reduce ``fact`` to rows whose ``fact_col`` appears in
    ``keys[key_col]`` — a LEFT SEMI join that broadcasts the PROJECTED
    key set while its width-scaled size estimate fits ``cap_bytes``,
    and falls back to a shuffle semi (whose selective build side feeds
    Spark's runtime bloom-filter scan pruning) above it.

    Why this exists (measured, r9): a predicate-only dimension — one
    whose columns never reach the output, like TPC-H Q8's PROMO part
    filter — should never force the fact through an exchange. Left to
    AQE, the Q8 part join broadcast at sf30 but crossed the 10 MB
    actual-size threshold at sf60, flipping to sort-merge: the full
    lineitem shuffled on l_partkey and the query's shuffle volume went
    2,174 → 12,456 MB (5.7× for 2× data), records 5.3×, exchanges
    5 → 7. Projecting the dim to its join key BEFORE the size gate
    keeps the estimate (and the physical broadcast) key-width-sized:
    the key set stays broadcastable for ~18× more data than the full
    dim rows. A semi join is also exactly right semantically: no
    duplicate fact rows if the key set ever holds duplicates, and
    Catalyst knows no build columns survive.

    At 100 TB the gate refuses honestly: ~3.3B PROMO keys estimate
    ~26 GB ≫ cap, and the shuffle semi takes over with bloom-filter
    pruning doing the scan-side reduction. The chosen regime is stamped
    into decisions for bench provenance.

    Estimate semantics under size-only stats (no CBO): a Filter above
    ``keys`` does NOT reduce Catalyst's sizeInBytes, so ``est`` is the
    PRE-filter key-column size — for a selective dim filter (Q8's PROMO
    part is ~1/6) the gate refuses the broadcast proportionally earlier
    than the actual key set requires. Safe direction (the fallback is
    the shuffle semi + bloom pruning), but it means ``cap_bytes`` caps
    the unfiltered key width: call sites with selective filters that
    want the full headroom should scale ``cap_bytes`` by the expected
    selectivity rather than trusting the 64 MB default to mean 64 MB of
    surviving keys."""
    from .. import decisions

    keys_proj = keys.select(key_col)
    est = relation_size_bytes(keys_proj)
    cond = fact[fact_col] == keys_proj[key_col]
    if est <= cap_bytes:
        decisions.record(**{f"semi_reduce[{fact_col}]": f"broadcast:{est}"})
        return fact.join(F.broadcast(keys_proj), cond, "leftsemi")
    decisions.record(**{f"semi_reduce[{fact_col}]": f"shuffle:{est}"})
    return fact.join(keys_proj, cond, "leftsemi")


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the plan's partition count is
    below the core budget — the guard for CPU-amplifying stages above
    scan-starved inputs.

    Parquet scans split at ROW-GROUP boundaries, so a file with few huge
    groups caps scan tasks at the group count regardless of cluster
    width — and AQE never helps because there is no exchange to re-plan.
    Measured: the sf60 embeddings fixture carried 2×600k-row groups, so
    every per-vector fold above it ran on 2 of 32 cores (ann_cosine_topk
    17.2 s; with the guard + relayout 3.1 s; the whole r7 embedding-
    family scale-curve inversion traced to this). Unlike ``spread`` this
    is unkeyed (no downstream co-partitioning claim) and a no-op when
    the scan is already wide enough — the repartition costs one small
    shuffle of the raw rows, worth it exactly when per-row compute
    dominates bytes.

    Placement constraint: the width probe (``df.rdd.getNumPartitions()``)
    finalizes the physical plan, and under AQE that can eagerly EXECUTE
    any upstream shuffle stages — work then discarded when the
    ``repartition()`` re-plans. Call this ONLY directly above a scan
    (+ narrow filters/projections, no exchange in between), where
    finalizing is free; for post-shuffle stages use ``spread`` with an
    explicit count instead."""
    n = n or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def blocked_pair_join(df: DataFrame, block_col: str, id_col: str,
                      payload: list[str], buckets: int = 16) -> DataFrame:
    """All unordered within-block pairs — ``a.block = b.block AND
    a.id < b.id`` — with the join key widened from ``block_col`` (often
    5-10 distinct values: a language, a near-dup blocking label) to
    (block, bucket) so one block's quadratic scoring work spreads over
    ``buckets`` tasks instead of one.

    Shape: the b side gets ``bucket = hash(id) % buckets``; the a side is
    replicated once per bucket value; joining on (block, a.probe =
    b.bucket, a.id < b.id) yields every qualifying pair exactly once —
    identical output to the naive self-join, never an extra or missing
    pair. The a-side replication multiplies its shuffle bytes by
    ``buckets`` — cheap for id+payload rows, and it also feeds AQE enough
    bytes to keep the post-shuffle stage parallel.

    Returns columns id_a, id_b, and ``{c}_a``/``{c}_b`` per payload col;
    compute the pair score (cosine, Jaccard, ...) on those.

    The join is pinned to SHUFFLE_HASH: both sides are corpus-sized (they
    ARE the corpus), so at scale neither may broadcast — and if Catalyst
    broadcasts one side at small SF, the pair scoring (which runs inside
    this join's stage) inherits the other side's scan partitioning, i.e.
    one task for a one-file input. The shuffle join hash-partitions both
    sides on (block, bucket) — the very key the bucketing exists to
    spread — and sidesteps sorting the (often array-heavy) payloads that
    a merge join would require. The b side carries the hint: it is the
    smaller (un-replicated) build side."""
    bkt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)).cast("int")
    b_side = df.withColumn("__bkt", bkt).hint("shuffle_hash")
    a_side = df.withColumn(
        "__probe", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    a, b = a_side.alias("a"), b_side.alias("b")
    return (
        a.join(b, (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
               & (F.col("a.__probe") == F.col("b.__bkt"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in payload],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in payload],
        )
    )


def explode_salted_agg(df: DataFrame, key: str, measure: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for a skewed groupBy key: partial aggregate on
    (key, salt), then final aggregate on key. Spark's hash aggregate
    already does map-side partials; explicit salting additionally spreads
    the REDUCE side of one hot key over ``salt_buckets`` tasks."""
    salted = df.withColumn(_SALT, (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, _SALT).agg(
        F.count("*").alias("__cnt"),
        F.sum(F.col(measure).cast("decimal(18,4)")).alias("__sum"),
    )
    return partial.groupBy(key).agg(
        F.sum("__cnt").alias("cnt"),
        F.sum("__sum").cast("double").alias("total"),
    )


def hot_key_share(df: DataFrame, on: str, sample_fraction: float = 0.1,
                  seed: int = 7) -> float:
    """Estimated share of rows held by the single hottest join key, from a
    seeded sample (one small aggregate job; at 100 TB the sample read is
    the only cost, and file-source sampling prunes at the scan)."""
    counted = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(on).count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
        .first()
    )
    if not counted or not counted["n"]:
        return 0.0
    return counted["mx"] / counted["n"]


def choose_salt_buckets(df: DataFrame, on: str, hot_threshold: float = 0.2,
                        sample_fraction: float = 0.1, seed: int = 7) -> int:
    """Salting decision: 1 (no salting) unless one key holds more than
    ``hot_threshold`` of the rows; then enough buckets to spread that key
    across the cluster (hot share × parallelism, capped)."""
    share = hot_key_share(df, on, sample_fraction, seed)
    if share <= hot_threshold:
        return 1
    par = df.sparkSession.sparkContext.defaultParallelism
    return max(2, min(int(share * par) + 1, par))


def _conf_bytes(spark, key: str) -> int:
    """Parse a Spark size conf ('10485760b', '-1', '10MB') to bytes;
    unparseable → -1 (treated as disabled). NOTE: conf.get must be
    called WITHOUT a default — PySpark returns the caller's default
    whenever the key wasn't explicitly set, masking Spark's built-in
    default value."""
    import re

    try:
        raw = str(spark.conf.get(key))
    except Exception:
        return -1
    m = re.match(r"\s*(-?\d+)\s*([kmgt]?b?)\s*$", raw.lower())
    if not m:
        return -1
    mult = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
            "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30,
            "t": 1 << 40, "tb": 1 << 40}[m.group(2)]
    return int(m.group(1)) * mult


def auto_join(big: DataFrame, small: DataFrame, on: str, how: str = "inner",
              hot_threshold: float = 0.2, sample_fraction: float = 0.1,
              seed: int = 7) -> DataFrame:
    """Skew-adaptive join — the decision tree is MEASURED, not assumed
    (sf10skew Zipf fixture, one key holding 38% of the fact, same
    session, min-of-2):

    1. ``small`` fits the broadcast threshold → plain join. A broadcast
       hash join never co-partitions the fact on the key, so skew is
       immaterial — and salting is actively harmful because replicating
       the dim ×S forces the join off the broadcast path entirely
       (measured: plain-broadcast 2.3 s vs salted 6.0 s on the skewed
       orders⋈customer). Also skips the sampling job.
    2. AQE skew-join splitting enabled → plain join. AQE splits only the
       HOT partition and replicates only its counterpart, where salting
       replicates the whole small side ×S (measured on the skewed
       fact⋈fact lineitem⋈orders: plain-AQE 18.4 s ≈ salted 18.9 s,
       both ~1.8× better than the unhandled 32.9 s — AQE gets the win
       for free and adapts to runtime sizes).
    3. Neither applies (AQE disabled — some pipelines pin it off for
       deterministic stage graphs): the classic known-hot-key fallback —
       sample the big side's hot share and salt when one key exceeds
       ``hot_threshold`` (measured: salted 18.9 s vs plain 32.9 s with
       the split disabled).

    The chosen regime is stamped into decisions for bench provenance."""
    from .. import decisions

    spark = big.sparkSession
    bcast = _conf_bytes(spark, "spark.sql.autoBroadcastJoinThreshold")
    if bcast > 0 and relation_size_bytes(small) <= bcast:
        decisions.record(**{f"auto_join[{on}]": "plain_broadcast"})
        return big.join(small, on, how)
    def _conf_true(key: str) -> bool:
        try:  # no default arg: see _conf_bytes
            return str(spark.conf.get(key)).lower() == "true"
        except Exception:
            return False

    if (_conf_true("spark.sql.adaptive.enabled")
            and _conf_true("spark.sql.adaptive.skewJoin.enabled")):
        decisions.record(**{f"auto_join[{on}]": "plain_aqe_skewjoin"})
        return big.join(small, on, how)
    buckets = choose_salt_buckets(big, on, hot_threshold, sample_fraction, seed)
    decisions.record(**{f"auto_join[{on}]": "plain" if buckets <= 1
                        else f"salted:{buckets}"})
    if buckets <= 1:
        return big.join(small, on, how)
    return salted_join(big, small, on, salt_buckets=buckets, how=how)


def auto_agg(df: DataFrame, key: str, measure: str,
             hot_threshold: float = 0.2, sample_fraction: float = 0.1,
             seed: int = 7) -> DataFrame:
    """Skew-adaptive count+sum aggregation — resolved by MEASUREMENT to
    the plain aggregate for these collapsing aggregates: Spark's
    hash-aggregate computes map-side partials, so each map task emits at
    most ONE row per key regardless of how hot the key is — the reduce
    side of a 38%-hot key receives n_map_tasks partial rows, not 38% of
    the data. The salted two-phase (``explode_salted_agg``) just adds a
    shuffle stage (measured on the sf10skew Zipf fixture, 15M rows, one
    key at 38%: plain 1.02 s vs salted 1.32 s). Count/sum skew-immunity
    is by construction, so no sampling job runs either.

    The ``salted_partials`` escape hatch remains ``explode_salted_agg``
    itself — it exists for NON-collapsing aggregates (collect_list /
    exact-distinct-heavy shapes whose partials are as large as the
    data), where two-phase reduction is the only lever. Output schema
    and values here are identical to the salted path (both accumulate in
    decimal(18,4) before the final double cast); the stamped regime
    records the rationale (VERDICT r03 item 5, re-measured round 7)."""
    from .. import decisions

    decisions.record(**{f"auto_agg[{key}]": "plain_partial_agg"})
    return df.groupBy(key).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(measure).cast("decimal(18,4)"))
        .cast("double").alias("total"),
    )
