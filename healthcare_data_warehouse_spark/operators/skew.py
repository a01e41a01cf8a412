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
