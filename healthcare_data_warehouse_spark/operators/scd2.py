"""SCD Type-2 dimension versioning.

The reference declares the SCD2 shape (valid_from / valid_to / is_current,
init.sql:62-64) but its dbt models only ever insert new keys — they never
close out changed rows. This operator completes the semantics:

- unchanged rows pass through;
- changed rows: the current version is closed (valid_to = as_of,
  is_current = false) and a new current version is appended;
- brand-new keys get new surrogate keys continuing the sequence.

One anti-join + one inner join + a union. The change-key set scales with
the update batch, so no forced broadcast hints: AQE converts the semi/anti
joins to broadcast at runtime while the batch is small (the normal case)
and falls back to shuffle joins for bulk backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .keys import add_dense_key


def scd2_apply(dim: DataFrame, updates: DataFrame, nk: str, tracked: list[str],
               key_col: str, as_of: str) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim``: current dimension (surrogate ``key_col``, natural ``nk``,
    ``tracked`` attribute columns, valid_from/valid_to/is_current).
    ``updates``: natural-key batch carrying the ``tracked`` columns.
    """
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    # Rename the update columns so re-applying a batch to a dimension that
    # already carries its lineage never trips the ambiguous-self-join check.
    upd = updates.select(
        F.col(nk).alias("__u_nk"), *[F.col(c).alias(f"__u_{c}") for c in tracked]
    )

    change_pred = None
    for c in tracked:
        p = ~(F.col(c).eqNullSafe(F.col(f"__u_{c}")))
        change_pred = p if change_pred is None else (change_pred | p)

    joined = cur.join(upd, cur[nk] == upd["__u_nk"], "inner")
    changed_keys = joined.filter(change_pred).select(F.col(key_col))

    closed = (
        cur.join(changed_keys, key_col, "left_semi")
        .withColumn("valid_to", F.lit(as_of).cast("timestamp"))
        .withColumn("is_current", F.lit(False))
    )
    unchanged = cur.join(changed_keys, key_col, "left_anti")

    # new versions for changed keys + brand-new natural keys
    changed_nk = (
        cur.join(changed_keys, key_col, "left_semi")
        .select(F.col(nk).alias("__u_nk"))
    )
    new_nk = upd.join(cur.select(F.col(nk).alias("__u_nk")), "__u_nk", "left_anti").select("__u_nk")
    # Attributes the update batch doesn't carry ride over from the current
    # version (NULL for brand-new natural keys).
    scd_cols = {key_col, nk, "valid_from", "valid_to", "is_current"}
    carried = [c for c in dim.columns if c not in scd_cols and c not in tracked]
    to_insert = (
        upd.join(changed_nk.union(new_nk).distinct(), "__u_nk", "left_semi")
        .join(cur.select(F.col(nk).alias("__u_nk"), *carried), "__u_nk", "left")
        .select(
            F.col("__u_nk").alias(nk),
            *[F.col(f"__u_{c}").alias(c) for c in tracked],
            *carried,
            F.lit(as_of).cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    max_key = dim.agg(F.coalesce(F.max(key_col), F.lit(0)).alias("m")).collect()[0]["m"]
    inserted = add_dense_key(to_insert, [nk], key_col=key_col, offset=max_key)

    cols = dim.columns
    return (
        hist.select(*cols)
        .unionByName(closed.select(*cols))
        .unionByName(unchanged.select(*cols))
        .unionByName(inserted.select(*cols))
    )
