"""Benchmark decontamination: scrub eval n-grams from training data.

The training-corpus hygiene step every serious LLM pipeline runs (the
GPT-3 paper's 13-gram overlap rule is the canonical recipe): any training
document sharing an n-gram with a held-out evaluation set is flagged (and
usually dropped) so benchmark numbers measure generalization, not
memorization.

Scale shape — the eval set is small (benchmarks are thousands of docs),
the training corpus is the 100 TB side:

1. eval docs → DISTINCT n-gram set, one explode + distinct (a compact
   relation; at 13-gram granularity typically millions of rows, far
   below corpus scale);
2. train docs → exploded n-grams, inner-joined against the eval-gram set
   on the gram. Catalyst/AQE broadcasts the eval grams while they fit
   (they usually do); beyond that it's a hash join keyed on the gram —
   never an all-pairs comparison;
3. flagged doc ids are distinct'd and anti-joined back (or kept as an
   annotation with the matching gram count).

Reuses ``dedup.shingles`` (word n-grams, DuckDB-oracle-replayable
construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def eval_ngrams(eval_df: DataFrame, text_col: str = "text",
                n: int = 13) -> DataFrame:
    """The distinct contamination-gram set of the evaluation corpus."""
    return (
        eval_df.select(F.explode(shingles(text_col, n)).alias("gram"))
        .distinct()
    )


def contamination_report(train_df: DataFrame, grams: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 13) -> DataFrame:
    """Per contaminated training doc: how many eval grams it contains.

    Docs sharing no gram are absent (clean). ``grams`` comes from
    ``eval_ngrams`` — precompute it once per benchmark suite and reuse
    across corpus versions.
    """
    exploded = train_df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("gram"))
    return (
        exploded.join(grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(train_df: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13) -> DataFrame:
    """Training corpus minus every doc sharing an ``n``-gram with the
    eval corpus (row-preserving on the clean side: one anti-join)."""
    dirty = contamination_report(
        train_df, eval_ngrams(eval_df, text_col, n), id_col, text_col, n)
    return train_df.join(dirty.select(id_col), id_col, "left_anti")


def common_phrase_report(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 5,
                         common_df: int = 20) -> DataFrame:
    """Boilerplate detection: per document, what share of its n-gram
    phrases also appear in >= ``common_df`` distinct documents (the
    RefinedWeb/Gopher 'repeated passage' signal — navigation chrome,
    license footers, templated text score high and get filtered or
    de-weighted before training).

    Same two-sided shape as the decontamination scrub, but
    self-referential: one explode builds per-doc DISTINCT grams, a hash
    aggregate computes each gram's document frequency, and a join keyed
    on the gram tags every (doc, gram) with commonness. No pairwise doc
    comparison; the gram-frequency relation grows with the corpus so it
    carries NO broadcast hint (AQE decides)."""
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("gram"))
    gram_df = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("d"))
    return (
        sh.join(gram_df, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("d") >= common_df, 1).otherwise(0)).alias("n_common"),
        )
        .select(
            id_col, "n_grams", "n_common",
            (F.col("n_common").cast("double") / F.col("n_grams")).alias("common_share"),
        )
    )
