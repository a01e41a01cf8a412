"""End-to-end LLM-training-corpus pipeline runner.

The corpus analog of ``runner.py``'s warehouse DAG: one driver program
that takes a raw document table through the full curation funnel and
materializes a training-ready corpus —

    ingest → quality filter + exact dedup + per-language token budget
    (``operators.curation.corpus_clean``) → boilerplate scrub (cut
    every maximal duplicated token span, ``dedup.cut_duplicated_spans``)
    → near-duplicate removal
    (MinHash+LSH candidates, keep the min-id of every candidate pair) →
    benchmark decontamination (eval 5-gram scrub) → context-window
    packing (``operators.curation.pack_token_budget``) → parquet
    partitioned by (lang, pack bucket) + retrieval chunks partitioned by
    lang, plus a JSON manifest with per-stage survivor counts.

Every stage is the declarative operator the catalog already certifies;
this module only composes them and writes. At 100 TB the identical
program is a spark-submit job; the partitioned layout means a trainer
reading one language (or one pack shard) prunes everything else.

    python -m healthcare_data_warehouse_spark.corpus_runner \
        [--sf-dir /root/testdata/sf0.001] [--out .scratch/corpus]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import SCRATCH_DIR, SMOKE_SF_DIR
from .operators.curation import corpus_clean, pack_token_budget
from .operators.dedup import lsh_candidate_pairs
from .session import get_spark
from .sources.loaders import load_table


def drop_near_dups(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Remove near-duplicates: LSH candidate pairs → connected components
    → keep each cluster's min-id representative. Component-level removal
    (not per-pair): with pairs (1,3),(2,3) a per-pair policy would keep
    both 1 and 2 even though they share a cluster through 3. One banded
    bucket join + the CC propagation rounds + one anti join — never
    O(n²)."""
    from .operators.graph import dedup_cluster_assignments

    pairs = lsh_candidate_pairs(docs, id_col=id_col)
    clusters = dedup_cluster_assignments(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def run_corpus_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    manifest: dict = {"sf_dir": sf_dir, "out_dir": out_dir, "stages": {}}
    docs = load_table(spark, sf_dir, "documents")
    manifest["stages"]["ingest"] = {"docs": docs.count()}

    # Stage 1: quality + exact dedup + per-language budget (one plan).
    kept_ids = corpus_clean(docs).select("doc_id")
    clean = docs.join(kept_ids, "doc_id", "left_semi")
    manifest["stages"]["clean"] = {"docs": clean.count()}

    # Stage 1.5: boilerplate scrub — cut every maximal duplicated token
    # span (Lee et al. 2022 find→cut) BEFORE near-dup detection, so
    # shared headers/footers can't glue otherwise-distinct docs into one
    # LSH cluster; docs reduced to nothing by the scrub drop here.
    from .operators.dedup import cut_duplicated_spans

    scrubbed = (
        clean.join(cut_duplicated_spans(clean), "doc_id")
        .filter(F.col("clean_text") != "")
        .withColumn("text", F.col("clean_text"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("clean_text", "n_removed_tokens")
    )
    manifest["stages"]["boilerplate_scrub"] = {"docs": scrubbed.count()}

    # Stage 2: near-dup removal over the survivors.
    deduped = drop_near_dups(scrubbed)
    manifest["stages"]["near_dup"] = {"docs": deduped.count()}

    # Stage 2.5: benchmark decontamination (GPT-3-style n-gram scrub).
    # The held-out eval set is the doc_id % 10 == 0 slice (the repo-wide
    # convention, see catalog.decontamination_report); eval docs leave
    # the training corpus and any trainer doc sharing a 5-gram with them
    # is scrubbed too.
    from .operators.decontamination import decontaminate

    evals = docs.filter(F.col("doc_id") % 10 == 0)
    deduped = decontaminate(
        deduped.filter(F.col("doc_id") % 10 != 0), evals, n=5)
    manifest["stages"]["decontaminated"] = {"docs": deduped.count()}

    # Stage 3: pack into context windows; keep text alongside assignment.
    packs = pack_token_budget(deduped, budget=2048)
    corpus = deduped.join(packs.select("doc_id", "shard", "n_tokens", "pack_id"),
                          "doc_id")
    out_path = os.path.join(out_dir, "corpus")
    corpus.write.mode("overwrite").partitionBy("lang", "shard").parquet(out_path)

    stats = corpus.groupBy().agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("lang", "shard", "pack_id").alias("packs"),
    ).collect()[0]
    manifest["stages"]["packed"] = {
        "docs": stats["docs"], "tokens": int(stats["tokens"]),
        "packs": stats["packs"],
    }

    # Stage 4: retrieval-ready overlapping chunks of the final corpus
    # (32-token windows, 8 overlap), partitioned by language so an
    # embedding job for one language prunes the rest.
    from .operators.curation import chunk_documents

    chunks = chunk_documents(deduped).join(
        deduped.select("doc_id", "lang"), "doc_id")
    chunk_path = os.path.join(out_dir, "corpus_chunks")
    chunks.write.mode("overwrite").partitionBy("lang").parquet(chunk_path)
    manifest["stages"]["chunks"] = {
        "chunks": spark.read.parquet(chunk_path).count()}

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SMOKE_SF_DIR)
    ap.add_argument("--out", default=os.path.join(SCRATCH_DIR, "corpus"))
    args = ap.parse_args()
    spark = get_spark("corpus-runner")
    manifest = run_corpus_pipeline(spark, args.sf_dir, args.out)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
