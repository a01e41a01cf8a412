"""End-to-end corpus pipeline runner (corpus_runner.py)."""

from __future__ import annotations

import pytest

import json
import os
import shutil

from healthcare_data_warehouse_spark.config import SCRATCH_DIR
from healthcare_data_warehouse_spark.corpus_runner import run_corpus_pipeline

from conftest import SF_SMOKE


def test_corpus_pipeline_end_to_end(spark):
    out = os.path.join(SCRATCH_DIR, "corpus_test")
    shutil.rmtree(out, ignore_errors=True)
    manifest = run_corpus_pipeline(spark, SF_SMOKE, out)

    s = manifest["stages"]
    # funnel is monotone: each stage keeps a subset
    assert s["ingest"]["docs"] >= s["clean"]["docs"]
    assert s["clean"]["docs"] >= s["boilerplate_scrub"]["docs"]
    assert s["boilerplate_scrub"]["docs"] >= s["near_dup"]["docs"]
    assert s["near_dup"]["docs"] >= s["decontaminated"]["docs"]
    assert s["packed"]["docs"] == s["decontaminated"]["docs"]
    assert s["packed"]["docs"] > 0
    assert s["packed"]["tokens"] > 0
    assert 0 < s["packed"]["packs"] <= s["packed"]["docs"]

    # manifest persisted and matches the return value
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f)["stages"] == s

    # partitioned layout: lang=<v>/shard=<v> directories, readable back
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    assert corpus.count() == s["packed"]["docs"]
    langs = [d for d in os.listdir(os.path.join(out, "corpus")) if d.startswith("lang=")]
    assert len(langs) > 1

    # partition pruning: reading one language touches only its directory
    one = corpus.filter(corpus.lang == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


@pytest.mark.slow
def test_corpus_pipeline_chunks_and_decontamination(spark):
    out = os.path.join(SCRATCH_DIR, "corpus_test2")
    shutil.rmtree(out, ignore_errors=True)
    manifest = run_corpus_pipeline(spark, SF_SMOKE, out)
    s = manifest["stages"]

    # eval slice (doc_id % 10 == 0) never reaches the training corpus
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    assert corpus.filter(corpus.doc_id % 10 == 0).count() == 0

    # chunk table: >= one chunk per surviving doc, lang-partitioned
    chunks = spark.read.parquet(os.path.join(out, "corpus_chunks"))
    assert s["chunks"]["chunks"] == chunks.count()
    assert chunks.count() >= s["packed"]["docs"]
    assert chunks.select("doc_id").distinct().count() == s["packed"]["docs"]
    assert {d.split("=")[0] for d in os.listdir(os.path.join(out, "corpus_chunks"))
            if "=" in d} == {"lang"}
    shutil.rmtree(out, ignore_errors=True)
