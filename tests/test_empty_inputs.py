"""Empty-input robustness: every query shape that computes driver-side
scalars (min/max/percentile seeds), fits a model, or builds a calendar
spine must degrade to an EMPTY result with a stable schema on 0-row
tables — the production backfill / new-partition edge — never crash.

(A full 140-query sweep ran once during development; the queries here are
the shapes that failed or came closest: scalar-seeded expressions, MLlib
fits, sequence spines, percentile arrays, LSH/corpus funnels.)
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

from conftest import SF_SMOKE

RISKY = [
    "histogram_totalprice",     # driver-side (min,max) seed arithmetic
    "ann_ivf_topk",             # KMeans.fit refuses empty input
    "ml_predict_readmission",   # RandomForest.fit refuses empty input
    "anomaly_quantile",         # percentile threshold seed
    "decile_boundaries",        # percentile-array seed
    "timeseries_gapfill",       # sequence() calendar spine from min/max
    "timeseries_locf",          # same spine + global window
    "highcost_above_p90",       # percentile scalar join
    "percentile_p90",
    "window_moving_avg",        # global window over empty series
    "dedup_minhash_lsh",        # signature explode over empty corpus
    "corpus_clean",             # multi-stage funnel
    "quality_bigram_lm",        # vocabulary aggregates over empty corpus
    "embedding_quantize",       # per-dim min/max join
    "trend_slope_per_customer", # closed-form OLS on empty groups
    "cdc_orders_diff",          # full-outer diff of two empty snapshots
    "stream_trending_topk",     # rank over empty windows
    "scan_partitioned_dpp",     # partitionBy(0 rows) writes no dirs
    "scan_schema_evolution",    # two empty parquet batches + mergeSchema
    "merge_orders_cdc",         # full-outer merge of two empty snapshots
    "embedding_norm_outliers",  # 1-row moments scalar on empty corpus
    "doc_length_profile",       # per-group percentiles over empty corpus
    "late_supplier_ranking",    # count-distinct rewrite over empty fact
    "min_cost_supplier",        # struct-argmin over empty two-level agg
    "supplier_value_share",     # 1-row (null) total crossJoin filter
    "top_revenue_supplier",     # max-scalar seed over empty view
    "excess_qty_suppliers",     # window over empty aggregated pairs
    "dedup_cluster_canonical",  # CC propagation loop over zero edges
    "regional_nation_revenue",  # same-nation residual over empty star
    "bilateral_trade_volume",   # symmetric-OR residual over empty fact
    "returns_revenue_topk",     # top-k heap over empty groups
    "unshipped_priority_topk",  # top-k heap over empty 3-way join
    "nation_profit_by_year",    # wide-measure agg over empty star
    "priority_shipping_stats",  # conditional-count pivot over empty join
    "part_supplier_variety",    # anti join + count-distinct over empty
    "text_normalize",           # pure projection over empty corpus
    "sample_weighted",          # weighted top-n window over empty groups
    "dedup_embedding_cosine",   # GEMM chunk-pair groups over zero vectors
    "embedding_nn_clusters",    # nn_top1_blas + CC loop over zero vectors
    "graph_pagerank",           # power iteration over an empty NN graph
    "vocab_bpe_merges",         # BPE argmax loop over an empty vocabulary
    "vocab_bpe_segment",        # zero-merge fold applied to zero documents
    "dedup_substring_spans",    # gram dup-count agg/semijoin over zero occurrences
    "dedup_substring_span_list",  # islands over zero duplicated positions
    "corpus_cut_boilerplate",   # span anti-join + rebuild over zero rows
    "corpus_shuffle_shards",    # two-phase dense key over zero rows
    "multimodal_audio_meta",    # WAV synth+decode over zero documents
    "multimodal_image_meta",    # PPM synth+decode over zero documents
    "ann_pq_topk",              # PQ index build/probe with no query vector
]

# Global aggregates legitimately return ONE row on empty input (SQL
# semantics: COUNT(*) with no GROUP BY is 0, not absent) — assert
# no-crash and the single-row shape instead of emptiness.
GLOBAL_AGG = [
    "agg_grouping_sets",        # the () grouping set emits a grand-total row
    "kpi_block",                # multi-KPI single pass
    "scalar_subquery",          # 1-row scalar cross join
    "part_qty_threshold",       # global agg over threshold-filtered join
    "promo_disjunctive_revenue",  # global agg over disjunctive join
    "promo_revenue_share",        # one-pass conditional-share ratio
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Every driver table, zero rows, schemas copied from sf0.001."""
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet"):
            s = pq.read_schema(os.path.join(SF_SMOKE, f))
            empty = pa.table(
                {c: pa.array([], type=s.field(c).type) for c in s.names},
                schema=s)
            pq.write_table(empty, os.path.join(out, f))
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("name", RISKY)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    fn = entrymod.queries()[name]
    rows = fn(spark, empty_sf_dir).collect()
    assert rows == []


@pytest.mark.parametrize("name", GLOBAL_AGG)
def test_global_agg_emits_single_row_on_empty(spark, empty_sf_dir, name):
    fn = entrymod.queries()[name]
    rows = fn(spark, empty_sf_dir).collect()
    assert len(rows) <= 1
