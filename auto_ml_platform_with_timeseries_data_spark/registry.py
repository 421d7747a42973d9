"""Query registry — the single source of truth for the engine's query set.

Every operator from SURVEY.md §2 that is "done" registers here twice:

- a Spark implementation: ``Callable[(SparkSession, sf_dir)] -> DataFrame``
- (when SQL-expressible) a DuckDB oracle SQL string over the same parquet
  tables, producing identical column names and values.

``__spark_entry__.py`` re-exports this registry to the correctness driver.
Float-valued aggregate columns are rounded to a fixed number of decimals
on BOTH sides so IEEE accumulation-order differences between engines
cannot flip the driver's value hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "auto_ml_platform_with_timeseries_data_spark.operators.profile",
    "auto_ml_platform_with_timeseries_data_spark.operators.timeseries",
    "auto_ml_platform_with_timeseries_data_spark.operators.evaluation",
    "auto_ml_platform_with_timeseries_data_spark.operators.scaling",
    # Never-driver-checked extension surface registers before the
    # relational/TPC-H block (green in rounds 1-2) so that, after the
    # _PRIORITY slots, any leftover sweep budget lands on queries with
    # no prior driver-verified rows.
    "auto_ml_platform_with_timeseries_data_spark.operators.dedup",
    "auto_ml_platform_with_timeseries_data_spark.operators.similarity",
    "auto_ml_platform_with_timeseries_data_spark.operators.text",
    "auto_ml_platform_with_timeseries_data_spark.operators.multimodal",
    "auto_ml_platform_with_timeseries_data_spark.operators.asof",
    "auto_ml_platform_with_timeseries_data_spark.operators.sessionize",
    "auto_ml_platform_with_timeseries_data_spark.operators.curation",
    "auto_ml_platform_with_timeseries_data_spark.operators.ts_features",
    "auto_ml_platform_with_timeseries_data_spark.operators.pipeline_ops",
    "auto_ml_platform_with_timeseries_data_spark.operators.layout",
    "auto_ml_platform_with_timeseries_data_spark.sources.readers",
    "auto_ml_platform_with_timeseries_data_spark.operators.graph",
    "auto_ml_platform_with_timeseries_data_spark.operators.relational",
    "auto_ml_platform_with_timeseries_data_spark.operators.tpch_more",
    "auto_ml_platform_with_timeseries_data_spark.operators.tpch3",
    # Expensive CV/streaming queries last: a budget-capped correctness
    # sweep verifies the most queries per second spent.
    "auto_ml_platform_with_timeseries_data_spark.ml.queries",
    "auto_ml_platform_with_timeseries_data_spark.streaming.events",
)

_loaded = False

# Driver-sweep priority. The correctness driver verifies queries in the
# order ``queries()`` yields them, under a 50-query budget per round
# (CORRECTNESS_r01-r03 each hold exactly 50 rows). Rounds 1-3 covered
# the reference-parity, TPC-H, and LLM-pipeline headline blocks —
# cumulatively 81 unique driver-green queries. Round 4 rotates onto the
# LAST tier with zero driver-verified rows (VERDICT.md round 3 "Next
# round" #1): the rounds-2/3 additions (q132, q135-q140), the
# q80-q127 extension block, and the streaming surface, plus the four
# new portable exact-twin queries (q141-q144) that convert the
# hash-family rows-only entries into oracle-checked rows.
#   1-6   canary slots — one long-green query per module family, so a
#         regression in shared infrastructure still gets witnessed
#   7-10  portable twins (new this round)
#   11-47 never-driver-checked extension queries, cheap-first
#   48-50 streaming (batch-equivalent oracles; the most expensive —
#         last so a time-capped sweep drops them before batch rows)
# Queries not listed keep registration order after the priority block.
_PRIORITY: tuple[str, ...] = (
    # canaries (driver-green in r1-r3; one per module family)
    "q01_head", "q06_acf", "q12_f1_confusion",
    "q18_jaccard_pairs", "q35_embedding_neardup", "q125_key_skew",
    # portable exact twins for the hash-family rows-only queries
    "q141_minhash_portable", "q142_simhash_portable",
    "q143_ann_signbucket", "q144_ivf_fixed_centroids",
    # rounds-2/3 additions: quality gates + exact sketch twin
    "q132_exact_agg_twin", "q135_chisq_independence", "q136_ks_drift",
    "q137_split_leakage", "q138_span_dedup", "q139_unigram_logprob",
    "q140_containment_pairs",
    # extension block: sinks, ML-data ops, embeddings, text
    "q80_partitioned_sink", "q83_merge_upsert", "q84_walkforward_splits",
    "q86_weighted_sample", "q87_label_centroids", "q88_centroid_assign",
    "q89_tfidf_topk", "q90_drift_psi", "q93_chunk_documents",
    "q94_redact_tokens",
    # extension block: relational/TS/window analytics
    "q105_dominant_suppliers", "q106_time_weighted_avg",
    "q107_cusum_changepoints", "q108_embedding_dim_stats",
    "q109_bigram_pmi", "q110_seasonal_residuals", "q111_repetition_ratio",
    "q112_word_entropy", "q113_target_encoding", "q114_funnel",
    "q115_cohort_retention", "q116_media_resize", "q117_frame_sample",
    "q118_embedding_quantize", "q119_fuzzy_decontaminate", "q121_bm25",
    "q122_window_heavy_hitters", "q123_rolling_median", "q124_group_ols",
    "q127_event_transitions",
    # streaming (most expensive; batch-equivalent SQL oracles)
    "q39_stream_window_counts", "q52_stream_dedup", "q58_stream_static_join",
    # ---- slots 51+: checked only if the driver budget stretches ----
    "q145_image_decode", "q146_xls_roundtrip", "q148_bpe_pair_counts",
    "q147_bpe_learn", "q149_stream_sink_exactly_once",
    "q150_audio_features", "q151_csv_roundtrip", "q152_video_frames",
    "q153_sharded_export", "q154_incremental_dedup", "q155_zorder_keys",
    "q156_quantile_sketch", "q157_compaction", "q158_bloom_decontaminate",
    "q160_pq_fixed_codebook", "q159_ann_pq", "q161_temperature_mix",
    "q162_incremental_neardup", "q163_token_budget_head",
    "q53_stateful_user_stats", "q79_stream_sessions",
    "q92_stream_stream_join",
    "q45_rolling_stats", "q85_cluster_retention",
    "q104_small_quantity_revenue", "q120_sliding_window",
)


def _ordered(d: dict) -> dict:
    """Priority names first (those registered), then registration order."""
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)
