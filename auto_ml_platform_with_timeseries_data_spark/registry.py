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
    "auto_ml_platform_with_timeseries_data_spark.operators.linkage",
    "auto_ml_platform_with_timeseries_data_spark.operators.validation",
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
# order ``queries()`` yields them, under a 50-query budget per round.
# Rounds 1-5 cumulatively witnessed 173 unique queries (168 hash-green);
# after round 5 the ONLY oracle-backed queries with no driver row ever
# are q183-q188 (VERDICT.md round-5 "Next round" #1). Round 6 therefore
# spends its budget as:
#   1-6   canary slots — one long-green query per module family, so a
#         regression in shared infrastructure still gets witnessed
#   7-12  q183-q188: near-dup-keyed leak-free split, MAD outliers,
#         dataset card, image/audio/video perceptual dedup — the last
#         never-witnessed tier
#   13-27 round-6 additions: q189 Hamming-banded image near-dup, q190
#         ExactSubstr span-removal rewrite, q191 fastText-style quality
#         classifier, q192 bigram-LM filter, q193 CLIP-style pair gate,
#         q194/q195 video/audio near-dup banding, q196 continuous-
#         aggregate incremental refresh, q197 ER blocking best-match,
#         q198 soft-dedup weights, q199 CCNet perplexity buckets,
#         q200 DoReMi reweight, q201 Count-Min heavy hitters, q202
#         triangle counting, q203 k-anonymity audit, q204 streaming
#         continuous aggregate (stateful streaming in the first
#         30 per the round-5 starvation lesson), q205 HTML boilerplate
#         extraction, q206 URL canonicalization, q207 single-pass corr
#         matrix, q208 walk-forward TS backtest, q209 constraint
#         audit, q210 CDC apply, q211 ORC round-trip, q212 GDPR
#         erasure cascade, q213 distribution-moment features, q214
#         Apriori frequent triples
#   39-50 re-witness rotation: 12 oracle-backed relational/TPC-H
#         queries whose last green driver row is rounds 1-2 (q27/q31/
#         q32/q40/q41/q43/q46/q54/q61/q62-q67/q91/q97-q103/q126 yield
#         to the new additions — q61's forecast family is covered by
#         q208/q213, q126's co-purchase family by q214), plus
#         q30_asof_join (last green r3; takes the slot of rows-only
#         q81_approx_aggs, which would spend budget on a weaker check)
# Slots 51+ are checked only if the budget stretches; every query there
# already has a green driver row from rounds 3-5.
_PRIORITY: tuple[str, ...] = (
    # canaries (driver-green every round; one per module family)
    "q01_head", "q06_acf", "q12_f1_confusion",
    "q18_jaccard_pairs", "q35_embedding_neardup", "q125_key_skew",
    # the never-driver-witnessed tier (oracle-backed, green in the
    # local 188/188 sweep since round 5)
    "q183_neardup_leakfree_split", "q184_mad_outliers",
    "q185_dataset_card", "q186_image_dhash_dedup",
    "q187_audio_fingerprint_dedup", "q188_video_fingerprint_dedup",
    # round-6 additions
    "q189_image_neardup_banded", "q190_exact_substr_rewrite",
    "q191_quality_classifier", "q192_bigram_lm_logprob",
    "q193_clip_pair_gate", "q194_video_neardup_banded",
    "q195_audio_neardup_banded",
    # round-6 late additions (no driver row ever — promoted over four
    # rotation entries whose table families stay covered: q62/q65/q99/
    # q103 yield to q63+q64 / q44 / q96+q100 / q28+q126)
    "q196_continuous_aggregate", "q197_blocking_bestmatch",
    "q198_softdedup_weights", "q199_perplexity_buckets",
    "q200_doremi_reweight", "q201_countmin_heavy_hitters",
    "q202_triangle_count", "q203_k_anonymity",
    "q204_stream_continuous_aggregate",
    "q205_html_extract", "q206_url_normalize",
    "q207_corr_matrix", "q208_ts_backtest",
    "q209_constraint_audit", "q210_cdc_apply",
    "q211_orc_roundtrip", "q212_gdpr_erasure",
    "q213_moment_features", "q214_frequent_triples",
    # re-witness rotation (last green driver row in rounds 1-2, plus
    # q30_asof_join standing in for rows-only q81)
    "q26_pricing_summary", "q28_top_customers",
    "q42_semi_anti_join", "q44_profit_by_nation_brand",
    "q49_range_join", "q50_shipping_priority",
    "q68_grouping_sets",
    "q30_asof_join", "q82_pivot_unpivot",
    "q95_late_order_priority", "q96_top_supplier",
    "q100_volume_shipping",
    # ---- slots 51+: checked only if the driver budget stretches ----
    # rotation entries displaced by q196-q208 (green r1-r2; families
    # still covered in-budget), then streaming + the r3-r5 blocks
    "q27_revenue_by_nation", "q31_set_ops", "q32_rollup", "q40_cube",
    "q41_topk_per_group", "q43_percentiles",
    "q46_distinct_counts", "q54_json_props",
    "q61_forecast_revenue", "q126_copurchase_pairs",
    "q62_returned_items", "q63_promo_revenue", "q64_large_orders",
    "q65_brand_revenue_bands", "q66_supplier_breadth",
    "q67_dormant_customers", "q91_equidepth_hist",
    "q99_local_supplier_volume", "q103_order_count_distribution",
    "q53_stateful_user_stats", "q79_stream_sessions",
    "q92_stream_stream_join", "q149_stream_sink_exactly_once",
    "q170_stream_incremental_dedup", "q182_stream_index_maintenance",
    "q164_ridge_exact_twin", "q165_index_update",
    "q166_cv_planted_optimum", "q130_pagerank",
    "q145_image_decode", "q146_xls_roundtrip", "q148_bpe_pair_counts",
    "q150_audio_features", "q151_csv_roundtrip", "q152_video_frames",
    "q153_sharded_export", "q154_incremental_dedup", "q155_zorder_keys",
    "q156_quantile_sketch", "q157_compaction", "q158_bloom_decontaminate",
    "q160_pq_fixed_codebook", "q161_temperature_mix",
    "q162_incremental_neardup", "q163_token_budget_head",
    "q45_rolling_stats", "q85_cluster_retention",
    "q104_small_quantity_revenue", "q120_sliding_window",
    "q175_ann_recall_gate", "q176_bpe_encode",
    "q179_canonical_selection", "q177_margin_mining", "q178_kmv_distinct",
    "q180_leakfree_split", "q181_ts_lookback_planted",
    "q128_pareto_abc",
    "q167_gopher_gate", "q168_stratified_token_head",
    "q169_curation_pipeline", "q172_semdedup_fixed_cells",
    "q173_scd2_dimension", "q174_snapshot_diff",
    "q97_sole_late_supplier", "q98_min_cost_supplier",
    "q101_market_share", "q102_important_parts",
    "q39_stream_window_counts", "q52_stream_dedup", "q58_stream_static_join",
    "q141_minhash_portable", "q142_simhash_portable",
    "q143_ann_signbucket", "q144_ivf_fixed_centroids",
    "q132_exact_agg_twin", "q135_chisq_independence", "q136_ks_drift",
    "q137_split_leakage", "q138_span_dedup", "q139_unigram_logprob",
    "q140_containment_pairs",
    "q80_partitioned_sink", "q83_merge_upsert", "q84_walkforward_splits",
    "q86_weighted_sample", "q87_label_centroids", "q88_centroid_assign",
    "q89_tfidf_topk", "q90_drift_psi", "q93_chunk_documents",
    "q94_redact_tokens",
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
