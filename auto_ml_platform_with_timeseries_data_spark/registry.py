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
# order ``queries()`` yields them, under a ~50-query budget per round.
# Round 1-2 spent the whole budget on the reference-parity + TPC-H block,
# leaving the LLM-data-pipeline surface (dedup / similarity / text /
# multimodal / curation / ts_features / sessionize) with zero
# driver-verified rows. This list pins the first 50 slots to:
#   1-17  reference parity Q1-Q15 surface (keeps those rows green), then
#   18-50 the never-driver-checked extension queries flagged in
#         VERDICT.md round 2 ("Next round" #1).
# Queries not listed keep registration order after the priority block;
# the already-twice-proven relational/TPC-H modules register last.
_PRIORITY: tuple[str, ...] = (
    # reference parity core (green in rounds 1-2; keep green)
    "q01_head", "q02_null_profile", "q03_histogram", "q04_corr_with_label",
    "q05_groups", "q13_importance_rank", "q14_min_max", "q48_histogram_auto",
    "q125_key_skew",
    "q06_acf", "q07_ts_split", "q08_ts_windows",
    "q10_rmse", "q11_binarize", "q12_f1_confusion",
    "q09_scale_params", "q29_minmax_scaled",
    # dedup
    "q16_dedup_exact", "q17_minhash_dedup", "q18_jaccard_pairs",
    "q23_simhash", "q33_fingerprint", "q55_dedup_components",
    # similarity search
    "q19_cosine_topk", "q34_ann_srp", "q35_embedding_neardup", "q36_ann_ivf",
    # text analysis
    "q20_token_stats", "q21_quality_score", "q22_langid",
    "q51_winnow_fingerprints", "q57_bpe_tokens",
    # sessionize / window
    "q24_window_agg", "q25_sessionize", "q59_resample_ffill",
    "q60_zscore_outliers",
    # multimodal
    "q37_media_stats", "q38_media_features",
    # as-of join + JSONL round-trip
    "q30_asof_join", "q56_jsonl_roundtrip",
    # curation
    "q73_stratified_sample", "q74_hash_split", "q75_class_balance",
    "q76_pack_sequences", "q77_decontaminate", "q78_uniform_sample",
    # time-series feature ops
    "q69_ewma", "q70_ohlc", "q71_lag_features", "q72_interpolate",
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
