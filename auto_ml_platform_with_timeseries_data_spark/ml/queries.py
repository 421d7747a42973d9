"""Registered ML queries (rows-only checks — CV model selection is not
ANSI-SQL-expressible; the driver records the weaker rows-only result,
and tests/test_ml.py pins determinism instead; SURVEY.md §2.13 Q15)."""

from __future__ import annotations

from pyspark.ml.regression import DecisionTreeRegressor, LinearRegression
from pyspark.ml.tuning import ParamGridBuilder
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.ml.automl import SEED, automl
from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table

_FEATURES = ["l_quantity", "l_discount", "l_tax"]
_LABEL = "l_extendedprice"


@query("q15_cv_select")  # rows-only: CV search isn't SQL-expressible
def q15_cv_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best (family, params) by k-fold CV RMSE on a capped sample of
    lineitem (deterministic seed; capped so the driver-side check stays
    fast — the full-grid path is exercised in tests/bench)."""
    # Deterministic 1-in-3 hash sample, NOT limit(): a global limit
    # collapses to one partition, serializing every fold×grid fit; the
    # filter keeps scan parallelism. cache() because CrossValidator
    # re-reads the train set for every fold split + refit — without it
    # each of the ~14 fits re-scans parquet.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(*_FEATURES, _LABEL)
        .filter(F.abs(F.xxhash64(*_FEATURES, _LABEL)) % 10 == 0)
        .cache()
    )
    li.count()
    lr = LinearRegression(featuresCol="features", labelCol="__label")
    dt = DecisionTreeRegressor(featuresCol="features", labelCol="__label",
                               seed=SEED)
    families = {
        "linear": (lr, ParamGridBuilder().addGrid(lr.regParam, [0.0, 0.1]).build()),
        "decision_tree": (dt, ParamGridBuilder().addGrid(dt.maxDepth, [3, 5]).build()),
    }
    try:
        result = automl(li, _FEATURES, _LABEL, mode="regression",
                        families=families, num_folds=3, parallelism=8)
    finally:
        li.unpersist()
    rows = [
        (r.family, str(sorted(r.best_params.items())), round(r.cv_metric, 4),
         1 if r.family == result.best.family else 0)
        for r in result.all_results
    ]
    return spark.createDataFrame(
        rows, "family string, best_params string, cv_rmse double, is_best int"
    )


@query("q47_ts_automl_per_group")  # rows-only: closed-form ridge per group
def q47_ts_automl_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-group TS model training — the operator the
    reference's dead TS branch intended (auto_machine_learning.py:100-107
    builds windows then trains nothing): lag-window features → per-group
    ordered split → one ridge fit per group inside Arrow applyInPandas.
    Coefficients are rounded so the rows-only hash is stable."""
    from auto_ml_platform_with_timeseries_data_spark.ml.ts_automl import (
        ts_automl_per_group,
    )

    ev = load_table(spark, sf_dir, "events")
    out = ts_automl_per_group(ev, "user_id", "ts", "value", look_back=3,
                              alpha=1.0, tie_break="event_id")
    return out.select(
        "group_key", "n_train", "n_test",
        F.round("test_rmse", 6).alias("test_rmse"),
        F.round("intercept", 6).alias("intercept"),
        *[F.round(F.col("coef")[i], 6).alias(f"coef_{i}") for i in range(3)],
    )


@query("q133_ts_lstm_per_group")  # rows-only: iterative Adam training
def q133_ts_lstm_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's actual TS model — LSTM(1→30)→Linear, MSE/Adam
    (model/models.py:4-31) — trained per group in pure numpy inside the
    same Arrow applyInPandas harness as q47 (no torch in this image;
    ml/ts_automl._lstm_kernel implements BPTT directly). Run on a
    deterministic subset of users (hash % 20) so the driver-side check
    stays fast: LSTM cost is epochs × groups, and the subset exercises
    the identical plan shape. Seeded per group key → reproducible
    across partitionings; rmse rounded COARSELY (3 decimals): 50 Adam
    epochs of BLAS matmuls amplify ulp-level differences between BLAS
    builds/thread counts, so a 6-decimal hash was host-stable only —
    3 decimals survives cross-host BLAS divergence."""
    from auto_ml_platform_with_timeseries_data_spark.ml.ts_automl import (
        ts_automl_per_group,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 20 == 0)
    out = ts_automl_per_group(ev, "user_id", "ts", "value", look_back=3,
                              tie_break="event_id", kernel="lstm",
                              lstm_epochs=50)
    return out.select(
        "group_key", "n_train", "n_test",
        F.round("test_rmse", 3).alias("test_rmse"),
    )
