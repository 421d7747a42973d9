"""ML determinism tests (SURVEY.md §5 item 4): CV picks planted structure,
importances rank stably, models persist per task."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml.regression import DecisionTreeRegressor, LinearRegression
from pyspark.ml.tuning import ParamGridBuilder
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.ml import automl as ml


def _linear_df(spark, n=400, seed=0):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    noise = rng.normal(scale=0.01, size=n)
    y = 3.0 * x1 + 0.5 * x2 + noise  # strongly linear → linear family wins
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    return spark.createDataFrame(rows, "x1 double, x2 double, y double")


def test_cv_selects_linear_on_linear_data(spark):
    df = _linear_df(spark)
    lr = LinearRegression(featuresCol="features", labelCol="__label")
    dt = DecisionTreeRegressor(featuresCol="features", labelCol="__label",
                               seed=ml.SEED)
    families = {
        "linear": (lr, ParamGridBuilder().addGrid(lr.regParam, [0.0]).build()),
        "tree": (dt, ParamGridBuilder().addGrid(dt.maxDepth, [3]).build()),
    }
    res = ml.automl(df, ["x1", "x2"], "y", families=families, num_folds=3)
    assert res.best.family == "linear"
    assert res.best.cv_metric < 0.05  # near the noise floor


def test_automl_deterministic_across_runs(spark):
    df = _linear_df(spark)
    lr = LinearRegression(featuresCol="features", labelCol="__label")
    fam = {"linear": (lr, ParamGridBuilder().addGrid(lr.regParam, [0.0, 0.1]).build())}
    r1 = ml.automl(df, ["x1", "x2"], "y", families=fam, num_folds=3)
    lr2 = LinearRegression(featuresCol="features", labelCol="__label")
    fam2 = {"linear": (lr2, ParamGridBuilder().addGrid(lr2.regParam, [0.0, 0.1]).build())}
    r2 = ml.automl(df, ["x1", "x2"], "y", families=fam2, num_folds=3)
    assert r1.best.best_params == r2.best.best_params
    assert abs(r1.best.cv_metric - r2.best.cv_metric) < 1e-9


def test_feature_importance_ranking(spark):
    df = _linear_df(spark)
    res = ml.automl(df, ["x1", "x2"], "y", mode="regression", fast=True,
                    num_folds=3)
    ranked = ml.feature_importances(res.best.model, ["x1", "x2"])
    assert ranked[0][0] == "x1"  # 3.0·x1 dominates 0.5·x2


def test_model_persistence_per_task(spark, tmp_path):
    df = _linear_df(spark)
    lr = LinearRegression(featuresCol="features", labelCol="__label")
    fam = {"linear": (lr, ParamGridBuilder().addGrid(lr.regParam, [0.0]).build())}
    res = ml.automl(df, ["x1", "x2"], "y", families=fam, num_folds=2)
    task_dir = str(tmp_path / "task_a")
    ml.save_model(res.best.model, task_dir)
    loaded = ml.load_model(task_dir)
    a = res.best.model.transform(df).select("prediction").collect()
    b = loaded.transform(df).select("prediction").collect()
    assert [r[0] for r in a] == pytest.approx([r[0] for r in b])


def test_binary_f1_cv_selection_beats_weighted_trap(spark):
    """Reference parity (auto_machine_learning.py:30-33): CV selection
    scores BINARY F1, not weighted. On an imbalanced set (90 neg /
    10 pos), an all-negative predictor WINS under weighted F1 (~0.853
    vs 0.76) but LOSES under binary F1 (0.0 vs 0.4) — the two metrics
    rank the candidates oppositely, and the engine must rank by binary."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    rows = []
    # model A: predicts all-negative. model B: catches all 10 positives
    # but flips 30 negatives to positive.
    for i in range(90):
        rows.append((0.0, 0.0, 1.0 if i < 30 else 0.0))
    for _ in range(10):
        rows.append((1.0, 0.0, 1.0))
    df = spark.createDataFrame(rows, "__label double, pred_a double, pred_b double")

    binary = ml.BinaryF1Evaluator(labelCol="__label")
    weighted = MulticlassClassificationEvaluator(labelCol="__label",
                                                 metricName="f1")
    a = df.select("__label", F.col("pred_a").alias("prediction"))
    b = df.select("__label", F.col("pred_b").alias("prediction"))

    # the weighted metric falls into the imbalance trap...
    assert weighted.evaluate(a) > weighted.evaluate(b)
    # ...the engine's CV evaluator does not
    f1_a, f1_b = binary.evaluate(a), binary.evaluate(b)
    assert f1_a == pytest.approx(0.0)
    assert f1_b == pytest.approx(0.4)
    assert f1_b > f1_a
    assert binary.isLargerBetter()


def test_automl_classification_selects_by_binary_f1():
    """The classification CV path must wire in BinaryF1Evaluator (not
    the weighted multiclass evaluator)."""
    import inspect

    src = inspect.getsource(ml.automl)
    assert "BinaryF1Evaluator" in src


def test_binary_f1_evaluator_survives_crossvalidator_copy(spark):
    """CrossValidator clones its evaluator via Params.copy(); the
    custom column attributes must survive the clone."""
    ev = ml.BinaryF1Evaluator(labelCol="__label")
    clone = ev.copy()
    assert clone.labelCol == "__label"
    assert clone.predictionCol == "prediction"


def test_binary_f1_evaluator_empty_dataset_scores_zero(spark):
    """F.sum over zero rows is NULL; an empty CV validation split must
    score 0.0 (sklearn zero_division=0), not raise."""
    df = spark.createDataFrame([], "__label double, prediction double")
    assert ml.BinaryF1Evaluator(labelCol="__label").evaluate(df) == 0.0


def test_ts_backtest_folds_expand_without_leakage(spark, sf_dir):
    """Fold k's training window must end strictly before its test
    window, train sizes expand with k, and every (group, fold) row
    carries a finite RMSE."""
    import math

    from auto_ml_platform_with_timeseries_data_spark.registry import queries

    rows = queries()["q208_ts_backtest"](spark, sf_dir).collect()
    assert rows
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group_key"], {})[r["fold"]] = r
        assert math.isfinite(r["test_rmse"]) and r["n_test"] > 0
    for folds in by_group.values():
        ks = sorted(folds)
        for a, b in zip(ks, ks[1:]):
            assert folds[b]["n_train"] > folds[a]["n_train"]
            # fold a's test segment IS fold b's training increment:
            # expanding windows never retest seen data
            assert folds[b]["n_train"] >= \
                folds[a]["n_train"] + folds[a]["n_test"]
