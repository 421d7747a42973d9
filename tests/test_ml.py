"""ML determinism tests (SURVEY.md §5 item 4): CV picks planted structure,
importances rank stably, models persist per task."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml.regression import DecisionTreeRegressor, LinearRegression
from pyspark.ml.tuning import ParamGridBuilder

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
