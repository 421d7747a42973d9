"""Time-series AutoML — completing the reference's dead-end path
(SURVEY.md §2.5 note, §2.9 M5/M6, §7 M4).

The reference's AUTOML_for_time_series scales one column, loops
look-backs, builds windowed datasets — then trains nothing and returns
nothing (auto_machine_learning.py:100-107). This module implements the
INTENDED semantics end-to-end, two ways:

1. `ts_automl_global` — fully distributed: per-group ordered 80/20
   split with look_back warm-up overlap (W1), flattened lag features
   (W2 as scalar columns — MLlib-friendly), MLlib estimators swept over
   look_back × family, scored on the held-out tail. This is the 100 TB
   path: windowing is one shuffle on the group key; training is
   distributed MLlib.

2. `ts_automl_per_group` — one small model per group via applyInPandas
   (Arrow-batched): closed-form ridge regression on the lag matrix with
   numpy inside each group. This is the shape the reference's per-group
   LSTM (model/models.py:4-31) would run in; the LSTM kernel itself is
   stubbed behind an import-try since torch isn't in this image — the
   Spark-side plumbing (grouping, schema, batch shape) is real and
   tested, per the multimodal/stub policy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.ml import Pipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_ml_platform_with_timeseries_data_spark.operators.timeseries import (
    train_test_split_ordered,
)

SEED = 42


def lag_features(df: DataFrame, group: str, order: str, value: str,
                 look_back: int, tie_break: str | None = None) -> DataFrame:
    """Flattened W2 windows: lag_{L-1}..lag_0 scalar columns + next-step
    `__label` (lead). One window pass builds every lag."""
    order_cols = [order] + ([tie_break] if tie_break else [])
    w = Window.partitionBy(group).orderBy(*order_cols)
    out = df.withColumn("__rn", F.row_number().over(w))
    for k in range(look_back - 1, -1, -1):
        out = out.withColumn(f"lag_{k}", F.lag(value, k).over(w))
    return (
        out.withColumn("__label", F.lead(value, 1).over(w))
        .filter((F.col("__rn") >= look_back) & F.col("__label").isNotNull())
    )


@dataclass
class TSAutoMLResult:
    look_back: int
    family: str
    test_rmse: float
    model: object


def ts_automl_global(df: DataFrame, group: str, order: str, value: str,
                     look_backs: tuple[int, ...] = (2, 3, 4),
                     tie_break: str | None = None,
                     train_frac: float = 0.8) -> TSAutoMLResult:
    """Sweep look_back × {linear, gbt}; select by held-out-tail RMSE
    (per-group ordered split, warm-up overlap preserved)."""
    evaluator = RegressionEvaluator(labelCol="__label", metricName="rmse",
                                    predictionCol="prediction")
    best: TSAutoMLResult | None = None
    for lb in look_backs:
        feats = [f"lag_{k}" for k in range(lb - 1, -1, -1)]
        windowed = lag_features(df, group, order, value, lb, tie_break)
        split = train_test_split_ordered(windowed, group, "__rn", train_frac,
                                         lb)
        train = split.filter(F.col("is_train") == 1)
        test = split.filter((F.col("is_test") == 1) & (F.col("is_train") == 0))
        assembler = VectorAssembler(inputCols=feats, outputCol="features")
        for family, est in (
            ("linear", LinearRegression(featuresCol="features", labelCol="__label")),
            ("gbt", GBTRegressor(featuresCol="features", labelCol="__label",
                                 maxIter=20, maxDepth=5, seed=SEED)),
        ):
            model = Pipeline(stages=[assembler, est]).fit(train)
            rmse = float(evaluator.evaluate(model.transform(test)))
            if best is None or rmse < best.test_rmse:
                best = TSAutoMLResult(lb, family, rmse, model)
    assert best is not None
    return best


def _ridge_kernel(pdf: pd.DataFrame, feats: list[str], alpha: float) -> pd.DataFrame:
    """Closed-form ridge on one group's lag matrix (numpy, no sklearn)."""
    x = pdf[feats].to_numpy(dtype=np.float64)
    y = pdf["__label"].to_numpy(dtype=np.float64)
    tr = pdf["is_train"].to_numpy() == 1
    xtr = np.hstack([x[tr], np.ones((tr.sum(), 1))])
    ident = np.eye(xtr.shape[1])
    ident[-1, -1] = 0.0  # don't penalize the intercept
    beta = np.linalg.solve(xtr.T @ xtr + alpha * ident, xtr.T @ y[tr])
    te = (pdf["is_test"].to_numpy() == 1) & ~tr
    xte = np.hstack([x[te], np.ones((te.sum(), 1))])
    pred = xte @ beta
    rmse = float(np.sqrt(np.mean((pred - y[te]) ** 2))) if te.sum() else float("nan")
    return pd.DataFrame({
        "group_key": [pdf["__g"].iloc[0]],
        "n_train": [int(tr.sum())],
        "n_test": [int(te.sum())],
        "test_rmse": [rmse],
        "coef": [beta[:-1].tolist()],
        "intercept": [float(beta[-1])],
    })


def ts_automl_per_group(df: DataFrame, group: str, order: str, value: str,
                        look_back: int = 3, alpha: float = 1.0,
                        tie_break: str | None = None,
                        train_frac: float = 0.8) -> DataFrame:
    """One ridge model per group (Arrow applyInPandas). Output: one row
    per group with test RMSE + coefficients. Groups too small to window
    are dropped (the reference's zero-window edge case)."""
    feats = [f"lag_{k}" for k in range(look_back - 1, -1, -1)]
    windowed = lag_features(df, group, order, value, look_back, tie_break)
    split = train_test_split_ordered(windowed, group, "__rn", train_frac,
                                     look_back)
    prepped = split.select(
        F.col(group).alias("__g"), *feats, "__label", "is_train", "is_test"
    )
    schema = ("group_key long, n_train long, n_test long, test_rmse double, "
              "coef array<double>, intercept double")
    return (
        prepped.groupBy("__g")
        .applyInPandas(lambda pdf: _ridge_kernel(pdf, feats, alpha), schema)
    )


def lstm_kernel_stub(*args, **kwargs):
    """Per-group LSTM training kernel (model/models.py:4-31: 1-layer
    LSTM(hidden=30) → Linear, MSE/Adam/50 epochs). torch is not in this
    image; the distributed harness (ts_automl_per_group) is the real,
    tested part — swap _ridge_kernel for a torch kernel when available."""
    try:
        import torch  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "LSTM kernel requires torch; use ts_automl_per_group's ridge "
            "kernel or install torch"
        ) from e
    raise NotImplementedError("torch present but LSTM kernel not implemented yet")
