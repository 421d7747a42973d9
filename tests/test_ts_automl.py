"""TS AutoML — the reference's dead-end path, made real (SURVEY §2.5)."""

from __future__ import annotations

import math

import numpy as np

from auto_ml_platform_with_timeseries_data_spark.ml import ts_automl


def _ar1_df(spark, groups=3, n=120, phi=0.8, seed=1):
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(groups):
        x = 0.0
        for t in range(n):
            x = phi * x + rng.normal(scale=0.1)
            rows.append((g, t, float(x)))
    return spark.createDataFrame(rows, "g long, t int, v double")


def test_lag_features_shape(spark):
    df = _ar1_df(spark, groups=1, n=20)
    out = ts_automl.lag_features(df, "g", "t", "v", 3)
    rows = out.collect()
    assert len(rows) == 17  # n − look_back (label needs a next row)
    r = sorted(rows, key=lambda r: r["__rn"])[0]
    assert r["lag_0"] == r["v"]  # lag_0 is the current value


def test_ts_automl_global_learns_ar1(spark):
    df = _ar1_df(spark)
    res = ts_automl.ts_automl_global(df, "g", "t", "v", look_backs=(2, 3))
    # AR(1) with sigma=0.1: a fitted linear model should beat sigma*2
    assert res.test_rmse < 0.2
    assert res.look_back in (2, 3)


def test_ts_automl_per_group_coefficients(spark):
    df = _ar1_df(spark, groups=4, n=150, phi=0.7)
    out = ts_automl.ts_automl_per_group(df, "g", "t", "v", look_back=2,
                                        alpha=0.01)
    rows = out.collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_train"] > 0 and r["n_test"] > 0
        # last coefficient ≈ phi (current value predicts next)
        assert math.isclose(r["coef"][-1], 0.7, abs_tol=0.25)
        assert r["test_rmse"] < 0.3


def _quad_map_df(spark, groups=2, n=300, seed=5):
    """Planted NONLINEAR autoregressive series (noisy logistic map
    x_{t+1} = 1 − 1.6·x_t² + ε): a linear lag model is structurally
    wrong here, so the LSTM kernel must beat the ridge baseline."""
    rows = []
    for g in range(groups):
        rng = np.random.default_rng(seed + g)
        x = 0.1
        for t in range(n):
            x = 1.0 - 1.6 * x * x + rng.normal(scale=0.02)
            rows.append((g, t, float(x)))
    return spark.createDataFrame(rows, "g long, t int, v double")


def test_lstm_kernel_beats_ridge_on_nonlinear_series(spark):
    """M5/M6 (model/models.py:4-31): the numpy LSTM kernel, trained in
    the same applyInPandas harness, must beat the closed-form ridge on
    a planted nonlinear series. 200 full-batch Adam steps ≈ the update
    count of the reference's 50 minibatch epochs."""
    df = _quad_map_df(spark)
    ridge = {r["group_key"]: r["test_rmse"] for r in
             ts_automl.ts_automl_per_group(
                 df, "g", "t", "v", look_back=3, alpha=0.01).collect()}
    lstm = {r["group_key"]: r["test_rmse"] for r in
            ts_automl.ts_automl_per_group(
                df, "g", "t", "v", look_back=3, kernel="lstm",
                lstm_epochs=200).collect()}
    assert set(lstm) == set(ridge)
    for g in ridge:
        assert lstm[g] < ridge[g] / 2, (g, lstm[g], ridge[g])


def test_lstm_kernel_deterministic_across_runs(spark):
    """Seeded per group key + full-batch training: identical results on
    repeated runs regardless of partitioning."""
    df = _quad_map_df(spark, groups=2, n=120)
    a = ts_automl.ts_automl_per_group(
        df, "g", "t", "v", look_back=2, kernel="lstm", lstm_epochs=30)
    b = ts_automl.ts_automl_per_group(
        df.repartition(7), "g", "t", "v", look_back=2, kernel="lstm",
        lstm_epochs=30)
    ra = {r["group_key"]: (r["test_rmse"], tuple(r["coef"])) for r in a.collect()}
    rb = {r["group_key"]: (r["test_rmse"], tuple(r["coef"])) for r in b.collect()}
    assert ra == rb


def test_zero_train_group_yields_nan_row_not_crash(spark):
    """A group with exactly look_back+1 rows windows to ONE row, which
    the 80/20 split assigns entirely to test (floor(0.8·1)=0 train):
    both kernels must emit a NaN-metric row instead of crashing."""
    rows = [(0, t, float(t)) for t in range(40)]          # healthy group
    rows += [(1, t, float(t)) for t in range(4)]          # look_back+1 rows
    df = spark.createDataFrame(rows, "g long, t int, v double")
    for kernel in ("ridge", "lstm"):
        out = {r["group_key"]: r for r in ts_automl.ts_automl_per_group(
            df, "g", "t", "v", look_back=3, kernel=kernel,
            lstm_epochs=5).collect()}
        assert out[0]["n_train"] > 0
        assert out[1]["n_train"] == 0
        # pandas NaN crosses Arrow as SQL NULL
        rmse = out[1]["test_rmse"]
        assert rmse is None or math.isnan(rmse)
