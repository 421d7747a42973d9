"""Planted-property tests for the round-12 operator wave
(q311-q320): each operator faces a fixture whose correct answer is
known by construction — coefficient recovery, lead/lag peaks, drift
alarms — plus the degenerate contracts the oracle gate cannot see.
The cross-engine value gate itself is scripts/check_oracle.py (all
of these queries are oracle-backed); these tests pin SEMANTICS.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import (
    forecast,
    ts_features,
)


def _frame(spark, vals):
    return spark.createDataFrame(
        [("s", i, int(v)) for i, v in enumerate(vals)],
        "g string, t long, v long")


# Deterministic pseudo-noise (fixed, not generated — Date/random are
# banned in workflow contexts and a fixture should be reviewable).
_NOISE = [3, -5, 2, 7, -4, -1, 6, -8, 5, 0, -3, 4, -6, 8, 1, -2, 7,
          -7, 2, 5, -4, 3, -1, -5, 6, 0, 4, -8, 8, -2, 1, -6, 5, -3,
          7, 2, -7, -1, 3, 6, -4, 0, -5, 8, -2, 4, 1, -8, 5, -6]


def test_ar2_recovers_planted_coefficients(spark):
    import numpy as np

    # v_t = 1000 + 0.6*(v_{t-1}-1000) - 0.3*(v_{t-2}-1000) + WHITE
    # noise (seeded numpy — the fixed _NOISE list is periodic, i.e.
    # itself autocorrelated, and would bias the fit)
    rng = np.random.RandomState(42)
    vals = [1000.0, 1010.0]
    for e in rng.normal(0, 5, 400):
        vals.append(1000.0 + 0.6 * (vals[-1] - 1000.0)
                    - 0.3 * (vals[-2] - 1000.0) + e)
    df = _frame(spark, [round(v) for v in vals])
    r = forecast.ar2_forecast(df, "g", "t", F.col("v")).collect()[0]
    assert r["nobs"] == len(vals) - 2
    assert r["b1"] == pytest.approx(0.6, abs=0.15)
    assert r["b2"] == pytest.approx(-0.3, abs=0.15)
    # forecast reproduces from the emitted coefficients (the contract)
    mean = sum(round(v) for v in vals) / len(vals)
    fc = (mean + r["b1"] * (round(vals[-1]) - mean)
          + r["b2"] * (round(vals[-2]) - mean)) / 100.0
    assert r["forecast_next"] == pytest.approx(fc, abs=1e-5)


def test_ar2_degenerate_constant_is_null_by_contract(spark):
    r = forecast.ar2_forecast(
        _frame(spark, [7] * 20), "g", "t", F.col("v")).collect()[0]
    assert r["b1"] is None and r["forecast_next"] is None


def test_mase_orders_smooth_vs_jagged(spark):
    # mean-reverting alternation: naive is the WORST forecaster
    # (always a full swing off), smoothing wins -> MASE < 1
    alt = [100 + (25 if i % 2 else -25) for i in range(60)]
    r_alt = forecast.mase_backtest(
        _frame(spark, alt), "g", "t", F.col("v")).collect()[0]
    assert r_alt["mase"] < 1.0
    # steady ramp: naive is one step behind, SES is many steps
    # behind -> MASE > 1
    ramp = [100 + 10 * i for i in range(60)]
    r_ramp = forecast.mase_backtest(
        _frame(spark, ramp), "g", "t", F.col("v")).collect()[0]
    assert r_ramp["mase"] > 1.0
    assert r_ramp["mae_naive"] == pytest.approx(0.1, abs=1e-6)


def test_dickey_fuller_separates_walk_from_stationary(spark):
    # random walk: cumulated noise (unit root) -> t-ratio near zero
    walk, acc = [], 1000
    for e in _NOISE * 2:
        acc += e
        walk.append(acc)
    # stationary AR(0.2) around 1000 -> strongly negative t-ratio
    stat = [1000.0]
    for e in _NOISE * 2:
        stat.append(1000.0 + 0.2 * (stat[-1] - 1000.0) + e)
    t_walk = ts_features.dickey_fuller(
        _frame(spark, walk), "g", "t", F.col("v")).collect()[0]["df_t"]
    t_stat = ts_features.dickey_fuller(
        _frame(spark, [round(v) for v in stat]), "g", "t",
        F.col("v")).collect()[0]["df_t"]
    assert t_stat < -2.86 < t_walk  # DF 5% critical value separates


def test_dickey_fuller_matches_numpy_ols(spark):
    import numpy as np

    vals = [100 + _NOISE[i % len(_NOISE)] * (i % 7) for i in range(40)]
    r = ts_features.dickey_fuller(
        _frame(spark, vals), "g", "t", F.col("v")).collect()[0]
    x = np.array(vals[:-1], dtype=float)
    y = np.diff(np.array(vals, dtype=float))
    A = np.vstack([np.ones_like(x), x]).T
    beta = np.linalg.lstsq(A, y, rcond=None)[0][1]
    assert r["beta"] == pytest.approx(beta, abs=1e-4)


def test_hurst_orders_trend_above_alternation(spark):
    # strong trend: block means spread GROWS with block size -> H
    # near 1; alternation (jittered so block variances stay positive
    # — an EXACT alternation zeroes every block-mean variance and
    # reports NULL by contract): block means collapse -> H near 0
    trend = [100 + 10 * i + _NOISE[i % len(_NOISE)]
             for i in range(128)]
    alt = [100 + (20 if i % 2 else -20) + (i % 3)
           for i in range(128)]
    h_trend = ts_features.hurst_aggvar(
        _frame(spark, trend), "g", "t",
        F.col("v")).collect()[0]["hurst"]
    h_alt = ts_features.hurst_aggvar(
        _frame(spark, alt), "g", "t", F.col("v")).collect()[0]["hurst"]
    assert h_trend > 0.85
    assert h_alt < 0.3
    assert h_trend > h_alt


def test_ccf_peaks_at_planted_lead(spark):
    import numpy as np

    # x leads y by 2 steps (y_t = x_{t-2}), so corr(x_t, y_{t+l}) =
    # corr(x_t, x_{t+l-2}) peaks at lag 2; white noise keeps the
    # off-peak lags near zero
    rng = np.random.RandomState(7)
    base = [int(round(b)) for b in rng.normal(0, 30, 120)]
    rows = [("s", i, 100 + base[i], 100 + base[i - 2])
            for i in range(2, len(base))]
    df = spark.createDataFrame(
        rows, "g string, t long, x long, y long")
    out = {r["lag"]: r["ccf"]
           for r in ts_features.ccf_lags(
               df, "g", "t", F.col("x"), F.col("y"),
               max_lag=4).collect()}
    assert max(out, key=lambda k: out[k]) == 2
    assert out[2] > 0.9


def test_seasonal_mk_ignores_pure_seasonality(spark):
    # pure 4-cycle, zero within-season trend -> s_total = 0
    cyc = [(10, 40, 25, 5)[i % 4] for i in range(48)]
    r = ts_features.seasonal_mann_kendall(
        _frame(spark, cyc), "g", ts_col="t", value=F.col("v"),
        id_col="t", season=(F.col("t") % 4).cast("int")).collect()[0]
    assert r["s_total"] == 0
    # same cycle + trend -> every within-season pair rises
    trend = [(10, 40, 25, 5)[i % 4] + 3 * i for i in range(48)]
    r2 = ts_features.seasonal_mann_kendall(
        _frame(spark, trend), "g", ts_col="t", value=F.col("v"),
        id_col="t", season=(F.col("t") % 4).cast("int")).collect()[0]
    assert r2["s_total"] == 4 * math.comb(12, 2)
    assert r2["z"] > 3


def test_page_hinkley_fires_on_level_jump_only(spark):
    flat = [100] * 40
    r = ts_features.page_hinkley(
        _frame(spark, flat), "g", "t", F.col("v"),
        delta=0.05, lam=10.0).collect()[0]
    assert r["n_alarms"] == 0 and r["first_alarm"] is None
    jump = [100] * 30 + [10000] * 30
    r2 = ts_features.page_hinkley(
        _frame(spark, jump), "g", "t", F.col("v"),
        delta=0.05, lam=10.0).collect()[0]
    assert r2["n_alarms"] > 0
    assert r2["first_alarm"] > 30  # fires AFTER the break, never before
    assert r2["ph_stat"] > 10.0
