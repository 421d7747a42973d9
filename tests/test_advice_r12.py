"""Round-12 ADVICE regressions, pinned:

1. (low) q320's Friedman oracle cross-joined `pert` (empty when no
   complete blocks exist) so it emitted ZERO rows on degenerate input
   while the engine emits its documented one-row-of-NULLs contract.
   The oracle now reads sr2 via a scalar subquery over pert and cross
   joins only the always-one-row global aggs (kfr/nblocks/ties), so
   both sides emit exactly one row on empty pert — pinned here by a
   no-complete-blocks fixture run through BOTH the engine and the
   oracle SQL itself (DuckDB, view-substituted events).
2. (low) ar2_forecast / granger_lag1 summed floor(x*1e4)-quantized
   products as BIGINT and only cast the finished sum to
   decimal(38,0); the oracle accumulates HUGEINT per row, so a
   per-series sum past ~9.2e18 overflowed long on the engine side
   only.  Each quantized term is now cast to decimal(38,0) BEFORE
   F.sum — pinned by an exact-integer Python replication on a fixture
   whose sums exceed long range.
3. (low) ccf_lags / ljung_box / kpss_level had the same long
   accumulator at the tighter 1e6 quantum (DuckDB sum(BIGINT) returns
   HUGEINT); also decimal(38,0) per term now — pinned the same way.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark import registry
from auto_ml_platform_with_timeseries_data_spark.operators import (
    forecast,
    ts_features,
    validation,
)

LONG_MAX = (1 << 63) - 1


def _pin(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# 1. Friedman one-row contract on a fixture with NO complete blocks


def test_friedman_engine_one_row_without_complete_blocks(spark):
    # two treatments exist overall (k=2) but every block holds only
    # one -> `complete` is empty -> pert is empty
    df = spark.createDataFrame(
        [("b1", "t1", 10), ("b1", "t1", 12), ("b2", "t2", 7)],
        "b string, t string, v long")
    rows = validation.friedman_test(
        df, F.col("v"), "b", "t").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k"] == 2 and r["b"] == 0
    assert r["chi2"] is None and r["chi2_adj"] is None


def test_friedman_oracle_one_row_without_complete_blocks():
    # the exact q320 oracle SQL, on an events view with no complete
    # blocks: pre-fix it emitted 0 rows (cross join over empty pert),
    # now exactly one NULL-stat row like the engine
    sql = registry.oracles()["q320_friedman"] if hasattr(
        registry, "oracles") else registry.ORACLES["q320_friedman"]
    ev = pd.DataFrame({
        "user_id": ["u1", "u1", "u2"],
        "event_type": ["a", "a", "b"],
        "value": [0.1, 0.2, 0.3],
    })
    con = duckdb.connect()
    con.register("events", ev)
    out = con.execute(sql).fetchdf()
    con.close()
    assert len(out) == 1
    assert out["k"].iloc[0] == 2 and out["b"].iloc[0] == 0
    assert pd.isna(out["chi2"].iloc[0])
    assert pd.isna(out["chi2_adj"].iloc[0])


# ---------------------------------------------------------------------------
# 2./3. decimal(38,0) per-term accumulation past long range
#
# Fixtures are built so the SUM of quantized terms exceeds 2^63-1
# while each term fits comfortably in a long (the exact failure mode:
# per-row floor() is fine, the accumulator was not).  Expected values
# are exact-integer Python replications of the engine arithmetic.


def _ljung_expected(v: list[int], max_lag: int = 10):
    n = len(v)
    m = sum(v) / n
    c = {}
    for lag in range(0, max_lag + 1):
        c[lag] = sum(
            math.floor((v[i] - m) * (v[i + lag] - m) * 1e6)
            for i in range(n - lag))
    q = 0.0
    for lag in range(1, max_lag + 1):
        rl = _pin(float(c[lag]) / float(c[0]))
        q += rl * rl / (n - lag)
    return c, _pin(n * (n + 2) * q)


def test_ljung_box_accumulates_past_long_range(spark):
    # +-1e5 alternating, mean exactly 0: each c0 term is 1e16, and
    # 1200 of them sum to 1.2e19 > 2^63-1 -> the pre-fix long
    # accumulator overflowed (ANSI error or silent wrap)
    n = 1200
    v = [100000 if i % 2 == 0 else -100000 for i in range(n)]
    c, expected = _ljung_expected(v)
    assert abs(c[0]) > LONG_MAX  # the fixture really exceeds long
    df = spark.createDataFrame(
        [("s", i, v[i]) for i in range(n)], "g string, t long, v long")
    r = ts_features.ljung_box(df, "g", "t", F.col("v")).collect()[0]
    assert r["n"] == n
    assert r["q_stat"] == expected


def _ar2_expected(v: list[int]):
    n = len(v)
    m = sum(v) / n
    q = lambda x: math.floor(x * 1e4)  # noqa: E731
    sxx = szz = sxz = sxy = szy = 0
    for t in range(2, n):
        y, x, z = v[t], v[t - 1], v[t - 2]
        cx, cz, cy = x - m, z - m, y - m
        sxx += q(cx * cx)
        szz += q(cz * cz)
        sxz += q(cx * cz)
        sxy += q(cx * cy)
        szy += q(cz * cy)
    det = sxx * szz - sxz * sxz
    num1 = szz * sxy - sxz * szy
    num2 = sxx * szy - sxz * sxy
    b1 = _pin(float(num1) / float(det))
    b2 = _pin(float(num2) / float(det))
    fc = m + b1 * (v[-1] - m) + b2 * (v[-2] - m)
    return sxx, det, b1, b2, _pin(fc / 100.0)


def test_ar2_accumulates_past_long_range(spark):
    # period-3 pattern (A, 0, -A), A=1e6, n=1400: per-term quanta are
    # ~1e16 at the 1e4 quantum and the 1398 regression rows sum to
    # ~9.3e18 > 2^63-1, while the Cramer products (sum x sum) stay
    # under decimal(38,0)'s 1e38 ceiling — the documented headroom
    # contract on both engine and oracle.  The pattern keeps the
    # normal equations non-singular (det != 0).
    pat = [1000000, 0, -1000000]
    v = [pat[i % 3] for i in range(1400)]
    sxx, det, b1, b2, fc = _ar2_expected(v)
    assert sxx > LONG_MAX and det != 0 and abs(det) < 10 ** 38
    df = spark.createDataFrame(
        [("s", i, v[i]) for i in range(len(v))],
        "g string, t long, v long")
    r = forecast.ar2_forecast(df, "g", "t", F.col("v")).collect()[0]
    assert r["nobs"] == len(v) - 2
    assert r["b1"] == b1 and r["b2"] == b2
    assert r["forecast_next"] == fc


def test_ccf_accumulates_past_long_range(spark):
    # identical +-1e5 alternating x and y: c0 = sxx = syy = n*1e16
    # with n=1200 -> 1.2e19 > 2^63-1; ccf at lag 0 is exactly 1.0
    n = 1200
    v = [100000 if i % 2 == 0 else -100000 for i in range(n)]
    df = spark.createDataFrame(
        [("s", i, v[i], v[i]) for i in range(n)],
        "g string, t long, x long, y long")
    out = ts_features.ccf_lags(
        df, "g", "t", F.col("x"), F.col("y"), max_lag=2)
    got = {r["lag"]: r for r in out.collect()}
    assert got[0]["ccf"] == 1.0
    # lag-1 of an exact alternation: sum has n-1 terms of -1e16,
    # full-series denominator n*1e16 -> pin(-(n-1)/n)
    assert got[1]["ccf"] == _pin(-(n - 1) / n)
    assert got[2]["ccf"] == _pin((n - 2) / n)


def test_kpss_accumulates_past_long_range(spark):
    # same alternation: the c0/c_l sums exceed long range; eta stays
    # finite and matches an exact replication of the engine arithmetic
    n = 1200
    max_lag = 5
    v = [100000 if i % 2 == 0 else -100000 for i in range(n)]
    # replicate: m = 0 exactly; partial sums S_t alternate 1e5, 0
    m = sum(v) / n
    ss2 = 0
    cs = 0
    for i, x in enumerate(v, start=1):
        cs += x
        st = cs - i * m
        ss2 += math.floor(st * st * 1e2)
    c = {}
    for lag in range(0, max_lag + 1):
        c[lag] = sum(
            math.floor((v[i] - m) * (v[i + lag] - m) * 1e6)
            for i in range(n - lag))
    assert abs(c[0]) > LONG_MAX
    lrv = float(c[0]) / 1e6 / n
    for lag in range(1, max_lag + 1):
        w = 2.0 * (1.0 - lag / (max_lag + 1.0))
        lrv += w * (float(c[lag]) / 1e6 / n)
    expected = _pin(float(ss2) / 1e2 / (n * n) / lrv)
    df = spark.createDataFrame(
        [("s", i, v[i]) for i in range(n)], "g string, t long, v long")
    r = ts_features.kpss_level(
        df, "g", "t", F.col("v"), max_lag=max_lag).collect()[0]
    assert r["n"] == n
    assert r["eta"] == expected


def test_granger_accumulates_past_long_range(spark):
    # period-4 y (so lag-1 does NOT perfectly predict y: ssr_u > 0)
    # and period-3 x, amplitudes chosen so saa/syy ~ 9.4e18 > 2^63-1
    # while every Cramer product stays under decimal(38,0)'s 1e38
    n = 1500
    ypat = [1000000, -1000000, 500000, -500000]
    y = [ypat[i % 4] for i in range(n)]
    x = [500000 if i % 3 == 0 else -250000 for i in range(n)]
    # engine aligns rows t>=1: y0 = y[t], yl = y[t-1], xl = x[t-1];
    # means are over the ALIGNED rows (the lagged frame)
    rows = [(y[t], y[t - 1], x[t - 1]) for t in range(1, n)]
    mcount = len(rows)
    my0 = sum(r[0] for r in rows) / mcount
    myl = sum(r[1] for r in rows) / mcount
    mxl = sum(r[2] for r in rows) / mcount
    q = lambda c: math.floor(c * 1e4)  # noqa: E731
    saa = sbb = sab = say = sby = syy = 0
    for y0, yl, xl in rows:
        cy, ca, cb = y0 - my0, yl - myl, xl - mxl
        saa += q(ca * ca)
        sbb += q(cb * cb)
        sab += q(ca * cb)
        say += q(ca * cy)
        sby += q(cb * cy)
        syy += q(cy * cy)
    assert saa > LONG_MAX or syy > LONG_MAX
    det = saa * sbb - sab * sab
    assert det > 0  # engine's ok-gate requires det > 0
    num1 = sbb * say - sab * sby
    num2 = saa * sby - sab * say
    b1 = _pin(float(num1) / float(det))
    bx = _pin(float(num2) / float(det))
    br = _pin(float(say) / float(saa))
    ssr_u = float(syy) - b1 * float(say) - bx * float(sby)
    ssr_r = float(syy) - br * float(say)
    assert ssr_u > 0
    f_stat = _pin((ssr_r - ssr_u) / (ssr_u / (mcount - 3)))
    df = spark.createDataFrame(
        [("s", i, y[i], x[i]) for i in range(n)],
        "g string, t long, y long, x long")
    r = ts_features.granger_lag1(
        df, "g", "t", F.col("y"), F.col("x")).collect()[0]
    assert r["m"] == mcount
    assert r["bx"] == bx
    assert r["f_stat"] == f_stat
