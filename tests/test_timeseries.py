"""W1/W2/A4 semantics, incl. the reference's split-overlap quirk and the
zero-window edge case (SURVEY.md §5 items 2-3)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import timeseries as ts

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:
    HAVE_HYP = False


def _series_df(spark, groups: dict[str, list[float]]):
    rows = []
    for g, values in groups.items():
        for i, v in enumerate(values):
            rows.append((g, i, float(v) if v is not None else None))
    return spark.createDataFrame(rows, "g string, t int, v double")


def test_split_overlap_is_exactly_look_back(spark):
    # auto_machine_learning.py:117-119: test starts at split − look_back
    df = _series_df(spark, {"a": list(range(10))})
    out = ts.train_test_split_ordered(df, "g", "t", 0.8, 3).collect()
    train_rns = sorted(r["rn"] for r in out if r["is_train"])
    test_rns = sorted(r["rn"] for r in out if r["is_test"])
    assert train_rns == [1, 2, 3, 4, 5, 6, 7, 8]   # floor(10*0.8) = 8
    assert test_rns == [6, 7, 8, 9, 10]             # from 8−3+1 = 6
    assert len(set(train_rns) & set(test_rns)) == 3  # overlap == look_back


def test_sliding_window_count_and_content(spark):
    # windows per group = n − look_back (stride 1, next-step label)
    df = _series_df(spark, {"a": [10, 20, 30, 40, 50]})
    out = ts.sliding_windows(df, "g", "t", ["v"], "v", 3).orderBy("rn").collect()
    assert len(out) == 2  # rows 3..4 have a following label row
    assert [x[0] for x in out[0]["features"]] == [10.0, 20.0, 30.0]
    assert out[0]["label"] == 40.0
    assert [x[0] for x in out[1]["features"]] == [20.0, 30.0, 40.0]
    assert out[1]["label"] == 50.0


def test_group_smaller_than_look_back_yields_no_windows(spark):
    df = _series_df(spark, {"tiny": [1, 2], "big": [1, 2, 3, 4, 5]})
    out = ts.sliding_windows(df, "g", "t", ["v"], "v", 3).collect()
    assert {r["g"] for r in out} == {"big"}


def test_sweep_slices_match_direct_build(spark):
    df = _series_df(spark, {"a": [float(i) for i in range(12)]})
    sweep = ts.sliding_windows_sweep(df, "g", "t", ["v"], "v", [2, 4])
    direct2 = ts.sliding_windows(df, "g", "t", ["v"], "v", 2)
    got = {r["rn"]: [x[0] for x in r["features"]]
           for r in sweep[2].collect()}
    want = {r["rn"]: [x[0] for x in r["features"]]
            for r in direct2.collect() if r["rn"] >= 4}
    for rn, feats in want.items():
        assert got[rn] == feats


def test_acf_matches_statsmodels_formula(spark):
    rng = np.random.default_rng(7)
    x = np.cumsum(rng.normal(size=200))  # autocorrelated walk
    df = _series_df(spark, {"a": list(map(float, x))})
    got = {r["lag"]: r["acf"] for r in ts.acf(df, "g", "t", "v", 5).collect()}
    mean = x.mean()
    denom = ((x - mean) ** 2).sum()
    for k in range(6):
        want = (((x[k:] - mean) * (x[: len(x) - k] - mean)).sum()) / denom
        assert math.isclose(got[k], want, abs_tol=1e-6), (k, got[k], want)
    assert got[0] == 1.0


def test_acf_drops_nulls_first(spark):
    # data_analysis.py:110 — dropna before acf
    df = _series_df(spark, {"a": [1.0, None, 2.0, 3.0, None, 4.0, 5.0, 6.0]})
    out = ts.acf(df, "g", "t", "v", 2).collect()
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    mean, denom = x.mean(), ((x - x.mean()) ** 2).sum()
    want1 = ((x[1:] - mean) * (x[:-1] - mean)).sum() / denom
    got = {r["lag"]: r["acf"] for r in out}
    assert math.isclose(got[1], want1, abs_tol=1e-6)


if HAVE_HYP:

    @settings(max_examples=10, deadline=None)
    @given(n=st.integers(min_value=0, max_value=40),
           lb=st.integers(min_value=2, max_value=5))
    def test_window_count_property(n, lb):
        # windows = max(0, n − lb) given stride 1 + next-step label
        from auto_ml_platform_with_timeseries_data_spark.session import get_spark

        spark = get_spark("tests", cores=8, shuffle_partitions=8)
        df = _series_df(spark, {"g": [float(i) for i in range(n)]})
        cnt = ts.sliding_windows(df, "g", "t", ["v"], "v", lb).count() if n else 0
        assert cnt == max(0, n - lb)


def test_acf_constant_series_is_null_not_error(spark):
    """Zero-variance series: autocorrelation undefined (statsmodels
    NaN) -> NULL at every lag, never an ANSI divide error."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.operators.timeseries import (
        acf,
    )

    rows = [(1, dt.datetime(2024, 1, 1, 0, i), 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "g long, ts timestamp, v double")
    out = acf(df, "g", "ts", "v", max_lag=3).collect()
    assert len(out) == 4
    assert all(r["acf"] is None for r in out)
