"""Metric semantics pinned to the reference (binarize `<`, binary F1)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import evaluation as ev
from auto_ml_platform_with_timeseries_data_spark.operators import scaling as sc


def test_binarize_is_strictly_less_than(spark):
    # data_analysis.py:200-201 — value < threshold → 1 (NOT <=, NOT >)
    df = spark.createDataFrame([(99.0,), (100.0,), (101.0,)], "v double")
    got = [r["b"] for r in
           df.select(ev.binarize("v", 100.0).alias("b")).orderBy("v").collect()]
    assert got == [1, 0, 0]


def test_rmse_matches_numpy(spark):
    import numpy as np

    t = np.array([1.0, 2.0, 3.0, 4.0])
    p = np.array([1.5, 1.5, 3.5, 3.0])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(t, p)], "t double, p double")
    got = ev.rmse(df, "t", "p").collect()[0]["rmse"]
    assert math.isclose(got, float(np.sqrt(((t - p) ** 2).mean())), abs_tol=1e-6)


def test_confusion_and_f1(spark):
    #                 truth, pred
    rows = [(1, 1)] * 6 + [(0, 1)] * 2 + [(1, 0)] * 3 + [(0, 0)] * 9
    df = spark.createDataFrame(rows, "t int, p int")
    got = ev.confusion_and_f1(df, "t", "p").collect()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (6, 2, 3, 9)
    assert math.isclose(got["f1"], 2 * 6 / (2 * 6 + 2 + 3), abs_tol=1e-6)


def test_confusion_matrix_pivot_marginals(spark):
    rows = [(1, 1)] * 6 + [(0, 1)] * 2 + [(1, 0)] * 3 + [(0, 0)] * 9
    df = spark.createDataFrame(rows, "t int, p int")
    got = {r["truth"]: r for r in
           ev.confusion_matrix_pivot(df, "t", "p").collect()}
    assert got[1]["pred_1"] == 6 and got[1]["pred_0"] == 3
    assert got[0]["pred_1"] == 2 and got[0]["pred_0"] == 9


def test_standard_scale_fit_on_train_applied_to_test(spark):
    # data_analysis.py:159-160 — TRAIN-fitted params reused on test
    train = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    test = spark.createDataFrame([(5.0,), (15.0,)], "x double")
    out = sorted(
        r["x_scaled"]
        for r in sc.standard_scale(train, test, ["x"], ddof=0).collect()
    )
    # train: mu=5, sigma_pop=5 → test 5→0, 15→2
    assert math.isclose(out[0], 0.0, abs_tol=1e-9)
    assert math.isclose(out[1], 2.0, abs_tol=1e-9)


def test_min_max_scale(spark):
    train = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    test = spark.createDataFrame([(2.5,), (20.0,)], "x double")
    out = sorted(
        r["x_scaled"] for r in sc.min_max_scale(train, test, ["x"]).collect()
    )
    assert math.isclose(out[0], 0.25, abs_tol=1e-9)
    assert math.isclose(out[1], 2.0, abs_tol=1e-9)  # out-of-range extrapolates


def test_scale_params_pop_vs_samp(spark):
    import numpy as np

    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    df = spark.createDataFrame([(float(v),) for v in x], "x double")
    got = sc.scale_params(df, ["x"]).collect()[0]
    assert math.isclose(got["std_pop"], float(x.std(ddof=0)), abs_tol=1e-6)
    assert math.isclose(got["std_samp"], float(x.std(ddof=1)), abs_tol=1e-6)


def test_roc_auc_perfect_ties_and_degenerate(spark):
    """Perfectly separating scores give AUC 1; a constant score gives
    exactly 0.5 through the average-rank tie handling; a single-class
    label reports NULL-by-contract."""
    from auto_ml_platform_with_timeseries_data_spark.operators.evaluation import (
        roc_auc,
    )

    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], "s double, y int")
    assert roc_auc(df, F.col("s"), F.col("y")).first()["auc"] == 1.0

    tied = spark.createDataFrame(
        [(5.0, 0), (5.0, 0), (5.0, 1), (5.0, 1)], "s double, y int")
    assert roc_auc(tied, F.col("s"), F.col("y")).first()["auc"] == 0.5

    onecls = spark.createDataFrame(
        [(1.0, 1), (2.0, 1)], "s double, y int")
    assert roc_auc(onecls, F.col("s"), F.col("y")).first()["auc"] is None


def test_cohens_kappa_perfect_and_chance(spark):
    """Identical raters give kappa 1; a rater that ignores the other
    (one constant, one varying) gives kappa 0 (p_o == p_e exactly);
    both-constant-and-equal is the NULL-by-contract degenerate."""
    from auto_ml_platform_with_timeseries_data_spark.operators.evaluation import (
        cohens_kappa,
    )

    same = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("x", "x"), ("z", "z")],
        "a string, b string")
    assert cohens_kappa(same, F.col("a"), F.col("b")).first()["kappa"] == 1.0

    const = spark.createDataFrame(
        [("x", "x"), ("y", "x"), ("x", "x"), ("y", "x")],
        "a string, b string")
    assert cohens_kappa(const, F.col("a"),
                        F.col("b")).first()["kappa"] == 0.0

    degen = spark.createDataFrame(
        [("x", "x"), ("x", "x")], "a string, b string")
    assert cohens_kappa(degen, F.col("a"),
                        F.col("b")).first()["kappa"] is None
