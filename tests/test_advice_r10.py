"""Regression pins for the round-10 ADVICE fixes: turning_points NULL
filtering, logrank all-censored zero-rows contract, the q281 p-value
clamp, mixture_conformance's reserved '__other__' guard, and the
relabeling test's structurally independent hash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import (
    curation,
    ts_features,
    validation,
)


def test_turning_points_ignores_nulls(spark):
    """A NULL row neither inflates n nor breaks neighbor adjacency:
    [1,3,2] with a NULL spliced in the middle must report the same
    (n, n_turns) as the clean series."""
    clean = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 1, 3.0), ("g", 2, 2.0)],
        "g string, t int, v double")
    holed = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 1, 3.0), ("g", 2, None), ("g", 3, 2.0)],
        "g string, t int, v double")
    a = ts_features.turning_points(clean, "g", "t", "v").collect()[0]
    b = ts_features.turning_points(holed, "g", "t", "v").collect()[0]
    assert (a["n"], a["n_turns"]) == (3, 1)
    assert (b["n"], b["n_turns"]) == (3, 1)
    assert a["z"] == b["z"]


def test_logrank_all_censored_zero_rows(spark):
    """All-censored input: the filtered cell table is empty, so the
    operator reports ZERO rows (the documented contract), not a NULL-z
    row."""
    df = spark.createDataFrame(
        [(1, 0, 1), (2, 0, 0), (3, 0, 1), (4, 0, 0)],
        "t int, e int, a int")
    out = ts_features.logrank_test(
        df, F.col("t"), F.col("e"), F.col("a"))
    assert out.count() == 0


def test_bh_fdr_p_value_clamped(spark):
    """The clamped two-sided p can never leave [0, 1]: least(1.0, ·)
    caps it even if a polynomial variant puts sf(0) above 0.5 (this
    build's A&S form gives 2·sf(0) = 0.999999999, so the clamp is
    inactive there — pin both that value and the cap)."""
    rows = spark.createDataFrame(
        [(0.0,), (1e-9,), (0.5,), (6.0,)], "z double").select(
        "z",
        (F.floor(F.least(F.lit(1.0),
                         2 * validation._normal_sf(F.col("z")))
                 * 1e9 + F.lit(0.5)) / 1e9).alias("p")).collect()
    by_z = {r["z"]: r["p"] for r in rows}
    assert by_z[0.0] == 0.999999999
    assert all(0.0 <= p <= 1.0 for p in by_z.values())


def test_mixture_conformance_rejects_reserved_key(spark):
    df = spark.createDataFrame([("a",), ("b",)], "src string")
    with pytest.raises(ValueError, match="__other__"):
        curation.mixture_conformance(
            df, "src", {"a": 500000, "__other__": 500000})


def test_relabel_hash_structurally_distinct(spark):
    """The old scheme's collision — boot salt b+64 for id i equals
    boot salt b for the neighboring residue — must NOT relate the
    relabeling draws to the bootstrap's: for a sample of (id, salt)
    pairs the relabel u32 differs from the bootstrap u32 of EVERY
    salt in the 64-wide band for that id and its ±1 residue
    neighbors."""
    P, K, K2, M = (validation._BOOT_PREMOD, validation._BOOT_KNUTH,
                   validation._RELABEL_KNUTH, validation._BOOT_M32)

    def boot(i, b):
        return ((i % P) * 64 + b) % P * K % M

    def rel(i, b):
        return ((i % P) * 64 + b) % P * K2 % M

    for i in (1, 7, 123456, 999999999):
        for b in range(8):
            boots = {boot(j, bb)
                     for j in (i - 1, i, i + 1) for bb in range(64)}
            assert rel(i, b) not in boots
