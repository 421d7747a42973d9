"""Round-11 ADVICE regressions, pinned:

1. (medium) the round-12 pre-built operators claimed gate-compares in
   tests/test_round12_prebuilt.py before that file existed — the file
   now exists and runs driver-style oracle gates for all of q299-q310
   (see test_round12_prebuilt.test_registered_oracle_gate).
2. (low) cronbach_alpha k<2 guard — pinned here and in
   test_round12_prebuilt.test_cronbach_alpha_perfect_and_guards.
3. (low) hilbert_keys must drop ONLY its own scratch columns, never
   caller-supplied "__"-prefixed columns — pinned here.
4. (low) cox_stuart pairs must be DISJOINT for odd n (h = ceil(n/2),
   middle element dropped) — pinned here and in
   test_round12_prebuilt.test_cox_stuart_disjoint_pairs_and_trend.
5. (low) the registry rotation comment omitted q292-q298 — the
   comment was rewritten for round 12 and the rotation itself is
   pinned by test_registry.test_canaries_and_round12_rotation...
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import (
    evaluation,
    layout,
    ts_features,
)


def test_hilbert_keys_preserves_caller_dunder_columns(spark):
    df = spark.createDataFrame(
        [(1, 10, 20, 7), (2, 30, 40, 8), (3, 50, 60, 9)],
        "id long, x long, y long, __epoch long")
    out = layout.hilbert_keys(df, "x", "y")
    # caller columns (including the "__"-prefixed one) survive; only
    # hkey is added and no scratch column leaks
    assert set(out.columns) == {"id", "x", "y", "__epoch", "hkey"}
    got = {r["id"]: r["__epoch"] for r in out.collect()}
    assert got == {1: 7, 2: 8, 3: 9}


def test_cronbach_alpha_k1_returns_null_contract(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "a long")
    row = evaluation.cronbach_alpha(df, {"a": F.col("a")}).collect()[0]
    assert row["k"] == 1 and row["alpha"] is None
    with pytest.raises(ValueError):
        evaluation.cronbach_alpha(df, {})


def test_cox_stuart_odd_n_drops_middle_element(spark):
    # n = 7, h = ceil(7/2) = 4 -> exactly floor(7/2) = 3 disjoint
    # pairs (1,5)(2,6)(3,7); the overlapping-pair variant would emit 4
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2])],
        "g string, t long, v long")
    r = ts_features.cox_stuart(df, "g", "t", F.col("v")).collect()[0]
    assert r["n"] == 7
    # pairs: (3,5)+, (1,9)+, (4,2)- -> m = 3, pos = 2
    assert r["m_pairs"] == 3 and r["n_pos"] == 2
