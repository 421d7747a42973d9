"""The local correctness gate must be exactly as strict as the driver's
value hash (VERDICT.md round 2, item 3): the round-2 q125 red row passed
locally because np.allclose(atol=1e-9) tolerated DuckDB's HUGEINT→float64
widening and ulp-level float drift that the driver's exact hash rejects.
These tests pin the stricter semantics so the gap cannot reopen."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from check_oracle import compare  # noqa: E402


def test_int_vs_float_family_mismatch_fails():
    """The q125 bug class: Spark bigint vs DuckDB HUGEINT-as-float64."""
    a = pd.DataFrame({"n": pd.Series([10000], dtype="int64")})
    b = pd.DataFrame({"n": pd.Series([10000.0], dtype="float64")})
    ok, msg = compare(a, b)
    assert not ok
    assert "dtype family" in msg


def test_same_family_different_width_passes():
    a = pd.DataFrame({"n": pd.Series([5, 6], dtype="int32")})
    b = pd.DataFrame({"n": pd.Series([5, 6], dtype="int64")})
    assert compare(a, b)[0]


def test_float_compare_is_exact_not_tolerant():
    """Queries pin floats via round/floor on BOTH sides; the gate must
    not paper over a sub-1e-9 divergence the driver's hash would catch."""
    a = pd.DataFrame({"x": [1.0]})
    b = pd.DataFrame({"x": [1.0 + 1e-12]})
    assert not compare(a, b)[0]


def test_equal_floats_with_nan_pass():
    a = pd.DataFrame({"x": [1.5, float("nan")]})
    b = pd.DataFrame({"x": [float("nan"), 1.5]})  # order-insensitive
    assert compare(a, b)[0]


def test_nullable_int_with_nulls_survives_canonicalization():
    a = pd.DataFrame({"n": pd.Series([1, None], dtype="Int64")})
    b = pd.DataFrame({"n": pd.Series([None, 1], dtype="Int64")})
    assert compare(a, b)[0]


def test_column_name_mismatch_fails():
    a = pd.DataFrame({"sum_qty": [3]})
    b = pd.DataFrame({"sum(l_quantity)": [3]})
    ok, msg = compare(a, b)
    assert not ok and "columns" in msg


def test_rowcount_mismatch_fails():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1]})
    ok, msg = compare(a, b)
    assert not ok and "rowcount" in msg


def test_value_mismatch_reports_column():
    a = pd.DataFrame({"k": ["a"], "v": [1]})
    b = pd.DataFrame({"k": ["a"], "v": [2]})
    ok, msg = compare(a, b)
    assert not ok and "v" in msg


@pytest.mark.parametrize("tz", [None])
def test_datetime_compares_by_microsecond_int(tz):
    a = pd.DataFrame({"t": pd.to_datetime(["2026-01-01 00:00:00.000001"])})
    b = pd.DataFrame({"t": pd.to_datetime(["2026-01-01 00:00:00.000002"])})
    assert not compare(a, b)[0]
    assert compare(a, a.copy())[0]
