"""Semantics for the data-quality constraint suite
(operators/validation.py)."""

from __future__ import annotations

from auto_ml_platform_with_timeseries_data_spark.operators.validation import (
    not_null_check,
    range_check,
    referential_check,
    unique_check,
)


def test_constraint_checks_count_violations(spark):
    child = spark.createDataFrame(
        [(1, 5.0), (2, 500.0), (2, None), (9, 1.0)], "k long, v double")
    parent = spark.createDataFrame([(1,), (2,)], "k long")

    r = range_check(child, "v_range", "v", 0.0, 100.0).first()
    assert (r["n_checked"], r["n_violations"], r["passed"]) == (4, 2, 0)
    # out-of-range 500.0 AND the null both violate a presence+range contract

    nn = not_null_check(child, "v_nn", "v").first()
    assert (nn["n_violations"], nn["passed"]) == (1, 0)

    u = unique_check(child, "k_unique", "k").first()
    assert (u["n_violations"], u["passed"]) == (1, 0)   # k=2 twice

    fk = referential_check(child, "k_fk", "k", parent, "k").first()
    assert (fk["n_checked"], fk["n_violations"], fk["passed"]) == (4, 1, 0)

    ok = range_check(child.filter("v is not null and v < 100"),
                     "ok", "v", 0.0, 100.0).first()
    assert ok["passed"] == 1 and ok["n_violations"] == 0


def test_gdpr_erasure_cascades_transitively(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.validation import (
        gdpr_erase,
    )

    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 2), (13, 3)],
        "o_orderkey long, o_custkey long")
    li = spark.createDataFrame(
        [(10, 1), (11, 1), (11, 2), (12, 1), (13, 1)],
        "l_orderkey long, l_lineno long")
    keys = spark.createDataFrame([(2,)], "c_custkey long")
    got = {r["table_name"]: r for r in
           gdpr_erase(cust, orders, li, keys).collect()}
    assert got["customer"]["rows_deleted"] == 1
    assert got["orders"]["rows_deleted"] == 2          # orders 11, 12
    assert got["lineitem"]["rows_deleted"] == 3        # lines of 11, 12
    assert all(r["residual_refs"] == 0 for r in got.values())
    assert got["lineitem"]["rows_after"] == 2
