"""Semantics + plan contracts for the second relational batch
(tpch_more.py) and the TS feature operators (ts_features.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
    ewma,
    interpolate_linear,
    lag_features,
    ohlc,
)
from auto_ml_platform_with_timeseries_data_spark.plans import explain
from auto_ml_platform_with_timeseries_data_spark.registry import queries
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


# ---------------------------------------------------------------------------
# Plan contracts
# ---------------------------------------------------------------------------


def test_q61_predicates_push_to_scan(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q61_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    for frag in ("l_shipdate", "GreaterThanOrEqual(l_discount",
                 "LessThan(l_quantity"):
        assert frag in plan, frag


def test_q62_broadcasts_nation_and_no_global_sort(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q62_returned_items"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # limit 20 without a full sort


def test_q63_part_join_is_broadcast(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q63_promo_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # lineitem never shuffles for the join


def test_q64_aggregates_before_join(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q64_large_orders"](spark, sf_dir))
    # the HAVING aggregate (partial+final on l_orderkey) sits below the joins
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2


def test_q66_distinct_agg_is_two_phase(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q66_supplier_breadth"](spark, sf_dir))
    # expand-based distinct aggregate: partial on (keys, suppkey) then count
    assert plan.count("HashAggregate") >= 3


def test_q67_anti_join_prunes_orders_scan(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q67_dormant_customers"](spark, sf_dir))
    assert "LeftAnti" in plan
    read = [l for l in plan.splitlines()
            if "ReadSchema" in l and "o_custkey" in l][0]
    assert "o_totalprice" not in read  # only custkey+orderdate read


def test_q68_grouping_sets_single_aggregate(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q68_grouping_sets"](spark, sf_dir))
    assert "Expand" in plan
    # one scan of orders despite 3 grouping sets
    assert sum("orders.parquet" in l for l in plan.splitlines()
               if "Location" in l) == 1


def test_ts_features_single_window_pass(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    df = lag_features(ev, "user_id", ["ts", "event_id"], "value", lags=3)
    plan = explain.formatted_plan(df)
    # all lag/delta/pct columns share one Window node and one exchange
    # (formatted output lists each node twice: tree + detail section)
    assert plan.count(") Window") == 1
    assert plan.count(") Exchange") == 1


def test_ewma_single_window_pass(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    df = ev.select("event_id", ewma(ev, "user_id", ["ts"], "value").alias("e"))
    plan = explain.formatted_plan(df)
    assert plan.count(") Window") == 1
    assert plan.count(") Exchange") == 1


# ---------------------------------------------------------------------------
# Operator semantics on tiny frames
# ---------------------------------------------------------------------------


def _ts(i: int) -> str:
    return f"2024-01-01 00:{i:02d}:00"


def test_ewma_matches_pandas_ewm(spark):
    pd = pytest.importorskip("pandas")
    vals = [1.0, 4.0, 2.0, 8.0, 5.0, 7.0]
    rows = [Row(user_id=1, event_id=i, ts=_ts(i), value=v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    got = (
        df.select("event_id",
                  ewma(df, "user_id", ["ts", "event_id"], "value",
                       alpha=0.3, lookback=20).alias("e"))
        .orderBy("event_id").collect()
    )
    want = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    # series shorter than the lookback → truncation exact, matches pandas
    for r, w in zip(got, want):
        assert math.isclose(r["e"], w, rel_tol=1e-12)


def test_ohlc_semantics(spark):
    rows = [
        Row(user_id=1, event_id=0, ts="2024-01-01 09:00:00", value=10.0),
        Row(user_id=1, event_id=1, ts="2024-01-01 12:00:00", value=30.0),
        Row(user_id=1, event_id=2, ts="2024-01-01 15:00:00", value=5.0),
        Row(user_id=1, event_id=3, ts="2024-01-01 18:00:00", value=20.0),
        Row(user_id=1, event_id=4, ts="2024-01-02 01:00:00", value=99.0),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["bucket_start"]: r for r in ohlc(df, "user_id", "ts", "value").collect()}
    d1 = out["2024-01-01 00:00:00"]
    assert (d1["open"], d1["high"], d1["low"], d1["close"], d1["n"]) == \
        (10.0, 30.0, 5.0, 20.0, 4)
    assert out["2024-01-02 00:00:00"]["open"] == 99.0


def test_interpolate_linear_fills_interior_and_edges(spark):
    vals = [None, 10.0, None, None, 40.0, None]
    rows = [Row(user_id=1, event_id=i, ts=_ts(i), v=v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = interpolate_linear(df, "user_id", ["ts", "event_id"], "v")
    got = [r["__interp"] for r in out.orderBy("event_id").collect()]
    # leading edge → nearest (10), interior → linear (20, 30), trailing → 40
    assert got == [10.0, 10.0, 20.0, 30.0, 40.0, 40.0]


def test_lag_features_null_prefix_and_pct(spark):
    rows = [Row(user_id=1, event_id=i, ts=_ts(i), value=float(v))
            for i, v in enumerate([2, 4, 1])]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r
           for r in lag_features(df, "user_id", ["ts", "event_id"],
                                 "value", lags=2).collect()}
    assert out[0]["lag_1"] is None and out[0]["pct_change"] is None
    assert out[1]["lag_1"] == 2.0 and out[1]["delta"] == 2.0
    assert out[1]["pct_change"] == 1.0
    assert out[2]["lag_2"] == 2.0 and out[2]["pct_change"] == -0.75


def test_q64_threshold_filters_orders(spark, sf_dir):
    out = queries()["q64_large_orders"](spark, sf_dir).collect()
    assert all(r["sum_qty"] > 140 for r in out)
    assert len(out) > 0


def test_q68_has_all_three_granularities(spark, sf_dir):
    out = queries()["q68_grouping_sets"](spark, sf_dir).collect()
    kinds = {(r["nation"] == "ALL", r["priority"] == "ALL") for r in out}
    assert kinds == {(False, False), (False, True), (True, False)}


def test_q95_semi_join_keeps_equi_key(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q95_late_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the non-equi shipdate predicate rides as the join condition,
    # not as the join key
    cond_lines = [l for l in plan.splitlines() if "Join condition" in l]
    assert any("l_shipdate" in l for l in cond_lines)


def test_q96_compares_exact_decimal(spark, sf_dir):
    out = queries()["q96_top_supplier"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) >= 1  # ties allowed, exact-decimal equality
    assert rows[0]["total_rev"] > 0


def test_q97_no_cartesian_and_single_fact_read(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q97_sole_late_supplier"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan
