"""Semantics + plan contracts for the third relational batch (tpch3.py):
Q2/Q5/Q7/Q8/Q11/Q13/Q17/Q20 shapes. Value-level parity with DuckDB is
covered by scripts/check_oracle.py; here we pin the plan shapes that
matter at 100 TB and a few semantics that oracles can't see (ties,
zero-count customers, threshold boundaries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.plans import explain
from auto_ml_platform_with_timeseries_data_spark.registry import queries
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


# ---------------------------------------------------------------------------
# Plan contracts
# ---------------------------------------------------------------------------


def test_q98_dims_broadcast_and_window_min(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q98_min_cost_supplier"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan  # per-part min as window, not a second self-join
    assert "TakeOrderedAndProject" in plan  # LIMIT 100 without global sort


def test_q99_single_fact_shuffle(spark, sf_dir):
    df = queries()["q99_local_supplier_volume"](spark, sf_dir)
    # The SF-linear sides (customer, region-filtered supplier) carry no
    # broadcast hint; their sizes are only known to AQE at runtime, so
    # finalize the adaptive plan before asserting.
    df.collect()
    plan = explain.final_plan(df)
    # customer/supplier/nation/region all broadcast: the only non-broadcast
    # join permitted is lineitem ⋈ orders.
    assert plan.count("SortMergeJoin") <= 1
    assert plan.count("BroadcastHashJoin") >= 3


def test_q100_date_filter_pushed(spark, sf_dir):
    df = queries()["q100_volume_shipping"](spark, sf_dir)
    assert explain.has_pushed_filter(df, "l_shipdate")


def test_q101_share_is_single_pass(spark, sf_dir):
    df = queries()["q101_market_share"](spark, sf_dir)
    df.collect()  # unhinted SF-linear joins finalize under AQE
    # numerator and denominator in ONE aggregate — no self-join of the
    # joined fact table. Join strategy from the AQE-final tree; the
    # aggregate-function detail lines live outside that section.
    assert explain.final_plan(df).count("SortMergeJoin") <= 1
    assert "partial_sum" in explain.formatted_plan(df)


def test_q102_reuses_per_part_exchange(spark, sf_dir):
    df = queries()["q102_important_parts"](spark, sf_dir)
    df.collect()  # AQE finalizes exchange reuse only at execution
    plan = explain.formatted_plan(df)
    # The global total re-aggregates the per-part exchange; Spark's
    # ReuseExchange must kick in so lineitem is scanned/shuffled once.
    assert "ReusedExchange" in plan or "reused exchange" in plan.lower()


def test_q103_preaggregates_before_outer_join(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q103_order_count_distribution"](spark, sf_dir)
    )
    # orders collapse to per-custkey counts BELOW the outer join
    assert "partial_count" in plan


def test_q104_broadcasts_part_avg(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q104_small_quantity_revenue"](spark, sf_dir)
    )
    # correlated-avg join-back is broadcast: lineitem itself never
    # shuffles for the join.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q105_semi_join_and_pruned_scan(spark, sf_dir):
    df = queries()["q105_dominant_suppliers"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert explain.has_pushed_filter(df, "l_shipdate")
    assert "Window" in plan


# ---------------------------------------------------------------------------
# Semantics
# ---------------------------------------------------------------------------


def test_q103_includes_zero_order_customers(spark, sf_dir):
    out = queries()["q103_order_count_distribution"](spark, sf_dir).collect()
    dist = {r["c_count"]: r["custdist"] for r in out}
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    n_cust = cust.count()
    n_with = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "semi").count()
    )
    assert sum(dist.values()) == n_cust
    assert dist.get(0, 0) == n_cust - n_with


def test_q102_threshold_strictly_greater(spark, sf_dir):
    out = queries()["q102_important_parts"](spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    total = (
        li.agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,4)")).alias("t")
        ).collect()[0]["t"]
    )
    thresh = 0.0006 * float(total)
    vals = [r["part_value"] for r in out.collect()]
    assert all(v > thresh - 0.01 for v in vals)


def test_q105_dominant_implies_share_above_30pct(spark, sf_dir):
    # every returned supplier must actually dominate ≥1 red part in 1996
    out = queries()["q105_dominant_suppliers"](spark, sf_dir)
    names = {r["s_name"] for r in out.collect()}
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    pairs = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(red, li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    totals = pairs.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    dom = (
        pairs.join(totals, "l_partkey")
        .filter(F.col("q") > 0.3 * F.col("tq"))
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .select("s_name")
        .distinct()
    )
    assert names == {r["s_name"] for r in dom.collect()}
