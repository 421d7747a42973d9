"""Relational operators — joins, grouped aggregation, top-k (SURVEY.md §2.3,
§2.6, §7 extension surface).

The reference implements no joins (SURVEY §2.3) — its only cross-table
contract is schema alignment. These queries exercise the join/agg/topk
surface that Catalyst gives the engine for free, shaped like the TPC-H
workloads the driver fixtures mirror, and serve as the bench headliners.

Scale notes (these ARE the plans we want at 100 TB):

- q26 pricing summary: scan + map-side partial agg into 6 groups —
  whole-stage codegen end to end, shuffle carries 6 rows per task.
- q27 revenue-by-nation: lineitem⋈orders is the only big-big join
  (shuffle on orderkey); customer/nation/region are broadcast — no
  shuffle for any dimension. Filters applied BEFORE the big join so
  pushdown prunes the parquet scan.
- q28 top customers: big-big join then partial agg; final top-10 is a
  TakeOrdered — no global sort of the aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


_SPLIT_M = 1_000_000


def _split_sum(c: Column, name: str) -> list[Column]:
    """Exact order-independent money sum on the LONG fast path: split
    each value into (value div M, value mod M) and sum the halves
    separately. Both partial sums stay inside BIGINT to ~10^12 rows per
    group (lo < M bounds sum_lo by N·M; hi shrinks by M), and long
    aggregation lives in whole-stage codegen — where a DECIMAL(>18)
    sum boxes a BigDecimal per row and ran 4× slower (measured 1.3 s
    vs 0.36 s on the sf0.1 fixture; see BASELINE.md q26 note). The
    (c - lo)/M form keeps the division exact in doubles (numerator is
    a multiple of M, both < 2^53)."""
    lo = c % _SPLIT_M
    hi = ((c - lo) / _SPLIT_M).cast("long")
    return [F.sum(hi).alias(f"__{name}_hi"), F.sum(lo).alias(f"__{name}_lo")]


def _split_money(name: str, unit_scale: int) -> Column:
    """Recombine a split sum (post-aggregation, rows = #groups) in
    DECIMAL — exact at any magnitude — and round to money: the value
    is (hi·M + lo) · 10^-unit_scale."""
    total = (F.col(f"__{name}_hi").cast("decimal(38,0)")
             * F.lit(_SPLIT_M) + F.col(f"__{name}_lo"))
    return (F.round(total / F.lit(10 ** unit_scale).cast("decimal(7,0)"), 2)
            .cast("double"))



@query(
    "q26_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(sum(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_charge,
           ROUND(avg(l_quantity), 6) AS avg_qty,
           ROUND(avg(l_extendedprice), 6) AS avg_price,
           ROUND(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q26_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: one scan, partial aggregates.

    Money columns are exact 2-dp values (the TPC-H money contract), so
    each row converts to integer CENTS once — price·(1-disc) is then an
    exact integer in 10^-4 units, ·(1+tax) in 10^-6 units — and every
    sum runs as split long pairs (`_split_sum`): order-independent
    exact accumulation like the previous DECIMAL formulation, but on
    the codegen long path instead of per-row boxed BigDecimals (4×
    faster measured). Recombination to DECIMAL happens on the four
    output rows only. Results are bit-identical to the DECIMAL oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc100 = F.round((F.lit(1) - F.col("l_discount")) * 100).cast("long")
    tax100 = F.round((F.lit(1) + F.col("l_tax")) * 100).cast("long")
    qty100 = F.round(F.col("l_quantity") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *_split_sum(qty100, "qty"),
            *_split_sum(cents, "price"),
            *_split_sum(cents * disc100, "disc"),
            *_split_sum(cents * disc100 * tax100, "charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            _split_money("qty", 2).alias("sum_qty"),
            _split_money("price", 2).alias("sum_base_price"),
            _split_money("disc", 4).alias("sum_disc_price"),
            _split_money("charge", 6).alias("sum_charge"),
            "avg_qty", "avg_price", "avg_disc", "count_order",
        )
    )


@query(
    "q27_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY n_name
    """,
)
def q27_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: one big-big shuffle join (lineitem⋈orders), bounded
    dims broadcast; the status filter lands before the join (pushdown).

    Broadcast-hint rule (VERDICT.md round 2, item 9): hint only sides
    bounded by construction (nation=25, region=5 rows at ANY scale).
    customer grows with SF (~15M rows at sf100) — no hint; size-based
    planning broadcasts it at fixture scale and AQE flips it to a
    shuffle join when it outgrows the threshold at 100×."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            # split-long exact money sum (see _split_sum): same values
            # as the DECIMAL oracle, but on the codegen long path
            *_split_sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * F.round((F.lit(1) - F.col("l_discount")) * 100)
                .cast("long"),
                "rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select("n_name", _split_money("rev", 4).alias("revenue"),
                "n_items")
    )


@query(
    "q28_top_customers",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(sum(o_totalprice), 4) AS total_spend,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey ASC
    LIMIT 10
    """,
)
def q28_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k after aggregation — TakeOrderedAndProject, no full sort."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        # customer is SF-linear — no broadcast hint (see q27)
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


@query(
    "q31_set_ops",
    oracle="""
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    ORDER BY c_custkey
    """,
)
def q31_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level set ops (SURVEY §2.7 extension): customers with orders."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.intersect(orders).orderBy("c_custkey")


@query(
    "q32_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '__ALL__') AS l_returnflag,
           COALESCE(l_linestatus, '__ALL__') AS l_linestatus,
           ROUND(sum(l_quantity), 4) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q32_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (SURVEY §2.4 note — free in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("__ALL__")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("__ALL__")).alias("l_linestatus"),
            "sum_qty", "n",
        )
    )


@query(
    "q40_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(ROUND(sum(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q40_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass — Catalyst expands the sets map-side, so the shuffle still
    carries only (groups × sets) rows. Decimal accumulation keeps the
    sums order-independent (same contract as q26)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,4)")), 2)
            .cast("double").alias("sum_qty"),
        )
    )


@query(
    "q41_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders
    ) WHERE rk <= 3 AND o_custkey <= 200
    """,
)
def q41_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer — the canonical window top-k.
    The rank filter prunes INSIDE the window stage (WindowGroupLimit
    pushes k into the sort), so no full per-group materialization."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.filter(F.col("o_custkey") <= 200)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "q42_semi_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                THEN 'active' ELSE 'inactive' END AS status
    FROM customer c
    WHERE c.c_custkey <= 500
    """,
)
def q42_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join in one result: customers tagged by order
    existence. Both halves are hash joins on the (deduplicated,
    broadcast-able) key set — no row multiplication from the orders
    side, which is the point of semi/anti over inner joins."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 500
    ).select("c_custkey", "c_name")
    okeys = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    active = cust.join(okeys, "c_custkey", "left_semi").withColumn(
        "status", F.lit("active")
    )
    inactive = cust.join(okeys, "c_custkey", "left_anti").withColumn(
        "status", F.lit("inactive")
    )
    return active.unionByName(inactive)


@query(
    "q43_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q43_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped percentiles (linear interpolation — same definition
    in Spark's percentile and DuckDB's quantile_cont). Exact quantiles
    shuffle the full column per group; the approximate scale path is
    percentile_approx (t-digest, mergeable sketches) — exposed here
    exactly because the oracle can't check a sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
    )


@query(
    "q44_profit_by_nation_brand",
    oracle="""
    SELECT n.n_name, p.p_brand,
           CAST(ROUND(sum(CAST(l.l_extendedprice AS DECIMAL(12,4))
                          * CAST(1 - l.l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY n.n_name, p.p_brand
    """,
)
def q44_profit_by_nation_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped multi-dimension star join: the fact table joins
    part, supplier, and nation — ALL broadcast (each is tiny relative to
    lineitem at any scale factor that matters), so the only wide
    operation is the final grouped aggregation. The p_type filter is
    applied to part BEFORE the broadcast, shrinking the build side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey", "p_brand")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    price_d = F.col("l_extendedprice").cast("decimal(12,4)")
    disc_d = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    return (
        li.select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        # part/supplier are SF-linear — no broadcast hint (see q27);
        # nation is bounded (25 rows) at any scale
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "p_brand")
        .agg(
            F.round(F.sum(price_d * disc_d), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q46_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q46_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column exact distinct aggregation (Catalyst expands to
    grouping-set partials — still two shuffles, no row explosion). The
    100 TB path is approx_count_distinct (HyperLogLog++, one pass,
    mergeable) — kept out of the oracle query because a sketch can't
    hash-match exact SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q49_range_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           count(c.event_id) AS n_clicks_1h,
           CAST(ROUND(COALESCE(sum(c.value), 0), 6) AS DOUBLE) AS click_value_1h
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def q49_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: every purchase joined to the same user's
    clicks in the preceding hour (time-bounded attribution — the
    canonical "events within a window of events" shape Spark has no
    native operator for).

    Physical strategy: equi-join on user_id with the time bound as a
    join-level residual predicate, then partial agg. The equi key does
    the heavy lifting (hash/SMJ, shuffle once on user_id); the range
    predicate filters inside the join, so no cross product ever
    materializes. Degenerate key distributions (one user = whole
    stream) are the documented limit — then the scale path is binning
    ts to 1-hour buckets, joining on (user_id, bucket±1), and
    re-filtering, which bounds any single join group."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("__pts"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("__cuid"), F.col("ts").alias("__cts"),
        F.col("event_id").alias("__cid"), F.col("value").alias("__cval"))
    joined = p.join(
        c,
        (F.col("user_id") == F.col("__cuid"))
        & (F.col("__cts") >= F.col("__pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("__cts") < F.col("__pts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("__cid").alias("n_clicks_1h"),
        F.round(F.coalesce(F.sum("__cval"), F.lit(0.0)), 6)
        .alias("click_value_1h"),
    )


@query(
    "q50_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def q50_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): both date filters sit directly
    on base tables (parquet pushdown), customer is broadcast, the only
    shuffle is lineitem⋈orders on orderkey + the final partial agg;
    top-10 runs as TakeOrderedAndProject (no global sort). Exact DECIMAL
    accumulation for order-independent revenue (see q26)."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff)
    price_d = F.col("l_extendedprice").cast("decimal(12,4)")
    disc_d = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # segment-filtered customer is still SF-linear — no hint (see q27)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(price_d * disc_d), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q54_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           ROUND(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q54_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` column with a
    typed from_json schema (JVM-side Jackson, codegen-friendly — not a
    UDF) and aggregate. At scale, from_json with an explicit schema beats
    schema_of_json/get_json_object per-field: one parse per row, pruned
    to the referenced fields by Catalyst's JsonExpressionOptimization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type",
                  F.from_json("props", "k bigint").alias("__p"))
        .select("event_type", F.col("__p.k").alias("__k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__k"), 6).alias("avg_k"),
            F.min("__k").alias("min_k"),
            F.max("__k").alias("max_k"),
        )
    )


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                how: str = "inner", salt: int = 8,
                seed: int = 42) -> DataFrame:
    """Skew-mitigated equi-join: left rows get a deterministic-per-run
    pseudo-random salt in [0, salt); the (smaller, but not
    broadcast-able) right side is replicated salt× with every salt
    value; joining on (keys…, salt) spreads a hot key over `salt`
    shuffle partitions instead of one straggler task.

    Result is row-identical to the plain join (verified by test): each
    left row meets exactly one replica of each matching right row.
    This is the manual fallback when AQE's skew-join can't apply —
    broadcast-ineligible right side + a key so hot one partition
    exceeds the executor, or a non-sort-merge plan. Cost: right side
    ×salt (choose salt ≈ hot-key partition excess, not 100)."""
    sl = left.withColumn(
        "__salt", F.floor(F.rand(seed) * salt).cast("int"))
    sr = right.withColumn(
        "__salt",
        F.explode_outer(F.sequence(F.lit(0), F.lit(salt - 1))))
    return sl.join(sr, on + ["__salt"], how).drop("__salt")


@query("q81_approx_aggs")  # rows-only: HLL/KLL sketch values are
# engine-specific (Spark HLL++ vs DuckDB HLL disagree by design);
# tests/test_relational_more.py pins the relative error vs exact.
def q81_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates next to their exact twins: HyperLogLog++
    distinct counts and quantile summaries. At 100 TB the exact forms
    are the bottleneck (countDistinct = shuffle of every distinct key;
    exact percentile = sort), while the sketches are one-pass,
    mergeable, fixed-size state — the only viable form; rsd/accuracy
    knobs trade state for error."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custkeys"),
        F.countDistinct("o_custkey").alias("exact_custkeys"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
    ).orderBy("o_orderpriority")


@query(
    "q132_exact_agg_twin",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS exact_custkeys,
           floor(quantile_cont(o_totalprice, 0.5) * 1e2 + 0.5) / 1e2
             AS exact_median
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q132_exact_agg_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact half of q81, split out so it carries a DuckDB oracle
    (VERDICT.md round 2, item 8): exact distinct counts and exact
    interpolated medians per priority. q81 keeps the sketch half
    rows-only — Spark HLL++ and DuckDB HLL disagree by design, but the
    exact twins are engine-portable and hash-checkable. Median pinned
    with floor(x·1e2+0.5) on both sides, NOT round(): the engines'
    round() disagree at the .xx5 half-boundary (Spark HALF_UP on the
    shortest decimal repr vs DuckDB on the binary double — the
    ts_features.py:160 lesson), while the interpolated median itself is
    the same IEEE double on both."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_custkeys"),
        (F.floor(F.expr("percentile(o_totalprice, 0.5)") * 1e2 + 0.5) / 1e2)
        .alias("exact_median"),
    ).orderBy("o_orderpriority")


_SKETCH_GATES = {          # measured max across sf0.01/sf0.1 → floor
    "hll_groupby": 0.06,   # rel err ≤ 0.0085 measured; 3σ of rsd=0.02
    "hll_merge_weekly": 0.05,  # ≤ 0.008 measured; q131's lgK=12 3σ bound
    "kll_median_rank": 0.00025,  # rank bracket within 2.5×(1/accuracy)
}


@query(
    "q349_sketch_error_gate",
    oracle="""
    SELECT 'hll_groupby' AS sketch, CAST('0.06' AS DOUBLE) AS bound,
           TRUE AS within_bound
    UNION ALL
    SELECT 'hll_merge_weekly', CAST('0.05' AS DOUBLE), TRUE
    UNION ALL
    SELECT 'kll_median_rank', CAST('0.00025' AS DOUBLE), TRUE
    ORDER BY sketch
    """,
)
def q349_sketch_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked ERROR-BOUND certificates for the sketch family —
    the q175/q201 gate pattern applied to q81/q131's rows-only
    approximations (VERDICT r14 #4: the exact twins q132/q178 pin the
    exact halves, but nothing driver-checked bounded the approximation
    itself until now). Three gates, each a boolean against a constant
    all-TRUE oracle (sketch register values are engine-specific by
    design; whether the estimate honors its published bound is not):

    - hll_groupby: q81's HLL++ approx_count_distinct(rsd=0.02) per
      order priority vs exact — max relative error ≤ 0.06 (3σ;
      measured ≤ 0.0085 across sf0.01/sf0.1, so only a broken hash
      family or register merge crosses it).
    - hll_merge_weekly: q131's mergeability dataflow — per-day
      hll_sketch_agg unioned to weekly estimates vs exact weekly
      distincts, every week within 5% (lgK=12 → σ≈1.6%; measured
      ≤ 0.008).
    - kll_median_rank: q81's percentile_approx(0.5, accuracy=10000)
      certified in RANK space, the space its guarantee lives in (the
      value-space error is unbounded for skewed data): per priority,
      the returned value's closed rank bracket [rank_lt, rank_le] must
      reach within eps of 0.5, eps = 2.5e-4 = 2.5×(1/accuracy)
      headroom for the discrete bracket at finite n (measured bracket
      edge 1.7e-5 from nominal at sf0.1).

    Only booleans and constants reach the output — the measured
    estimates stay engine-side, so the oracle is portable. All three
    measurements are distributed aggregates; the driver sees three
    scalars (the q175 bounded-collect contract)."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"),
        F.countDistinct("o_custkey").alias("e"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("am"),
    )
    hll_ok = (g.select((F.max(F.abs(F.col("a") - F.col("e")) / F.col("e"))
                        <= _SKETCH_GATES["hll_groupby"]).alias("ok"))
              .collect()[0]["ok"])
    eps = _SKETCH_GATES["kll_median_rank"]
    ranks = (o.join(F.broadcast(g.select("o_orderpriority", "am")),
                    "o_orderpriority")
             .groupBy("o_orderpriority").agg(
                 (F.sum(F.when(F.col("o_totalprice") < F.col("am"), 1)
                        .otherwise(0)) / F.count(F.lit(1))).alias("lt"),
                 (F.sum(F.when(F.col("o_totalprice") <= F.col("am"), 1)
                        .otherwise(0)) / F.count(F.lit(1))).alias("le")))
    kll_ok = (ranks.select(
        (F.min(F.when((F.col("lt") <= 0.5 + eps)
                      & (F.col("le") >= 0.5 - eps), 1).otherwise(0)) == 1)
        .alias("ok")).collect()[0]["ok"])
    ev = load_table(spark, sf_dir, "events")
    day = ev.select(F.date_trunc("week", "ts").alias("week"),
                    F.date_trunc("day", "ts").alias("day"), "user_id")
    weekly = (day.groupBy("week", "day")
              .agg(F.hll_sketch_agg("user_id").alias("sk"))
              .groupBy("week")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("approx")))
    exact = day.groupBy("week").agg(F.countDistinct("user_id").alias("e"))
    merge_ok = (weekly.join(exact, "week").select(
        (F.max(F.abs(F.col("approx") - F.col("e")) / F.col("e"))
         <= _SKETCH_GATES["hll_merge_weekly"]).alias("ok"))
        .collect()[0]["ok"])
    rows = [("hll_groupby", _SKETCH_GATES["hll_groupby"], bool(hll_ok)),
            ("hll_merge_weekly", _SKETCH_GATES["hll_merge_weekly"],
             bool(merge_ok)),
            ("kll_median_rank", eps, bool(kll_ok))]
    return spark.createDataFrame(
        rows, "sketch string, bound double, within_bound boolean") \
        .orderBy("sketch")


_PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


@query(
    "q82_pivot_unpivot",
    oracle="""
    SELECT source, lang, count(*) AS n_docs
    FROM documents GROUP BY source, lang
    """,
)
def q82_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide: one column per language, explicit value list so
    the schema is known without a discovery pass — mandatory at scale)
    then unpivot back (wide→long via the ids/values melt). The
    round-trip must reproduce the plain long-form aggregate, which is
    the oracle. Spark plans pivot as the long-form aggregate followed
    by a pivotfirst re-aggregate — one extra shuffle, but its input is
    the already-reduced long form (|sources|×|langs| rows), so the
    extra exchange is negligible at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    wide = (
        docs.groupBy("source")
        .pivot("lang", _PIVOT_LANGS)
        .agg(F.count(F.lit(1)))
    )
    long = wide.unpivot(
        ids=["source"], values=_PIVOT_LANGS,
        variableColumnName="lang", valueColumnName="n_docs",
    )
    # pivot fills absent (source, lang) cells with null; the long-form
    # oracle has no such rows
    return long.filter(F.col("n_docs").isNotNull())


@query(
    "q91_equidepth_hist",
    oracle="""
    SELECT lang, decile, count(*) AS n,
           min(n_chars) AS lo, max(n_chars) AS hi
    FROM (SELECT lang, n_chars,
                 ntile(10) OVER (PARTITION BY lang
                                 ORDER BY n_chars, doc_id) AS decile
          FROM documents)
    GROUP BY lang, decile
    """,
)
def q91_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram per language via ntile — the
    complement of the equal-width histogram (q03): bucket BOUNDARIES
    adapt to the distribution, bucket counts stay flat. Deterministic
    under the (n_chars, doc_id) total order.

    Scale note: ntile partitioned by lang is one shuffle + sorted
    streaming per partition. A GLOBAL (unpartitioned) ntile would
    serialize into one task — at scale use approxQuantile cutpoints
    (mergeable sketch, q81) and a map-side width_bucket assignment
    instead."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as _W

    dec = F.ntile(10).over(
        _W.partitionBy("lang").orderBy("n_chars", "doc_id"))
    return (
        docs.select("lang", "n_chars", dec.alias("decile"))
        .groupBy("lang", "decile")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("n_chars").alias("lo"),
             F.max("n_chars").alias("hi"))
    )


@query(
    "q126_copurchase_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n DESC, part_a, part_b
    LIMIT 20
    """,
)
def q126_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top part pairs appearing in the same
    order. The oracle states it as the relational self-join; the engine
    expands pairs INSIDE each order group with a higher-order function
    over the collected distinct part set — the scan runs once and the
    shuffle carries (order, parts) groups then (pair, partial count)
    rows, never the self-join's quadratic row blowup outside the group.
    Baskets are small (TPC-H ≤ 7 lines), so per-group expansion is
    bounded; a hot basket would cap exactly like the LSH buckets."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("__parts"))
        .filter(F.size("__parts") > 1)
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(F.transform(
                "__parts",
                lambda a: F.transform(
                    F.filter(F.col("__parts"), lambda b: b > a),
                    lambda b: F.struct(a.alias("part_a"), b.alias("part_b")),
                ),
            ))
        ).alias("p")
    )
    return (
        pairs.groupBy("p.part_a", "p.part_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "q128_pareto_abc",
    oracle="""
    WITH r AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
               AS revenue
      FROM orders GROUP BY o_custkey
    ),
    c AS (
      SELECT custkey, CAST(revenue AS DOUBLE) AS revenue,
             CAST(sum(revenue) OVER (ORDER BY revenue DESC, custkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum,
             CAST(sum(revenue) OVER () AS DOUBLE) AS total
      FROM r
    )
    SELECT custkey, ROUND(revenue, 2) AS revenue,
           floor((cum / total) * 1e6 + 0.5) / 1e6 AS cum_share,
           CASE WHEN cum / total <= 0.8 THEN 'A'
                WHEN cum / total <= 0.95 THEN 'B' ELSE 'C' END AS abc_class
    FROM c
    """,
)
def q128_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC revenue analysis: customers ranked by lifetime revenue
    with cumulative share and A/B/C class (80/95 cutoffs). Revenue sums
    through DECIMAL (exact, order-independent); cum/total divide as
    bit-identical doubles on both engines.

    The cumulative sum is the classic distributed two-pass prefix sum —
    NOT a global single-task window: (1) range-partition the customer
    aggregate on (revenue desc, custkey) so partition p holds a
    contiguous rank range; (2) per-partition cumulative sums run in
    parallel under a window PARTITIONED by the range-partition id;
    (3) per-partition totals (one row per partition — bounded model-size
    state, like fitted centroids) collect to the driver, turn into exact
    Decimal prefix offsets, and broadcast-join back. At 100× the
    customer dimension every stage stays parallel: the only global
    object is the P-row offset table. All revenue arithmetic stays in
    DECIMAL until the final double cast, so the result is bit-identical
    to the single-window formulation."""
    from decimal import Decimal

    o = load_table(spark, sf_dir, "orders")
    r = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)").alias("__rev"))
    nparts = spark.sparkContext.defaultParallelism
    # Range partitioner keeps the global (rev desc, custkey) order across
    # partition ids: pid 0 holds the top revenues. Persist: the partials
    # pass and the final pass both consume this exchange, and the ids
    # from spark_partition_id must come from ONE materialization.
    ranged = (
        r.repartitionByRange(nparts, F.desc("__rev"), F.asc("custkey"))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    totals = ranged.groupBy("__pid").agg(F.sum("__rev").alias("__t")).collect()
    by_pid = {row["__pid"]: row["__t"] for row in totals}
    offsets, acc = [], Decimal(0)
    for pid in sorted(by_pid):
        offsets.append((pid, acc))
        acc += by_pid[pid]
    total = acc  # exact grand total, known from the same partials
    off_df = spark.createDataFrame(
        offsets or [(0, Decimal(0))], "__pid int, __off decimal(38,4)")
    wcum = Window.partitionBy("__pid") \
                 .orderBy(F.desc("__rev"), F.asc("custkey")) \
                 .rowsBetween(Window.unboundedPreceding, 0)
    cum = (F.sum("__rev").over(wcum) + F.col("__off")).cast("double")
    share = cum / F.lit(total).cast("decimal(38,4)").cast("double")
    return ranged.join(F.broadcast(off_df), "__pid").select(
        "custkey",
        F.round(F.col("__rev").cast("double"), 2).alias("revenue"),
        (F.floor(share * 1e6 + F.lit(0.5)) / 1e6).alias("cum_share"),
        F.when(share <= 0.8, "A").when(share <= 0.95, "B")
        .otherwise("C").alias("abc_class"),
    )



# ---------------------------------------------------------------------------
# q214 — frequent triple itemsets (Apriori level 3 over the order basket)
# ---------------------------------------------------------------------------


def frequent_triples(baskets: DataFrame, basket_col: str, item_col: str,
                     min_support: int = 2) -> DataFrame:
    """Market-basket triples with support ≥ minsup — the Apriori step
    after q126's pairs. The level-1 downward-closure prune runs FIRST:
    an item in any frequent triple must itself appear in ≥ minsup
    baskets, so infrequent items leave the join graph before the cubic
    step (sound — no frequent triple is lost). The triple enumeration
    is then a basket-keyed double self-join with ordered items
    (a<b<c, each triple generated exactly once) and a count filter.
    (basket, item) rows are DEDUPED before the join — a basket that
    repeats an item (lineitem does repeat partkeys within an order)
    must still contribute exactly ONE row per triple, so support
    counts baskets, not row combinations.
    At 100 TB the prune is what keeps the join tractable: the long
    tail of once-seen items (most of a real catalog) never enters;
    what remains shuffles on the basket key it is already grouped by.

    The pruned+deduped (basket, item) frame is PERSISTED before the
    self-joins (r15, guide §2.4/§5): all three join branches read it,
    and without the cache each branch re-ran the scan → semi-join →
    distinct subtree from the source (measured: 6 source scans and
    three freq-item aggregations for one query; now one of each). The
    cache is slim — two key columns, post-prune — and intra-query;
    callers run under sessions that clear caches between queries."""
    freq_items = (baskets.groupBy(item_col)
                  .agg(F.count_distinct(basket_col).alias("__bn"))
                  .filter(F.col("__bn") >= min_support)
                  .select(item_col))
    li = (baskets.join(F.broadcast(freq_items), item_col, "leftsemi")
          .select(F.col(basket_col).alias("__bk"),
                  F.col(item_col).alias("__it"))
          .distinct().persist())
    li.count()
    a, b, c = li.alias("a"), li.alias("b"), li.alias("c")
    return (
        a.join(b, (F.col("a.__bk") == F.col("b.__bk")) &
               (F.col("a.__it") < F.col("b.__it")))
        .join(c, (F.col("a.__bk") == F.col("c.__bk")) &
              (F.col("b.__bk") == F.col("c.__bk")) &
              (F.col("b.__it") < F.col("c.__it")))
        .groupBy(F.col("a.__it").alias("item_a"),
                 F.col("b.__it").alias("item_b"),
                 F.col("c.__it").alias("item_c"))
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )


@query(
    "q214_frequent_triples",
    oracle="""
    WITH li AS (SELECT l_orderkey AS bk, l_partkey AS it FROM lineitem),
    freq AS (
      SELECT it FROM li GROUP BY it
      HAVING count(DISTINCT bk) >= 2
    ),
    f AS (SELECT DISTINCT bk, it FROM li WHERE it IN (SELECT it FROM freq))
    SELECT a.it AS item_a, b.it AS item_b, c.it AS item_c,
           CAST(count(*) AS BIGINT) AS support
    FROM f a
    JOIN f b ON a.bk = b.bk AND a.it < b.it
    -- the redundant b.bk = c.bk equality matters: without it the c
    -- relation connects to b only through the inequality, and the
    -- oracle's join planner may pick a b x c cross product (measured:
    -- >10 min at sf0.1 vs 0.7 s with the equality)
    JOIN f c ON a.bk = c.bk AND b.bk = c.bk AND b.it < c.it
    GROUP BY 1, 2, 3
    HAVING count(*) >= 2
    """,
)
def q214_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part triples co-purchased in at least two orders (Apriori with
    the level-1 prune): every (triple, support) row value-hash-checked
    against the oracle's unpruned three-way join — the prune provably
    changes nothing but the work."""
    li = load_table(spark, sf_dir, "lineitem")
    return frequent_triples(li, "l_orderkey", "l_partkey")
