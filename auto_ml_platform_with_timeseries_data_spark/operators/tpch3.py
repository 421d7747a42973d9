"""Third relational batch — the remaining classic TPC-H query shapes
not covered by relational.py / tpch_more.py: min-cost supplier with a
correlated-min join-back (Q2), multi-way local-supplier volume (Q5),
nation-pair volume shipping (Q7), conditional-aggregate market share
(Q8), fraction-of-global-total HAVING (Q11), outer-join count
distribution (Q13), correlated-average small-quantity filter (Q17),
and nested-aggregate semi-join promotion (Q20).

The reference implements no joins (SURVEY.md §2.3); this is extension
surface (SURVEY.md §7/M6). The fixtures have no ``partsupp`` table, so
the Q2/Q11/Q20 shapes use ``lineitem`` as the part-supplier bridge —
the *plan shapes* (aggregate-then-join-back, scalar-subquery HAVING,
nested semi-joins) are what we exercise, with DuckDB oracles pinning
the semantics.

Scale notes (100 TB):
- Every "correlated subquery" is expressed as aggregate + join-back or
  window-over-group — never a per-row recompute. The per-group
  aggregates (per-part min cost, per-part avg quantity, per-part total
  quantity) are tiny relative to the fact table and broadcast back.
- Dimension joins (part/supplier/customer/nation/region) broadcast;
  the only big shuffles are lineitem⋈orders on orderkey and the
  per-(part,supp) aggregations on partkey — both uniform keys.
- Q13's outer join pre-aggregates orders per custkey BEFORE joining
  customer, so the outer join sees one row per customer, not one per
  order: the shuffle carries |customers| rows, not |orders|.

Cross-engine float determinism: money sums accumulate as exact
DECIMAL, are cast to DOUBLE once, and any division happens as a single
double op — identical in Spark and DuckDB regardless of row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


def _dec(col: str, prec: int = 12) -> F.Column:
    return F.col(col).cast(f"decimal({prec},4)")


def _disc_price_d() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(8,4)"
    )


def _ts(lit: str) -> F.Column:
    return F.lit(lit + " 00:00:00").cast("timestamp")


# ---------------------------------------------------------------------------
# Q2 shape — min-cost supplier per part (aggregate → window-min → join-back)
# ---------------------------------------------------------------------------


@query(
    "q98_min_cost_supplier",
    oracle="""
    WITH euro_supp AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    pair_cost AS (
        SELECT l.l_partkey, l.l_suppkey,
               ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
                     / CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE),
                     6) AS unit_cost
        FROM lineitem l
        JOIN euro_supp es ON l.l_suppkey = es.s_suppkey
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    best AS (
        SELECT * FROM pair_cost
        QUALIFY unit_cost = min(unit_cost) OVER (PARTITION BY l_partkey)
    )
    SELECT es.s_acctbal, es.s_name, es.n_name,
           p.p_partkey, p.p_type, b.unit_cost
    FROM best b
    JOIN euro_supp es ON b.l_suppkey = es.s_suppkey
    JOIN part p ON b.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    ORDER BY es.s_acctbal DESC, es.n_name, es.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q98_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (lineitem as the part-supplier bridge): restrict
    to in-region suppliers, aggregate unit cost per (part, supplier),
    keep the per-part minimum, join supplier/part attributes back.

    Plan: the region/nation/supplier chain is a broadcast semi-input
    (~1/5 of suppliers); the per-pair aggregate shuffles lineitem once
    on (partkey, suppkey); the per-part min is a window over partkey
    (second, much smaller shuffle — one row per pair, not per line);
    the final dimension joins broadcast. At 100 TB the pair aggregate
    is the only fact-sized stage. Ties on the rounded min are kept on
    both sides, so the result set is engine-independent.
    """
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")

    euro = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )

    pair_cost = (
        # euro supplier subset is SF-linear — no hint (see relational.q27)
        li.join(euro.select("s_suppkey"),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double")
                / F.sum(_dec("l_quantity")).cast("double"),
                6,
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey")
    best = pair_cost.withColumn(
        "min_cost", F.min("unit_cost").over(w)
    ).filter(F.col("unit_cost") == F.col("min_cost"))

    return (
        # euro / filtered part are SF-linear — no hint (see relational.q27)
        best.join(euro, best.l_suppkey == euro.s_suppkey)
        .join(
            part.filter(F.col("p_size") <= 10),
            best.l_partkey == part.p_partkey,
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q5 shape — local supplier volume (customer and supplier in same nation)
# ---------------------------------------------------------------------------


@query(
    "q99_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
                          CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q99_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join where the interesting predicate is
    cross-dimension (customer's nation == supplier's nation). The only
    fact-sized shuffle is lineitem⋈orders on orderkey; customer,
    supplier, nation, region all broadcast, and the same-nation filter
    evaluates inside the broadcast join, never as a shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    o_filt = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(o_filt, li.l_orderkey == o_filt.o_orderkey)
        # customer / region-filtered supplier are SF-linear — no hint
        .join(cust, o_filt.o_custkey == cust.c_custkey)
        .join(
            asia_supp,
            (li.l_suppkey == asia_supp.s_suppkey)
            & (cust.c_nationkey == asia_supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_disc_price_d()), 2).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q7 shape — volume shipping between a nation pair, by year
# ---------------------------------------------------------------------------


@query(
    "q100_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
                          CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE)
             AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY sn.n_name, cn.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q100_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation-pair disjunction evaluates after two
    broadcast dimension joins; grouping adds the derived year column.
    The supplier-side nation filter (suppliers in either nation) pushes
    into the broadcast build side, shrinking the probe early."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    pair = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    s_n = supp.join(F.broadcast(pair), supp.s_nationkey == pair.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    c_n = cust.join(F.broadcast(pair), cust.c_nationkey == pair.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1995-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        # nation-filtered supplier/customer are SF-linear — no hint
        .join(s_n, li.l_suppkey == s_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(c_n, orders.o_custkey == c_n.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.round(F.sum(_disc_price_d()), 2).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share of one nation inside a region, by year
# ---------------------------------------------------------------------------


@query(
    "q101_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(
             CAST(sum(CASE WHEN sn.n_name = 'NATION_6'
                  THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
                       CAST(1 - l_discount AS DECIMAL(8,4))
                  ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE) /
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
                      CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q101_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a conditional aggregate (share = sum-if /
    sum) instead of a self-join — one pass over the joined facts
    computes numerator and denominator together. Both DECIMAL sums are
    exact, so the single double division is engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    amer_cust = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("c_custkey")
    )
    s_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")

    o_filt = orders.filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    vol = _disc_price_d()
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        # filtered part / amer_cust / supplier are SF-linear — no hint
        li.join(
            part.filter(F.col("p_type") == "PROMO").select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(o_filt, li.l_orderkey == o_filt.o_orderkey)
        .join(amer_cust, o_filt.o_custkey == F.col("c_custkey"))
        .join(s_nat, li.l_suppkey == s_nat.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q11 shape — parts whose value exceeds a fraction of the global total
# ---------------------------------------------------------------------------


@query(
    "q102_important_parts",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS value_dec
        FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT sum(value_dec) AS total_dec FROM per_part)
    SELECT p.l_partkey,
           CAST(ROUND(p.value_dec, 2) AS DOUBLE) AS part_value
    FROM per_part p, total t
    WHERE CAST(p.value_dec AS DOUBLE) > 0.0006 * CAST(t.total_dec AS DOUBLE)
    ORDER BY part_value DESC, p.l_partkey
    """,
)
def q102_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp fixture → value from lineitem):
    per-group aggregate HAVING a scalar-subquery threshold. The global
    total re-aggregates the per-part rows (tiny) instead of rescanning
    lineitem, and joins back as a broadcast 1-row cross join — the
    fact table is scanned exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).alias("value_dec")
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > F.lit(0.0006) * F.col("total_dec").cast("double")
        )
        .select(
            "l_partkey",
            F.round(F.col("value_dec"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q13 shape — distribution of order counts per customer (outer join)
# ---------------------------------------------------------------------------


@query(
    "q103_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q103_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers-with-zero-orders must survive, so
    the join is outer. Scale formulation: pre-aggregate orders per
    custkey FIRST (map-side partial + one shuffle of |custkeys| rows),
    then left-join customer to the counts and coalesce missing to 0 —
    the outer join never carries per-order rows. The second aggregate
    (distribution) is over |customers| rows — negligible."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity orders vs per-part average (correlated avg)
# ---------------------------------------------------------------------------


@query(
    "q104_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)
                     / count(*), 6) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(sum(CAST(l.l_extendedprice AS DECIMAL(12,4))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'SMALL'
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q104_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated AVG subquery becomes one
    per-part aggregate joined back to the fact. The per-part averages
    are one row per partkey — broadcast back to lineitem, so the fact
    table neither shuffles nor rescans; the global sum is a 1-row
    two-phase aggregate. avg_qty is rounded identically on both
    engines before the `<` comparison so the boundary cannot flip."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.round(
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_qty")
    )
    return (
        # filtered part and the per-part averages are SF-linear — no hint
        li.join(
            part.filter(F.col("p_type") == "SMALL").select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(part_avg, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")) / F.lit(7.0), 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape — suppliers dominating a part's shipped volume (nested agg + semi)
# ---------------------------------------------------------------------------


@query(
    "q105_dominant_suppliers",
    oracle="""
    WITH red_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    pair_qty AS (
        SELECT l.l_partkey, l.l_suppkey,
               sum(CAST(l.l_quantity AS DECIMAL(12,4))) AS qty_dec
        FROM lineitem l
        JOIN red_parts rp ON l.l_partkey = rp.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    dominant AS (
        SELECT DISTINCT l_suppkey FROM (
            SELECT l_suppkey,
                   CAST(qty_dec AS DOUBLE) AS q,
                   0.3 * CAST(sum(qty_dec) OVER (PARTITION BY l_partkey)
                              AS DOUBLE) AS thresh
            FROM pair_qty
        ) WHERE q > thresh
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN dominant d ON s.s_suppkey = d.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_name
    """,
)
def q105_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested aggregation (per-pair quantity vs 30% of
    the per-part total) feeding a semi-join on suppliers. The part-name
    and shipdate filters prune the fact scan before the one shuffle on
    (partkey, suppkey); the per-part total is a window over the
    already-aggregated pairs; the dominant-supplier set is tiny and
    semi-joins supplier via broadcast. Threshold comparison happens on
    doubles derived from exact decimal sums — engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    pair_qty = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        # name-filtered part is SF-linear — no hint
        .join(red, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        pair_qty.withColumn(
            "thresh", F.lit(0.3) * F.sum("qty_dec").over(w).cast("double")
        )
        .filter(F.col("qty_dec").cast("double") > F.col("thresh"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        # dominant-supplier set is SF-linear — no hint
        supp.join(dominant, supp.s_suppkey == F.col("l_suppkey"), "semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
