"""As-of join — a time-series operator Spark lacks natively (SURVEY.md §7).

Semantics: for each left row (key, t_left), attach the single right row
with the same key and the LARGEST t_right <= t_left (backward as-of,
pandas merge_asof / DuckDB ASOF JOIN semantics).

Implementation is the union-interleave trick — fully distributed, ONE
shuffle on (key), no range cross-join blowup:

  1. union left probes and right quotes into one stream tagged by side
  2. sort within key by (time, side) — right rows sort BEFORE a left row
     with the same timestamp (<= semantics)
  3. last_value(right_attrs, ignoreNulls) over rows UNBOUNDED PRECEDING
     carries the most recent right row forward onto each left row

At 100 TB this is the plan you want: linear in |L|+|R|, sort-merge
within partitions, no per-key driver loop, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       left_time: str, right_time: str,
                       value_cols: list[str],
                       tie_break: str | None = None) -> DataFrame:
    """Backward as-of join; appends `value_cols` (and the matched right
    timestamp as `asof_<right_time>`) to every left row."""
    carry = [right_time] + value_cols
    l = left.select(
        F.col(key).alias("__k"), F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carry],
    )
    r = right.select(
        F.col(key).alias("__k"), F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(c).alias(f"__r_{c}") for c in carry],
    )
    order = [F.col("__t"), F.col("__side")] + (
        [F.col(f"__r_{tie_break}")] if tie_break else []
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = l.unionByName(r)
    for c in carry:
        out = out.withColumn(
            f"__last_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return (
        out.filter(F.col("__side") == 1)
        .select(
            *left.columns,
            F.col(f"__last_{right_time}").alias(f"asof_{right_time}"),
            *[F.col(f"__last_{c}").alias(c) for c in value_cols],
        )
    )


@query(
    "q30_asof_join",
    oracle="""
    SELECT o_orderkey, o_custkey,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_ts,
           e.value AS asof_value
    FROM orders o
    ASOF LEFT JOIN events e
      ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
    """,
)
def q30_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each order, the latest event of that user at or before the
    order date. Only user_ids 1..150 exist in events, so most orders get
    NULL matches — exercising the left-outer semantics too."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("o_custkey"), "ts", "value"
    )
    joined = asof_join_backward(
        orders, events, key="o_custkey", left_time="o_orderdate",
        right_time="ts", value_cols=["value"],
    )
    return joined.select(
        "o_orderkey", "o_custkey",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
        F.col("value").alias("asof_value"),
    )
