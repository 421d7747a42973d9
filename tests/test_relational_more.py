"""Contracts for the partitioned sink (q80), approx aggregates (q81),
pivot/unpivot (q82), and streaming sessions (q79)."""

from __future__ import annotations

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.plans import explain
from auto_ml_platform_with_timeseries_data_spark.registry import queries
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


def test_q80_reread_is_partition_pruned(spark, sf_dir):
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    stage = tempfile.mkdtemp(prefix="sparkgraft_parttest_")
    (docs.repartition("lang").write.mode("overwrite")
     .partitionBy("lang").parquet(stage))
    back = spark.read.parquet(stage).filter(F.col("lang") == "en")
    plan = explain.formatted_plan(back)
    # the lang predicate is a PartitionFilter (directory pruning), not a
    # row-level data filter
    assert "PartitionFilters" in plan
    part_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "lang" in part_line
    # exactly the one selected partition's files are scanned
    assert back.select("lang").distinct().collect()[0]["lang"] == "en"


def test_q81_sketches_close_to_exact(spark, sf_dir):
    rows = queries()["q81_approx_aggs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["approx_custkeys"] - r["exact_custkeys"]) \
            <= 0.06 * r["exact_custkeys"]
        assert abs(r["approx_median"] - r["exact_median"]) \
            <= 0.05 * abs(r["exact_median"])


def test_q81_approx_plan_has_no_expand(spark, sf_dir):
    # countDistinct plans an Expand + extra aggregate phase; the
    # approx-only form must stay a plain 2-phase aggregate
    o = load_table(spark, sf_dir, "orders")
    approx_only = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("a"))
    plan = explain.formatted_plan(approx_only)
    assert "Expand" not in plan
    # partial + final only (formatted output lists nodes twice: tree +
    # detail; count detail entries)
    assert plan.count(") HashAggregate") == 2


def test_q82_wide_schema_and_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wide = docs.groupBy("source").pivot(
        "lang", ["de", "en", "es", "fr", "zh"]).agg(F.count(F.lit(1)))
    assert wide.columns == ["source", "de", "en", "es", "fr", "zh"]
    # long-form aggregate + pivotfirst re-aggregate: exactly 2 exchanges,
    # the second over the already-reduced |sources|×|langs| rows
    plan = explain.formatted_plan(wide)
    assert plan.count(") Exchange") == 2


def test_q79_streaming_equals_batch_sessionize(spark, sf_dir):
    stream_rows = queries()["q79_stream_sessions"](spark, sf_dir)
    got = stream_rows.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events")).first()
    ev = load_table(spark, sf_dir, "events")
    batch = (ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
             .agg(F.count(F.lit(1)).alias("n")))
    want = batch.agg(F.count(F.lit(1)).alias("n_sessions"),
                     F.sum("n").alias("n_events")).first()
    assert (got["n_sessions"], got["n_events"]) == \
        (want["n_sessions"], want["n_events"])
