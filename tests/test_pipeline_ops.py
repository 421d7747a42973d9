"""Semantics + plan contracts for pipeline-completion operators
(operators/pipeline_ops.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators.pipeline_ops import (
    merge_upsert,
    walkforward_folds,
)
from auto_ml_platform_with_timeseries_data_spark.plans import explain
from auto_ml_platform_with_timeseries_data_spark.registry import queries


def test_merge_upsert_semantics(spark):
    snap = spark.createDataFrame(
        [Row(k=1, v="old1"), Row(k=2, v="old2"), Row(k=3, v="old3")])
    delta = spark.createDataFrame(
        [Row(k=2, v="new2"), Row(k=9, v="ins9")])
    got = {r["k"]: r["v"] for r in merge_upsert(snap, delta, "k").collect()}
    assert got == {1: "old1", 2: "new2", 3: "old3", 9: "ins9"}


def test_merge_upsert_is_broadcast_anti(spark):
    snap = spark.range(1000).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    delta = spark.range(10).select(F.col("id").alias("k"), F.lit("y").alias("v"))
    plan = explain.formatted_plan(merge_upsert(snap, delta, "k"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan  # snapshot side never shuffles


def test_walkforward_chunks_partition_evenly(spark):
    rows = [Row(g=1, t=i) for i in range(8)]
    df = spark.createDataFrame(rows)
    out = walkforward_folds(df, "g", ["t"], k=3)
    chunks = [r["__chunk"] for r in out.orderBy("t").collect()]
    # 8 rows, 4 chunks -> 2 rows each; chunk is monotone in time
    assert chunks == [0, 0, 1, 1, 2, 2, 3, 3]


def test_walkforward_single_exchange(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q84_walkforward_splits"](spark, sf_dir))
    # rn + n + chunk + the final group ride ONE shuffle by user_id
    assert plan.count(") Exchange") == 1


def test_walkforward_validation_strictly_after_training(spark):
    rows = [Row(g=1, t=i) for i in range(12)]
    out = walkforward_folds(spark.createDataFrame(rows), "g", ["t"], k=3)
    rows_out = out.collect()
    for fold in (1, 2, 3):
        val_ts = {r["t"] for r in rows_out if r["__chunk"] == fold}
        train_ts = {r["t"] for r in rows_out if r["__chunk"] < fold}
        assert train_ts and val_ts
        assert max(train_ts) < min(val_ts)


def test_cluster_retention_no_window_over_documents(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q85_cluster_retention"](spark, sf_dir))
    # the arg-max is an aggregate of an orderable struct, not a
    # row_number window over the joined table
    assert ") Window" not in plan


def test_weighted_sample_monotone_in_weight(spark, sf_dir):
    out = {r["lang"]: r for r in
           queries()["q86_weighted_sample"](spark, sf_dir).collect()}
    assert out  # non-empty
    # kept average length must exceed the population average: the weight
    # favors long documents
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table
    pop = {r["lang"]: r["avg"] for r in
           load_table(spark, sf_dir, "documents")
           .groupBy("lang").agg(F.avg("n_chars").alias("avg")).collect()}
    for lang, r in out.items():
        assert r["avg_chars_kept"] > pop[lang]
