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


# ---------------------------------------------------------------------------
# q113-q115 — target encoding, funnel, cohort retention
# ---------------------------------------------------------------------------


def test_q113_encoding_shrinks_toward_global_mean(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.registry import queries
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = queries()["q113_target_encoding"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    g = li.agg(F.avg("l_extendedprice")).collect()[0][0]
    for r in rows:
        raw = (
            li.filter(F.col("l_returnflag") == r["category"])
            .agg(F.avg("l_extendedprice")).collect()[0][0]
        )
        # smoothed encoding lies strictly between raw category mean and
        # the global mean (or equals both when they coincide)
        lo, hi = sorted([raw, g])
        assert lo - 1e-6 <= r["encoded"] <= hi + 1e-6


def test_q114_funnel_is_monotone(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.registry import queries

    r = queries()["q114_funnel"](spark, sf_dir).collect()[0]
    assert r["n_users"] >= r["step1_view"] >= r["step2_click"] >= r["step3_purchase"]
    assert r["step3_purchase"] >= 0


def test_q114_funnel_respects_order(spark):
    # user 1: purchase BEFORE click → must not count as step3
    from auto_ml_platform_with_timeseries_data_spark.operators import pipeline_ops  # noqa: F401
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:01", "view"),
            (2, 1, "2024-01-01 00:00:02", "purchase"),
            (3, 1, "2024-01-01 00:00:03", "click"),
            (4, 2, "2024-01-01 00:00:01", "view"),
            (5, 2, "2024-01-01 00:00:02", "click"),
            (6, 2, "2024-01-01 00:00:03", "purchase"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    seq = df.groupBy("user_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
        ).alias("s")
    )
    flags = {
        r["user_id"]: r["ok"]
        for r in seq.select(
            "user_id", F.col("s").rlike("view.*click.*purchase").alias("ok")
        ).collect()
    }
    assert flags[1] is False and flags[2] is True


def test_q115_cohort_triangle_properties(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.registry import queries

    rows = queries()["q115_cohort_retention"](spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["week_offset"] >= 0
        by_cohort.setdefault(r["cohort"], {})[r["week_offset"]] = r["n_users"]
    for cohort, offsets in by_cohort.items():
        # offset 0 is the cohort's own first week: every member is active
        assert 0 in offsets
        assert offsets[0] == max(offsets.values())
