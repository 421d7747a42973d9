"""As-of join + sessionization semantics on hand-built inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators.asof import (
    asof_join_backward,
)
from auto_ml_platform_with_timeseries_data_spark.operators.sessionize import (
    sessionize,
)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 10, "b"), (1, 15, "c"), (3, 1, "z")],
        "k long, rt long, val string")
    out = asof_join_backward(left, right, "k", "t", "rt", ["val"])
    got = {(r["k"], r["t"]): (r["asof_rt"], r["val"]) for r in out.collect()}
    assert got[(1, 10)] == (10, "b")   # <= picks the equal timestamp
    assert got[(1, 20)] == (15, "c")   # latest before 20
    assert got[(1, 5)] == (None, None)  # nothing at or before 5
    assert got[(2, 10)] == (None, None)  # no right rows for key 2
    assert len(got) == 4                # every left row survives (outer)


def test_sessionize_gap_splits(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 01:00:00"),   # 50-min gap → new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = sessionize(df, "user_id", "ts", gap_minutes=30)
    got = {(r["user_id"], str(r["ts"])): r["session_id"] for r in out.collect()}
    assert got[(1, "2024-01-01 00:00:00")] == 1
    assert got[(1, "2024-01-01 00:10:00")] == 1
    assert got[(1, "2024-01-01 01:00:00")] == 2
    assert got[(2, "2024-01-01 00:00:00")] == 1


def test_sessionize_exact_gap_boundary(spark):
    # gap strictly greater-than splits; exactly 30:00 stays in-session
    rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:30:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = sessionize(df, "user_id", "ts", gap_minutes=30)
    assert {r["session_id"] for r in out.collect()} == {1}


def test_range_join_semantics(spark):
    """q49 shape: purchases pick up only same-user clicks in (p.ts-1h, p.ts]."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minutes, uid, typ, val):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, val, "{}")

    rows = [
        ev(1, 0, 7, "purchase", 100.0),
        ev(2, -30, 7, "click", 1.0),    # in window
        ev(3, -61, 7, "click", 2.0),    # too old (>1h before)
        ev(4, 0, 7, "click", 4.0),      # simultaneous → excluded (c.ts < p.ts)
        ev(5, -10, 8, "click", 8.0),    # other user
        ev(6, 5, 7, "click", 16.0),     # after purchase
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    p = df.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("__pts"))
    c = df.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("__cuid"), F.col("ts").alias("__cts"),
        F.col("event_id").alias("__cid"), F.col("value").alias("__cval"))
    got = (p.join(c, (F.col("user_id") == F.col("__cuid"))
                  & (F.col("__cts") >= F.col("__pts") - F.expr("INTERVAL 1 HOUR"))
                  & (F.col("__cts") < F.col("__pts")), "left")
           .groupBy("event_id").agg(F.count("__cid").alias("n"),
                                    F.sum("__cval").alias("s"))).collect()
    assert len(got) == 1
    assert got[0]["n"] == 1 and got[0]["s"] == 1.0


def test_resample_ffill_gaps(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from auto_ml_platform_with_timeseries_data_spark.operators.sessionize import (
        resample_ffill,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [  # observations at hours 0, 1, 4 → gaps at 2, 3
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(hours=1), 20.0),
        (1, t0 + dt.timedelta(hours=4), 50.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["bucket"]: r for r in
           resample_ffill(df, "user_id", "ts", "value", 3600).collect()}
    assert len(got) == 5  # dense hourly grid 00:00..04:00
    assert got["2024-01-01 01:00:00"]["value_ffill"] == 20.0
    assert got["2024-01-01 02:00:00"]["n_obs"] == 0
    assert got["2024-01-01 02:00:00"]["value_ffill"] == 20.0  # carried
    assert got["2024-01-01 03:00:00"]["value_ffill"] == 20.0
    assert got["2024-01-01 04:00:00"]["value_ffill"] == 50.0


def test_zscore_flags_planted_spike(spark):
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.operators.sessionize import (
        zscore_outliers,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(minutes=i),
             100.0 + (i % 3) + (500.0 if i == 30 else 0.0))
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")
    got = zscore_outliers(df, "user_id", "ts", "event_id", "value").collect()
    assert [r["event_id"] for r in got] == [30]


def test_zscore_constant_window_flags_nothing(spark):
    """A constant trailing window has zero spread: no outlier verdict,
    no ANSI divide error — even when a new value finally deviates the
    z-score is NULL until the window has spread."""
    from auto_ml_platform_with_timeseries_data_spark.operators.sessionize import (
        zscore_outliers,
    )

    rows = [(1, i, 5.0) for i in range(10)] + [(1, 10, 99.0)]
    df = spark.createDataFrame(rows, "g long, ts long, v double")
    out = zscore_outliers(df, "g", "ts", "ts", "v")
    assert out.count() == 0
