"""Semantics + plan contracts for the analysis batch: time-weighted
average (q106), CUSUM changepoints (q107), embedding dimension stats
(q108), bigram PMI (q109), seasonal residuals (q110)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
    cusum_changepoints,
    time_weighted_avg,
)
from auto_ml_platform_with_timeseries_data_spark.plans import explain
from auto_ml_platform_with_timeseries_data_spark.registry import queries


# ---------------------------------------------------------------------------
# time_weighted_avg semantics
# ---------------------------------------------------------------------------


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, k, f"2024-01-01 00:00:{s:02d}", v) for i, (k, s, v) in enumerate(rows)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_twa_constant_series_is_constant(spark):
    df = _mk_events(spark, [(1, 0, 5.0), (1, 10, 5.0), (1, 45, 5.0)])
    out = time_weighted_avg(df, "user_id", "ts", "value").collect()
    assert len(out) == 1
    assert out[0]["twa"] == 5.0
    assert out[0]["n_intervals"] == 2


def test_twa_weights_by_interval_not_count(spark):
    # value 10 held for 9s, value 0 held for 1s → TWA = 9, arithmetic mean
    # would be 5: the gap weighting must dominate.
    df = _mk_events(spark, [(1, 0, 10.0), (1, 9, 0.0), (1, 10, 99.0)])
    out = time_weighted_avg(df, "user_id", "ts", "value").collect()[0]
    assert out["twa"] == 9.0


def test_twa_single_event_user_dropped(spark):
    df = _mk_events(spark, [(1, 0, 3.0), (2, 0, 7.0), (2, 5, 7.0)])
    out = {r["user_id"]: r["twa"]
           for r in time_weighted_avg(df, "user_id", "ts", "value").collect()}
    assert 1 not in out and out[2] == 7.0


# ---------------------------------------------------------------------------
# cusum semantics
# ---------------------------------------------------------------------------


def test_cusum_flags_level_shift_not_noise(spark):
    # 40 points at 0, then 40 points at 3: the drift accumulates and must
    # trip; a pure zero series must not.
    shift = [(1, s, 0.0) for s in range(40)] + [(1, s + 40, 3.0) for s in range(19)]
    flat = [(2, s, 1.0) for s in range(59)]
    df = spark.createDataFrame(
        [(i, k, f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}", v)
         for i, (k, s, v) in enumerate(shift + flat)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = cusum_changepoints(df, "user_id", ["ts", "event_id"], "value").collect()
    users = {r["user_id"] for r in out}
    assert 1 in users  # shift detected
    assert 2 not in users  # constant series has sigma 0 → no flags


# ---------------------------------------------------------------------------
# Plan contracts
# ---------------------------------------------------------------------------


def test_q106_single_shuffle_window_plus_agg(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q106_time_weighted_avg"](spark, sf_dir)
    )
    assert "Window" in plan
    assert "HashAggregate" in plan


def test_q108_explode_then_partial_agg(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q108_embedding_dim_stats"](spark, sf_dir)
    )
    assert "Generate" in plan  # posexplode stays in the scan stage
    assert "partial_" in plan  # map-side combine before the d-row shuffle


def test_q109_no_positional_self_join(spark, sf_dir):
    plan = explain.formatted_plan(queries()["q109_bigram_pmi"](spark, sf_dir))
    # bigrams come from arrays_zip/slice, not a token self-join; the only
    # joins are broadcast unigram lookups.
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q110_profile_broadcast_topk(spark, sf_dir):
    plan = explain.formatted_plan(
        queries()["q110_seasonal_residuals"](spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# Cross-checks
# ---------------------------------------------------------------------------


def test_q109_pmi_math(spark, sf_dir):
    rows = queries()["q109_bigram_pmi"](spark, sf_dir).collect()
    assert len(rows) == 20
    # pmi is a log-ratio: |pmi| bounded by ln(N); counts positive
    for r in rows:
        assert r["c_xy"] >= 1
        assert math.isfinite(r["pmi"])


def test_q108_dims_cover_vector_width(spark, sf_dir):
    rows = queries()["q108_embedding_dim_stats"](spark, sf_dir).collect()
    dims = [r["dim"] for r in rows]
    assert dims == list(range(1, len(dims) + 1))
    for r in rows:
        assert r["min_v"] <= r["mean_v"] <= r["max_v"]


# ---------------------------------------------------------------------------
# q111 / q112 — repetition + entropy quality signals
# ---------------------------------------------------------------------------


def test_q111_repetition_bounds_and_order(spark, sf_dir):
    rows = queries()["q111_repetition_ratio"](spark, sf_dir).collect()
    assert rows
    ratios = [r["rep_ratio"] for r in rows]
    assert all(0.0 <= x < 1.0 for x in ratios)
    assert ratios == sorted(ratios, reverse=True)


def test_q112_entropy_bounds(spark, sf_dir):
    rows = queries()["q112_word_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 ≤ H ≤ ln(n_tokens)
        assert -1e-9 <= r["entropy"] <= math.log(r["n_tokens"]) + 1e-9


def test_repetition_ratio_detects_loops(spark):
    docs = spark.createDataFrame(
        [(1, "a b c " * 20), (2, " ".join(f"w{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table  # noqa: F401
    from auto_ml_platform_with_timeseries_data_spark.operators import text as T
    import auto_ml_platform_with_timeseries_data_spark.operators.text  # noqa: F401
    from pyspark.sql import functions as FF
    w = "split(trim(text), ' ')"
    grams = docs.selectExpr(
        "doc_id",
        f"""explode(transform(
              sequence(1, greatest(size({w}) - 2, 0)),
              i -> concat_ws(' ', element_at({w}, i),
                             element_at({w}, i + 1),
                             element_at({w}, i + 2)))) AS g""",
    )
    per = grams.groupBy("doc_id").agg(
        (FF.lit(1.0) - FF.countDistinct("g") / FF.count(FF.lit(1))).alias("r")
    ).collect()
    r = {x["doc_id"]: x["r"] for x in per}
    assert r[1] > 0.9   # looped text: almost all trigrams repeat
    assert r[2] == 0.0  # all-unique text: no repetition


def test_moment_features_match_python_reference(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        moment_features,
    )

    vals = [1.0, 2.0, 2.0, 3.0, 7.0, 9.0, 4.5, 0.5]
    df = spark.createDataFrame([(1, v) for v in vals], "g long, v double")
    r = moment_features(df, "g", "v").first()

    q = [round(v * 10000) for v in vals]          # the operator's quantization
    n = len(q)
    m = sum(q) / n
    var = sum(x * x for x in q) / n - m * m
    skew = (sum(x ** 3 for x in q) / n - 3 * m * (sum(x * x for x in q) / n)
            + 2 * m ** 3) / (var * var ** 0.5)
    kurt = (sum(x ** 4 for x in q) / n - 4 * m * (sum(x ** 3 for x in q) / n)
            + 6 * m * m * (sum(x * x for x in q) / n) - 3 * m ** 4) \
        / (var * var) - 3.0
    assert r["n"] == n
    assert abs(r["mean"] - m / 10000.0) < 1e-6
    assert abs(r["variance"] - var / 1e8) < 1e-6
    assert abs(r["skewness"] - skew) < 1e-5
    assert abs(r["kurtosis"] - kurt) < 1e-5

    # constant group: undefined shape moments -> excluded
    const = spark.createDataFrame([(2, 5.0)] * 4, "g long, v double")
    assert moment_features(const, "g", "v").count() == 0


def test_frequent_triples_known_baskets(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.relational import (
        frequent_triples,
    )

    baskets = [
        (1, 10), (1, 20), (1, 30),          # {10,20,30}
        (2, 10), (2, 20), (2, 30), (2, 40),  # {10,20,30,40}
        (3, 10), (3, 20), (3, 50),           # 50 appears once -> pruned
    ]
    df = spark.createDataFrame(baskets, "bk long, it long")
    got = {(r["item_a"], r["item_b"], r["item_c"]): r["support"]
           for r in frequent_triples(df, "bk", "it").collect()}
    # only {10,20,30} reaches support 2; triples with 40 or 50 have
    # support 1 and must be absent
    assert got == {(10, 20, 30): 2}


def test_group_ols_singular_design_is_null(spark):
    """All observations at one timestamp: the normal equation is
    singular -> NULL slope/intercept, never an ANSI divide error."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        group_ols,
    )

    rows = [(1, dt.datetime(2024, 1, 1), float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "g long, ts timestamp, v double")
    r = group_ols(df, "g", "ts", "v").first()
    assert r["slope_per_day"] is None and r["intercept"] is None


def test_ks_missing_group_is_null(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        ks_two_sample,
    )

    df = spark.createDataFrame([("a", float(i)) for i in range(5)],
                               "grp string, v double")
    r = ks_two_sample(df, "v", "grp", "a", "b").first()
    assert r["ks"] is None and r["n_b"] == 0


def test_theil_sen_robust_to_outlier(spark):
    """Planted line v = 2t with ONE wild outlier: the median-of-slopes
    estimator recovers slope 2 where OLS would be dragged away."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        theil_sen_slopes,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        v = 2.0 * i if i != 10 else 1000.0   # outlier at t=10
        rows.append((i, t0 + dt.timedelta(seconds=i), 1, v))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = theil_sen_slopes(ev, "user_id").collect()
    assert len(got) == 1
    # slopes are cents/second: true slope 2.0 → 200 cents/s
    assert abs(got[0]["slope"] - 200.0) < 1e-6
    assert got[0]["n_pairs"] == 190


def test_mann_kendall_trend_and_degenerate(spark):
    """Strictly increasing series → S = C(n,2) and a large positive z;
    constant series → zero variance, z NULL-by-contract."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        mann_kendall,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(12):
        rows.append((i, t0 + dt.timedelta(seconds=i), 1, float(i)))
        rows.append((100 + i, t0 + dt.timedelta(seconds=i), 2, 7.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r["__g"]: r for r in mann_kendall(ev, "user_id").collect()}
    inc, const = got[1], got[2]
    assert inc["s_stat"] == 66            # C(12,2), every pair ascends
    assert inc["z"] is not None and inc["z"] > 1.96
    assert const["s_stat"] == 0
    assert const["var18"] == 0 and const["z"] is None


def test_theil_sen_sampled_tracks_full_and_guards_empty_sample(spark):
    """The hash-sampled estimate sits near the full one on a clean
    trend, and a group whose sample comes up empty reports
    NULL-by-contract instead of crashing."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        theil_sen_sampled,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=i), 1, 3.0 * i)
            for i in range(30)]
    # a 2-event group: exactly one pair — sampled away w.p. 3/4 under
    # rate=4; force the empty-sample branch with a huge rate
    rows += [(500, t0, 2, 1.0), (501, t0 + dt.timedelta(seconds=1), 2, 2.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r["__g"]: r for r in
           theil_sen_sampled(ev, "user_id", rate=1_000_000).collect()}
    g1 = got[1]
    assert g1["slope_full"] == 300.0          # 3 units/s = 300 cents/s
    assert g1["n_sampled"] < g1["n_pairs"]    # rate hides most pairs
    if g1["n_sampled"] > 0:
        assert abs(g1["slope_sampled"] - 300.0) < 1e-6
    assert got[2]["slope_sampled"] is None and got[2]["err"] is None


def test_phrase_occurrences_counts_adjacent_only(spark):
    """Only ADJACENT, in-order occurrences count: the top phrase is
    the planted bigram, reversed or gapped mentions do not count."""
    from auto_ml_platform_with_timeseries_data_spark.operators.text import (
        phrase_occurrences,
    )

    rows = [
        (0, "red fox red fox red fox"),     # 3 adjacent occurrences
        (1, "red fox jumps red fox"),       # 2
        (2, "fox red gap red nothing fox"), # reversed/gapped: 0
        (3, "red fox"),                     # 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = phrase_occurrences(df, "doc_id", "text").collect()
    assert all((r["w1"], r["w2"]) == ("red", "fox") for r in got)
    counts = {r["doc_id"]: r["n_occurrences"] for r in got}
    assert counts == {0: 3, 1: 2, 3: 1}


def test_theil_sen_capped_prunes_enumeration_and_tracks_trend(spark):
    """The capped estimator retains at most `cap` rows per group
    (n_pairs ≤ C(cap,2) even for a much longer series), recovers a
    clean trend's slope from the capped subset, and a group smaller
    than the cap is untouched (identical to the full estimator)."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        theil_sen_capped,
        theil_sen_slopes,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=i), 1, 2.5 * i)
            for i in range(300)]              # C(300,2) = 44850 pairs
    rows += [(1000 + i, t0 + dt.timedelta(seconds=i), 2, 4.0 * i)
             for i in range(10)]              # under the cap
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r["__g"]: r for r in theil_sen_capped(
        ev, "user_id", cap=16).collect()}
    g1 = got[1]
    assert g1["n_events"] == 16
    assert g1["n_pairs"] <= 16 * 15 // 2
    assert abs(g1["slope"] - 250.0) < 1e-6    # 2.5 units/s = 250 c/s
    g2 = got[2]
    assert g2["n_events"] == 10               # cap did not bind
    full = {r["__g"]: r for r in theil_sen_slopes(
        ev.filter(F.col("user_id") == 2), "user_id").collect()}
    assert g2["n_pairs"] == full[2]["n_pairs"]
    assert g2["slope"] == full[2]["slope"]
