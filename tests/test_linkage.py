"""Semantics + plan contracts for record linkage, soft-dedup weights
(operators/linkage.py), the continuous-aggregate incremental refresh
(operators/layout.py), and CCNet perplexity bucketing
(operators/text.py) — the round-6 late additions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators.layout import (
    continuous_aggregate_refresh,
)
from auto_ml_platform_with_timeseries_data_spark.operators.linkage import (
    blocking_best_match,
    soft_dedup_weights,
)
from auto_ml_platform_with_timeseries_data_spark.operators.text import (
    perplexity_buckets,
)
from auto_ml_platform_with_timeseries_data_spark.plans import explain


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# blocking best-match (q197)
# ---------------------------------------------------------------------------


def test_best_match_argmax_and_tiebreak(spark):
    left = _docs(spark, [(1, "alpha beta gamma delta", "en")])
    right = _docs(spark, [
        (10, "alpha beta gamma zeta", "en"),    # 3/5 Jaccard
        (11, "alpha beta gamma delta", "en"),   # exact: 4/4
        (12, "alpha zeta eta theta", "en"),     # 1/7
    ])
    out = blocking_best_match(left, right, "doc_id", "text", "lang").collect()
    assert len(out) == 1
    assert out[0]["match_id"] == 11
    assert out[0]["score_ppm"] == 1_000_000

    # tie on score -> smallest right id wins
    right2 = _docs(spark, [
        (20, "alpha beta gamma zeta", "en"),
        (19, "alpha beta gamma eta", "en"),
    ])
    out2 = blocking_best_match(left, right2, "doc_id", "text", "lang").collect()
    assert out2[0]["match_id"] == 19


def test_blocking_bounds_candidates(spark):
    """Different lang / first token / length bucket -> no candidate pair,
    and the plan contains no cartesian/nested-loop join (the block key
    is an equi-join key)."""
    left = _docs(spark, [(1, "alpha beta", "en")])
    right = _docs(spark, [
        (10, "alpha beta", "fr"),                         # lang mismatch
        (11, "beta alpha", "en"),                         # first-token mismatch
        (12, "alpha " + "pad " * 40 + "beta", "en"),      # length-bucket mismatch
    ])
    out = blocking_best_match(left, right, "doc_id", "text", "lang")
    assert out.count() == 0
    plan = explain.formatted_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# soft-dedup weights (q198)
# ---------------------------------------------------------------------------


def test_soft_dedup_weights_downweight_groups(spark):
    df = _docs(spark, [
        (1, "a b c", "en"),
        (2, "A  b c ", "en"),     # normalizes to the same text as 1
        (3, "a b c", "en"),       # and again -> group of 3
        (4, "x y", "en"),
    ])
    rows = {r["doc_id"]: r for r in
            soft_dedup_weights(df, "doc_id", "text").collect()}
    assert rows[1]["group_size"] == 3
    assert rows[1]["weight_ppm"] == 333_333
    assert rows[1]["eff_tokens_ppm"] == 3 * 333_333
    assert rows[4]["group_size"] == 1
    assert rows[4]["weight_ppm"] == 1_000_000
    # expected effective copies of the duplicated doc across the corpus
    eff = sum(rows[i]["weight_ppm"] for i in (1, 2, 3))
    assert abs(eff - 1_000_000) <= 3  # 3 * 333_333 = 999_999


# ---------------------------------------------------------------------------
# continuous aggregate incremental refresh (q196)
# ---------------------------------------------------------------------------


def test_incremental_refresh_equals_one_shot_with_late_data(spark):
    """Late-arriving delta rows land in an OLD bucket: the touched
    bucket must be recomputed from ALL rows (carry-over + delta), not
    appended — the invariant that makes the refresh correct."""
    t0 = dt.datetime(2024, 1, 1, 0, 10)
    t1 = dt.datetime(2024, 1, 1, 1, 20)
    rows = [
        (t0, 1.00, False),   # old batch, bucket 00:00
        (t0, 2.00, False),   # old batch, bucket 00:00
        (t1, 4.00, False),   # old batch, bucket 01:00
        (t0, 8.00, True),    # LATE delta row, lands in bucket 00:00
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, value double, is_delta boolean")
    out = {r["bucket"]: r for r in continuous_aggregate_refresh(
        ev, "ts", "value", F.col("is_delta")).collect()}
    b0, b1 = "2024-01-01 00:00:00", "2024-01-01 01:00:00"
    assert out[b0]["n_events"] == 3 and out[b0]["sum_cents"] == 1100
    assert out[b0]["refreshed"] == 1
    assert out[b1]["n_events"] == 1 and out[b1]["sum_cents"] == 400
    assert out[b1]["refreshed"] == 0   # untouched bucket carried over


def test_refresh_recompute_is_delta_bounded(spark, sf_dir):
    """The refresh plan joins the full table against a BROADCAST of the
    touched-bucket set — the recompute side is pruned by the delta,
    not a second full-table rollup."""
    from auto_ml_platform_with_timeseries_data_spark.registry import queries

    plan = explain.formatted_plan(
        queries()["q196_continuous_aggregate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


# ---------------------------------------------------------------------------
# CCNet perplexity buckets (q199)
# ---------------------------------------------------------------------------


def test_perplexity_buckets_are_per_lang_terciles(spark):
    """5 docs in one language split 2/2/1 head/middle/tail by the
    arithmetic tercile rule idx = floor((rank-1) * 3 / n); the
    highest-logprob docs land in head."""
    df = _docs(spark, [
        (1, "a b a b a b", "en"),    # repeated common bigram -> high lp
        (2, "a b a b c c", "en"),
        (3, "c a b c a d", "en"),
        (4, "d c b a d e", "en"),
        (5, "e d c b a f", "en"),    # rare bigrams -> low lp
        (6, "x y x y", "fr"),        # separate language: own terciles
    ])
    out = perplexity_buckets(df, "doc_id", "text", "lang").collect()
    en = {r["doc_id"]: r["bucket"] for r in out if r["lang"] == "en"}
    assert sorted(en.values()) == sorted(
        ["head", "head", "middle", "middle", "tail"])
    fr = [r["bucket"] for r in out if r["lang"] == "fr"]
    assert fr == ["head"]  # a 1-doc language is all head, never tail
    # ranking follows logprob: doc 1 must be head
    assert en[1] == "head"


# ---------------------------------------------------------------------------
# plan contracts for the round-6 late additions (the 100 TB claims in
# the docstrings, checked against the actual physical plans)
# ---------------------------------------------------------------------------


def _plan(q, spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.registry import queries

    return explain.formatted_plan(queries()[q](spark, sf_dir))


def test_new_ops_have_no_cartesian_or_nested_loop_joins(spark, sf_dir):
    """None of the round-6 late additions may fall back to a cartesian
    or (non-trivial) nested-loop join; 1-row broadcast aggregates are
    the only sanctioned BroadcastNestedLoopJoin source (q199 carries
    exactly one — the vocab-size scalar the q192 LM broadcasts), and
    q196's literal-cutoff fix removed even those."""
    for q in ("q196_continuous_aggregate", "q197_blocking_bestmatch",
              "q198_softdedup_weights",
              "q201_countmin_heavy_hitters", "q202_triangle_count",
              "q203_k_anonymity", "q207_corr_matrix",
              "q210_cdc_apply"):
        plan = _plan(q, spark, sf_dir)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
    # q199: the ONLY nested-loop join allowed is the 1-row vocab scalar
    # (formatted plans print each node twice: tree + detail section)
    plan = _plan("q199_perplexity_buckets", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_gdpr_cascade_is_broadcast_only(spark, sf_dir):
    """q212's erasure joins must all broadcast the subject/order key
    sets — no fact-table shuffle join in the cascade."""
    plan = _plan("q212_gdpr_erasure", spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_countmin_counters_are_broadcast(spark, sf_dir):
    """The 4x256 counter table joins back as a broadcast — estimate
    lookup never shuffles the key set."""
    plan = _plan("q201_countmin_heavy_hitters", spark, sf_dir)
    assert "BroadcastHashJoin" in plan
