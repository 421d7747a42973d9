"""Shuffle-count plan contracts for the LLM-pipeline operators.

The scale argument for each operator is a claim about its PHYSICAL
plan — "map-only", "one shuffle keyed by X", "reduces to a cell table
before windowing". These tests pin the Exchange count of the
AQE-finalized plan so a refactor that silently adds a shuffle (the
failure mode that costs the most at 100 TB) turns a test red instead
of a cluster bill. Counts are upper bounds (== where the structure is
load-bearing, <= where AQE may legally coalesce further).
"""

from __future__ import annotations

from auto_ml_platform_with_timeseries_data_spark.plans import explain
from auto_ml_platform_with_timeseries_data_spark.registry import queries


def _exchanges(spark, sf_dir, name: str) -> tuple[int, int]:
    df = queries()[name](spark, sf_dir)
    df.collect()  # finalize AQE
    plan = explain.final_plan(df)
    # count only SHUFFLE exchanges: "Exchange (" also prefixes
    # BroadcastExchange/ReusedExchange, which are not shuffles
    shuffles = (plan.count("Exchange (")
                - plan.count("BroadcastExchange (")
                - plan.count("ReusedExchange ("))
    return shuffles, plan.count("SortMergeJoin")


def test_map_only_operators_have_zero_exchanges(spark, sf_dir):
    """Token stats (q20), quality score (q21), fingerprint (q33), and
    chunking (q93) are pure row-local expression pipelines — they must
    stream at scan speed with NO shuffle at any scale."""
    for name in ("q20_token_stats", "q21_quality_score",
                 "q33_fingerprint", "q93_chunk_documents"):
        ex, _ = _exchanges(spark, sf_dir, name)
        assert ex == 0, (name, ex)


def test_single_shuffle_aggregations(spark, sf_dir):
    """Exact dedup (q16: one shuffle on the md5 fingerprint), hash
    split (q74: map-only split + one final groupBy), and lang-ID
    (q22: row-local n-gram vote + one groupBy) each carry exactly one
    exchange — the unavoidable aggregation shuffle."""
    for name in ("q16_dedup_exact", "q74_hash_split", "q22_langid"):
        ex, smj = _exchanges(spark, sf_dir, name)
        assert ex == 1, (name, ex)
        assert smj == 0, name


def test_stratified_sample_shuffles_only_aggregates(spark, sf_dir):
    """q73: the hash-filter is map-only; the two exchanges belong to
    the two-phase countDistinct over the already-reduced groups."""
    ex, smj = _exchanges(spark, sf_dir, "q73_stratified_sample")
    assert ex <= 2, ex
    assert smj == 0


def test_drift_stats_reduce_before_windowing(spark, sf_dir):
    """q135/q136 must collapse the corpus to a per-cell/per-value count
    table in ONE corpus shuffle before any window/marginal pass — the
    remaining exchanges move only the tiny reduced table."""
    ex, smj = _exchanges(spark, sf_dir, "q136_ks_drift")
    assert ex <= 2, ex
    assert smj == 0
    ex, smj = _exchanges(spark, sf_dir, "q135_chisq_independence")
    assert ex <= 4, ex
    assert smj == 0


def test_pareto_abc_has_no_global_window(spark, sf_dir):
    """q128's cumulative revenue share must run as the two-pass prefix
    sum: per-range-partition windows + a broadcast offset join. A
    refactor back to Window.orderBy with no partition key would funnel
    the whole customer dimension through ONE task — the plan must
    contain no single-partition exchange."""
    df = queries()["q128_pareto_abc"](spark, sf_dir)
    df.collect()
    plan = explain.final_plan(df)
    assert "SinglePartition" not in plan, plan
    # the offset table joins broadcast — the big side never reshuffles
    # for the join
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_portable_twins_plan_contracts(spark, sf_dir):
    """q141 (per-doc MinHash signature) and q145 (BMP synth → decode →
    checksum) are pure row-local pipelines — zero shuffles at any
    scale; q142's SimHash bit votes carry exactly the one per-doc
    aggregation shuffle; q148's BPE pair counting carries exactly two
    (word-freq groupBy, then pair groupBy — both map-side partial)."""
    for name, want in (("q141_minhash_portable", 0),
                       ("q145_image_decode", 0),
                       ("q142_simhash_portable", 1),
                       ("q148_bpe_pair_counts", 2)):
        ex, smj = _exchanges(spark, sf_dir, name)
        assert ex == want, (name, ex)
        assert smj == 0, name


def test_signbucket_ann_broadcasts_probes(spark, sf_dir):
    """q143: the probe fan-out must ride the BROADCAST query side — the
    corpus never reshuffles for the candidate join; the one exchange
    belongs to the per-query top-k window."""
    df = queries()["q143_ann_signbucket"](spark, sf_dir)
    df.collect()
    plan = explain.final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    ex, _ = _exchanges(spark, sf_dir, "q143_ann_signbucket")
    assert ex <= 1, ex


def test_round5_plan_contracts(spark, sf_dir):
    """Round-5 queries keep the plans their docstrings price:

    - q164 ridge twin: the per-group coefficient table joins BROADCAST
      back onto the held-out tail — the events side never reshuffles
      for the join (the window/agg shuffle on user_id is the only big
      exchange family).
    - q167 gopher gate: flags are map-only; the per-lang audit adds
      exactly the one aggregation shuffle.
    - q168 stratified head: the two-pass prefix sum survives — no
      single-partition exchange (a partition-less Window would funnel
      a 100 TB stratum through one task); offsets join broadcast.
    - q173 SCD2 / q174 snapshot diff: exactly ONE shuffled full-outer
      join (SMJ or AQE's shuffled-hash pick — full outer cannot
      broadcast), executed once: q173 emits every version row through
      one array+explode projection instead of a 3-way union that
      would re-run the join per branch."""
    from pyspark.sql import functions as F  # noqa: F401

    df = queries()["q164_ridge_exact_twin"](spark, sf_dir)
    df.collect()
    plan = explain.final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    ex, smj = _exchanges(spark, sf_dir, "q167_gopher_gate")
    assert ex == 1, ex
    assert smj == 0

    df = queries()["q168_stratified_token_head"](spark, sf_dir)
    df.collect()
    plan = explain.final_plan(df)
    assert "SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    for name in ("q173_scd2_dimension", "q174_snapshot_diff"):
        df = queries()[name](spark, sf_dir)
        df.collect()
        plan = explain.final_plan(df)
        joins = (plan.count("SortMergeJoin")
                 + plan.count("ShuffledHashJoin"))
        assert joins == 1, (name, joins)


def test_round7_plan_contracts(spark, sf_dir):
    """Round-7 queries keep the plans their docstrings price:

    - q215/q216 ANN appends: no cartesian or nested-loop join — the
      centroid/codeword tables join BROADCAST; the certificate's
      global totals come from a tiny |cells|-row window, never a
      corpus-wide single partition.
    - q217 Spearman: the two-pass prefix machinery survives — no
      SinglePartition exchange anywhere (a global rank window would
      funnel the distinct-value frame through one task).
    - q218 IVM / q220 DSIR / q221 pruning certificate: no cartesian
      products; every join is keyed or broadcast.
    """
    for name in ("q215_ivf_append", "q216_pq_append",
                 "q218_ivm_join", "q220_dsir_select",
                 "q221_zorder_pruning"):
        df = queries()[name](spark, sf_dir)
        df.collect()
        plan = explain.final_plan(df)
        assert "CartesianProduct" not in plan, name
        # the only legal BNLJ is a broadcast of a 1-row bounds/total
        # aggregate (the audited histogram/zorder pattern): q220's two
        # LM totals and q221's bounds frame; q215/q216/q218 must have
        # none at all
        if name in ("q215_ivf_append", "q216_pq_append", "q218_ivm_join"):
            assert "BroadcastNestedLoopJoin" not in plan, name

    df = queries()["q217_spearman_matrix"](spark, sf_dir)
    df.collect()
    plan = explain.final_plan(df)
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan, "global-window rank regression"


def test_round7_late_additions_plan_contracts(spark, sf_dir):
    """The late round-7 queries keep their priced plans: no cartesian
    product anywhere; the digest/maintenance/trend/search operators
    join only on keys or broadcast bounded sides. q227/q228/q231's
    pairwise self-joins are keyed on the group column (the inequality
    is a post-join filter, not a cartesian); q232's adjacency comes
    from a map-side array zip (no postings self-join at all)."""
    for name in ("q223_table_digest", "q224_image_index_update",
                 "q225_audio_index_update", "q226_video_index_update",
                 "q227_theil_sen", "q228_mann_kendall",
                 "q229_mutual_info", "q230_image_near_index",
                 "q231_theil_sen_sampled", "q232_phrase_search",
                 "q235_theil_sen_capped", "q237_audio_near_index",
                 "q238_video_near_index", "q239_quantile_normalize",
                 "q240_k_core", "q242_benford_audit",
                 "q243_roc_auc"):
        df = queries()[name](spark, sf_dir)
        df.collect()
        plan = explain.final_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_ivfpq_plan_contracts(spark, sf_dir):
    """The composed IVF-PQ queries keep the plans their docstrings
    price: no cartesian product, no nested-loop join anywhere — the
    query table broadcasts into the rescore, the centroid/codeword
    frames broadcast into the certificate, and every other join is
    keyed."""
    for name in ("q233_ivfpq_search", "q234_ivfpq_append"):
        df = queries()[name](spark, sf_dir)
        df.collect()
        plan = explain.final_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_robust_quantiles_lookup_is_bounds_broadcast(spark, sf_dir):
    """q241's ordinal lookup is a range-condition join whose build side
    is the (k·|qs|·2)-row target table — the audited bounds-broadcast
    BNLJ pattern is the ONLY nested loop allowed, and no cartesian
    product may appear."""
    df = queries()["q241_robust_quantiles"](spark, sf_dir)
    df.collect()
    plan = explain.final_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_phrase_search_adjacency_is_map_side(spark, sf_dir):
    """q232's bigram stream must come from the map-side array zip —
    NO join on the exploded postings (the round-7 self-join shuffled
    the full positional postings twice for the same pair multiset).
    Legal shuffles: the per-doc bigram aggregation, the phrase-total
    aggregation, and AQE's final-ordering exchange; the top-phrase
    filter is a broadcast join."""
    ex, smj = _exchanges(spark, sf_dir, "q232_phrase_search")
    assert smj == 0, "postings self-join regression"
    assert ex <= 3, ex


def test_chunking_is_map_only_zero_shuffle(spark, sf_dir):
    """q336: tokenize → sequence → explode → slice is scan-project-
    generate all the way down — ZERO exchanges, the embarrassingly
    parallel shape an embed-everything job needs."""
    from auto_ml_platform_with_timeseries_data_spark.plans import explain
    from auto_ml_platform_with_timeseries_data_spark.registry import (
        queries,
    )

    df = queries()["q336_chunk_documents"](spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "Exchange" not in plan


def test_hw_and_conformal_share_one_series_exchange(spark, sf_dir):
    """q328/q334: the lag frame and every window on top of it hash on
    the SAME series key — exactly one Exchange hashpartitioning in
    each plan (AQE may add reads, not new shuffles)."""
    from auto_ml_platform_with_timeseries_data_spark.plans import explain
    from auto_ml_platform_with_timeseries_data_spark.registry import (
        queries,
    )

    for name in ("q328_holt_winters", "q334_conformal_forecast_pi"):
        df = queries()[name](spark, sf_dir)
        plan = explain.formatted_plan(df)
        # formatted plans name each node once in the tree as
        # "Exchange (k)" — count those
        n = plan.count("Exchange (")
        # the conformal plan re-exchanges for the residual rank
        # window's re-aggregation join; the HW plan is one exchange
        limit = 2 if name == "q328_holt_winters" else 4
        assert 1 <= n <= limit, (name, n, plan[:2000])


def test_capped_screens_are_hash_joined_never_nested_loop(spark, sf_dir):
    """q341/q342 (clone-collapsed delta Hamming screens): the candidate
    stage must be an equi hash-family join on (band_id, band) — a
    CartesianProduct or BroadcastNestedLoopJoin here is the 100 TB
    scale-killer the r14 VERDICT flagged. The collapse itself shows as
    Window nodes (min-id per distinct signature) feeding the join, and
    the top_m output cap as the final rank Window."""
    from auto_ml_platform_with_timeseries_data_spark.plans import explain
    from auto_ml_platform_with_timeseries_data_spark.registry import (
        queries,
    )

    for name in ("q341_image_screen_capped", "q342_video_screen_capped"):
        df = queries()[name](spark, sf_dir)
        plan = explain.formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        joins = sum(plan.count(j) for j in
                    ("SortMergeJoin", "ShuffledHashJoin",
                     "BroadcastHashJoin"))
        assert joins >= 3, (name, joins)   # band join + 2 expansions
        assert plan.count("Window") >= 3, name  # 2 collapses + rank
