"""Registry ordering contract.

The correctness driver verifies queries in the order ``queries()`` yields
them under a 50-query budget per round (CORRECTNESS_r01-r03 each hold
exactly 50 rows).  Round 4 pins the first 50 slots to 6 cross-family
canaries + the 4 portable twins + the oracle-backed queries that had
zero driver-verified rows after rounds 1-3 (VERDICT.md round 3, "Next
round" item 1), with a ranked overflow tail past slot 50.  These tests
keep that contract from silently regressing when new queries register.
"""

from auto_ml_platform_with_timeseries_data_spark import registry


def test_priority_block_covers_the_sweep_budget():
    """At least 50 pinned slots (the driver budget), no duplicates; the
    tail past 50 is the ranked overflow the driver reaches only if its
    budget stretches."""
    assert len(registry._PRIORITY) >= 50
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY)


def test_first_50_queries_are_the_priority_block():
    keys = list(registry.queries())
    assert keys[:50] == list(registry._PRIORITY[:50])


def test_every_priority_name_is_registered():
    assert set(registry._PRIORITY) <= set(registry.queries())


def test_canaries_and_round5_promotions_keep_their_slots():
    """One long-green canary per module family stays in-budget so a
    shared-infrastructure regression is still witnessed; the round-5
    rotation (VERDICT r4 #1) must put the never-driver-witnessed tier
    and the new conversions in the 50-slot budget, with the stateful
    streaming trio in the FIRST half (it slipped off the tail for four
    rounds). The round-4 twins q141-q144 are driver-green since r04
    and may yield their slots."""
    head = set(registry._PRIORITY[:50])
    first_half = set(registry._PRIORITY[:25])
    canaries = {
        "q01_head", "q06_acf", "q12_f1_confusion",
        "q18_jaccard_pairs", "q35_embedding_neardup", "q125_key_skew",
    }
    streaming = {"q53_stateful_user_stats", "q79_stream_sessions",
                 "q92_stream_stream_join"}
    promotions = {
        "q145_image_decode", "q146_xls_roundtrip", "q148_bpe_pair_counts",
        "q149_stream_sink_exactly_once", "q150_audio_features",
        "q151_csv_roundtrip", "q152_video_frames", "q153_sharded_export",
        "q154_incremental_dedup", "q155_zorder_keys",
        "q156_quantile_sketch", "q157_compaction",
        "q158_bloom_decontaminate", "q160_pq_fixed_codebook",
        "q161_temperature_mix", "q162_incremental_neardup",
        "q163_token_budget_head",
        "q45_rolling_stats", "q85_cluster_retention",
        "q104_small_quantity_revenue", "q120_sliding_window",
        # round-5 additions / oracle conversions
        "q164_ridge_exact_twin", "q165_index_update",
        "q166_cv_planted_optimum", "q130_pagerank",
        "q167_gopher_gate", "q168_stratified_token_head",
        "q169_curation_pipeline", "q170_stream_incremental_dedup",
    }
    assert canaries <= head
    assert streaming <= first_half
    assert promotions <= head


def test_oracles_follow_query_order():
    qkeys = [k for k in registry.queries() if k in registry.oracles()]
    assert list(registry.oracles()) == qkeys


def test_priority_queries_are_oracle_checked():
    """Every priority slot should carry a DuckDB oracle — a rows-only
    entry spends budget on a weaker check.  The pinned exceptions are
    the four sketch-based queries whose semantics (xxhash64 MinHash /
    SimHash, SRP/IVF bucketing) DuckDB cannot reproduce; the driver
    records a rows-only check for those, which VERDICT.md round 2
    accepts explicitly."""
    rows_only_ok = {
        "q17_minhash_dedup", "q23_simhash", "q34_ann_srp", "q36_ann_ivf",
        # trained PQ codebooks (k-means) — same category as q36; the
        # machinery is oracle-checked via the injected-codebook twin
        # q160, which sits directly before it in the priority order
        "q159_ann_pq",
        # iterative argmax training loop (the q15/q130 category); its
        # round-1 machinery is oracle-checked as q148 and the full loop
        # is pinned by a pure-Python reference test
        "q147_bpe_learn",
    }
    oracles = registry.oracles()
    missing = [
        k for k in registry._PRIORITY
        if k not in oracles and k not in rows_only_ok
    ]
    assert missing == [], missing


def test_driver_budget_prefix_is_oracle_backed():
    """The driver's per-round correctness budget is ~50 queries taken in
    queries() order: every one of the first 50 slots must carry a
    DuckDB oracle — a rows-only query in the prefix would burn a slot
    on a weaker check. (Round 5 moves streaming INTO the first half
    instead of closing the prefix: ordering streaming last starved
    q53/q79/q92 of budget for four straight rounds.)"""
    names = list(registry.queries())
    oracles = registry.oracles()
    not_oracle_backed = [n for n in names[:50] if n not in oracles]
    assert not_oracle_backed == []
