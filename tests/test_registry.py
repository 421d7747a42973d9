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


def test_canaries_and_round6_promotions_keep_their_slots():
    """One long-green canary per module family stays in-budget so a
    shared-infrastructure regression is still witnessed; the round-6
    rotation (VERDICT r5 #1) must put the only oracle-backed queries
    with NO driver row ever (q183-q188) plus this round's additions
    (q189-q191) in the FIRST half, and fill the remainder with the
    relational/TPC-H block whose last green driver row is rounds 1-2
    (every round-3-to-5-green query may yield its slot)."""
    head = set(registry._PRIORITY[:50])
    # q183-q214 (6 + 26 round-6 additions) + 6 canaries = 38 slots;
    # the whole never-witnessed tier must sit in the first 40 so the
    # driver budget reaches it even if the sweep is cut short
    first_half = set(registry._PRIORITY[:40])
    canaries = {
        "q01_head", "q06_acf", "q12_f1_confusion",
        "q18_jaccard_pairs", "q35_embedding_neardup", "q125_key_skew",
    }
    never_witnessed = {
        "q183_neardup_leakfree_split", "q184_mad_outliers",
        "q185_dataset_card", "q186_image_dhash_dedup",
        "q187_audio_fingerprint_dedup", "q188_video_fingerprint_dedup",
        "q189_image_neardup_banded", "q190_exact_substr_rewrite",
        "q191_quality_classifier", "q192_bigram_lm_logprob",
        "q193_clip_pair_gate", "q194_video_neardup_banded",
        "q195_audio_neardup_banded",
        "q196_continuous_aggregate", "q197_blocking_bestmatch",
        "q198_softdedup_weights", "q199_perplexity_buckets",
        "q200_doremi_reweight", "q201_countmin_heavy_hitters",
        "q202_triangle_count", "q203_k_anonymity",
        "q204_stream_continuous_aggregate",
        "q205_html_extract", "q206_url_normalize",
        "q207_corr_matrix", "q208_ts_backtest",
        "q209_constraint_audit", "q210_cdc_apply",
        "q211_orc_roundtrip", "q212_gdpr_erasure",
        "q213_moment_features", "q214_frequent_triples",
    }
    stale_r1_r2 = {
        "q26_pricing_summary", "q28_top_customers",
        "q42_semi_anti_join",
        "q44_profit_by_nation_brand",
        "q49_range_join", "q50_shipping_priority",
        "q68_grouping_sets", "q30_asof_join", "q82_pivot_unpivot",
        "q95_late_order_priority", "q96_top_supplier",
        "q100_volume_shipping",
    }
    assert canaries <= head
    assert never_witnessed <= first_half
    assert stale_r1_r2 <= head


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
