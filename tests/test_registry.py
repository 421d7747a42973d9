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


def test_canaries_and_round15_rotation_keep_their_slots():
    """One long-green canary per module family stays in-budget so a
    shared-infrastructure regression is still witnessed; the round-15
    rotation puts the never-driver-witnessed registrations (q349/q350)
    right after the canaries, then spends the remaining budget on the
    stalest driver evidence — ALL 18 queries whose newest rows date to
    r7, then the 24 alphabetically-first r8-stale rows. The freshly
    r14-witnessed wave (q341-q346, q348) sits at the very END of the
    overflow."""
    head = registry._PRIORITY[:50]
    head_set = set(head)
    canaries = {
        "q01_head", "q06_acf", "q12_f1_confusion",
        "q18_jaccard_pairs", "q35_embedding_neardup", "q125_key_skew",
    }
    fresh = {"q349_sketch_error_gate", "q350_stream_fleet_triage"}
    assert canaries <= head_set
    assert fresh <= head_set
    # the complete r7-stale block leads the rotation slots
    r7_block = {"q31_set_ops", "q32_rollup", "q40_cube",
                "q41_topk_per_group", "q43_percentiles",
                "q46_distinct_counts", "q54_json_props",
                "q61_forecast_revenue", "q62_returned_items",
                "q63_promo_revenue", "q64_large_orders",
                "q65_brand_revenue_bands", "q66_supplier_breadth",
                "q67_dormant_customers", "q91_equidepth_hist",
                "q97_sole_late_supplier", "q98_min_cost_supplier",
                "q99_local_supplier_volume"}
    assert r7_block <= head_set
    # every head slot is a canary, a fresh registration, or stale
    # rotation — the budget is fully spent
    assert len(head) == 50 and len(head_set) == 50
    # the freshly r14-witnessed wave really is at the end of the
    # overflow, never in a budget slot
    tail = set(registry._PRIORITY[-30:])
    r14_wave = {"q341_image_screen_capped", "q342_video_screen_capped",
                "q343_best_forecast_family",
                "q344_residual_anomaly_windows",
                "q345_matrix_profile_discord", "q346_fleet_triage",
                "q348_forecast_combination"}
    assert r14_wave <= tail
    assert not (r14_wave & head_set)


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
