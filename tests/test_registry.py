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


def test_canaries_and_round10_rotation_keep_their_slots():
    """One long-green canary per module family stays in-budget so a
    shared-infrastructure regression is still witnessed; the round-10
    rotation puts the never-driver-witnessed queries (q259/q260, the
    new q261-q267) right after the canaries, then spends the whole
    remaining budget on the stalest driver evidence — the round-4/5
    block from q138_span_dedup onward (≥30 rotation slots, the VERDICT
    floor). The freshly r9-witnessed block (q245-q258, q73-q78,
    q105-q137) sits at the very END of the overflow."""
    head = registry._PRIORITY[:50]
    head_set = set(head)
    canaries = {
        "q01_head", "q06_acf", "q12_f1_confusion",
        "q18_jaccard_pairs", "q35_embedding_neardup", "q125_key_skew",
    }
    round10_new = {
        "q259_t_closeness", "q260_wasserstein_drift",
        "q261_threshold_sweep", "q262_two_proportion_z",
        "q263_gini_coefficient", "q264_cramers_v",
        "q265_kaplan_meier", "q266_dominant_acf_lag",
        "q267_margin_agreement_gate",
    }
    assert canaries <= head_set
    assert round10_new <= head_set
    # everything in the head that is neither a canary nor a round-10
    # addition is a stale-evidence rotation slot; the floor is 30
    rotation = head_set - canaries - round10_new
    assert len(rotation) >= 30
    # rotation slots go to the stalest tier (last green r4-r5): none of
    # the freshly r9-witnessed names may occupy a budget slot
    r9_witnessed = {
        "q245_conformal_quantile", "q246_brier_decomposition",
        "q247_group_auc", "q248_coreness", "q249_negative_samples",
        "q250_margin_mining_scaled", "q251_stream_near_screen",
        "q252_calibration_error", "q253_ndcg_at_k", "q254_mrr",
        "q255_average_precision", "q256_decile_lift",
        "q257_js_divergence", "q258_bucketed_join",
        "q73_stratified_sample", "q74_hash_split", "q75_class_balance",
        "q76_pack_sequences", "q77_decontaminate", "q78_uniform_sample",
    }
    assert rotation & r9_witnessed == set()
    # and the r9-witnessed block leads from the BACK: it may only
    # appear in the overflow tail
    tail = set(registry._PRIORITY[50:])
    assert r9_witnessed <= tail


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
