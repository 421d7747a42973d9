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


def test_canaries_and_round8_rotation_keep_their_slots():
    """One long-green canary per module family stays in-budget so a
    shared-infrastructure regression is still witnessed; the round-8
    rotation (VERDICT r7 #3) puts this round's never-witnessed
    additions and the two queries whose SEMANTICS changed this round
    (q231 portable pair hash, q228 textbook tie correction) right
    after the canaries, then spends the whole remaining budget on the
    round-3 block — the stalest driver evidence left in the repo."""
    head = set(registry._PRIORITY[:50])
    canaries = {
        "q01_head", "q06_acf", "q12_f1_confusion",
        "q18_jaccard_pairs", "q35_embedding_neardup", "q125_key_skew",
    }
    semantics_changed = {"q228_mann_kendall", "q231_theil_sen_sampled"}
    round3_block = {
        "q05_groups", "q07_ts_split", "q08_ts_windows",
        "q09_scale_params", "q10_rmse", "q11_binarize",
        "q13_importance_rank", "q14_min_max", "q16_dedup_exact",
        "q19_cosine_topk", "q20_token_stats", "q21_quality_score",
        "q22_langid", "q24_window_agg", "q25_sessionize",
        "q29_minmax_scaled", "q33_fingerprint", "q37_media_stats",
        "q38_media_features", "q48_histogram_auto",
        "q51_winnow_fingerprints", "q55_dedup_components",
        "q56_jsonl_roundtrip", "q57_bpe_tokens", "q59_resample_ffill",
        "q60_zscore_outliers", "q69_ewma", "q70_ohlc",
        "q71_lag_features", "q72_interpolate", "q73_stratified_sample",
        "q74_hash_split", "q75_class_balance", "q76_pack_sequences",
        "q77_decontaminate", "q78_uniform_sample",
    }
    assert canaries <= head
    assert semantics_changed <= head
    # 6 canaries + 12 round-8 additions + 2 semantics-changed = 20
    # pinned slots, so exactly 30 of the 36-query round-3 block fit the
    # 50-slot budget (the VERDICT r7 #3 floor); the remaining six ride
    # the head of the overflow and get re-witnessed next rotation. This
    # is saturated: one more pinned addition would drop the block below
    # the floor, so round-8 registered additions stop at q244.
    assert round3_block <= set(registry._PRIORITY[:56])
    assert len(round3_block & head) >= 30


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
