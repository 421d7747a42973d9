"""Registry ordering contract.

The correctness driver verifies queries in the order ``queries()`` yields
them under a ~50-query budget per round.  Round 3 pins the first 50 slots
to the reference-parity core plus the extension queries that had zero
driver-verified rows after rounds 1-2 (VERDICT.md round 2, "Next round"
item 1).  These tests keep that contract from silently regressing when
new queries register.
"""

from auto_ml_platform_with_timeseries_data_spark import registry


def test_priority_block_is_exactly_the_sweep_budget():
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50


def test_first_50_queries_are_the_priority_block():
    keys = list(registry.queries())
    assert keys[:50] == list(registry._PRIORITY)


def test_every_priority_name_is_registered():
    assert set(registry._PRIORITY) <= set(registry.queries())


def test_parity_core_keeps_its_slots():
    """Q1-Q14 surface (green in rounds 1-2) must stay inside the budget."""
    core = {
        "q01_head", "q02_null_profile", "q03_histogram",
        "q04_corr_with_label", "q05_groups", "q06_acf", "q07_ts_split",
        "q08_ts_windows", "q09_scale_params", "q10_rmse", "q11_binarize",
        "q12_f1_confusion", "q13_importance_rank", "q14_min_max",
    }
    assert core <= set(registry._PRIORITY)


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
    }
    oracles = registry.oracles()
    missing = [
        k for k in registry._PRIORITY
        if k not in oracles and k not in rows_only_ok
    ]
    assert missing == [], missing
