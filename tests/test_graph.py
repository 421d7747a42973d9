"""Graph-algorithm semantics (operators/graph.py): fixed-iteration
PageRank on graphs with known structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators.graph import pagerank


def _ranks(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, iterations=10, damping=0.85)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_pagerank_star_hub_dominates(spark):
    # undirected star: hub 0 ↔ spokes 1..4
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    got = _ranks(spark, edges)
    assert got[0] > max(got[i] for i in range(1, 5)) * 2
    spoke = [round(got[i], 6) for i in range(1, 5)]
    assert len(set(spoke)) == 1                  # symmetry
    assert abs(sum(got.values()) - 1.0) < 1e-3   # rank mass conserved


def test_pagerank_symmetric_cycle_uniform(spark):
    # directed 4-cycle: all nodes equivalent → equal ranks = 1/4
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = _ranks(spark, edges)
    assert all(abs(v - 0.25) < 1e-6 for v in got.values())


def test_key_skew_stats_flags_hot_key(spark):
    from auto_ml_platform_with_timeseries_data_spark.operators.profile import (
        key_skew_stats,
    )

    rows = [(7,)] * 90 + [(k,) for k in range(10)]
    df = spark.createDataFrame(rows, "k long")
    got = key_skew_stats(df, "k", "t").first()
    assert got["n_keys"] == 10 and got["n_rows"] == 100
    assert got["max_per_key"] == 91              # key 7: 90 + 1
    assert got["top_key_share"] == 0.91
    assert got["skew_factor"] == 9.1             # 91 / (100/10)


def test_kmv_small_sets_are_exact_and_estimator_sane(spark):
    """A week whose merged sketch holds fewer than k hashes reports the
    EXACT distinct count; a large week estimates within the KMV bound."""
    import datetime

    from auto_ml_platform_with_timeseries_data_spark.registry import (
        QUERIES, load_all,
    )

    load_all()
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # week 1: 10 users over 3 days (< k=64 → exact by construction)
    for d in range(3):
        for u in range(10):
            rows.append((len(rows), base + datetime.timedelta(days=d), u))
    # week 2: 500 users spread over 5 days (> k → estimated)
    for d in range(7, 12):
        for u in range(d * 100, d * 100 + 100):
            rows.append((len(rows), base + datetime.timedelta(days=d), u))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")

    import auto_ml_platform_with_timeseries_data_spark.tables as tables
    orig = tables.load_table
    try:
        tables.load_table = lambda sp, sf, name: df  # events only here
        import auto_ml_platform_with_timeseries_data_spark.operators.graph as g
        old = g.load_table
        g.load_table = tables.load_table
        try:
            got = {r["week"]: r for r in
                   QUERIES["q178_kmv_distinct"](spark, "ignored").collect()}
        finally:
            g.load_table = old
    finally:
        tables.load_table = orig
    small = [r for r in got.values() if r["exact_distinct"] == 10]
    big = [r for r in got.values() if r["exact_distinct"] == 500]
    assert small and small[0]["approx_distinct"] == 10.0   # exact path
    assert big and big[0]["within_bound"]                  # 30% gate holds


def test_countmin_one_sided_error(spark):
    """est >= exact for EVERY key (the Count-Min guarantee), exact for
    keys with no collisions, and the distinct-key row count holds."""
    from auto_ml_platform_with_timeseries_data_spark.operators.graph import (
        countmin_estimates,
    )

    df = spark.createDataFrame(
        [(i % 50,) for i in range(2000)] + [(999,)] * 100, "user_id long")
    rows = countmin_estimates(df, "user_id").collect()
    assert len(rows) == 51
    assert all(r["est"] >= r["exact"] for r in rows)
    assert all(r["err"] == r["est"] - r["exact"] for r in rows)
    # with 51 keys in 256 columns x 4 rows, at least the hot key should
    # see little relative error: min-over-rows kills most collisions
    hot = next(r for r in rows if r["key"] == 999)
    assert hot["exact"] == 100 and hot["est"] < 200


def test_triangle_counts_known_graph(spark):
    """K4 minus edge (3,4): triangles {1,2,3} and {1,2,4} only."""
    from auto_ml_platform_with_timeseries_data_spark.operators.graph import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "a long, b long")
    got = {r["vertex"]: r["n_triangles"]
           for r in triangle_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "a long, b long")
    assert triangle_counts(star).count() == 0


def test_k_core_peel_cascades_and_keeps_clique(spark):
    """A 4-clique survives 2-core peeling with within-core degree 3;
    a pendant chain hanging off it peels CASCADING — one vertex per
    round — so one round is not enough and three rounds clear it."""
    from pyspark.sql import functions as F  # noqa: F811

    from auto_ml_platform_with_timeseries_data_spark.operators.graph import (
        k_core_peel,
    )

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]      # pendant path
    edges = spark.createDataFrame(clique + chain, "a long, b long")

    got = {r["vertex"]: r["degree"]
           for r in k_core_peel(edges, k=2, rounds=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    # one round only removes the chain's tip: 12 goes, 11 stays
    one = {r["vertex"] for r in
           k_core_peel(edges, k=2, rounds=1).collect()}
    assert 12 not in one and 11 in one and 10 in one


def test_coreness_planted_and_consistent_with_k_core(spark):
    """A 4-clique with a pendant chain: clique vertices have coreness
    3, the chain decays 1 — and the set {coreness >= k} equals the
    fixpoint k-core for every k."""
    from pyspark.sql import functions as F  # noqa: F811

    from auto_ml_platform_with_timeseries_data_spark.operators.graph import (
        coreness,
        k_core_peel,
    )

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "a long, b long")
    got = {r["vertex"]: r["coreness"]
           for r in coreness(edges, rounds=10).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1, 12: 1}
    for k in (1, 2, 3, 4):
        core = {r["vertex"] for r in
                k_core_peel(edges, k=k, rounds=10).collect()}
        assert core == {v for v, c in got.items() if c >= k}, k
