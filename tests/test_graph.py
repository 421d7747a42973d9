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
