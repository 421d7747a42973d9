"""Property pins for the round-9 metric operators: the DuckDB oracles
certify engine-vs-engine agreement; these certify the MATH — each
operator against a direct pure-python computation of its textbook
definition on small random inputs."""

from __future__ import annotations

import math

import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from auto_ml_platform_with_timeseries_data_spark.operators import (  # noqa: E402
    evaluation,
)
from auto_ml_platform_with_timeseries_data_spark.operators.curation import (  # noqa: E402
    t_closeness,
    wasserstein1,
)
from auto_ml_platform_with_timeseries_data_spark.session import get_spark  # noqa: E402

_PIN = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # group
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),  # score
        st.integers(min_value=0, max_value=3),      # rel / label seed
    ),
    min_size=4, max_size=30,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(g, float(v), r, i) for i, (g, v, r) in enumerate(rows)],
        "g int, v double, r int, event_id long")


@settings(max_examples=8, deadline=None)
@given(rows=_rows)
def test_ndcg_matches_python_reference(rows):
    """Spark NDCG@k equals the direct per-group computation with the
    same integer position weights and tiebreaks."""
    from auto_ml_platform_with_timeseries_data_spark.operators.evaluation import (
        _NDCG_K,
        _NDCG_W,
    )

    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    got = {r["g"]: (r["dcg_scaled"], r["idcg_scaled"], r["ndcg"])
           for r in evaluation.ndcg_at_k(
               _df(spark, rows), "g", F.col("v"), F.col("r")).collect()}
    by_g: dict[int, list] = {}
    for i, (g, v, r) in enumerate(rows):
        by_g.setdefault(g, []).append((v, r, i))
    for g, items in by_g.items():
        ranked = sorted(items, key=lambda t: (-t[0], t[2]))
        ideal = sorted(items, key=lambda t: (-t[1], t[2]))
        dcg = sum(((1 << r) - 1) * _NDCG_W[p]
                  for p, (_, r, _) in enumerate(ranked[:_NDCG_K]))
        idcg = sum(((1 << r) - 1) * _NDCG_W[p]
                   for p, (_, r, _) in enumerate(ideal[:_NDCG_K]))
        want = _PIN(dcg / idcg) if idcg > 0 else None
        assert got[g][0] == dcg and got[g][1] == idcg
        assert got[g][2] == want


@settings(max_examples=8, deadline=None)
@given(rows=_rows)
def test_average_precision_matches_python_reference(rows):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    got = {r["g"]: (r["n_pos"], r["ap"])
           for r in evaluation.average_precision_by_group(
               _df(spark, rows), "g", F.col("v"),
               (F.col("r") % 2 == 0).cast("long")).collect()}
    by_g: dict[int, list] = {}
    for i, (g, v, r) in enumerate(rows):
        by_g.setdefault(g, []).append((v, 1 if r % 2 == 0 else 0, i))
    for g, items in by_g.items():
        ranked = sorted(items, key=lambda t: (-t[0], t[2]))
        cum = 0
        s = 0
        n_pos = sum(y for _, y, _ in items)
        for rk, (_, y, _) in enumerate(ranked, start=1):
            cum += y
            if y:
                s += (cum * 1_000_000_000) // rk
        want = _PIN(s / 1e9 / n_pos) if n_pos else None
        assert got[g] == (n_pos, want)


@settings(max_examples=8, deadline=None)
@given(rows=_rows)
def test_mrr_matches_python_reference(rows):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    got = {r["g"]: (r["first_pos_rank"], r["rr"])
           for r in evaluation.mrr(
               _df(spark, rows), "g", F.col("v"),
               (F.col("r") % 2 == 0).cast("int")).collect()}
    by_g: dict[int, list] = {}
    for i, (g, v, r) in enumerate(rows):
        by_g.setdefault(g, []).append((v, 1 if r % 2 == 0 else 0, i))
    for g, items in by_g.items():
        ranked = sorted(items, key=lambda t: (-t[0], t[2]))
        first = next((rk for rk, (_, y, _) in enumerate(ranked, 1) if y),
                     None)
        want = _PIN(1.0 / first) if first else None
        assert got[g] == (first, want)


@settings(max_examples=8, deadline=None)
@given(rows=_rows)
def test_wasserstein1_matches_python_reference(rows):
    """W1 equals the direct merged-CDF integral with the same per-term
    1e12 quantization."""
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(float(v), "a" if g % 2 == 0 else "b")
         for (g, v, _) in rows], "v double, grp string")
    row = wasserstein1(df, "v", "grp", "a", "b").collect()[0]
    a = sorted(v for (g, v, _) in rows if g % 2 == 0)
    b = sorted(v for (g, v, _) in rows if g % 2 == 1)
    if not a or not b:
        assert row["w1"] is None
        return
    vals = sorted(set(a) | set(b))
    s = 0
    for i in range(len(vals) - 1):
        fa = sum(1 for x in a if x <= vals[i]) / len(a)
        fb = sum(1 for x in b if x <= vals[i]) / len(b)
        s += math.floor(abs(fa - fb) * (vals[i + 1] - vals[i]) * 1e12)
    assert row["w1"] == _PIN(s / 1e12)
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))


@settings(max_examples=8, deadline=None)
@given(rows=_rows)
def test_t_closeness_matches_python_reference(rows):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(g, r) for (g, _, r) in rows], "g int, s int")
    got = {r["g"]: (r["n"], r["emd"])
           for r in t_closeness(df, ["g"], F.col("s")).collect()}
    vals = sorted({r for (_, _, r) in rows})
    k = len(vals)
    n = len(rows)
    gcum = {}
    acc = 0
    for v in vals:
        acc += sum(1 for (_, _, r) in rows if r == v)
        gcum[v] = acc
    groups = {g for (g, _, _) in rows}
    for g in groups:
        mine = [r for (gg, _, r) in rows if gg == g]
        ng = len(mine)
        acc = 0
        t = 0
        for v in vals:
            acc += sum(1 for r in mine if r == v)
            t += math.floor(abs(acc / ng - gcum[v] / n) * 1e12)
        want = _PIN(t / 1e12 / (k - 1)) if k > 1 else None
        assert got[g] == (ng, want)
