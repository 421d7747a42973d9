"""Round-11 registration de-risking, fresh batch (the pattern's fourth
round): Cochran-Armitage trend, Fleiss' kappa, quadratic-weighted
kappa, mixture-conformance audit, two-sample Anderson-Darling, the
turning-point randomness test, difference-in-differences, the
covariate balance table, PACF (Durbin-Levinson), and the STL
trend/seasonal strength pair — DuckDB oracles DRAFTED and
driver-gate-compared here, so registering next rotation is a pure
registry edit."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from check_oracle import compare  # noqa: E402

from auto_ml_platform_with_timeseries_data_spark.operators import (  # noqa: E402
    curation,
    evaluation,
    ts_features,
    validation,
)

_TABLES = ("lineitem", "documents", "events")


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


_CA_ORACLE = """
    WITH s AS (
      SELECT CAST(floor(l_quantity) AS BIGINT) // 10 AS w,
             CAST(l_returnflag = 'R' AS BIGINT) AS y
      FROM lineitem WHERE l_quantity IS NOT NULL
    ),
    cells AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS x
      FROM s GROUP BY w
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS x,
             sum(CAST(x AS HUGEINT) * w) AS xw,
             sum(CAST(n AS HUGEINT) * w) AS nw,
             sum(CAST(n AS HUGEINT) * w * w) AS nww
      FROM cells
    ),
    ex AS (
      SELECT k, n, x,
             CAST(xw AS DOUBLE)
             - (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) * nw AS t,
             (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
             * (1 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(nww AS DOUBLE)
                - CAST(nw AS DOUBLE) * nw / CAST(n AS DOUBLE)) AS var
      FROM agg
    )
    SELECT k, n, x,
           CASE WHEN k > 1 AND x > 0 AND x < n AND var > 0 THEN
             floor(t / sqrt(var) * 1e6 + 0.5) / 1e6
           END AS z
    FROM ex
"""


def test_cochran_armitage_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = validation.cochran_armitage(
        li.filter(F.col("l_quantity").isNotNull()),
        F.expr("cast(floor(l_quantity) as bigint) div 10"),
        (F.col("l_returnflag") == "R").cast("long")).toPandas()
    want = _duck(sf_dir, _CA_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_FLEISS_ORACLE = """
    WITH src AS (
      SELECT l_orderkey AS i, l_returnflag AS r
      FROM lineitem WHERE l_linenumber <= 3
    ),
    fl AS (
      SELECT i, r FROM src
      WHERE i IN (SELECT i FROM src GROUP BY i HAVING count(*) = 3)
    ),
    cells AS (
      SELECT i, r, CAST(count(*) AS BIGINT) AS c FROM fl GROUP BY i, r
    ),
    marg AS (SELECT r, CAST(sum(c) AS BIGINT) AS m FROM cells GROUP BY r),
    magg AS (
      SELECT CAST(count(*) AS BIGINT) AS kc,
             sum(CAST(m AS HUGEINT) * m) AS m2,
             CAST(sum(m) AS BIGINT) AS tot
      FROM marg
    ),
    iagg AS (
      SELECT CAST(count(DISTINCT i) AS BIGINT) AS ni,
             sum(CAST(c AS HUGEINT) * c) AS s2
      FROM cells
    ),
    ex AS (
      SELECT ni, kc,
             (CAST(s2 AS DOUBLE) - CAST(ni AS DOUBLE) * 3.0)
             / (CAST(ni AS DOUBLE) * 3.0 * 2.0) AS p_bar,
             CAST(m2 AS DOUBLE) / (CAST(tot AS DOUBLE) * tot) AS p_e
      FROM iagg, magg
    )
    SELECT ni AS n_items, CAST(3 AS BIGINT) AS n_raters,
           kc AS k_categories,
           CASE WHEN ni > 0 THEN floor(p_bar * 1e6 + 0.5) / 1e6 END
             AS p_bar,
           CASE WHEN ni > 0 THEN floor(p_e * 1e6 + 0.5) / 1e6 END
             AS p_e,
           CASE WHEN ni > 0 AND p_e < 1 THEN
             floor((p_bar - p_e) / (1 - p_e) * 1e6 + 0.5) / 1e6
           END AS kappa
    FROM ex
"""


def test_fleiss_kappa_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    src = li.filter(F.col("l_linenumber") <= 3).select(
        F.col("l_orderkey").alias("item"),
        F.col("l_returnflag").alias("rating"))
    got = evaluation.fleiss_kappa(
        src, "item", F.col("rating"), nraters=3).toPandas()
    want = _duck(sf_dir, _FLEISS_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_WKAPPA_ORACLE = """
    WITH s AS (
      SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS a,
             CAST(least(floor(l_extendedprice / 20000), 5) AS BIGINT)
               AS b
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM s GROUP BY a, b
    ),
    obs AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT a) AS BIGINT) AS ka,
             CAST(count(DISTINCT b) AS BIGINT) AS kb,
             sum(CAST((a - b) * (a - b) AS HUGEINT) * o) AS wo
      FROM cells
    ),
    ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
    cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
    we AS (
      SELECT sum(CAST((a - b) * (a - b) AS HUGEINT) * r * c) AS we
      FROM ra, cb
    )
    SELECT n, ka AS k_a, kb AS k_b,
           CASE WHEN n > 0 AND we > 0 THEN
             floor((1 - CAST(wo AS DOUBLE) * n / CAST(we AS DOUBLE))
                   * 1e6 + 0.5) / 1e6
           END AS kappa_w
    FROM obs, we
"""


def test_weighted_kappa_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull())
    got = evaluation.weighted_kappa(
        li, F.floor(F.col("l_quantity") / 10).cast("long"),
        F.least(F.floor(F.col("l_extendedprice") / 20000),
                F.lit(5.0)).cast("long")).toPandas()
    want = _duck(sf_dir, _WKAPPA_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_MIX_SPEC = {f"src{i}": 50_000 for i in range(16)}
_MIX_SPEC["src16"] = 200_000


def _mix_oracle() -> str:
    declared = ", ".join(f"('{k}', {v})" for k, v in
                         sorted(_MIX_SPEC.items()))
    inlist = ", ".join(f"'{k}'" for k in sorted(_MIX_SPEC))
    return f"""
    WITH spec AS (
      SELECT * FROM (VALUES {declared}, ('__other__', 0))
        AS t(category, expected_ppm)
    ),
    cells AS (
      SELECT CASE WHEN source IN ({inlist}) THEN source
                  ELSE '__other__' END AS category,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cells),
    fl AS (
      SELECT coalesce(s.category, c.category) AS category,
             CAST(coalesce(c.n, 0) AS BIGINT) AS n,
             CAST(coalesce(s.expected_ppm, 0) AS BIGINT)
               AS expected_ppm,
             tot
      FROM spec s FULL JOIN cells c ON s.category = c.category, tot
    )
    SELECT category, n, expected_ppm,
           CAST((n * 1000000) // tot AS BIGINT) AS observed_ppm,
           CAST((n * 1000000) // tot - expected_ppm AS BIGINT)
             AS deviation_ppm,
           CASE WHEN expected_ppm > 0 THEN
             floor((n - CAST(expected_ppm AS DOUBLE) / 1e6 * tot)
                   * (n - CAST(expected_ppm AS DOUBLE) / 1e6 * tot)
                   / (CAST(expected_ppm AS DOUBLE) / 1e6 * tot)
                   * 1e6 + 0.5) / 1e6
           END AS chi2_term
    FROM fl
"""


def test_mixture_conformance_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = curation.mixture_conformance(
        docs, "source", _MIX_SPEC).toPandas()
    want = _duck(sf_dir, _mix_oracle())
    ok, msg = compare(got, want)
    assert ok, msg


def _ad_oracle() -> str:
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        _hash_u32_sql,
    )

    return f"""
    WITH s AS (
      SELECT n_chars,
             CASE WHEN {_hash_u32_sql('doc_id')} % 100 < 80 THEN 'train'
                  WHEN {_hash_u32_sql('doc_id')} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    c AS (
      SELECT CAST(n_chars AS DOUBLE) AS v,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
               AS BIGINT) AS cb
      FROM s WHERE split IN ('train', 'test') GROUP BY 1
    ),
    m AS (
      SELECT ca + cb AS l,
             sum(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ma,
             sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS mb,
             sum(ca) OVER () AS na, sum(cb) OVER () AS nb
      FROM c
    ),
    t AS (
      SELECT na, nb,
             CAST(floor(
               CAST(l AS DOUBLE)
               * (CAST(CAST((na + nb) * ma - na * (ma + mb) AS HUGEINT)
                       * ((na + nb) * ma - na * (ma + mb)) AS DOUBLE)
                  / na
                  + CAST(CAST((na + nb) * mb - nb * (ma + mb) AS HUGEINT)
                         * ((na + nb) * mb - nb * (ma + mb)) AS DOUBLE)
                    / nb)
               / (CAST(na + nb AS DOUBLE) * (ma + mb)
                  * ((na + nb) - (ma + mb)))
               * 1e12) AS BIGINT) AS q
      FROM m
      WHERE na > 0 AND nb > 0 AND ma + mb < na + nb
    )
    SELECT CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           floor(sum(q) / 1e12 * 1e6 + 0.5) / 1e6 AS a2
    FROM t
"""


def test_anderson_darling_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        hash_split,
    )
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, "doc_id")
    got = curation.anderson_darling_2s(
        split, "n_chars", "split", "train", "test").toPandas()
    want = _duck(sf_dir, _ad_oracle())
    ok, msg = compare(got, want)
    assert ok, msg


_TP_ORACLE = """
    WITH s AS (
      SELECT user_id AS g, value AS v,
             lag(value) OVER w AS pv, lead(value) OVER w AS nv
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                       AND ((pv < v AND nv < v) OR (pv > v AND nv > v))
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_turns
      FROM s GROUP BY g
    )
    SELECT g AS user_id, n, n_turns,
           CASE WHEN n >= 3 THEN
             floor(2 * (CAST(n AS DOUBLE) - 2) / 3 * 1e6 + 0.5) / 1e6
           END AS expected,
           CASE WHEN n >= 3
                AND (16 * CAST(n AS DOUBLE) - 29) / 90 > 0 THEN
             floor((n_turns - 2 * (CAST(n AS DOUBLE) - 2) / 3)
                   / sqrt((16 * CAST(n AS DOUBLE) - 29) / 90)
                   * 1e6 + 0.5) / 1e6
           END AS z
    FROM per
"""


def test_turning_points_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    got = ts_features.turning_points(
        ev, "user_id", "ts", "value", tie_break="event_id").toPandas()
    want = _duck(sf_dir, _TP_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


# ---------------------------------------------------------------------------
# Property pins
# ---------------------------------------------------------------------------

pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from auto_ml_platform_with_timeseries_data_spark.session import get_spark  # noqa: E402

_PIN = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(st.tuples(
    st.integers(min_value=0, max_value=3),      # score
    st.booleans()),                             # success
    min_size=4, max_size=30))
def test_cochran_armitage_matches_python_reference(rows):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(int(w), 1 if y else 0) for w, y in rows], "w long, y long")
    row = validation.cochran_armitage(
        df, F.col("w"), F.col("y")).collect()[0]
    n, x = len(rows), sum(1 for _, y in rows if y)
    ws = sorted({w for w, _ in rows})
    k = len(ws)
    assert (row["k"], row["n"], row["x"]) == (k, n, x)
    xw = sum(w for w, y in rows if y)
    nw = sum(w for w, _ in rows)
    nww = sum(w * w for w, _ in rows)
    pbar = x / n
    t = xw - pbar * nw
    var = pbar * (1 - pbar) * (nww - nw * nw / n)
    if k > 1 and 0 < x < n and var > 0:
        assert row["z"] == pytest.approx(
            _PIN(t / math.sqrt(var)), abs=2e-6)
    else:
        assert row["z"] is None


def test_fleiss_kappa_endpoints(spark):
    """Perfect agreement → kappa 1; one lone disagreeing triple drops
    it below 1 but keeps it positive."""
    rows = [(i, "A") for i in range(30) for _ in range(3)]
    df = spark.createDataFrame(rows, "item long, rating string")
    r = evaluation.fleiss_kappa(df, "item", F.col("rating"), 3)
    # all one category → P_e = 1 → NULL by contract
    assert r.collect()[0]["kappa"] is None
    rows2 = ([(i, "A") for i in range(20) for _ in range(3)]
             + [(i + 100, "B") for i in range(20) for _ in range(3)]
             + [(999, "A"), (999, "A"), (999, "B")])
    df2 = spark.createDataFrame(rows2, "item long, rating string")
    row = evaluation.fleiss_kappa(df2, "item", F.col("rating"), 3)\
        .collect()[0]
    assert row["n_items"] == 41 and row["k_categories"] == 2
    assert 0.8 < row["kappa"] < 1.0
    # items without exactly 3 ratings are dropped
    rows3 = rows2 + [(777, "A")]
    df3 = spark.createDataFrame(rows3, "item long, rating string")
    assert (evaluation.fleiss_kappa(df3, "item", F.col("rating"), 3)
            .collect()[0]["n_items"] == 41)


def test_weighted_kappa_identity_and_shift(spark):
    """Identical raters → kappa_w = 1; a constant off-by-one shift on
    a wide scale stays high (quadratic weights forgive near-misses)."""
    rows = [(i % 7, i % 7) for i in range(70)]
    df = spark.createDataFrame(rows, "a long, b long")
    assert evaluation.weighted_kappa(
        df, F.col("a"), F.col("b")).collect()[0]["kappa_w"] == 1.0
    rows2 = [(i % 7, min(i % 7 + 1, 6)) for i in range(70)]
    df2 = spark.createDataFrame(rows2, "a long, b long")
    kw = evaluation.weighted_kappa(
        df2, F.col("a"), F.col("b")).collect()[0]["kappa_w"]
    assert 0.7 < kw < 1.0


def test_mixture_conformance_exact_counts(spark):
    docs = spark.createDataFrame(
        [(i, "s0" if i < 60 else ("s1" if i < 90 else "zz"))
         for i in range(100)], "doc_id long, src string")
    out = {r["category"]: r for r in curation.mixture_conformance(
        docs, "src", {"s0": 500_000, "s1": 400_000, "s2": 100_000})
        .collect()}
    assert out["s0"]["n"] == 60 and out["s0"]["observed_ppm"] == 600_000
    assert out["s0"]["deviation_ppm"] == 100_000
    assert out["s1"]["deviation_ppm"] == -100_000
    assert out["s2"]["n"] == 0 and out["s2"]["observed_ppm"] == 0
    assert out["__other__"]["n"] == 10
    assert out["__other__"]["expected_ppm"] == 0
    assert out["__other__"]["chi2_term"] is None
    # chi2 term exact: (60-50)^2/50 = 2.0
    assert out["s0"]["chi2_term"] == 2.0


def test_anderson_darling_orders_with_ks(spark):
    """Identical distributions → A² near 0; separated ones → large."""
    same = [(float(v % 10), g) for v in range(200) for g in ("a", "b")]
    df = spark.createDataFrame(same, "v double, g string")
    r = curation.anderson_darling_2s(df, "v", "g", "a", "b").collect()[0]
    assert r["a2"] < 0.05
    sep = ([(float(v % 10), "a") for v in range(200)]
           + [(float(v % 10 + 100), "b") for v in range(200)])
    df2 = spark.createDataFrame(sep, "v double, g string")
    r2 = curation.anderson_darling_2s(
        df2, "v", "g", "a", "b").collect()[0]
    assert r2["a2"] > 50  # fully separated samples blow up the tails


def test_turning_points_known_sequences(spark):
    """A strictly monotone series has 0 turns; a perfect zigzag has
    n−2; both z-score away from 0 in opposite directions."""
    mono = [(0, t, float(t)) for t in range(20)]
    zig = [(1, t, float(t % 2)) for t in range(20)]
    df = spark.createDataFrame(mono + zig, "g int, ts long, v double")
    out = {r["g"]: r for r in ts_features.turning_points(
        df, "g", "ts", "v").collect()}
    assert out[0]["n_turns"] == 0 and out[0]["z"] < -3
    assert out[1]["n_turns"] == 18 and out[1]["z"] > 3
    assert out[0]["expected"] == _PIN(2 * 18 / 3)


_DID_ORACLE = """
    WITH s AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS INT)
               AS t,
             CAST(o_orderdate >= DATE '1995-01-01' AS INT) AS p
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_t0,
        CAST(sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_t1,
        CAST(sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_c0,
        CAST(sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_c1,
        sum(CASE WHEN t = 1 AND p = 0 THEN CAST(v AS HUGEINT)
            ELSE 0 END) AS s_t0,
        sum(CASE WHEN t = 1 AND p = 1 THEN CAST(v AS HUGEINT)
            ELSE 0 END) AS s_t1,
        sum(CASE WHEN t = 0 AND p = 0 THEN CAST(v AS HUGEINT)
            ELSE 0 END) AS s_c0,
        sum(CASE WHEN t = 0 AND p = 1 THEN CAST(v AS HUGEINT)
            ELSE 0 END) AS s_c1,
        sum(CASE WHEN t = 1 AND p = 0 THEN CAST(v AS HUGEINT) * v
            ELSE 0 END) AS q_t0,
        sum(CASE WHEN t = 1 AND p = 1 THEN CAST(v AS HUGEINT) * v
            ELSE 0 END) AS q_t1,
        sum(CASE WHEN t = 0 AND p = 0 THEN CAST(v AS HUGEINT) * v
            ELSE 0 END) AS q_c0,
        sum(CASE WHEN t = 0 AND p = 1 THEN CAST(v AS HUGEINT) * v
            ELSE 0 END) AS q_c1
      FROM s
    ),
    ex AS (
      SELECT *,
        CAST(s_t0 AS DOUBLE) / n_t0 AS m_t0,
        CAST(s_t1 AS DOUBLE) / n_t1 AS m_t1,
        CAST(s_c0 AS DOUBLE) / n_c0 AS m_c0,
        CAST(s_c1 AS DOUBLE) / n_c1 AS m_c1,
        (CAST(q_t0 AS DOUBLE) - CAST(s_t0 AS DOUBLE) * s_t0 / n_t0)
          / CAST(n_t0 - 1 AS DOUBLE) AS v_t0,
        (CAST(q_t1 AS DOUBLE) - CAST(s_t1 AS DOUBLE) * s_t1 / n_t1)
          / CAST(n_t1 - 1 AS DOUBLE) AS v_t1,
        (CAST(q_c0 AS DOUBLE) - CAST(s_c0 AS DOUBLE) * s_c0 / n_c0)
          / CAST(n_c0 - 1 AS DOUBLE) AS v_c0,
        (CAST(q_c1 AS DOUBLE) - CAST(s_c1 AS DOUBLE) * s_c1 / n_c1)
          / CAST(n_c1 - 1 AS DOUBLE) AS v_c1
      FROM agg
    ),
    fin AS (
      SELECT *,
        (m_t1 - m_t0) - (m_c1 - m_c0) AS did_raw,
        v_t0 / n_t0 + v_t1 / n_t1 + v_c0 / n_c0 + v_c1 / n_c1 AS se2,
        (n_t0 > 1 AND n_t1 > 1 AND n_c0 > 1 AND n_c1 > 1) AS ok
      FROM ex
    )
    SELECT n_t0, n_t1, n_c0, n_c1,
      CASE WHEN n_t0 > 0 THEN floor(m_t0 * 1e6 + 0.5) / 1e6 END
        AS mean_t0,
      CASE WHEN n_t1 > 0 THEN floor(m_t1 * 1e6 + 0.5) / 1e6 END
        AS mean_t1,
      CASE WHEN n_c0 > 0 THEN floor(m_c0 * 1e6 + 0.5) / 1e6 END
        AS mean_c0,
      CASE WHEN n_c1 > 0 THEN floor(m_c1 * 1e6 + 0.5) / 1e6 END
        AS mean_c1,
      CASE WHEN ok THEN floor(did_raw * 1e6 + 0.5) / 1e6 END AS did,
      CASE WHEN ok AND se2 > 0 THEN
        floor(sqrt(se2) * 1e6 + 0.5) / 1e6 END AS se,
      CASE WHEN ok AND se2 > 0 THEN
        floor(did_raw / sqrt(se2) * 1e6 + 0.5) / 1e6 END AS z
    FROM fin
"""


def test_diff_in_diff_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull())
    got = validation.diff_in_diff(
        o, F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))\
        .toPandas()
    want = con.sql(_DID_ORACLE).df()
    ok, msg = compare(got, want)
    assert ok, msg


_BAL_ORACLE = """
    WITH m AS (
      SELECT 'discount_pct' AS f,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS v,
             CAST(l_returnflag = 'R' AS INT) AS a
      FROM lineitem WHERE l_discount IS NOT NULL
      UNION ALL
      SELECT 'price_cents',
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
             CAST(l_returnflag = 'R' AS INT)
      FROM lineitem WHERE l_extendedprice IS NOT NULL
      UNION ALL
      SELECT 'quantity', CAST(floor(l_quantity) AS BIGINT),
             CAST(l_returnflag = 'R' AS INT)
      FROM lineitem WHERE l_quantity IS NOT NULL
      UNION ALL
      SELECT 'tax_pct', CAST(floor(l_tax * 100 + 0.5) AS BIGINT),
             CAST(l_returnflag = 'R' AS INT)
      FROM lineitem WHERE l_tax IS NOT NULL
    ),
    agg AS (
      SELECT f,
             CAST(sum(a) AS BIGINT) AS n_a,
             CAST(sum(1 - a) AS BIGINT) AS n_b,
             sum(CASE WHEN a = 1 THEN CAST(v AS HUGEINT) ELSE 0 END)
               AS sa,
             sum(CASE WHEN a = 0 THEN CAST(v AS HUGEINT) ELSE 0 END)
               AS sb,
             sum(CASE WHEN a = 1 THEN CAST(v AS HUGEINT) * v
                 ELSE 0 END) AS qa,
             sum(CASE WHEN a = 0 THEN CAST(v AS HUGEINT) * v
                 ELSE 0 END) AS qb
      FROM m GROUP BY f
    ),
    ex AS (
      SELECT f, n_a, n_b,
             CAST(sa AS DOUBLE) / n_a AS ma,
             CAST(sb AS DOUBLE) / n_b AS mb,
             (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a)
               / CAST(n_a - 1 AS DOUBLE) AS va,
             (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b)
               / CAST(n_b - 1 AS DOUBLE) AS vb
      FROM agg
    )
    SELECT f AS feature, n_a, n_b,
      CASE WHEN n_a > 0 THEN floor(ma * 1e6 + 0.5) / 1e6 END
        AS mean_a,
      CASE WHEN n_b > 0 THEN floor(mb * 1e6 + 0.5) / 1e6 END
        AS mean_b,
      CASE WHEN n_a > 1 AND n_b > 1 AND (va + vb) / 2 > 0 THEN
        floor((ma - mb) / sqrt((va + vb) / 2) * 1e6 + 0.5) / 1e6
      END AS smd,
      CASE WHEN n_a > 1 AND n_b > 1 AND vb > 0 THEN
        floor(va / vb * 1e6 + 0.5) / 1e6
      END AS var_ratio
    FROM ex
"""


def test_covariate_balance_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    feats = {
        "quantity": F.floor(F.col("l_quantity")),
        "price_cents": F.floor(F.col("l_extendedprice") * 100
                               + F.lit(0.5)),
        "discount_pct": F.floor(F.col("l_discount") * 100 + F.lit(0.5)),
        "tax_pct": F.floor(F.col("l_tax") * 100 + F.lit(0.5)),
    }
    got = validation.covariate_balance(
        li, (F.col("l_returnflag") == "R").cast("int"), feats).toPandas()
    want = _duck(sf_dir, _BAL_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


def test_diff_in_diff_planted_effect(spark):
    """Control rises by 10 pre→post; treated rises by 10 PLUS a
    planted +50 effect — DID must recover exactly 50."""
    rows = []
    i = 0
    for t in (0, 1):
        for p in (0, 1):
            base = 100 + 10 * p + 7 * t + (50 if (t and p) else 0)
            for j in range(40):
                rows.append((t, p, base + (j % 5)))
                i += 1
    df = spark.createDataFrame(rows, "t int, p int, v long")
    r = validation.diff_in_diff(
        df, F.col("v"), F.col("t"), F.col("p")).collect()[0]
    assert r["did"] == 50.0
    assert r["z"] > 100  # tiny within-cell variance
    assert (r["n_t0"], r["n_t1"], r["n_c0"], r["n_c1"]) == (40,) * 4


def test_covariate_balance_detects_planted_imbalance(spark):
    """One balanced and one shifted feature: the balanced one's |SMD|
    sits near 0, the shifted one's far above the 0.1 rule."""
    rows = [(i % 2, 100 + (i % 7), 100 + (i % 7) + 40 * (i % 2))
            for i in range(400)]
    df = spark.createDataFrame(rows, "a int, bal long, shifted long")
    out = {r["feature"]: r for r in validation.covariate_balance(
        df, F.col("a"),
        {"bal": F.col("bal"), "shifted": F.col("shifted")}).collect()}
    assert abs(out["bal"]["smd"]) < 0.05
    assert abs(out["shifted"]["smd"]) > 5
    # 400 rows split odd/even against mod-7 values: variances match to
    # ~0.4% (not exactly — 400/7 is not integral)
    assert out["bal"]["var_ratio"] == pytest.approx(1.0, abs=0.01)


def test_pacf_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.operators.timeseries import (
        _pacf_oracle,
        pacf,
    )
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = pacf(ev, "user_id", "ts", "value",
               tie_break="event_id").toPandas()
    want = _duck(sf_dir, _pacf_oracle())
    ok, msg = compare(got, want)
    assert ok, msg


def test_pacf_matches_python_durbin_levinson(spark):
    """The operator's unrolled Durbin-Levinson against a direct
    recursive python implementation over the same pinned ACF values,
    on a series with real autocorrelation structure."""
    import math

    vals = [math.sin(t / 3.0) + 0.3 * math.sin(t / 1.1) + t * 0.01
            for t in range(60)]
    rows = [(0, t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, ts long, v double")

    from auto_ml_platform_with_timeseries_data_spark.operators.timeseries import (
        acf,
        pacf,
    )

    r = {row["lag"]: row["acf"]
         for row in acf(df, "g", "ts", "v", 5).collect()}
    got = {row["lag"]: row["pacf"]
           for row in pacf(df, "g", "ts", "v").collect()}
    # recursive DL on the pinned r values
    phi = {1: {1: r[1]}}
    for k in range(2, 6):
        num = r[k] - sum(phi[k - 1][j] * r[k - j]
                         for j in range(1, k))
        den = 1 - sum(phi[k - 1][j] * r[j] for j in range(1, k))
        phi[k] = {k: num / den}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - phi[k][k] * phi[k - 1][k - j]
    for k in range(1, 6):
        assert got[k] == pytest.approx(_PIN(phi[k][k]), abs=2e-6), k
    # AR-identification sanity: a smooth sinusoid mix is strongly
    # lag-1 autocorrelated (measured 0.8977 on this fixture)
    assert abs(got[1]) > 0.85


def test_pacf_constant_series_null_by_contract(spark):
    rows = [(0, t, 5.0) for t in range(20)]
    df = spark.createDataFrame(rows, "g int, ts long, v double")
    from auto_ml_platform_with_timeseries_data_spark.operators.timeseries import (
        pacf,
    )

    out = pacf(df, "g", "ts", "v").collect()
    assert len(out) == 5 and all(r["pacf"] is None for r in out)


_TSS_ORACLE = """
    WITH base AS (
      SELECT user_id AS g, CAST(value AS DOUBLE) AS v, ts, event_id,
             CAST(hour(ts) AS INT) AS s
      FROM events WHERE value IS NOT NULL
    ),
    t AS (
      SELECT g, v, s,
             avg(v) OVER (PARTITION BY g ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      FROM base
    ),
    d AS (SELECT g, v, s, v - trend AS dd FROM t),
    prof AS (SELECT g, s, avg(dd) AS seas FROM d GROUP BY g, s),
    j AS (
      SELECT d.g, d.v, d.dd, d.dd - p.seas AS r,
             d.v - p.seas AS deseason
      FROM d JOIN prof p ON d.g = p.g AND d.s = p.s
    ),
    agg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             sum(r) AS sr, sum(r * r) AS qr,
             sum(dd) AS sd, sum(dd * dd) AS qd,
             sum(deseason) AS su, sum(deseason * deseason) AS qu
      FROM j GROUP BY g
    ),
    ex AS (
      SELECT g, n,
             (qr - sr * sr / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
               AS vr,
             (qd - sd * sd / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
               AS vd,
             (qu - su * su / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
               AS vu
      FROM agg
    )
    SELECT g AS user_id, n,
           CASE WHEN vu > 0 THEN
             floor(greatest(0.0, 1 - vr / vu) * 1e6 + 0.5) / 1e6
           END AS trend_strength,
           CASE WHEN vd > 0 THEN
             floor(greatest(0.0, 1 - vr / vd) * 1e6 + 0.5) / 1e6
           END AS seasonal_strength
    FROM ex
"""


def test_trend_seasonal_strength_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = ts_features.trend_seasonal_strength(
        ev, "user_id", "ts", "value", F.hour("ts").cast("int"),
        tie_break="event_id").toPandas()
    want = _duck(sf_dir, _TSS_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


def test_trend_seasonal_strength_planted_components(spark):
    """A pure-trend series scores trend_strength ~1; a pure
    2-period oscillation scores seasonal_strength ~1 with season key
    t % 2; white-ish structure scores both low-ish."""
    import math

    rows = []
    for t in range(120):
        rows.append((0, t, t % 2, 10.0 * t))              # pure trend
        rows.append((1, t, t % 2, 5.0 if t % 2 else -5.0))  # pure season
        rows.append((2, t, t % 2, math.sin(t * 2.17) * 3))  # mush
    df = spark.createDataFrame(rows, "g int, ts long, s int, v double")
    out = {r["g"]: r for r in ts_features.trend_seasonal_strength(
        df, "g", "ts", "v", F.col("s")).collect()}
    assert out[0]["trend_strength"] > 0.99
    assert out[1]["seasonal_strength"] > 0.99
    assert out[2]["trend_strength"] < 0.9
