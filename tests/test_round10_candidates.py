"""Round-10 registration de-risking (the q245-q249 pattern, one round
later): the operators held back by round 9's saturated driver head —
threshold sweep, two-proportion z, Gini, Cramér's V, Kaplan-Meier —
get their DuckDB oracles DRAFTED and driver-gate-compared here, so
registering them next rotation is a pure registry edit."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from check_oracle import compare  # noqa: E402

from auto_ml_platform_with_timeseries_data_spark.operators import (  # noqa: E402
    evaluation,
    profile,
    ts_features,
    validation,
)
from auto_ml_platform_with_timeseries_data_spark.operators.curation import (  # noqa: E402
    cramers_v,
)

_TABLES = ("lineitem", "events", "documents")


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


_THRESH_ORACLE = """
    WITH s AS (
      SELECT CAST(l_discount AS DOUBLE) AS v,
             CAST(l_returnflag = 'R' AS BIGINT) AS y
      FROM lineitem WHERE l_discount IS NOT NULL
    ),
    c AS (
      SELECT v, CAST(sum(y) AS BIGINT) AS cp,
             CAST(sum(1 - y) AS BIGINT) AS cn
      FROM s GROUP BY v
    ),
    m AS (
      SELECT v AS threshold,
             sum(cp) OVER (ORDER BY v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(cn) OVER (ORDER BY v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
             sum(cp) OVER () AS p, sum(cn) OVER () AS nn
      FROM c
    )
    SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(p - tp AS BIGINT) AS fn, CAST(nn - fp AS BIGINT) AS tn,
           CASE WHEN 2 * tp + fp + (p - tp) > 0 THEN
             floor(2 * tp / CAST(2 * tp + fp + (p - tp) AS DOUBLE)
                   * 1e6 + 0.5) / 1e6
           END AS f1,
           CASE WHEN p > 0 AND nn > 0 THEN
             floor((CAST(tp AS DOUBLE) / p - CAST(fp AS DOUBLE) / nn)
                   * 1e6 + 0.5) / 1e6
           END AS youden_j
    FROM m
"""


def test_threshold_sweep_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = evaluation.threshold_sweep(
        li, F.col("l_discount"),
        (F.col("l_returnflag") == "R").cast("long")).toPandas()
    want = _duck(sf_dir, _THRESH_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_TWOPROP_ORACLE = """
    WITH s AS (
      SELECT l_linestatus = 'O' AS a,
             CAST(l_returnflag = 'R' AS BIGINT) AS y
      FROM lineitem WHERE l_linestatus IN ('O', 'F')
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN a THEN y ELSE 0 END) AS BIGINT) AS x_a,
             CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN a THEN 0 ELSE y END) AS BIGINT) AS x_b
      FROM s
    )
    SELECT n_a, x_a, n_b, x_b,
           CASE WHEN n_a > 0 THEN
             floor(CAST(x_a AS DOUBLE) / n_a * 1e6 + 0.5) / 1e6
           END AS p_a,
           CASE WHEN n_b > 0 THEN
             floor(CAST(x_b AS DOUBLE) / n_b * 1e6 + 0.5) / 1e6
           END AS p_b,
           CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
                AND x_a + x_b < n_a + n_b THEN
             floor((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                   / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                          * (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b))
                   * 1e6 + 0.5) / 1e6
           END AS z
    FROM agg
"""


def test_two_proportion_z_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = validation.two_proportion_z(
        li, "l_linestatus", "O", "F",
        (F.col("l_returnflag") == "R").cast("long")).toPandas()
    want = _duck(sf_dir, _TWOPROP_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_GINI_ORACLE = """
    WITH s AS (
      SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    f AS (SELECT v FROM s WHERE v >= 0),
    vv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY v),
    sp AS (
      SELECT v, c,
             CAST(coalesce(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS st
      FROM vv
    ),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(v * c) AS BIGINT) AS total,
             sum(CAST(v AS HUGEINT)
                 * (CAST(c AS HUGEINT) * st + (c * (c + 1)) // 2))
               AS rs
      FROM sp
    )
    SELECT n, total,
           CASE WHEN total > 0 THEN
             floor((2.0 * rs - CAST(n + 1 AS DOUBLE) * total)
                   / (CAST(n AS DOUBLE) * total) * 1e6 + 0.5) / 1e6
           END AS gini
    FROM agg
"""


def test_gini_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = profile.gini_coefficient(
        li, F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")).toPandas()
    want = _duck(sf_dir, _GINI_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_CRAMERS_ORACLE = """
    WITH c AS (
      SELECT lang, source, count(*) AS n FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2
    ),
    m AS (
      SELECT n,
             sum(n) OVER (PARTITION BY lang) AS ra,
             sum(n) OVER (PARTITION BY source) AS cb,
             sum(n) OVER () AS tot
      FROM c
    ),
    agg AS (
      SELECT floor((sum((n - CAST(ra AS DOUBLE) * cb / tot)
                        * (n - CAST(ra AS DOUBLE) * cb / tot)
                        / (CAST(ra AS DOUBLE) * cb / tot))
                    + max(tot)
                    - sum(CAST(ra AS DOUBLE) * cb / tot))
                   * 1e6 + 0.5) / 1e6 AS chi2,
             CAST(max(tot) AS BIGINT) AS n
      FROM m
    ),
    ks AS (
      SELECT count(DISTINCT lang) AS ka, count(DISTINCT source) AS kb
      FROM c
    )
    SELECT chi2,
           CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof, n,
           CASE WHEN least(ka, kb) > 1 THEN
             floor(sqrt(chi2 / (CAST(n AS DOUBLE) * (least(ka, kb) - 1)))
                   * 1e6 + 0.5) / 1e6
           END AS v
    FROM agg, ks
"""


def test_cramers_v_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = cramers_v(docs, "lang", "source").toPandas()
    want = _duck(sf_dir, _CRAMERS_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_KM_ORACLE = """
    WITH s AS (
      SELECT user_id % 3 AS g,
             CAST(floor(abs(value)) AS BIGINT) AS t,
             CAST(event_id % 4 != 0 AS INT) AS e
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT g, t, CAST(sum(e) AS BIGINT) AS d,
             CAST(sum(1 - e) AS BIGINT) AS c
      FROM s GROUP BY g, t
    ),
    stepped AS (
      SELECT g, t, d, c,
             sum(d + c) OVER (PARTITION BY g)
             - coalesce(sum(d + c) OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS n_risk
      FROM cells
    ),
    walked AS (
      SELECT g, t, n_risk, d, c,
             sum(CASE WHEN d < n_risk THEN
                 CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                            * 1e12) AS BIGINT) END)
               OVER (PARTITION BY g ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ls,
             max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (PARTITION BY g ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS dead
      FROM stepped
    )
    SELECT g AS cohort, t, CAST(n_risk AS BIGINT) AS n_risk, d, c,
           CASE WHEN dead = 1 THEN 0.0 ELSE
             floor(exp(ls / 1e12) * 1e6 + 0.5) / 1e6
           END AS survival
    FROM walked
"""


def test_kaplan_meier_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()).select(
        (F.col("user_id") % 3).alias("cohort"), "value", "event_id")
    got = ts_features.kaplan_meier(
        ev, "cohort", F.floor(F.abs(F.col("value"))),
        (F.col("event_id") % 4 != 0).cast("int")).toPandas()
    want = _duck(sf_dir, _KM_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


# ---------------------------------------------------------------------------
# Property pins: each candidate against a direct pure-python
# computation of its textbook definition (the test_round9_properties
# pattern — the oracle drafts above certify engine-vs-engine, these
# certify the math).
# ---------------------------------------------------------------------------

import math  # noqa: E402

pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from auto_ml_platform_with_timeseries_data_spark.session import get_spark  # noqa: E402

_PIN = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=10_000),
                     min_size=2, max_size=30))
def test_gini_matches_python_reference(vals):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    row = profile.gini_coefficient(df, F.col("x")).collect()[0]
    n, total = len(vals), sum(vals)
    xs = sorted(vals)
    rs = sum((i + 1) * x for i, x in enumerate(xs))
    want = (_PIN((2.0 * rs - float(n + 1) * total) / (float(n) * total))
            if total > 0 else None)
    assert (row["n"], row["total"], row["gini"]) == (n, total, want)


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(st.tuples(
    st.integers(min_value=1, max_value=8),      # duration
    st.booleans()),                             # event (vs censored)
    min_size=2, max_size=25))
def test_kaplan_meier_matches_python_reference(rows):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(0, int(t), 1 if e else 0) for t, e in rows],
        "cohort int, t long, e int")
    got = {r["t"]: (r["n_risk"], r["d"], r["c"], r["survival"])
           for r in ts_features.kaplan_meier(
               df, "cohort", F.col("t"), F.col("e")).collect()}
    times = sorted({t for t, _ in rows})
    remaining = len(rows)
    log_q = 0
    dead = False
    for t in times:
        d = sum(1 for tt, e in rows if tt == t and e)
        c = sum(1 for tt, e in rows if tt == t and not e)
        n_risk = remaining
        if d < n_risk:
            log_q += math.floor(math.log(1.0 - d / n_risk) * 1e12)
        else:
            dead = True
        want = 0.0 if dead else _PIN(math.exp(log_q / 1e12))
        assert got[t] == (n_risk, d, c, want)
        remaining -= d + c


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(st.tuples(
    st.integers(min_value=0, max_value=5),      # score (ties likely)
    st.booleans()),                             # label
    min_size=2, max_size=30))
def test_threshold_sweep_matches_python_reference(rows):
    spark = get_spark("tests", cores=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(float(v), 1 if y else 0) for v, y in rows],
        "v double, y long")
    got = {r["threshold"]: (r["tp"], r["fp"], r["fn"], r["tn"],
                            r["f1"], r["youden_j"])
           for r in evaluation.threshold_sweep(
               df, F.col("v"), F.col("y")).collect()}
    p = sum(1 for _, y in rows if y)
    nn = len(rows) - p
    for th in sorted({v for v, _ in rows}):
        tp = sum(1 for v, y in rows if y and v >= th)
        fp = sum(1 for v, y in rows if not y and v >= th)
        fn, tn = p - tp, nn - fp
        f1 = _PIN(2 * tp / (2 * tp + fp + fn)) if 2 * tp + fp + fn else None
        j = _PIN(tp / p - fp / nn) if p and nn else None
        assert got[float(th)] == (tp, fp, fn, tn, f1, j)


def _dominant_lag_oracle(max_lag: int = 10) -> str:
    from auto_ml_platform_with_timeseries_data_spark.operators.timeseries import (
        _acf_oracle,
    )

    return f"""
    WITH acf_rows AS ({_acf_oracle()}),
    ranked AS (
      SELECT user_id, lag, acf,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY acf DESC NULLS LAST,
                                         lag ASC) AS rk
      FROM acf_rows WHERE lag >= 1
    )
    SELECT user_id,
           CAST(CASE WHEN acf IS NOT NULL THEN lag END AS INT)
             AS best_lag,
           acf AS best_acf
    FROM ranked WHERE rk = 1
    """


def test_dominant_acf_lag_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.operators.timeseries import (
        _ACF_LAGS,
        dominant_acf_lag,
    )
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = dominant_acf_lag(ev, "user_id", "ts", "value", _ACF_LAGS,
                           tie_break="event_id").toPandas()
    want = _duck(sf_dir, _dominant_lag_oracle(_ACF_LAGS))
    ok, msg = compare(got, want)
    assert ok, msg
