"""Round-9 registration de-risking: the library operators held back by
round 8's saturated driver budget (conformal quantile, Brier
decomposition, grouped AUC, coreness) get their DuckDB oracles DRAFTED
and driver-gate-compared here, so registering them next rotation is a
pure registry edit — the exactness work is already proven under the
same compare the driver uses."""

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
    graph,
)

_TABLES = ("lineitem", "events", "documents")


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


_CONFORMAL_ORACLE = """
    WITH s AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    t AS (SELECT n, CAST(ceil((n + 1) * 0.9) AS BIGINT) AS k FROM nn),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS i FROM s)
    SELECT t.n, t.k, (SELECT v FROM r WHERE r.i = t.k) AS qhat FROM t
"""


def test_conformal_quantile_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = evaluation.conformal_quantile(
        li, F.col("l_extendedprice"), alpha=0.1).toPandas()
    want = _duck(sf_dir, _CONFORMAL_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_BRIER_ORACLE = """
    WITH s AS (
      SELECT CAST(floor(l_discount * 10 * 1e6 + 0.5) AS BIGINT) AS p,
             least(CAST(floor(l_discount * 10 * 10) AS INT), 9) AS b,
             CAST(l_returnflag = 'R' AS BIGINT) AS y
      FROM lineitem
      WHERE l_discount IS NOT NULL
    ),
    cells AS (
      SELECT b, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(p) AS BIGINT) AS sp, CAST(sum(y) AS BIGINT) AS sy
      FROM s GROUP BY b
    ),
    tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n,
                   CAST(sum(sy) AS BIGINT) AS ty FROM cells),
    terms AS (
      SELECT max(n) AS n,
             max(CAST(ty AS DOUBLE) / n) AS ob,
             sum(CAST(nb AS DOUBLE)
                 * (CAST(sp AS DOUBLE) / 1e6 / CAST(nb AS DOUBLE)
                    - CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE))
                 * (CAST(sp AS DOUBLE) / 1e6 / CAST(nb AS DOUBLE)
                    - CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE))) AS rel,
             sum(CAST(nb AS DOUBLE)
                 * (CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE)
                    - CAST(ty AS DOUBLE) / n)
                 * (CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE)
                    - CAST(ty AS DOUBLE) / n)) AS res
      FROM cells, tot
    )
    SELECT n,
           floor(rel / n * 1e6 + 0.5) / 1e6 AS reliability,
           floor(res / n * 1e6 + 0.5) / 1e6 AS resolution,
           floor(ob * (1 - ob) * 1e6 + 0.5) / 1e6 AS uncertainty,
           floor((rel / n - res / n + ob * (1 - ob)) * 1e6 + 0.5) / 1e6
             AS brier
    FROM terms
"""


def test_brier_decomposition_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_discount").isNotNull())
    got = evaluation.brier_decomposition(
        li, F.col("l_discount") * 10,
        (F.col("l_returnflag") == "R").cast("int"), bins=10).toPandas()
    want = _duck(sf_dir, _BRIER_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


_GROUP_AUC_ORACLE = """
    WITH s AS (
      SELECT user_id AS g, CAST(value AS DOUBLE) AS v,
             CAST(event_id % 3 = 0 AS INT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT g, y,
             2 * rank() OVER (PARTITION BY g ORDER BY v)
             + count(*) OVER (PARTITION BY g, v) - 1 AS r2
      FROM s
    ),
    agg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT)
               AS s2p
      FROM r GROUP BY g
    )
    SELECT g AS user_id, n, n_pos, n - n_pos AS n_neg,
           CASE WHEN n_pos > 0 AND n > n_pos THEN
             floor((CAST(s2p AS DOUBLE) - n_pos * (n_pos + 1))
                   / (2.0 * n_pos * (n - n_pos)) * 1e6 + 0.5) / 1e6
           END AS auc
    FROM agg
"""


def test_group_auc_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    got = evaluation.roc_auc_by_group(
        ev, "user_id", F.col("value"),
        (F.col("event_id") % 3 == 0).cast("int")).toPandas()
    want = _duck(sf_dir, _GROUP_AUC_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg


def _coreness_oracle(rounds: int = 6) -> str:
    stages = []
    prev = "c0"
    for t in range(1, rounds + 1):
        stages.append(f"""    c{t} AS MATERIALIZED (
      SELECT p.u, least(p.c, coalesce(h.h, 0)) AS c
      FROM {prev} p LEFT JOIN (
        SELECT u, CAST(max(least(rk, cv)) AS BIGINT) AS h FROM (
          SELECT s.u, p2.c AS cv,
                 row_number() OVER (PARTITION BY s.u
                   ORDER BY p2.c DESC, s.v ASC) AS rk
          FROM sym s JOIN {prev} p2 ON s.v = p2.u
        ) GROUP BY u) h ON p.u = h.u
    )""")
        prev = f"c{t}"
    return f"""
    WITH e AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS MATERIALIZED (SELECT pa AS u, pb AS v FROM e
            UNION ALL SELECT pb, pa FROM e),
    c0 AS MATERIALIZED (
      SELECT u, CAST(count(*) AS BIGINT) AS c FROM sym GROUP BY u
    ),
{",".join(stages)}
    SELECT u AS vertex, c AS coreness FROM {prev}
"""


def test_coreness_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    edges = (li.alias("x").join(
        li.alias("y"),
        (F.col("x.l_orderkey") == F.col("y.l_orderkey")) &
        (F.col("x.l_partkey") < F.col("y.l_partkey")))
        .groupBy(F.col("x.l_partkey").alias("a"),
                 F.col("y.l_partkey").alias("b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2).drop("__n"))
    got = graph.coreness(edges, rounds=6).toPandas()
    want = _duck(sf_dir, _coreness_oracle(6))
    ok, msg = compare(got, want)
    assert ok, msg


_NS_SQL_P = 1_000_003
_NS_SQL_A = 2_654_435_761 % 1_000_003
_NS_SQL_C = 12_289

_NEG_SAMPLES_ORACLE = f"""
    WITH ib AS (
      SELECT doc_id AS item,
             ((doc_id % {_NS_SQL_P}) * {_NS_SQL_A} + {_NS_SQL_C})
               % {_NS_SQL_P} AS ih
      FROM documents
    ),
    ibb AS (SELECT item, ih, ih % 32 AS bucket FROM ib),
    anchors AS (SELECT DISTINCT doc_id AS a FROM documents
                WHERE doc_id < 20),
    slots AS (
      SELECT a, s.slot,
             ((((a % {_NS_SQL_P}) * (s.slot + 1) + {_NS_SQL_C})
               % {_NS_SQL_P}) * {_NS_SQL_A} + {_NS_SQL_C})
               % {_NS_SQL_P} % 32 AS bucket
      FROM anchors, (SELECT unnest(generate_series(0, 3)) AS slot) s
    ),
    pos AS (SELECT a, a + 1 AS item FROM anchors),
    cand AS (
      SELECT sl.a, sl.slot, b.item, b.ih
      FROM slots sl JOIN ibb b USING (bucket)
      WHERE b.item != sl.a
        AND NOT EXISTS (SELECT 1 FROM pos p
                        WHERE p.a = sl.a AND p.item = b.item)
    ),
    picked AS (
      SELECT a, slot, item FROM (
        SELECT a, slot, item,
               row_number() OVER (PARTITION BY a, slot
                                  ORDER BY ih, item) AS rk
        FROM cand) WHERE rk = 1
    )
    SELECT s.a AS qid, CAST(s.slot AS INT) AS slot,
           CAST(p.item AS BIGINT) AS neg_id
    FROM slots s LEFT JOIN picked p ON s.a = p.a AND s.slot = p.slot
"""


def test_negative_samples_oracle_draft(spark, sf_dir):
    from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
        negative_samples,
    )
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("qid"))
    positives = anchors.select(
        "qid", (F.col("qid") + 1).alias("doc_id"))
    got = negative_samples(anchors, docs, positives, "qid", "doc_id",
                           k=4, nbuckets=32).toPandas()
    want = _duck(sf_dir, _NEG_SAMPLES_ORACLE)
    ok, msg = compare(got, want)
    assert ok, msg
