"""Pipeline-completion operators: snapshot merge/upsert, walk-forward
CV splits, near-dup cluster retention, and importance-weighted
sampling.

These close the loop between the curation layer (operators/curation.py)
and the AutoML layer (SURVEY.md §2.9): ingest a delta batch into the
canonical snapshot, build leakage-free time-series CV folds (the
walk-forward generalization of the reference's single 80/20 ordered
split, auto_machine_learning.py:117-119), choose which near-duplicate
to keep, and bias a sample toward high-value rows — all declarative,
all oracle-checked.

Scale notes (100 TB):
- Merge (q83) is the anti-join ∪ delta form, NOT a full-outer-join
  coalesce: the snapshot side streams through the anti-join probe
  (broadcast when the delta is small — the common case for incremental
  ingest), and no wide coalesce row is materialized.
- Walk-forward folds (q84) are one window pass (rn, n per key) plus
  arithmetic — fold membership is a CASE on rn, so K folds cost ONE
  shuffle total, not K passes.
- Retention (q85) rides on the component labels (q55); the arg-max per
  cluster is a single partial-aggregatable max of a (key, orderable
  struct) — no window, no second shuffle of the documents table.
- Weighted sampling (q86) is map-only like q73/q74.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_ml_platform_with_timeseries_data_spark.operators.curation import (
    _M32,
    hash_u32,
    _hash_u32_sql,
)
from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
    _JACCARD_PAIRS_DUCK,
    _JACCARD_THRESHOLD,
    connected_components,
    jaccard_pairs_blocked,
)
from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


# ---------------------------------------------------------------------------
# q83 — merge/upsert a delta batch into a snapshot
# ---------------------------------------------------------------------------


def merge_upsert(snapshot: DataFrame, delta: DataFrame,
                 key: str) -> DataFrame:
    """SCD-1 merge: delta rows win on key collision, snapshot rows
    survive otherwise, inserts append. Anti-join ∪ delta — the
    MERGE INTO physical shape without a table format: the (big)
    snapshot probes the delta's keys; nothing is rewritten except what
    changed. No forced broadcast: a typical delta is small and AQE
    broadcasts its key set at runtime, but a backfill-sized delta must
    be allowed to fall back to a shuffle join."""
    return snapshot.join(
        delta.select(key), key, "left_anti"
    ).unionByName(delta)


@query(
    "q83_merge_upsert",
    oracle="""
    WITH delta AS (
      SELECT doc_id, text, lang, 'delta-update' AS source,
             n_chars + 1000 AS n_chars
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, text, lang,
             'delta-insert' AS source, n_chars
      FROM documents WHERE doc_id % 13 = 0
    ), merged AS (
      SELECT * FROM delta
      UNION ALL
      SELECT s.* FROM documents s
      WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.doc_id = s.doc_id)
    )
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars  -- HUGEINT→BIGINT
    FROM merged GROUP BY lang, source
    """,
)
def q83_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic delta batch derived from the fixture itself:
    every 10th doc arrives updated (+1000 chars, relabeled source),
    every 13th doc arrives as a brand-new insert under a shifted id."""
    docs = load_table(spark, sf_dir, "documents")
    updates = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "text", "lang",
        F.lit("delta-update").alias("source"),
        (F.col("n_chars") + 1000).alias("n_chars"),
    )
    inserts = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "text", "lang",
        F.lit("delta-insert").alias("source"),
        "n_chars",
    )
    merged = merge_upsert(
        docs.select("doc_id", "text", "lang", "source", "n_chars"),
        updates.unionByName(inserts), "doc_id")
    return merged.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# q84 — walk-forward (expanding-window) CV folds per group
# ---------------------------------------------------------------------------

_N_FOLDS = 3


def walkforward_folds(df: DataFrame, key: str, order: list[str],
                      k: int = _N_FOLDS) -> DataFrame:
    """Per-key expanding-window folds over k+1 equal time chunks: fold
    i (1..k) trains on chunks [0, i) and validates on chunk i — the
    leakage-free CV scheme for ordered data (validation is always
    strictly later than training), generalizing the reference's single
    ordered 80/20 split (auto_machine_learning.py:117-119, W1).

    One window pass assigns (rn, n) per key; a row's chunk is
    arithmetic on rn, so every fold's membership comes out of the SAME
    shuffle — k folds, one exchange."""
    w = Window.partitionBy(key).orderBy(*order)
    wall = Window.partitionBy(key)
    chunks = k + 1
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wall))
        # chunk c ∈ [0, k]: rn ∈ (floor(c·n/(k+1)), floor((c+1)·n/(k+1))]
        .withColumn(
            "__chunk",
            F.ceil(F.col("__rn") * chunks / F.col("__n")) - 1,
        )
    )


@query(
    "q84_walkforward_splits",
    oracle=f"""
    WITH r AS (
      SELECT user_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id,
           CAST(ceil(rn * {_N_FOLDS + 1} / CAST(n AS DOUBLE)) - 1 AS BIGINT)
             AS fold,
           count(*) AS val_n,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS val_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS val_end
    FROM r
    WHERE ceil(rn * {_N_FOLDS + 1} / CAST(n AS DOUBLE)) - 1 >= 1
    GROUP BY 1, 2
    """,
)
def q84_walkforward_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation-window summary per (user, fold): fold i validates on
    chunk i (chunk 0 is never validation — it's the minimum training
    prefix). Start/end timestamps prove temporal ordering."""
    ev = load_table(spark, sf_dir, "events")
    folds = walkforward_folds(ev, "user_id", ["ts", "event_id"], _N_FOLDS)
    return (
        folds.filter(F.col("__chunk") >= 1)
        .groupBy("user_id", F.col("__chunk").alias("fold"))
        .agg(
            F.count(F.lit(1)).alias("val_n"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("val_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("val_end"),
        )
    )


# ---------------------------------------------------------------------------
# q85 — near-dup cluster retention (keep the best document per cluster)
# ---------------------------------------------------------------------------


@query(
    "q85_cluster_retention",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_DUCK}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (
      SELECT src AS doc_id, min(dst) AS component
      FROM reach GROUP BY src
    ),
    ranked AS (
      SELECT c.component, d.doc_id, d.n_chars,
             count(*) OVER (PARTITION BY c.component) AS cluster_size,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
      FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT component, doc_id AS kept_doc_id, n_chars, cluster_size
    FROM ranked WHERE rk = 1 AND cluster_size > 1
    """,
)
def q85_cluster_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the dedup funnel: given near-dup components (q55), keep
    ONE canonical document per multi-doc cluster — the longest (ties →
    smallest id), the usual "keep the most complete copy" policy.
    The arg-max is a plain aggregate of an orderable struct
    (max (n_chars, −doc_id) ⇒ longest-then-smallest-id), which partial-
    aggregates map-side — no window over the full table, no second
    shuffle; only the component labels shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_blocked(docs, "doc_id", "text", "lang",
                                  shingle_n=2, threshold=_JACCARD_THRESHOLD)
    comp = connected_components(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), id_col="doc_id")
    labeled = comp.select(F.col("id").alias("doc_id"), "component").join(
        docs.select("doc_id", "n_chars"), "doc_id")
    return (
        labeled.groupBy("component")
        .agg(
            F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("__neg")))
            .alias("__best"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .filter(F.col("cluster_size") > 1)
        .select(
            "component",
            (-F.col("__best.__neg")).alias("kept_doc_id"),
            F.col("__best.n_chars").alias("n_chars"),
            "cluster_size",
        )
    )


# ---------------------------------------------------------------------------
# q86 — importance-weighted sampling (longer docs kept preferentially)
# ---------------------------------------------------------------------------


@query(
    "q86_weighted_sample",
    oracle=f"""
    SELECT lang, count(*) AS n_kept,
           ROUND(avg(n_chars), 4) AS avg_chars_kept
    FROM documents
    WHERE {_hash_u32_sql('doc_id')} <
          LEAST(n_chars / 500.0, 1.0) * {_M32}
    GROUP BY lang
    """,
)
def q86_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling with a per-row weight (keep probability
    min(n_chars/500, 1)): the deterministic-hash acceptance test makes
    it reproducible — same row, same verdict, any engine, any
    partitioning. Map-only; the weight can be any row-local expression
    (quality score, source prior, toxicity penalty)."""
    docs = load_table(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars") / 500.0, F.lit(1.0))
    kept = docs.filter(hash_u32("doc_id") < weight * F.lit(_M32))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars_kept"),
    )


# ---------------------------------------------------------------------------
# Smoothed target encoding (mean encoding with additive smoothing)
# ---------------------------------------------------------------------------


@query(
    "q113_target_encoding",
    oracle="""
    WITH per_cat AS (
      SELECT l_returnflag AS category,
             sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS s,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    ),
    overall AS (
      SELECT CAST(sum(s) AS DOUBLE) / sum(n) AS gmean FROM per_cat
    )
    SELECT category, n,
           ROUND((CAST(s AS DOUBLE) + 10.0 * gmean) / (n + 10.0), 6)
             AS encoded
    FROM per_cat, overall
    ORDER BY category
    """,
)
def q113_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean (target) encoding of a categorical column against
    a numeric label: enc(c) = (Σ_c y + m·ȳ) / (n_c + m), m=10 — the
    standard leakage-resistant categorical encoder for GBT-style models
    (extends the reference's feature surface, SURVEY.md §2.9/M2, which
    feeds raw columns only).

    Scale: one partial-aggregated pass builds the per-category sums;
    the global mean re-reduces those category rows (ReusedExchange, no
    second scan); the encoder table is |categories| rows — broadcast
    back to training data for free. Sums are exact DECIMAL, the
    smoothing is one double expression — engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    per_cat = li.groupBy(F.col("l_returnflag").alias("category")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,4)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    glob = per_cat.agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("gmean")
    )
    return (
        per_cat.crossJoin(F.broadcast(glob))
        .select(
            "category", "n",
            F.round(
                (F.col("s").cast("double") + 10.0 * F.col("gmean"))
                / (F.col("n") + 10.0),
                6,
            ).alias("encoded"),
        )
        .orderBy("category")
    )


# ---------------------------------------------------------------------------
# Ordered funnel analysis (subsequence match per user)
# ---------------------------------------------------------------------------


@query(
    "q114_funnel",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(event_type, ' ' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT
      count(*) AS n_users,
      CAST(sum(CASE WHEN regexp_matches(s, 'view') THEN 1 ELSE 0 END)
        AS BIGINT) AS step1_view,
      CAST(sum(CASE WHEN regexp_matches(s, 'view.*click') THEN 1 ELSE 0 END)
        AS BIGINT) AS step2_click,
      CAST(sum(CASE WHEN regexp_matches(s, 'view.*click.*purchase')
                    THEN 1 ELSE 0 END)
        AS BIGINT) AS step3_purchase
    FROM seq
    """,
)
def q114_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: how many users have view → click → purchase as
    a time-ordered subsequence of their event stream. The per-user
    sequence is materialized as a sorted struct array collapsed to a
    string, then matched with one regex per funnel step — all JVM-side.

    Scale: ONE shuffle (groupBy user) with array_sort on the collected
    (ts, event_id, type) structs — per-user state is bounded by the
    user's own event count; the funnel flags reduce to a 4-number
    global aggregate. No window, no join, no driver loop. The same
    shape extends to any step list."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("s")
        )
    )
    flag = lambda pat: F.sum(  # noqa: E731
        F.when(F.col("s").rlike(pat), 1).otherwise(0)
    )
    return seq.agg(
        F.count(F.lit(1)).alias("n_users"),
        flag("view").alias("step1_view"),
        flag("view.*click").alias("step2_click"),
        flag("view.*click.*purchase").alias("step3_purchase"),
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix
# ---------------------------------------------------------------------------


@query(
    "q115_cohort_retention",
    oracle="""
    WITH wk AS (
      SELECT user_id,
             date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) // 7
               AS week_idx
      FROM events
    ),
    first_wk AS (
      SELECT user_id, min(week_idx) AS cohort FROM wk GROUP BY user_id
    )
    SELECT f.cohort,
           CAST(w.week_idx - f.cohort AS BIGINT) AS week_offset,
           count(DISTINCT w.user_id) AS n_users
    FROM wk w JOIN first_wk f ON w.user_id = f.user_id
    GROUP BY f.cohort, week_offset
    ORDER BY f.cohort, week_offset
    """,
)
def q115_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week,
    counted distinct in each subsequent week offset. Week indexing is a
    flat integer day-diff // 7 from a fixed origin — no engine-specific
    week-truncation conventions.

    Scale: the first-seen aggregate and the (cohort, offset) distinct
    count both shuffle on user_id — same key, one exchange reused; the
    distinct-count re-aggregates to the small cohort×offset grid. The
    join of events to their user's cohort is key-aligned (no extra
    shuffle); output is the retention matrix, driver-sized."""
    ev = load_table(spark, sf_dir, "events")
    week_idx = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date")) / 7
    )
    wk = ev.select("user_id", week_idx.alias("week_idx"))
    first_wk = wk.groupBy("user_id").agg(F.min("week_idx").alias("cohort"))
    return (
        wk.join(first_wk, "user_id")
        .groupBy(
            "cohort",
            (F.col("week_idx") - F.col("cohort")).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort", "week_offset")
    )
