"""Record linkage (entity resolution) and dedup-aware reweighting.

Two curation-adjacent operators a large training-data pipeline runs
between dedup and sampling:

- blocking best-match join: the classic entity-resolution dataflow —
  cheap deterministic blocking keys bound the candidate-pair space,
  an exact set-similarity verifies inside each block, and a per-left-
  record argmax picks the canonical match. This is the Fellegi-Sunter
  blocking shape (and the reference's implicit "same entity across
  sources" need): NEVER all-pairs, the block key is the shuffle key.
- soft-dedup weights: instead of dropping duplicates, down-weight them
  (weight = 1/group_size) so the sampled corpus keeps one expected copy
  of every duplicated document — the count-based soft variant of exact
  dedup used when the trainer consumes sampling weights rather than a
  filtered corpus.

Exactness: every similarity is computed in integer arithmetic
(intersection / union cardinalities, ppm-scaled integer division) so
the Spark result and the DuckDB oracle agree bit-for-bit — the q177
convention (quantize before folding, never compare raw float scores).

Scale: blocking keys are (lang, first-token, length-bucket) — the
candidate set is block-bounded, the join shuffles on the block key, and
the per-left argmax is one window over the candidate pairs (pair-
bounded, not corpus-bounded). Soft-dedup weights are one hash-groupBy
on a 32-byte md5 fingerprint; the shuffle never carries document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_ml_platform_with_timeseries_data_spark.functions.text_exprs import (
    normalize_text,
    tokens,
)
from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table

_NORM_DUCK = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_DUCK = f"string_split({_NORM_DUCK}, ' ')"

# ---------------------------------------------------------------------------
# Blocking best-match join (entity resolution)
# ---------------------------------------------------------------------------


def _blocked(df: DataFrame, id_col: str, text_col: str, lang_col: str,
             length_bucket: int) -> DataFrame:
    """Per-record blocking profile: (lang, first token, ⌊n_tokens/b⌋)
    block key + the distinct-token set the in-block verify compares."""
    toks = tokens(normalize_text(text_col))
    return df.select(
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("__lang"),
        F.element_at(toks, 1).alias("__tok0"),
        F.floor(F.size(toks) / F.lit(length_bucket)).cast("long")
        .alias("__lb"),
        F.array_distinct(toks).alias("__set"),
    )


def blocking_best_match(left: DataFrame, right: DataFrame, id_col: str,
                        text_col: str, lang_col: str,
                        length_bucket: int = 8) -> DataFrame:
    """Best right-side match per left record under blocked exact
    token-set Jaccard.

    Dataflow: both sides project to (block_key, distinct-token set);
    an equi-join on (lang, first token, length bucket) produces the
    candidate pairs; the verify computes |A∩B| and |A∪B| as exact
    integers and scores score_ppm = ⌊10⁶·|A∩B| / |A∪B|⌋; a per-left
    window keeps the argmax (ties → smallest right id). Left records
    whose block holds no right record emit nothing (no match exists
    under the blocking scheme — the standard ER contract).

    At scale the equi-join shuffles on the composite block key, so
    work is Σ_blocks |L_b|·|R_b| — bounded by the blocking scheme, not
    |L|·|R|; the window repartitions by left id over candidate pairs
    only. Reference analogue: joining uploaded datasets to an existing
    catalog by fuzzy identity (auto_machine_learning.py upload path
    re-matches task names by exact key; this is the fuzzy version a
    multi-source platform needs)."""
    lb = _blocked(left, id_col, text_col, lang_col, length_bucket)
    rb = _blocked(right, id_col, text_col, lang_col, length_bucket)
    inter = F.size(F.array_intersect(F.col("l.__set"), F.col("r.__set")))
    union = (F.size(F.col("l.__set")) + F.size(F.col("r.__set")) - inter)
    cand = (
        lb.alias("l")
        .join(rb.alias("r"),
              on=[F.col("l.__lang") == F.col("r.__lang"),
                  F.col("l.__tok0") == F.col("r.__tok0"),
                  F.col("l.__lb") == F.col("r.__lb")])
        .select(
            F.col("l.__id").alias("left_id"),
            F.col("r.__id").alias("match_id"),
            inter.cast("long").alias("n_common"),
            union.cast("long").alias("n_union"),
        )
        .withColumn(
            "score_ppm",
            F.floor(F.col("n_common") * F.lit(1_000_000) /
                    F.col("n_union")).cast("long"))
    )
    w = Window.partitionBy("left_id").orderBy(
        F.col("score_ppm").desc(), F.col("match_id").asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@query(
    "q197_blocking_bestmatch",
    oracle=f"""
    WITH prof AS (
      SELECT doc_id, source, lang,
             ({_TOKS_DUCK})[1] AS tok0,
             len({_TOKS_DUCK}) // 32 AS lb,
             list_distinct({_TOKS_DUCK}) AS tset
      FROM documents
    ),
    cand AS (
      SELECT l.doc_id AS left_id, r.doc_id AS match_id,
             len(list_intersect(l.tset, r.tset)) AS n_common,
             len(l.tset) + len(r.tset)
               - len(list_intersect(l.tset, r.tset)) AS n_union
      FROM prof l JOIN prof r
        ON l.lang = r.lang AND l.tok0 = r.tok0 AND l.lb = r.lb
      WHERE l.source = 'src0' AND r.source <> 'src0'
    ),
    scored AS (
      SELECT left_id, match_id,
             CAST(n_common AS BIGINT) AS n_common,
             CAST(n_union AS BIGINT) AS n_union,
             CAST(n_common * 1000000 // n_union AS BIGINT) AS score_ppm,
             row_number() OVER (
               PARTITION BY left_id
               ORDER BY n_common * 1000000 // n_union DESC, match_id ASC
             ) AS rn
      FROM cand
    )
    SELECT left_id, match_id, n_common, n_union, score_ppm
    FROM scored WHERE rn = 1
    """,
)
def q197_blocking_bestmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolve the src0 slice against the rest of the corpus:
    blocked candidate generation + exact integer Jaccard verify +
    per-record argmax. Every matched row value-hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return blocking_best_match(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") != "src0"),
        "doc_id", "text", "lang", length_bucket=32)


# ---------------------------------------------------------------------------
# Soft-dedup sampling weights
# ---------------------------------------------------------------------------


def soft_dedup_weights(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """Down-weight exact duplicates instead of dropping them:
    weight_ppm = ⌊10⁶ / group_size⌋ per document, where group_size is
    the md5-fingerprint duplicate-group cardinality. eff_tokens_ppm =
    n_tokens · weight_ppm is the document's contribution to the
    expected (deduplicated) token budget — summing it over the corpus
    and dividing by 10⁶ gives the effective token count a sampler that
    draws by these weights would consume.

    One hash-groupBy on the 32-byte fingerprint (shuffle never carries
    text), then a window count — identical shape to exact_dedup_groups
    (dedup.py:102) with the drop replaced by a weight column."""
    toks = tokens(normalize_text(text_col))
    base = df.select(
        F.col(id_col),
        F.md5(normalize_text(text_col)).alias("__fp"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("__fp")).cast("long")
    return (
        base.withColumn("group_size", n)
        .withColumn("weight_ppm",
                    F.floor(F.lit(1_000_000) / F.col("group_size"))
                    .cast("long"))
        .withColumn("eff_tokens_ppm",
                    (F.col("n_tokens") * F.col("weight_ppm")).cast("long"))
        .drop("__fp")
    )


@query(
    "q198_softdedup_weights",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, md5({_NORM_DUCK}) AS fp,
             CAST(len({_TOKS_DUCK}) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS group_size,
           CAST(1000000 // count(*) OVER (PARTITION BY fp) AS BIGINT)
             AS weight_ppm,
           CAST(n_tokens *
                (1000000 // count(*) OVER (PARTITION BY fp)) AS BIGINT)
             AS eff_tokens_ppm
    FROM fp
    """,
)
def q198_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document soft-dedup sampling weights over the documents
    table — all 500 rows (group size, ppm weight, effective tokens)
    value-hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return soft_dedup_weights(docs, "doc_id", "text")
