"""Deduplication operators for training-data pipelines (BASELINE.json
north star; beyond the reference's surface, designed for 100 TB).

Four tiers, cheapest first:

- exact dedup: hash-groupBy on normalized text — one shuffle keyed by
  the (tiny) md5, never the full text.
- content fingerprint: md5 of normalized text (portable across engines,
  hence oracle-checkable).
- MinHash + LSH banding: k hash functions per shingle set via xxhash64
  (JVM-side, no UDF); band → bucket → self-join on (band, band_hash)
  produces candidate pairs LINEAR in data size (no O(n²) cross join);
  candidates verified with exact Jaccard.
- SimHash: 64-bit signature via per-bit majority vote over token hashes;
  near-dups = signatures within small Hamming distance.
- n-gram Jaccard: exact verification kernel, also exposed standalone
  with lang-blocked candidate generation (oracle-checkable).

Scale notes: the LSH self-join shuffles on (band_id, band_hash) — hot
buckets (boilerplate docs) are the classic skew source; AQE skew-join
splits them, and `max_bucket_size` hard-caps degenerate buckets the way
production dedup pipelines do.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_ml_platform_with_timeseries_data_spark.functions.text_exprs import (
    jaccard,
    normalize_text,
    tokens,
    word_ngrams,
)
from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table

# ---------------------------------------------------------------------------
# Exact dedup + fingerprint
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Tag every row with its duplicate group: (id, canonical_id,
    group_size). canonical = min id among rows with identical normalized
    text. Grouping key is md5(norm) so the shuffle carries 32 bytes per
    row, not the document body."""
    keyed = df.select(
        F.col(id_col), F.md5(normalize_text(text_col)).alias("__fp")
    )
    w = Window.partitionBy("__fp")
    return keyed.select(
        id_col,
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )


def deduplicate_exact(df: DataFrame, text_col: str) -> DataFrame:
    """Keep one row per distinct normalized text (dropDuplicates on the
    fingerprint — order-independent, scale-out)."""
    return df.withColumn("__fp", F.md5(normalize_text(text_col))).dropDuplicates(
        ["__fp"]
    ).drop("__fp")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(df: DataFrame, id_col: str, shingles: Column,
                       num_hashes: int = 32) -> DataFrame:
    """(id, sig array<long>): for seed i, min over distinct shingles of
    xxhash64(shingle, i). One explode + ONE groupBy with num_hashes `min`
    aggregates (map-side combined) — far cheaper to codegen than
    num_hashes nested array-transforms, and explode parallelizes long
    documents across the partition."""
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(shingles)).alias("__sh"),
    )
    return exploded.groupBy("__id").agg(
        F.array(*[
            F.min(F.xxhash64(F.col("__sh"), F.lit(i))) for i in range(num_hashes)
        ]).alias("__sig")
    )


def minhash_lsh_candidates(df: DataFrame, id_col: str, text_col: str,
                           num_hashes: int = 32, bands: int = 8,
                           shingle_n: int = 3,
                           max_bucket_size: int = 1000) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: (id_a, id_b) with
    id_a < id_b that share at least one band. Rows per band-bucket are
    capped at `max_bucket_size` to bound worst-case skew."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(
        df, id_col, word_ngrams(tokens(normalize_text(text_col)), shingle_n),
        num_hashes,
    )
    banded = sig.select(
        "__id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[F.element_at(F.col("__sig"), b * rows_per_band + r + 1)
                              for r in range(rows_per_band)],
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")
    capped = banded.withColumn(
        "__rn", F.row_number().over(
            Window.partitionBy("band", "bucket").orderBy("__id")
        )
    ).filter(F.col("__rn") <= max_bucket_size).drop("__rn")
    a = capped.select(F.col("__id").alias("id_a"), "band", "bucket")
    b = capped.select(F.col("__id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                        threshold: float = 0.7, num_hashes: int = 32,
                        bands: int = 8, shingle_n: int = 3) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard ≥ threshold.
    Output: (id_a, id_b, jaccard)."""
    cands = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands,
                                   shingle_n)
    grams = df.select(
        F.col(id_col).alias("__gid"),
        F.array_distinct(
            word_ngrams(tokens(normalize_text(text_col)), shingle_n)
        ).alias("__grams"),
    )
    ga = grams.select(F.col("__gid").alias("id_a"), F.col("__grams").alias("__ga"))
    gb = grams.select(F.col("__gid").alias("id_b"), F.col("__grams").alias("__gb"))
    return (
        cands.join(ga, "id_a").join(gb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(jaccard(F.col("__ga"), F.col("__gb")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: bit b of the signature is set iff the
    majority of token hashes have bit b set. One explode + one groupBy
    with 64 conditional-sum aggregates — fully JVM-side."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(normalize_text(text_col))).alias("__t")
    ).withColumn("__h", F.xxhash64("__t"))
    bit_votes = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"__b{b}")
        for b in range(64)
    ]
    votes = tok.groupBy(id_col).agg(*bit_votes)
    sig = reduce(
        lambda acc, b: acc + F.when(
            F.col(f"__b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long")),
        range(1, 64),
        F.when(F.col("__b0") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidate-blocked on
    16-bit signature chunks (a pair within distance d≤3 shares at least
    one of the 4 chunks exactly — pigeonhole)."""
    sigs = simhash64(df, id_col, text_col)
    chunks = sigs.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF))
                .alias("chunk"),
            )
            for c in range(4)
        ])).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk_id", "cc.chunk")
    a = chunks.select(F.col(id_col).alias("id_a"),
                      F.col("simhash").alias("sig_a"), "chunk_id", "chunk")
    b = chunks.select(F.col(id_col).alias("id_b"),
                      F.col("simhash").alias("sig_b"), "chunk_id", "chunk")
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["chunk_id", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard with blocking (oracle-checkable)
# ---------------------------------------------------------------------------


def jaccard_pairs_blocked(df: DataFrame, id_col: str, text_col: str,
                          block_col: str, shingle_n: int = 2,
                          threshold: float = 0.2) -> DataFrame:
    """All-pairs n-gram Jaccard within blocks (e.g. same language):
    (id_a, id_b, jaccard ≥ threshold). Quadratic per block by design —
    the exact-verification baseline the LSH path approximates."""
    grams = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.array_distinct(
            word_ngrams(tokens(normalize_text(text_col)), shingle_n)
        ).alias("__grams"),
    )
    a = grams.select(F.col("__blk"), F.col("__id").alias("id_a"),
                     F.col("__grams").alias("__ga"))
    b = grams.select(F.col("__blk"), F.col("__id").alias("id_b"),
                     F.col("__grams").alias("__gb"))
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("__blk").alias("block"), "id_a", "id_b",
            F.round(jaccard(F.col("__ga"), F.col("__gb")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------

_NORM_DUCK = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_JACCARD_THRESHOLD = 0.5


@query(
    "q16_dedup_exact",
    oracle=f"""
    SELECT doc_id,
           CAST(min(doc_id) OVER (PARTITION BY fp) AS BIGINT) AS canonical_id,
           count(*) OVER (PARTITION BY fp) AS group_size
    FROM (SELECT doc_id, md5({_NORM_DUCK}) AS fp FROM documents)
    """,
)
def q16_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "doc_id", "text")


@query(
    "q33_fingerprint",
    oracle=f"SELECT doc_id, md5({_NORM_DUCK}) AS fingerprint FROM documents",
)
def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(normalize_text("text")).alias("fingerprint")
    )


@query(
    "q18_jaccard_pairs",
    oracle=f"""
    WITH g AS (
      SELECT lang, doc_id,
             list_distinct(list_transform(
               range(1, len(string_split({_NORM_DUCK}, ' '))),
               i -> string_split({_NORM_DUCK}, ' ')[i] || ' ' ||
                    string_split({_NORM_DUCK}, ' ')[i + 1]
             )) AS grams
      FROM documents
    )
    SELECT a.lang AS block, a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
                 (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS jaccard
    FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
          (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
          >= {_JACCARD_THRESHOLD}
    """,
)
def q18_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_blocked(docs, "doc_id", "text", "lang",
                                 shingle_n=2, threshold=_JACCARD_THRESHOLD)


@query("q17_minhash_dedup")  # rows-only: xxhash64 has no DuckDB equivalent
def q17_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.35)


@query("q23_simhash")  # rows-only: xxhash64 has no DuckDB equivalent
def q23_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash64(docs, "doc_id", "text")
