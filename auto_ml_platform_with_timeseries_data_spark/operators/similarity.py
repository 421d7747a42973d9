"""Similarity search over embedding columns (BASELINE.json north star).

- Brute-force cosine top-k: the exact baseline. Query set is broadcast;
  the corpus is scanned ONCE; per-query top-k comes from a window over
  (query × corpus) scored rows. Dot products are `F.zip_with` +
  `F.aggregate` — JVM-side, no Python in the loop.
- LSH-bucketed ANN (random hyperplane / SRP): each vector hashed to a
  `nbits`-bit sketch by sign of dot with deterministic hyperplanes
  (seeded, reproducible); candidates = same bucket in ≥1 of `ntables`
  tables; exact re-score on candidates only. This is the 100 TB path:
  shuffle is (table, bucket)-keyed, bucket size bounds the rescore cost.

At cluster scale the brute-force path is still the right *structure*
(broadcast queries, one corpus pass, partial top-k per partition via
the window), just with a larger query batch; the LSH path trades recall
for a ~|bucket|/|corpus| cut of the rescore work.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential fold — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(corpus: DataFrame, queries_df: DataFrame,
                           id_col: str, vec_col: str, k: int = 5,
                           round_to: int = 6) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, cosine). Queries are broadcast
    (small side); ranking excludes self-matches; ties broken by
    neighbor id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__cnorm", l2_norm(F.col("__cv")))
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qnorm", l2_norm(F.col("__qv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (dot(F.col("__cv"), F.col("__qv"))
             / (F.col("__cnorm") * F.col("__qnorm"))).alias("__cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round(F.col("__cos"), round_to).alias("cosine"))
    )


def _hyperplanes(dim: int, nbits: int, ntables: int, seed: int) -> list[list[list[float]]]:
    """Deterministic pseudo-random unit hyperplanes from a counter-based
    generator (no numpy state, reproducible across runs/workers)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        [list(map(float, rng.standard_normal(dim))) for _ in range(nbits)]
        for _ in range(ntables)
    ]


def srp_sketch(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection sketch: bit i = 1 iff vec·plane_i > 0,
    packed into a long. Plane coefficients are literals folded into the
    plan (they're tiny); the data-side math is JVM expressions."""
    bits = []
    for i, plane in enumerate(planes):
        prod = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(p) for p in plane]), lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bits.append(F.when(prod > 0, F.shiftleft(F.lit(1).cast("long"), i))
                    .otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def cosine_topk_srp(corpus: DataFrame, queries_df: DataFrame, id_col: str,
                    vec_col: str, k: int = 5, nbits: int = 12,
                    ntables: int = 4, seed: int = 42,
                    round_to: int = 6) -> DataFrame:
    """Approximate top-k via SRP-LSH bucketing + exact rescore of
    candidates. Output shape matches cosine_topk_bruteforce."""
    sample = corpus.select(vec_col).first()
    dim = len(sample[0])
    tables = _hyperplanes(dim, nbits, ntables, seed)

    def sketched(df: DataFrame, prefix: str) -> DataFrame:
        v = _as_double(F.col(vec_col))
        out = df.select(
            F.col(id_col).alias(f"{prefix}_id"), v.alias(f"__{prefix}v")
        ).withColumn(f"__{prefix}norm", l2_norm(F.col(f"__{prefix}v")))
        buckets = F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     srp_sketch(F.col(f"__{prefix}v"), tables[t]).alias("bucket"))
            for t in range(ntables)
        ])
        return out.select(
            f"{prefix}_id", f"__{prefix}v", f"__{prefix}norm",
            F.explode(buckets).alias("bb"),
        ).select(f"{prefix}_id", f"__{prefix}v", f"__{prefix}norm",
                 "bb.tbl", "bb.bucket")

    c = sketched(corpus, "neighbor")
    q = sketched(queries_df, "query")
    cands = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__neighborv", "__querynorm",
                "__neighbornorm", "__queryv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id", "neighbor_id",
        (dot(F.col("__neighborv"), F.col("__queryv"))
         / (F.col("__neighbornorm") * F.col("__querynorm"))).alias("__cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round(F.col("__cos"), round_to).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------

_N_QUERIES = 10
_TOP_K = 5


@query(
    "q19_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])) AS cos
      FROM embeddings e, q
      WHERE e.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
           ROUND(cos, 6) AS cosine
    FROM scored
    QUALIFY rank <= {_TOP_K}
    """,
)
def q19_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk_bruteforce(emb, queries_df, "vec_id", "embedding", _TOP_K)


@query("q34_ann_srp")  # rows-only: hyperplane hashing not SQL-portable
def q34_ann_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk_srp(emb, queries_df, "vec_id", "embedding", _TOP_K)
