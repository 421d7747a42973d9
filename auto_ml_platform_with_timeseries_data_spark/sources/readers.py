"""Ingest sources (SURVEY.md §2.1 S1-S5).

Reference: extension-dispatched pd.read_csv / pd.read_excel with full
schema inference (data_analysis.py:17-21). Engine policy: inference is
allowed at INGEST only; everything downstream sees an explicit schema
(the ingested parquet's). Excel has no distributed reader in this
image — it funnels through pandas→Arrow on the driver (Excel files are
small by construction), gated behind an import-try.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table


def read_any(spark: SparkSession, path: str) -> DataFrame:
    """Extension-dispatched load, mirroring data_analysis.py:18."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        return read_csv(spark, path)
    if ext in (".xlsx", ".xls"):
        return read_excel(spark, path)
    if ext == ".parquet":
        return spark.read.parquet(path)
    if ext in (".json", ".jsonl"):
        return spark.read.json(path)
    raise ValueError(f"unsupported extension: {ext}")


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan with header + schema inference (ingest-only inference)."""
    return spark.read.csv(path, header=True, inferSchema=True)


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """Excel scan via pandas on the driver (S2). Requires openpyxl/xlrd;
    raises a clear error when the engine image lacks them."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path)
    except ImportError as e:
        raise NotImplementedError(
            "Excel ingest needs openpyxl/xlrd, not present in this image; "
            "convert to CSV/parquet upstream"
        ) from e
    return spark.createDataFrame(pdf)


def ingest_to_parquet(spark: SparkSession, src_path: str, dest_dir: str,
                      name: str = "train_data",
                      skip_if_exists: bool = True) -> str:
    """Upload sink (S4/S5, app.py:23-51): persist the ingested table as
    the task's canonical columnar copy; idempotent like the reference's
    skip-if-exists."""
    dest = os.path.join(dest_dir, f"{name}.parquet")
    if skip_if_exists and os.path.exists(dest):
        return dest
    read_any(spark, src_path).write.mode("overwrite").parquet(dest)
    return dest


@query(
    "q56_jsonl_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,  -- HUGEINT→BIGINT
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q56_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink + source round-trip — the lingua franca format of LLM
    data pipelines. documents → newline-delimited JSON (one shard per
    partition, JSON-escaped text survives embedded newlines/quotes) →
    read back with an EXPLICIT schema (no inference pass over 100 TB)
    → aggregate; the result must equal aggregating the original table."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    stage = tempfile.mkdtemp(prefix="sparkgraft_jsonl_")
    docs.write.mode("overwrite").json(stage)
    back = spark.read.schema(docs.schema).json(stage)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


def ingest_bucketed(df: DataFrame, table: str, key: str,
                    num_buckets: int = 32, path: str | None = None,
                    sort: bool = True) -> None:
    """Persist a table bucketed (and per-bucket sorted) by its join key.

    Bucketing is THE big-big join lever at cluster scale: two tables
    bucketed by the same key into the same bucket count join with ZERO
    exchange — each task reads bucket i of both sides; with sortBy the
    per-bucket sort disappears too. Pre-paying one shuffle at ingest
    amortizes across every subsequent join/agg on that key (fact tables
    are written once, joined thousands of times)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


@query(
    "q80_partitioned_sink",
    oracle="""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars  -- HUGEINT→BIGINT
    FROM documents WHERE lang = 'en' GROUP BY source
    """,
)
def q80_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-PRUNED re-read —
    the layout decision that matters most at 100 TB: a `lang` filter on
    a lang-partitioned table becomes a directory listing (PartitionFilters
    in the scan, zero data files of other langs opened), not a scan of
    everything. Write side: partitionBy controls layout; one output file
    per (task, lang) here — at scale you'd repartition("lang") first so
    each partition is written by one task (avoids the small-files
    explosion of tasks × partitions)."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    stage = tempfile.mkdtemp(prefix="sparkgraft_part_")
    (docs.repartition("lang").write.mode("overwrite")
     .partitionBy("lang").parquet(stage))
    back = spark.read.parquet(stage).filter(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
