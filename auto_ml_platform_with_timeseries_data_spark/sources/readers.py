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
