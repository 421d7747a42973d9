"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in the package; this file only
re-exports the registry (auto_ml_platform_with_timeseries_data_spark/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from auto_ml_platform_with_timeseries_data_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the star-join revenue
    rollup (one big join + broadcast dims + grouped agg)."""
    registry.load_all()
    return registry.QUERIES["q27_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    entries (CV search, xxhash64-based sketches, SRP/IVF-LSH, HLL,
    LSTM training, trained-codebook ANN) are omitted — PageRank and
    all streaming queries carry oracles (exact-integer recurrence /
    batch-equivalent SQL). Ordering mirrors
    queries(): registry._PRIORITY pins the driver's budget-capped sweep
    to the parity core + the never-yet-checked extension block."""
    return registry.oracles()
