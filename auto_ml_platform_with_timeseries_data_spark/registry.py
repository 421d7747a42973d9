"""Query registry — the single source of truth for the engine's query set.

Every operator from SURVEY.md §2 that is "done" registers here twice:

- a Spark implementation: ``Callable[(SparkSession, sf_dir)] -> DataFrame``
- (when SQL-expressible) a DuckDB oracle SQL string over the same parquet
  tables, producing identical column names and values.

``__spark_entry__.py`` re-exports this registry to the correctness driver.
Float-valued aggregate columns are rounded to a fixed number of decimals
on BOTH sides so IEEE accumulation-order differences between engines
cannot flip the driver's value hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "auto_ml_platform_with_timeseries_data_spark.operators.profile",
    "auto_ml_platform_with_timeseries_data_spark.operators.timeseries",
    "auto_ml_platform_with_timeseries_data_spark.operators.evaluation",
    "auto_ml_platform_with_timeseries_data_spark.operators.scaling",
    "auto_ml_platform_with_timeseries_data_spark.operators.relational",
    "auto_ml_platform_with_timeseries_data_spark.operators.tpch_more",
    "auto_ml_platform_with_timeseries_data_spark.operators.tpch3",
    "auto_ml_platform_with_timeseries_data_spark.operators.curation",
    "auto_ml_platform_with_timeseries_data_spark.operators.pipeline_ops",
    "auto_ml_platform_with_timeseries_data_spark.operators.ts_features",
    "auto_ml_platform_with_timeseries_data_spark.operators.asof",
    "auto_ml_platform_with_timeseries_data_spark.operators.sessionize",
    "auto_ml_platform_with_timeseries_data_spark.operators.dedup",
    "auto_ml_platform_with_timeseries_data_spark.operators.similarity",
    "auto_ml_platform_with_timeseries_data_spark.operators.text",
    "auto_ml_platform_with_timeseries_data_spark.operators.multimodal",
    # Cheap oracle-checked queries register (and therefore run) before
    # the expensive CV/streaming ones: a budget-capped correctness
    # sweep then verifies the most queries per second spent.
    "auto_ml_platform_with_timeseries_data_spark.sources.readers",
    "auto_ml_platform_with_timeseries_data_spark.operators.graph",
    "auto_ml_platform_with_timeseries_data_spark.ml.queries",
    "auto_ml_platform_with_timeseries_data_spark.streaming.events",
)

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
