"""Canonical access to the driver-generated parquet tables (TESTDATA.md).

All fixtures are columnar parquet; reading through here guarantees the
session is tuned (UTC timezone, AQE, Arrow) before any plan is built, so
oracle comparisons are deterministic regardless of who built the session.
"""

from __future__ import annotations

import os
import warnings

try:  # the stats probe goes through py4j; absent under Spark Connect
    from py4j.protocol import Py4JError as _Py4JError
except ImportError:  # pragma: no cover
    class _Py4JError(Exception):
        pass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.session import tune

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Numeric lineitem columns used as the "feature matrix" stand-in
# (FIXTURES.md §3: label=l_extendedprice, features=quantity/discount/tax/...).
LINEITEM_LABEL = "l_extendedprice"
LINEITEM_FEATURES = ("l_quantity", "l_discount", "l_tax",
                     "l_partkey", "l_suppkey", "l_linenumber")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    # events.parquet stores TIMESTAMP(NANOS), which the vectorized parquet
    # reader rejects; read nanos as long and truncate to microseconds —
    # exactly what DuckDB's TIMESTAMP_NS→TIMESTAMP cast does, so both
    # engines see identical values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer `div`, NOT `/` — nanos (~1.7e18) overflow a double's
            # 53-bit mantissa, so float division would corrupt low digits
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.dataType.simpleString() == "timestamp_ntz":
            # Session built before tune() could apply inferTimestampNTZ=false
            # (static conf): normalize NTZ → LTZ. Under the UTC session tz
            # this is value-preserving and matches the oracle's naive epoch.
            df = df.withColumn(field.name,
                               F.col(field.name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# Persist `frame` only when re-deriving it would re-scan a source big
# enough for the saved scans to beat the cache's fixed cost.
PERSIST_SRC_MB_ENV = "SPARK_GRAFT_PERSIST_SRC_MB"
_PERSIST_SRC_MB_DEFAULT = 256.0
_PROBE_WARNED = False


def persist_if_scan_heavy(frame: DataFrame, source: DataFrame) -> DataFrame:
    """Size-gated persist (guide §5: cache only when recompute costs
    more than the materialization barrier + memory pressure caching
    creates).

    `frame` at every call site is small by construction (grouped cells,
    key sets, narrow projections); what the persist SAVES is N-1
    re-scans of `source` by the downstream subtrees that share `frame`.
    The decision therefore keys on the SOURCE's size, taken from the
    optimizer's statistics (parquet relations report exact file bytes,
    scaled by projection; unknown statistics report Long.MaxValue and
    so persist — the safe default at scale).

    Measured both ways at sf0.1 (events ≈ 3 MB, idle box, paired A/B,
    r15): the unconditional persist made friedman/cochran_q ~2x SLOWER
    per query — the cache materialization serializes the query into a
    barrier plus an InMemoryRelation scan that costs more than
    re-reading page-cached parquet — while at production sizes the N
    re-scans dominate by the ratio of table size to cache size.
    Threshold parameterised via $SPARK_GRAFT_PERSIST_SRC_MB (default
    256 MB, the guide §2.2/§6 band where scan I/O starts to matter;
    plan tests set it to 0 to assert the at-scale single-scan shape)."""
    try:
        mb = float(os.environ.get(PERSIST_SRC_MB_ENV,
                                  _PERSIST_SRC_MB_DEFAULT))
    except ValueError:
        mb = _PERSIST_SRC_MB_DEFAULT
    try:
        size = int(str(source._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes()))
    except (AttributeError, TypeError, ValueError, _Py4JError) as exc:
        # No _jdf (Spark Connect) or a probe-shape change: fall back to
        # the at-scale-safe unconditional persist, but say so ONCE — a
        # silently disabled gate reverts every call site to the
        # measured ~2x-slower small-scale persist with no signal.
        global _PROBE_WARNED
        if not _PROBE_WARNED:
            _PROBE_WARNED = True
            warnings.warn(
                "persist_if_scan_heavy: source-size probe unavailable "
                f"({type(exc).__name__}: {exc}); persisting "
                "unconditionally from now on", RuntimeWarning)
        return frame.persist()
    return frame.persist() if size >= mb * 1024 * 1024 else frame
