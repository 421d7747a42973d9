"""Feature scaling operators (SURVEY.md §2.8 F1/F2, §2.4 A7/A8 — Q9).

Reference semantics (citations into /root/reference):

- StandardScaler fit/transform   auto_machine_learning.py:15-16,45 and
  data_analysis.py:160 (fit on TRAIN, reuse on test). sklearn uses the
  POPULATION std (ddof=0); MLlib's StandardScaler uses the sample std
  (ddof=1) — the engine reports both and standardizes on ddof=0 for
  reference parity.
- MinMaxScaler                   auto_machine_learning.py:101-102

Scale notes: parameter fitting is ONE aggregation over the train table
(4 partial aggregates per feature, map-side combined). The transform
broadcast-joins the 1-row parameter table — never a collect, never a
driver-side literal, so the same plan works when "train" is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import (
    LINEITEM_FEATURES,
    load_table,
)


def scale_params(df: DataFrame, features: list[str], round_to: int = 6) -> DataFrame:
    """Per-feature (mean, std_pop, std_samp, min, max) in ONE pass (Q9).

    Output: (feature, mean, std_pop, std_samp, min_value, max_value).
    """
    aggs = []
    for c in features:
        aggs += [
            F.round(F.avg(c), round_to).alias(f"__avg_{c}"),
            F.round(F.stddev_pop(c), round_to).alias(f"__sdp_{c}"),
            F.round(F.stddev_samp(c), round_to).alias(f"__sds_{c}"),
            F.min(c).cast("double").alias(f"__min_{c}"),
            F.max(c).cast("double").alias(f"__max_{c}"),
        ]
    agg = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', __avg_{c}, __sdp_{c}, __sds_{c}, __min_{c}, __max_{c}"
        for c in features
    )
    return agg.selectExpr(
        f"stack({len(features)}, {pairs}) as "
        "(feature, mean, std_pop, std_samp, min_value, max_value)"
    )


def standard_scale(train: DataFrame, apply_to: DataFrame,
                   features: list[str], ddof: int = 0) -> DataFrame:
    """(x − μ)/σ per feature; μ/σ fitted on `train`, applied to `apply_to`
    (the reference's fit-on-train / transform-on-test contract,
    data_analysis.py:159-160). Appends `<c>_scaled` columns."""
    std = F.stddev_pop if ddof == 0 else F.stddev_samp
    stats = train.agg(
        *[F.avg(c).alias(f"__mu_{c}") for c in features],
        *[std(c).alias(f"__sigma_{c}") for c in features],
    )
    out = apply_to.crossJoin(F.broadcast(stats))
    for c in features:
        # constant train column: sigma 0 -> scaled value NULL by
        # contract (sklearn emits 0 there; NULL keeps "no information"
        # visible), never an ANSI divide error
        out = out.withColumn(
            f"{c}_scaled",
            F.when(F.col(f"__sigma_{c}") > 0,
                   (F.col(c) - F.col(f"__mu_{c}"))
                   / F.col(f"__sigma_{c}")))
    return out.drop(*[f"__mu_{c}" for c in features],
                    *[f"__sigma_{c}" for c in features])


def min_max_scale(train: DataFrame, apply_to: DataFrame,
                  features: list[str]) -> DataFrame:
    """(x − min)/(max − min) (F2, auto_machine_learning.py:101-102)."""
    stats = train.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in features],
        *[F.max(c).alias(f"__mx_{c}") for c in features],
    )
    out = apply_to.crossJoin(F.broadcast(stats))
    for c in features:
        out = out.withColumn(
            f"{c}_scaled",
            F.when(F.col(f"__mx_{c}") > F.col(f"__mn_{c}"),
                   (F.col(c) - F.col(f"__mn_{c}"))
                   / (F.col(f"__mx_{c}") - F.col(f"__mn_{c}"))),
        )
    return out.drop(*[f"__mn_{c}" for c in features],
                    *[f"__mx_{c}" for c in features])


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------


@query(
    "q09_scale_params",
    oracle=" UNION ALL ".join(
        f"SELECT '{c}' AS feature, ROUND(avg({c}), 6) AS mean, "
        f"ROUND(stddev_pop({c}), 6) AS std_pop, "
        f"ROUND(stddev_samp({c}), 6) AS std_samp, "
        f"CAST(min({c}) AS DOUBLE) AS min_value, "
        f"CAST(max({c}) AS DOUBLE) AS max_value FROM lineitem"
        for c in LINEITEM_FEATURES
    ),
)
def q09_scale_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scale_params(load_table(spark, sf_dir, "lineitem"),
                        list(LINEITEM_FEATURES))


@query(
    "q29_minmax_scaled",
    oracle="""
    WITH s AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           ROUND((l_quantity - mn) / (mx - mn), 6) AS l_quantity_scaled
    FROM lineitem, s
    """,
)
def q29_minmax_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return min_max_scale(li, li, ["l_quantity"]).select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_quantity_scaled"), 6).alias("l_quantity_scaled"),
    )
