"""Evaluation operators (SURVEY.md §2.4 A9-A11, §2.8 F3 — Q10-Q12).

Reference semantics (citations into /root/reference):

- RMSE                         data_analysis.py:167 (mean_squared_error squared=False)
- threshold binarization       data_analysis.py:200-201 — strictly `<`
  (RUL < threshold → positive class 1; note NOT MLlib Binarizer's `>`)
- binary F1                    data_analysis.py:203 (f1 = 2TP/(2TP+FP+FN))
- confusion matrix             data_analysis.py:204 (2×2 counts)

All metrics are single aggregation passes (map-side combined); the
confusion matrix is a groupBy-pivot that produces 4 counts — at any
scale these reduce to one tiny result row.

The registered queries use a deterministic, model-free "prediction"
(a fixed linear formula of l_quantity) so the oracle can reproduce the
metric math exactly; the model-backed path lives in ml/automl.py and
produces the same shapes via these same functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.registry import query
from auto_ml_platform_with_timeseries_data_spark.tables import load_table

# ---------------------------------------------------------------------------
# Reusable operators
# ---------------------------------------------------------------------------


def rmse(df: DataFrame, truth: str, pred: str, round_to: int = 6) -> DataFrame:
    """sqrt(mean((truth − pred)²)) as a 1-row DataFrame (A11)."""
    d = F.col(truth) - F.col(pred)
    return df.agg(F.round(F.sqrt(F.avg(d * d)), round_to).alias("rmse"))


def binarize(col: str | Column, threshold: float) -> Column:
    """1 iff value < threshold else 0 (F3, data_analysis.py:200-201).

    Direction is strictly `<` — the reference binarizes RUL so that
    "fails within `threshold` cycles" is the positive class. MLlib's
    Binarizer uses `>`, hence the explicit `when`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c < F.lit(threshold), 1).otherwise(0)


def confusion_and_f1(df: DataFrame, truth_bin: str, pred_bin: str,
                     round_to: int = 6) -> DataFrame:
    """2×2 confusion counts + binary F1 in ONE pass (A9+A10).

    Output columns: tp, fp, fn, tn, f1 (positive class = 1).
    binary F1 = 2TP / (2TP + FP + FN) — exactly sklearn's
    f1_score(average='binary'), not the weighted variant.
    """
    t, p = F.col(truth_bin), F.col(pred_bin)
    # coalesce: F.sum over ZERO rows is NULL — an empty frame must
    # yield a (0,0,0,0, 0.0) row, not None counts
    zero = F.lit(0).cast("long")
    tp = F.coalesce(F.sum(((t == 1) & (p == 1)).cast("long")), zero).alias("tp")
    fp = F.coalesce(F.sum(((t == 0) & (p == 1)).cast("long")), zero).alias("fp")
    fn = F.coalesce(F.sum(((t == 1) & (p == 0)).cast("long")), zero).alias("fn")
    tn = F.coalesce(F.sum(((t == 0) & (p == 0)).cast("long")), zero).alias("tn")
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    return df.agg(tp, fp, fn, tn).select(
        "tp", "fp", "fn", "tn",
        F.round(
            # all-negative truth AND prediction → denom 0; sklearn's
            # zero_division=0 scores 0.0 (ANSI mode would raise)
            F.when(denom != 0, 2 * F.col("tp") / denom).otherwise(F.lit(0.0)),
            round_to,
        ).alias("f1"),
    )


def confusion_matrix_pivot(df: DataFrame, truth_bin: str, pred_bin: str) -> DataFrame:
    """Long-form confusion matrix via groupBy-pivot (A9): rows = truth,
    columns pred_0/pred_1 — the 2×2 table the reference heatmaps."""
    return (
        df.groupBy(F.col(truth_bin).alias("truth"))
        .pivot(pred_bin, [0, 1])
        .count()
        .na.fill(0)
        .withColumnsRenamed({"0": "pred_0", "1": "pred_1"})
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------

# deterministic stand-in prediction for l_extendedprice
_PRED = "l_quantity * 1000.0"
_THRESHOLD = 20000.0


@query(
    "q10_rmse",
    oracle=f"""
    SELECT ROUND(SQRT(AVG((l_extendedprice - ({_PRED})) * (l_extendedprice - ({_PRED})))), 6) AS rmse
    FROM lineitem
    """,
)
def q10_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "pred", F.expr(_PRED)
    )
    return rmse(li, "l_extendedprice", "pred")


@query(
    "q11_binarize",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_extendedprice < {_THRESHOLD} THEN 1 ELSE 0 END AS truth_bin,
           CASE WHEN ({_PRED}) < {_THRESHOLD} THEN 1 ELSE 0 END AS pred_bin
    FROM lineitem
    """,
)
def q11_binarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        binarize("l_extendedprice", _THRESHOLD).alias("truth_bin"),
        binarize(F.expr(_PRED), _THRESHOLD).alias("pred_bin"),
    )


@query(
    "q12_f1_confusion",
    oracle=f"""
    WITH b AS (
      SELECT CASE WHEN l_extendedprice < {_THRESHOLD} THEN 1 ELSE 0 END AS truth_bin,
             CASE WHEN ({_PRED}) < {_THRESHOLD} THEN 1 ELSE 0 END AS pred_bin
      FROM lineitem
    )
    SELECT tp, fp, fn, tn,
           ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1
    FROM (SELECT
            CAST(sum(CASE WHEN truth_bin = 1 AND pred_bin = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
            CAST(sum(CASE WHEN truth_bin = 0 AND pred_bin = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
            CAST(sum(CASE WHEN truth_bin = 1 AND pred_bin = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
            CAST(sum(CASE WHEN truth_bin = 0 AND pred_bin = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
          FROM b)
    """,
)
def q12_f1_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        binarize("l_extendedprice", _THRESHOLD).alias("truth_bin"),
        binarize(F.expr(_PRED), _THRESHOLD).alias("pred_bin"),
    )
    return confusion_and_f1(li, "truth_bin", "pred_bin")
