"""Task catalog — the engine's stateful API surface (SURVEY.md §2.12).

The reference drives everything through 10 Flask endpoints mutating ONE
global DataAnalysis object (app.py:17) with a global model cache
(auto_machine_learning.py:12) — concurrent tasks clobber each other.
Here every endpoint becomes a method on an immutable-by-rebind `Task`
keyed by task name; config is an explicit dataclass (the reference's
Flask session dict, app.py:85-88); models persist under the task's own
directory.

Endpoint → method map:
  POST /upload                  → Task.ingest
  GET  /display-data            → Task.preview
  GET  /pre-analyze             → Task.pre_analyze
  POST /set-supervised-options  → Task.set_supervised_options
  GET  /generate_histogram      → Task.histogram / Task.ts_lines
  GET  /generate_scatter        → Task.scatter_data / Task.acf
  GET  /generate_correlation    → Task.correlation
  POST /start_ml + /confirm_training → Task.train
  POST /upload-test-data        → Task.ingest_test
  POST /evaluate                → Task.evaluate
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import evaluation as ev
from auto_ml_platform_with_timeseries_data_spark.operators import profile as prof
from auto_ml_platform_with_timeseries_data_spark.operators import timeseries as ts


@dataclass
class TaskConfig:
    """The reference's session config (app.py:29,47,67,85-88,146)."""
    taskname: str
    label: str | None = None
    excluded_features: list[str] = field(default_factory=list)
    nan_columns: list[str] = field(default_factory=list)
    is_time_series: bool = False
    group_by: str | None = None
    order_by: str | None = None  # explicit — pandas used implicit file order
    mode: str = "regression"


class Task:
    def __init__(self, spark: SparkSession, taskname: str,
                 storage_dir: str = "task_storage"):
        self.spark = spark
        self.config = TaskConfig(taskname=taskname)
        self.storage_dir = os.path.join(storage_dir, taskname)
        self.df: DataFrame | None = None
        self.test_df: DataFrame | None = None
        self.model = None
        self.automl_result = None

    # -- ingest ------------------------------------------------------------
    def ingest(self, df_or_path) -> "Task":
        from auto_ml_platform_with_timeseries_data_spark.sources.readers import read_any

        self.df = (df_or_path if isinstance(df_or_path, DataFrame)
                   else read_any(self.spark, df_or_path))
        return self

    def ingest_test(self, df_or_path) -> "Task":
        from auto_ml_platform_with_timeseries_data_spark.sources.readers import read_any

        self.test_df = (df_or_path if isinstance(df_or_path, DataFrame)
                        else read_any(self.spark, df_or_path))
        return self

    # -- profiling ---------------------------------------------------------
    def preview(self, n: int = 5) -> DataFrame:
        return prof.head(self._req(), n)

    def pre_analyze(self) -> list[str]:
        """Drop all-NaN columns; record + return their names
        (data_analysis.py:23-28 + app.py:62-70)."""
        self.df, removed = prof.drop_all_nan_columns(self._req())
        self.config.nan_columns = removed
        return removed

    def set_supervised_options(self, label: str,
                               excluded_features: list[str] | None = None,
                               is_time_series: bool = False,
                               group_by: str | None = None,
                               order_by: str | None = None) -> "Task":
        """app.py:72-94: set config, drop excluded columns. The effective
        excluded set reported downstream is user-excluded ∪ nan-dropped
        (app.py:148)."""
        self.config.label = label
        self.config.excluded_features = list(excluded_features or [])
        self.config.is_time_series = is_time_series
        self.config.group_by = group_by
        self.config.order_by = order_by
        if excluded_features:
            self.df = prof.remove_features(self._req(), excluded_features)
        return self

    @property
    def effective_excluded(self) -> list[str]:
        return sorted(set(self.config.excluded_features) | set(self.config.nan_columns))

    def feature_columns(self) -> list[str]:
        """Column-list predicate P5: everything except label/group/order."""
        skip = {self.config.label, self.config.group_by, self.config.order_by}
        return [c for c in self._req().columns if c not in skip]

    def histogram(self, column: str, nbins: int = 10) -> DataFrame:
        return prof.histogram(self._req(), column, nbins)

    def correlation(self) -> DataFrame:
        numeric = [c for c, t in self._req().dtypes
                   if c in self.feature_columns()
                   and t in ("int", "bigint", "double", "float", "smallint")]
        return prof.corr_with_label(self._req(), numeric, self.config.label)

    def acf(self, feature: str, max_lag: int = 10) -> DataFrame:
        cfg = self.config
        return ts.acf(self._req(), cfg.group_by, cfg.order_by, feature, max_lag)

    def ts_lines(self, features: list[str]) -> DataFrame:
        """W4 per-group ordered series (the numbers behind the line plots)."""
        cfg = self.config
        return self._req().select(cfg.group_by, cfg.order_by, *features) \
            .orderBy(cfg.group_by, cfg.order_by)

    # -- training / evaluation --------------------------------------------
    def train(self, mode: str = "regression", fast: bool = True,
              persist: bool = False):
        from auto_ml_platform_with_timeseries_data_spark.ml import automl as ml

        self.config.mode = mode
        if self.config.is_time_series:
            from auto_ml_platform_with_timeseries_data_spark.ml.ts_automl import (
                ts_automl_global,
            )

            cfg = self.config
            self.automl_result = ts_automl_global(
                self._req(), cfg.group_by, cfg.order_by, cfg.label
            )
            self.model = self.automl_result.model
        else:
            numeric = [c for c, t in self._req().dtypes
                       if c in self.feature_columns()
                       and t in ("int", "bigint", "double", "float")]
            self.automl_result = ml.automl(
                self._req(), numeric, self.config.label, mode=mode, fast=fast
            )
            self.model = self.automl_result.best.model
            if persist:
                ml.save_model(self.model, self.storage_dir)
        return self.automl_result

    def evaluate(self, threshold: float | None = None) -> dict:
        """data_analysis.py:156-214: predict on test with the TRAIN-fitted
        pipeline; RMSE (+ optional threshold-binarized F1/confusion)."""
        from auto_ml_platform_with_timeseries_data_spark.ml.automl import (
            feature_importances,
        )

        if self.test_df is None or self.model is None:
            raise ValueError("need ingest_test() and train() first")
        label = self.config.label
        pred = self.model.transform(self.test_df)
        out = {"rmse": ev.rmse(pred, label, "prediction")}
        numeric = [c for c, t in self.test_df.dtypes
                   if c in self.feature_columns() and t in ("int", "bigint", "double", "float")]
        try:
            out["importances"] = feature_importances(self.model, numeric)
        except ValueError:
            pass
        if threshold is not None:
            threshold = float(threshold)  # app.py:197-201 scalar cast
            binned = pred.select(
                ev.binarize(label, threshold).alias("truth_bin"),
                ev.binarize("prediction", threshold).alias("pred_bin"),
            )
            out["f1_confusion"] = ev.confusion_and_f1(binned, "truth_bin", "pred_bin")
            out["confusion_matrix"] = ev.confusion_matrix_pivot(
                binned, "truth_bin", "pred_bin"
            )
        return out

    def _req(self) -> DataFrame:
        if self.df is None:
            raise ValueError("no data ingested")
        return self.df
