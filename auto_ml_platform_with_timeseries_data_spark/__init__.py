"""auto_ml_platform_with_timeseries_data_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``freezonex/auto-ML-platform-with-timeseries-data`` (a
single-node Flask + pandas + sklearn AutoML app for tabular and grouped
time-series data), extended with the operators a large-scale (100 TB)
training-data pipeline needs: deduplication, similarity search,
multimodal columns, and text analysis.

Design principles (see SURVEY.md):

- DataFrame/SQL first: every operator is a lazy Catalyst plan; no eager
  pandas in the hot path, no ``collect()`` inside operators.
- Declarative semantics: the reference's implicit file-order contracts
  become explicit ordering columns (``Window.partitionBy(g).orderBy(ts)``).
- Scale-aware physical choices: broadcast tiny dims, partial aggregation,
  one-pass multi-lag windows, AQE on, Arrow for every pandas boundary.
- UDFs only where built-ins genuinely cannot express the semantics, and
  then always Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas).
"""

from auto_ml_platform_with_timeseries_data_spark.session import get_spark  # noqa: F401
from auto_ml_platform_with_timeseries_data_spark.catalog import TaskConfig, Task  # noqa: F401

__version__ = "0.1.0"
