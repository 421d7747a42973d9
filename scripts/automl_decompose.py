"""Decompose automl_e2e wall time into phases (guide §1: measure first).

Times ingest/pre_analyze/train/evaluate separately, and within train
each family, on the same session/bench methodology. Optionally sweeps
a repartition factor for the cached train frame.

Usage: python scripts/automl_decompose.py [npart ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from auto_ml_platform_with_timeseries_data_spark.session import get_spark
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table
    from auto_ml_platform_with_timeseries_data_spark.catalog import Task
    from auto_ml_platform_with_timeseries_data_spark.staging import staging_dir
    from pyspark.sql import functions as F

    spark = get_spark(app_name="automl_decompose")

    def run_once(tag: str, npart: int = 0) -> None:
        t_all = time.time()
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_quantity", "l_discount", "l_tax", "l_extendedprice",
            (F.crc32(F.concat_ws("|", "l_orderkey", "l_linenumber")) % 5)
            .alias("__fold"))
        if npart:
            li = li.repartition(npart)
        train = li.filter(F.col("__fold") != 0).drop("__fold")
        test = li.filter(F.col("__fold") == 0).drop("__fold")
        print(f"[{tag}] train input partitions:",
              train.rdd.getNumPartitions(), flush=True)
        task = Task(spark, "decompose", storage_dir=staging_dir("dec"))
        t0 = time.time()
        task.ingest(train).ingest_test(test)
        task.pre_analyze()
        task.set_supervised_options(label="l_extendedprice")
        t1 = time.time()
        task.train(mode="regression", fast=True)
        t2 = time.time()
        task.evaluate()["rmse"].count()
        t3 = time.time()
        print(f"[{tag}] pre={t1-t0:.2f}s train={t2-t1:.2f}s "
              f"eval={t3-t2:.2f}s total={t3-t_all:.2f}s", flush=True)

    # warm
    load_table(spark, sf_dir, "lineitem").count()
    nparts = [int(a) for a in sys.argv[1:]] or [0, 0, 0]
    for i, npart in enumerate(nparts):
        run_once(f"run{i}_npart{npart or 'asis'}", npart)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
