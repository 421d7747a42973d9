"""Per-query cost decomposition (guide §1.1/§1.4): for each named query,
time (a) DataFrame construction (analysis), (b) explain("formatted")
(optimization + physical planning — pure driver), and (c) two noop-sink
executions (cold codegen + warm steady state). Separates driver-side
plan cost, which is a constant at any data size, from executor work.

Usage: python scripts/isolate.py q343_best_forecast_family [q309...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from auto_ml_platform_with_timeseries_data_spark import registry
    from auto_ml_platform_with_timeseries_data_spark.session import get_spark

    spark = get_spark(app_name="isolate")
    qs = dict(registry.queries())
    # warm the session the same way bench.py does
    qs["q27_revenue_by_nation"](spark, sf_dir).count()

    print(f"{'query':40s} {'build':>7s} {'explain':>8s} {'exec1':>7s} "
          f"{'exec2':>7s}")
    for name in names:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        t_explain = time.time() - t0
        del plan
        execs = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        import gc
        gc.collect()
        print(f"{name:40s} {t_build:7.2f} {t_explain:8.2f} "
              f"{execs[0]:7.2f} {execs[1]:7.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
