"""Finer decomposition: per iteration, time build (fn call), count
(the bench's timed action), and noop write, separately, 3 rounds.

Usage: python scripts/isolate2.py <query> [query ...]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from auto_ml_platform_with_timeseries_data_spark import registry
    from auto_ml_platform_with_timeseries_data_spark.session import get_spark

    spark = get_spark(app_name="isolate2")
    qs = dict(registry.queries())
    qs["q27_revenue_by_nation"](spark, sf_dir).count()

    for name in names:
        fn = qs[name]
        for i in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            t0 = time.time()
            df.count()
            t_count = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_noop = time.time() - t0
            spark.catalog.clearCache()
            gc.collect()
            print(f"{name:40s} it{i} build={t_build:7.2f} "
                  f"count={t_count:7.2f} noop={t_noop:7.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
