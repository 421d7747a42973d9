"""Warm build-time sweep: measure the 2nd DataFrame-construction time
(pure driver/py4j cost, no execution) for each named query or, with
--top, every bench HEADLINE query. Identifies driver-build-bound rows.

Usage: python scripts/build_sweep.py [query ...]
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

    spark = get_spark(app_name="build_sweep")
    qs = dict(registry.queries())
    if not names:
        import bench
        names = [n for n in bench.HEADLINE if n in qs]
    qs["q27_revenue_by_nation"](spark, sf_dir).count()

    rows = []
    for name in names:
        fn = qs[name]
        try:
            fn(spark, sf_dir)  # cold build (analyzer JIT etc.)
            t0 = time.time()
            fn(spark, sf_dir)
            rows.append((time.time() - t0, name))
        except Exception as e:  # noqa: BLE001
            rows.append((-1.0, f"{name} ERR {type(e).__name__}"))
        spark.catalog.clearCache()
        gc.collect()
    for t, name in sorted(rows, reverse=True):
        print(f"{t:7.2f}  {name}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
