"""Capture .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
files (guide §1: record the plan shape before and after).

Usage: python scripts/capture_plans.py <tag> <suffix> <query> [...]
e.g.   python scripts/capture_plans.py r15 before q250_margin_mining_scaled
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from auto_ml_platform_with_timeseries_data_spark import registry
    from auto_ml_platform_with_timeseries_data_spark.session import get_spark

    spark = get_spark(app_name=f"plans_{tag}")
    qs = dict(registry.queries())
    from auto_ml_platform_with_timeseries_data_spark.ml.queries import (
        automl_e2e,
    )
    qs["automl_e2e"] = automl_e2e

    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
