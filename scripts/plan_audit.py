"""Plan-shape audit over every registered query (guide §1.2 / §7.2):
for each query, count (a) parquet Scan nodes per source file — a source
mentioned N>1 times means the subtree re-reads it N times unless an
InMemoryRelation sits between — (b) Exchange mentions, (c) Python
boundary nodes, (d) SortMergeJoin / CartesianProduct mentions.  Explain
only — nothing is executed.

Usage: python scripts/plan_audit.py [sf_dir] > /tmp/plan_audit.tsv
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from auto_ml_platform_with_timeseries_data_spark import registry
    from auto_ml_platform_with_timeseries_data_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    qs = dict(registry.queries())

    print("query\tscans\tdup_scans\tmax_same_src\texchange\tsmj\tpy\tcartesian\tinmem")
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERR\t{type(e).__name__}")
            continue
        srcs = re.findall(r"Location:.*?\[([^\]]+)\]", plan)
        srcs = [s.rsplit("/", 1)[-1] for s in srcs]
        per = {}
        for s in srcs:
            per[s] = per.get(s, 0) + 1
        dup = sum(c - 1 for c in per.values() if c > 1)
        mx = max(per.values()) if per else 0
        print("\t".join(str(x) for x in (
            name, len(srcs), dup, mx,
            plan.count("Exchange"),
            plan.count("SortMergeJoin"),
            plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas") + plan.count("MapInArrow")
            + plan.count("FlatMapGroupsInPandas"),
            plan.count("CartesianProduct"),
            plan.count("InMemoryRelation"),
        )))
        # free any persisted frames a builder created
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
