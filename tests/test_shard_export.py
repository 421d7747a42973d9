from __future__ import annotations

import glob
import os
import shutil
import tempfile


def test_export_jsonl_shards_cap_and_roundtrip(spark):
    from auto_ml_platform_with_timeseries_data_spark.sources.readers import (
        export_jsonl_shards,
    )

    df = spark.range(0, 1000).selectExpr(
        "id", "concat('doc-', id) AS text", "id % 3 AS lang"
    )
    dest = tempfile.mkdtemp(prefix="shard_export_test_")
    try:
        export_jsonl_shards(df, dest, max_records_per_file=128,
                            target_files=4)
        back = spark.read.schema(df.schema).json(dest)
        assert back.count() == 1000
        assert set(r["id"] for r in back.collect()) == set(range(1000))
        for part in glob.glob(os.path.join(dest, "part-*")):
            with open(part) as fh:
                n = sum(1 for _ in fh)
            assert n <= 128, f"{part} has {n} rows > cap"
    finally:
        shutil.rmtree(dest, ignore_errors=True)
