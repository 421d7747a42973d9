"""Local stand-in for the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle, canonicalize (sort rows by all
columns, round doubles), and compare row counts + values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out.columns = [str(c) for c in out.columns]
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(9)
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None else None)
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_pdf) != len(duck_pdf):
        return False, f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}"
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return False, f"columns spark={list(a.columns)} duck={list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = np.allclose(av.astype(float).fillna(np.nan),
                             bv.astype(float).fillna(np.nan),
                             rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = av.fillna("<NULL>").astype(str).equals(bv.fillna("<NULL>").astype(str))
        if not ok:
            diff = None
            try:
                mism = (av.astype(str) != bv.astype(str))
                idx = mism[mism].index[:3].tolist()
                diff = [(i, av[i], bv[i]) for i in idx]
            except Exception:
                pass
            return False, f"values differ in column {c}: {diff}"
    return True, "ok"


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--hostile"]
    hostile = "--hostile" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from auto_ml_platform_with_timeseries_data_spark import registry

    if hostile:
        # Simulate the correctness driver's session: vanilla confs,
        # non-UTC timezone, default 200 shuffle partitions — the engine's
        # tune() must repair everything it depends on at load_table time.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("check-oracle-hostile")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from auto_ml_platform_with_timeseries_data_spark.session import get_spark

        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = registry.queries(), registry.oracles()
    n_pass = n_fail = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(spark_pdf)} rows (rows-only, "
                  f"{time.time()-t0:.1f}s)")
            n_pass += 1 if len(spark_pdf) >= 0 else 0
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spark_pdf, duck_pdf)
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name}: {msg} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
