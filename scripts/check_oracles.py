#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Loads the driver contract module exactly as the driver does, runs every
`queries()` entry at sf0.01 alongside its `oracle_sql()` DuckDB twin, and
compares rows / schema (column names) / values after the driver's
canonicalization (columns sorted by name, rows sorted by all columns).
Queries without an oracle get a rows-only note.

Usage: python scripts/check_oracles.py [query ...]   (default: all)
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = "/root/repo"
# the driver grades at sf0.01; pointing this at sf0.1 re-proves every
# oracle at 10x the graded scale (scale-consistency of correctness)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def null_nan_profile(tbl) -> dict:
    """Per-column (n_null, n_nan) from the ARROW table — pandas folds SQL
    NULL and float NaN together in float columns (both become NaN after
    to_numeric), so a query regressing to NaN where the oracle says NULL
    would compare equal.  Arrow keeps them distinct; order-insensitive
    counts catch the swap."""
    import pyarrow as pa
    import pyarrow.compute as pc
    prof = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        n_nan = 0
        if pa.types.is_floating(col.type):
            n_nan = int(pc.sum(pc.is_nan(col.drop_null())).as_py() or 0)
        prof[name] = (int(col.null_count), n_nan)
    return prof


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xa = pd.to_numeric(x, errors="coerce").to_numpy(dtype=float)
            ya = pd.to_numeric(y, errors="coerce").to_numpy(dtype=float)
            if not np.array_equal(xa, ya, equal_nan=True):
                return False
        else:
            xa = x.astype(object).where(pd.notna(x), None)
            ya = y.astype(object).where(pd.notna(y), None)
            if not (xa.to_numpy() == ya.to_numpy()).all():
                return False
    return True


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             # the plain-builder default is 1g driver heap; at the sf0.1
             # scale-decade sweep dedup_components (~895k verified pairs
             # through the pointer-jumping rounds) OOMs there, killing the
             # session and erroring every later query.  Match the engine
             # session's sizing — this mirror grades correctness, and the
             # real driver grades at sf0.01 where 1g suffices.
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")

    qs, osql = mod.queries(), mod.oracle_sql()
    only = set(sys.argv[1:])
    unknown = only - set(qs)
    if unknown:
        # a typo must not produce a zero-query green exit
        print(f"unknown query name(s): {sorted(unknown)}; "
              f"known: {sorted(qs)}")
        sys.exit(2)
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            # one execution per side: Arrow for the NULL/NaN profile,
            # pandas (from the same Arrow table) for the value compare
            sarrow = fn(spark, SF_DIR).toArrow()
            sdf = sarrow.to_pandas()
            if name not in osql:
                print(f"{name:28s} rows={len(sdf):7d}  (no oracle)")
                continue
            oarrow = con.sql(osql[name]).arrow()
            odf = oarrow.to_pandas()
            a, b = canon(sdf), canon(odf)
            rows = len(sdf) == len(odf)
            schema = list(a.columns) == list(b.columns)
            nulls = null_nan_profile(sarrow) == null_nan_profile(oarrow)
            vals = rows and schema and nulls and values_match(a, b)
            status = "OK " if (rows and schema and vals) else "FAIL"
            print(f"{name:28s} rows={len(sdf):7d} oracle={len(odf):7d} "
                  f"rows_match={rows} schema={schema} nulls={nulls} "
                  f"values={vals} {status}")
            if status == "FAIL":
                fails.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            fails.append(name)
    print(f"\n{len(qs) if not only else len(only)} queries; fails: {fails}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
