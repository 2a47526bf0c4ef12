#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run each queries()[name]
on Spark and its oracle_sql()[name] on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (floats at small tolerance).

Usage: python scripts/check_oracles.py [name ...] [--sf DIR]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    issues = []
    if len(sdf) != len(ddf):
        issues.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
    sc, dc = sorted(sdf.columns), sorted(ddf.columns)
    if sc != dc:
        issues.append(f"columns spark={sc} duck={dc}")
        return issues
    if issues:
        return issues
    s, d = canon(sdf), canon(ddf)
    for c in s.columns:
        a, b = s[c], d[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av = a.astype("f8").to_numpy()
            bv = b.astype("f8").to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            ok = both_nan | np.isclose(av, bv, rtol=1e-9, atol=1e-12)
            if not ok.all():
                i = int(np.nonzero(~ok)[0][0])
                issues.append(f"col {c}: {av[i]!r} != {bv[i]!r} at row {i}")
        else:
            av, bv = a.astype(str).to_numpy(), b.astype(str).to_numpy()
            if not (av == bv).all():
                i = int(np.nonzero(av != bv)[0][0])
                issues.append(f"col {c}: {av[i]!r} != {bv[i]!r} at row {i}")
    return issues


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf" and i + 1 < len(argv):
            sf_dir = argv[i + 1]
            i += 1
        elif not a.startswith("--"):
            args.append(a)
        i += 1

    import __spark_entry__ as E
    from ocgis_spark.session import get_spark

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    names = args or list(qs)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)})")
            continue
        try:
            ddf = con.sql(os_[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        issues = compare(name, sdf, ddf)
        dt = time.time() - t0
        if issues:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s, {len(sdf)} rows): " + "; ".join(issues[:3]))
        else:
            print(f"PASS {name} ({dt:.1f}s, {len(sdf)} rows)")
    spark.stop()
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
