#!/usr/bin/env python
"""Driver-strict local gate (VERDICT r5 ask #2, scoped to what the
optimization round may touch): run queries()[name] on Spark and
oracle_sql()[name] on DuckDB at sf0.01 and compare EXACT float bytes —
including the sign bit of zero and NaN positions — the way the driver's
hash does, which `check_oracles.py`'s np.isclose gate is structurally
blind to (the r5 lisa_bivariate/seasonal_decompose reds).

DuckDB runs with SET threads=1 so oracle-side thread nondeterminism
(seasonal_decompose's raw-double avg) is pinned; a query that is strict-
green here but oracle-nondeterministic at higher thread counts is still
a driver coin flip — the sweep output marks those separately when
--threads is varied.

Usage: python scripts/check_strict.py [name ...] [--threads N]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def canon(df):
    df = df[sorted(df.columns)].copy()
    # value sort (not bit sort): -0.0 and +0.0 tie, so the two engines
    # keep identical row order and the bit compare below sees aligned rows
    keys = list(df.columns)
    if len(df):
        df = df.sort_values(keys, kind="mergesort").reset_index(drop=True)
    return df


def strict_diff(sdf, ddf) -> list[str]:
    issues = []
    if len(sdf) != len(ddf):
        return [f"rowcount spark={len(sdf)} duck={len(ddf)}"]
    if sorted(sdf.columns) != sorted(ddf.columns):
        return [f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"]
    s, d = canon(sdf), canon(ddf)
    for c in s.columns:
        a, b = s[c], d[c]
        fa = str(a.dtype).startswith("float") or str(b.dtype).startswith("float")
        if fa:
            av = a.astype("f8").to_numpy()
            bv = b.astype("f8").to_numpy()
            if av.tobytes() != bv.tobytes():
                neq = av.view("u8") != bv.view("u8")
                i = int(np.nonzero(neq)[0][0])
                issues.append(
                    f"col {c}: {av[i]!r} (bits {av.view('u8')[i]:#x}) != "
                    f"{bv[i]!r} (bits {bv.view('u8')[i]:#x}) at row {i} "
                    f"({int(neq.sum())} rows)"
                )
        else:
            av = a.astype(str).to_numpy()
            bv = b.astype(str).to_numpy()
            if not (av == bv).all():
                i = int(np.nonzero(av != bv)[0][0])
                issues.append(f"col {c}: {av[i]!r} != {bv[i]!r} at row {i}")
    return issues


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--threads", type=int, default=1)
    args = ap.parse_args()

    import __spark_entry__ as E
    from ocgis_spark.session import get_spark

    qs, os_ = E.queries(), E.oracle_sql()
    names = args.names or sorted(qs)
    spark = get_spark("check_strict", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads={args.threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    n_pass = 0
    fails = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            ddf = con.sql(os_[name]).df()
            issues = strict_diff(sdf, ddf)
        except Exception as e:  # noqa: BLE001
            issues = [f"error: {e}"[:300]]
        if issues:
            fails.append(name)
            print(f"STRICT-FAIL {name}: {'; '.join(issues)[:400]}", flush=True)
        else:
            n_pass += 1
            print(f"PASS {name}", flush=True)
    print(f"\n{n_pass}/{len(names)} strict-green; fails: {fails}")
    spark.stop()


if __name__ == "__main__":
    main()
