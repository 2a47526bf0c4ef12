#!/usr/bin/env python
"""Two-tier truth policy gate (VERDICT r4 ask #6, the eb_moran lesson).

A registry entry whose DuckDB oracle is the SAME dialect-neutral SQL
string the Spark side executes proves cross-engine execution parity,
not semantic correctness — a shared formula bug passes parity. Policy:
every such entry MUST also have an independent (non-parity) pytest
truth: a test that exercises the underlying operator against NumPy /
crafted fixtures / closed-form expectations.

Detection is dynamic, not declarative: each ``queries()`` entry is
CONSTRUCTED (lazily — nothing executes) against sf0.001 with
``SparkSession.sql`` instrumented; an entry is classified shared-SQL
when a recorded engine-side string shares the oracle's CTE STRUCTURE
(>= 2 CTEs and Jaccard similarity of CTE-name sets >= 0.6 — raw-string
similarity false-positives on the common fixture derivations, while
CTE names fingerprint the generated pipeline itself). For each shared
entry the operator symbol is read from the ``operators/<file>.py
<name>`` docstring convention and looked up in ``tests/*.py`` source;
entries whose symbol never appears in a test fail the gate.

Usage: python scripts/check_two_tier.py   (exit 1 on violations)
"""

from __future__ import annotations


import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JACCARD_THRESHOLD = 0.6
SF_DIR = "/root/testdata/sf0.001"


def _cte_names(sql: str) -> frozenset[str]:
    """CTE names of a WITH chain (incl. DuckDB's AS MATERIALIZED and
    column-aliased ``name(cols) AS (``)."""
    return frozenset(
        m.group(1).lower()
        for m in re.finditer(
            r"(?:WITH|,)\s*(\w+)\s*(?:\([\w\s,]*\))?\s+AS"
            r"(?:\s+MATERIALIZED)?\s*\(",
            sql,
            re.I,
        )
    )

#: shared-SQL entries whose truth lives under a different symbol than
#: the docstring convention exposes, with the justifying test
ALLOWLIST: dict[str, str] = {}


def main() -> None:
    import __spark_entry__ as entry
    from ocgis_spark.session import get_spark

    spark = get_spark("two_tier_gate", cpus=2)
    spark.sparkContext.setLogLevel("ERROR")

    qs, oq = entry.queries(), entry.oracle_sql()
    tests_src = "\n".join(
        open(p).read() for p in glob.glob("tests/*.py")
    )

    recorded: list[str] = []
    real_sql = type(spark).sql

    def spy_sql(self, sqlQuery, *a, **kw):
        if isinstance(sqlQuery, str):
            recorded.append(sqlQuery)
        return real_sql(self, sqlQuery, *a, **kw)

    type(spark).sql = spy_sql
    shared, errors, missing = [], [], []
    try:
        for name, q in qs.items():
            oracle = oq.get(name)
            if not oracle:
                continue
            recorded.clear()
            try:
                q(spark, SF_DIR)
            except Exception as exc:  # construction must not fail
                errors.append((name, repr(exc)))
                continue
            oc = _cte_names(oracle)
            hit = False
            for s in recorded:
                sc = _cte_names(s)
                if len(sc) < 2 or not oc:
                    continue
                jac = len(sc & oc) / len(sc | oc)
                if jac >= JACCARD_THRESHOLD:
                    hit = True
                    break
            if hit:
                shared.append(name)
    finally:
        type(spark).sql = real_sql

    for name in shared:
        if name in ALLOWLIST:
            continue
        doc = qs[name].__doc__ or ""
        m = re.search(r"operators/\w+\.py\s+(\w+)", doc)
        sym = m.group(1) if m else None
        if sym is None or not re.search(rf"\b{re.escape(sym)}\b", tests_src):
            missing.append((name, sym))

    print(f"registry: {len(qs)}; shared-SQL entries: {len(shared)}")
    if errors:
        print(f"CONSTRUCTION ERRORS ({len(errors)}):")
        for n, e in errors:
            print(f"  {n}: {e}")
    if missing:
        print(f"SHARED-SQL WITHOUT INDEPENDENT TRUTH ({len(missing)}):")
        for n, s in missing:
            print(f"  {n} (operator symbol: {s})")
    else:
        print("two-tier policy: OK (every shared-SQL entry has an "
              "independent pytest truth)")
    sys.exit(1 if (missing or errors) else 0)


if __name__ == "__main__":
    main()
