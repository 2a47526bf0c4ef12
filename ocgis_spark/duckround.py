"""Spark-side emulation of DuckDB's float ``round(x, d)``.

DuckDB rounds a DOUBLE by multiply-round-divide in doubles
(``floor(x * 10^d + 0.5) / 10^d``, sign-mirrored), which is LOSSY once
``|x| * 10^d`` exceeds 2^53 — the product snaps to the nearest
representable integer before the divide, so the result can differ from
the true decimal rounding by an ulp. Spark's ``round`` goes through
BigDecimal on the exact binary value and is decimal-exact at every
magnitude. Both also differ on the sign of a rounded-to-zero negative
(DuckDB keeps −0.0, Spark normalizes).

Where an oracle compares ``round(big_value, d)`` by exact hash, the
Spark side must reproduce DuckDB's arithmetic, not improve on it. The
emulation below — Spark's exact integer-round applied to the
double-precision product, then the same divide, with the signed zero
restored — matched DuckDB 1.0 bit-for-bit on 5009 random doubles
spanning 1e-8..1e14 plus tie/zero edge cases (r6 validation; inputs
shipped via Arrow so no literal-parsing ulp could contaminate the
comparison). It is equal to Spark's own ``round(x, d)`` whenever
``|x| * 10^d < 2^53`` and x does not round to a negative zero.
"""

from __future__ import annotations


def duck_round_sql(expr: str, d: int = 6) -> str:
    """SQL string computing DuckDB's ``round({expr}, d)`` bit-exactly
    on the Spark side. ``expr`` is parenthesized; NULL propagates; a
    negative input rounding to zero yields −0.0 as DuckDB does (the
    string-form test catches a literal −0.0 input — Spark's 1/0.0 is
    NULL under ANSI-off, so the division sign-probe is unusable)."""
    p = f"1.0E{int(d)}"
    mrd = f"(round(({expr}) * {p}, 0) / {p})"
    return (
        f"CASE WHEN {mrd} = 0.0E0 AND (({expr}) < 0.0E0 "
        f"OR CAST(({expr}) AS STRING) = '-0.0') "
        f"THEN CAST('-0.0' AS DOUBLE) ELSE {mrd} END"
    )
