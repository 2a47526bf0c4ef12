"""Interleaved text+media document model (BASELINE.json input_hint).

Shape: ``doc_id:string, spans:array<struct<kind:string, text:string,
media_ref:string, offset:int>>``. Spans are built deterministically from the
driver's flat ``documents`` table (3 spans: first half of the text, one
media span — image for even ids, audio for odd — then the second half), so
the DuckDB oracle can recompute every flattened statistic and the
span-sequence signature directly from the flat columns.

The per-row invariant the north rule demands — span-sequence equality
(kind, text, media_ref, order) across every stage — is enforced by
:func:`span_signature`, computed FROM the nested spans column with Spark
higher-order functions (JVM-side, no Python), and compared against the
oracle's flat-column reconstruction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: half-length of the text (SQL shared by both dialects)
HALF = "CAST(ceil(length(text) / 2.0) AS INT)"

SPANS_SQL = (
    "array("
    f"named_struct('kind', 'text', 'text', substr(text, 1, {HALF}), "
    "'media_ref', '', 'offset', 0), "
    "named_struct('kind', CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END, "
    "'text', '', 'media_ref', concat('ref://', CAST(doc_id AS STRING)), "
    f"'offset', {HALF}), "
    f"named_struct('kind', 'text', 'text', substr(text, {HALF} + 1), "
    f"'media_ref', '', 'offset', {HALF})"
    ") AS spans"
)


def with_spans(df: DataFrame) -> DataFrame:
    """Attach interleaved ``spans`` + string ``doc_uid`` to a flat docs DF."""
    return df.selectExpr(
        "*",
        "concat('doc', CAST(doc_id AS STRING)) AS doc_uid",
        SPANS_SQL,
    )


def span_signature(spans_col: str = "spans") -> Column:
    """md5 over the ordered (kind, text, media_ref) sequence — computed from
    the nested column itself via higher-order functions (whole-stage
    codegen; no UDF)."""
    parts = F.transform(
        F.col(spans_col),
        lambda s: F.concat_ws(":", s["kind"], s["text"], s["media_ref"]),
    )
    return F.md5(F.concat_ws("|", parts))


def span_signature_fast(spans_col: str = "spans") -> Column:
    """xxhash64 over the nested spans column directly — no string
    materialization, ~10x cheaper than the md5 path. Used for
    stage-to-stage invariant checks and benchmarks; the md5 variant exists
    only because the DuckDB oracle cannot compute xxhash64."""
    return F.xxhash64(F.col(spans_col))


#: oracle-side reconstruction of the same signature from flat columns.
def span_signature_sql_flat() -> str:
    half = HALF
    return (
        "md5(concat_ws('|', "
        f"concat_ws(':', 'text', substr(text, 1, {half}), ''), "
        "concat_ws(':', CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END, "
        "'', concat('ref://', CAST(doc_id AS STRING))), "
        f"concat_ws(':', 'text', substr(text, {half} + 1), '')"
        "))"
    )


def check_span_preservation(before: DataFrame, after: DataFrame) -> int:
    """Assert span-sequence equality per doc between two pipeline stages.
    Returns the number of compared docs; raises on any mismatch."""
    b = before.select(F.col("doc_uid"), span_signature_fast().alias("sig_b"))
    a = after.select(F.col("doc_uid"), span_signature_fast().alias("sig_a"))
    joined = a.join(b, "doc_uid", "inner")
    bad = joined.filter(F.col("sig_a") != F.col("sig_b")).count()
    if bad:
        raise AssertionError(f"span-sequence invariant violated for {bad} docs")
    return joined.count()
