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


def chunk_spans(
    df: DataFrame, max_tokens: int = 32, media_token_cost: int = 64,
    spans: str = "spans",
) -> DataFrame:
    """Split each doc's interleaved span sequence into token-budget
    chunks — the context-window splitter of a training pipeline, over
    the BASELINE input shape (the interleaved counterpart of
    ``operators.text.chunk_documents``, which chunks FLAT text with
    token overlap; this one must keep media spans whole and the
    text/media order intact). Spans are ATOMIC (never split mid-span;
    a media blob or a text run is indivisible) and ORDER-PRESERVING:
    reading the output back in (doc_id, chunk_id, pos) order reproduces
    the original span sequence exactly (the north-rule per-row
    invariant, pytest-asserted via :func:`span_signature`).

    Chunking contract (the fixed-boundary streaming-chunker form, which
    is a pure prefix-sum — no sequential per-doc state, so it stays one
    window pass at 100 TB): a span belongs to the boundary interval
    ``floor(exclusive_prefix_tokens / max_tokens)`` — i.e. the chunk
    where it STARTS; a straddling span overruns its chunk rather than
    splitting. Boundary indices are then renumbered densely per doc so
    chunk_ids are contiguous (a span longer than ``max_tokens`` would
    otherwise skip indices). Text spans cost their non-empty whitespace
    token count; media spans cost ``media_token_cost`` (the fixed
    patch/frame token budget multimodal LMs charge).

    Plan: posexplode → two same-key windows (prefix sum, dense rank)
    → narrow maps: ONE exchange on doc_id. Returns one row per span:
    (doc_id, chunk_id, pos, kind, span_text, media_ref, span_offset,
    span_tokens)."""
    from pyspark.sql import Window

    ex = df.select("doc_id", F.posexplode(spans).alias("pos", "s"))
    # greatest(size, 0): a text span with NULL text has size(null) = -1
    # with ANSI off, which would DECREASE the prefix sum and corrupt every
    # later chunk boundary in the doc (r4 review finding)
    cost = F.when(
        F.col("s.kind") == "text",
        F.greatest(
            F.size(F.filter(F.split(F.col("s.text"), " "), lambda t: t != "")),
            F.lit(0),
        ),
    ).otherwise(F.lit(media_token_cost)).cast("bigint")
    ex = ex.withColumn("span_tokens", cost)
    wsum = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ex = ex.withColumn(
        "boundary",
        F.floor(
            F.coalesce(F.sum("span_tokens").over(wsum), F.lit(0))
            / F.lit(max_tokens)
        ).cast("int"),
    )
    wrank = Window.partitionBy("doc_id").orderBy("boundary")
    return ex.select(
        "doc_id",
        (F.dense_rank().over(wrank) - 1).cast("int").alias("chunk_id"),
        F.col("pos").cast("int").alias("pos"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("span_text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").cast("int").alias("span_offset"),
        "span_tokens",
    )


def chunk_spans_packed(
    df: DataFrame, max_tokens: int = 32, media_token_cost: int = 64,
    spans: str = "spans",
) -> DataFrame:
    """:func:`chunk_spans` re-packed to one row per chunk with the spans
    array rebuilt in order (posexplode + array_sort(struct) — never
    collect_list order, per repo convention) and the chunk token total.
    Schema: (doc_id, chunk_id, spans, n_tokens) — the training-sequence
    shape downstream packers consume."""
    flat = chunk_spans(df, max_tokens, media_token_cost, spans)
    packed = flat.groupBy("doc_id", "chunk_id").agg(
        F.array_sort(
            F.collect_list(F.struct(
                "pos", "kind",
                F.col("span_text").alias("text"),
                "media_ref",
                F.col("span_offset").alias("offset"),
            ))
        ).alias("_sp"),
        F.sum("span_tokens").alias("n_tokens"),
    )
    return packed.select(
        "doc_id", "chunk_id",
        F.transform(
            F.col("_sp"),
            lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
        "n_tokens",
    )


def chunk_spans_sql_flat(
    max_tokens: int = 32, media_token_cost: int = 64,
    table: str = "documents",
) -> str:
    """DuckDB oracle twin of :func:`chunk_spans`, deriving the 3-span
    interleaved sequence from the flat table (same construction as
    SPANS_SQL) and applying the identical prefix-sum boundary rule."""
    half = HALF
    return (
        f"WITH sp AS ("
        f"SELECT doc_id, 0 AS pos, 'text' AS kind, "
        f"substr(text, 1, {half}) AS span_text, '' AS media_ref, "
        f"0 AS span_offset FROM {table} "
        f"UNION ALL SELECT doc_id, 1, "
        f"CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END, '', "
        f"concat('ref://', CAST(doc_id AS STRING)), {half} FROM {table} "
        f"UNION ALL SELECT doc_id, 2, 'text', substr(text, {half} + 1), "
        f"'', {half} FROM {table}), "
        f"tok AS (SELECT *, CAST(CASE WHEN kind = 'text' THEN "
        f"len(list_filter(string_split(span_text, ' '), x -> x <> '')) "
        f"ELSE {media_token_cost} END AS BIGINT) AS span_tokens FROM sp), "
        f"cum AS (SELECT *, CAST(floor(coalesce(sum(span_tokens) OVER ("
        f"PARTITION BY doc_id ORDER BY pos "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"/ {max_tokens}) AS INT) AS boundary FROM tok) "
        f"SELECT doc_id, CAST(dense_rank() OVER (PARTITION BY doc_id "
        f"ORDER BY boundary) - 1 AS INT) AS chunk_id, "
        f"CAST(pos AS INT) AS pos, kind, span_text, media_ref, "
        f"CAST(span_offset AS INT) AS span_offset, span_tokens FROM cum"
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


def scrub_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Span-preserving PII scrub over interleaved documents: redact
    SSN -> email -> phone (the text.pii_scan chain, same order so the
    same non-double-counting guarantees hold) inside TEXT spans only.
    Media spans stay byte-identical and the span count, order, kinds,
    media_refs, and offsets are untouched — the north-rule span-sequence
    invariant holds modulo the redaction itself.

    100-TB posture: one narrow projection, 0 exchanges, 0 Python
    (plan-asserted in tests/test_scrub_media.py). `F.transform` is an
    interpreted HOF but doc-bounded (3 spans/doc); the regex passes
    dominate its per-element overhead."""
    from ocgis_spark.operators.text import (
        PII_EMAIL_RE, PII_PHONE_RE, PII_SSN_RE,
    )

    def scrub(s):
        red = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(s["text"], PII_SSN_RE, "[SSN]"),
                PII_EMAIL_RE, "[EMAIL]",
            ),
            PII_PHONE_RE, "[PHONE]",
        )
        return F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "text", red)
            .otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        )

    return df.withColumn(spans_col, F.transform(F.col(spans_col), scrub))


def media_ref_stats(
    df: DataFrame,
    spans_col: str = "spans",
    content_key: Column | None = None,
) -> DataFrame:
    """Media blob reference counting — the storage-dedup manifest for an
    interleaved corpus (dedupe identical media blobs across documents,
    keep one canonical copy). One row per blob:
    ``(blob_key, n_spans, n_docs, n_kinds, canonical_doc)`` with
    ``canonical_doc = min(doc_id)`` ("first doc wins", the same keeper
    rule as URL/text dedup).

    ``content_key`` is the blob's CONTENT identity — at production scale
    a content hash of the binary column; defaults to the span's
    ``media_ref``. It may reference the exploded span as ``s`` and any
    document column (e.g. ``doc_id``).

    100-TB posture: one narrow explode + ONE hash aggregation with
    map-side partials; the two count-distincts expand the agg input 2x
    but stay bounded by the media-span count (text spans are filtered
    before the shuffle). Span position is irrelevant to the manifest —
    plain explode, no position column."""
    s = df.select("doc_id", F.explode(spans_col).alias("s"))
    media = s.filter(F.col("s.media_ref") != "")
    key = content_key if content_key is not None else F.col("s.media_ref")
    return (
        media.select(
            F.col("doc_id"),
            key.alias("blob_key"),
            F.col("s.kind").alias("kind"),
        )
        .groupBy("blob_key")
        .agg(
            F.count("*").alias("n_spans"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("kind").alias("n_kinds"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )
