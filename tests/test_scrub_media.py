"""Span-preserving PII scrub + media blob reference counting (spans.py)."""

from pyspark.sql import functions as F

from ocgis_spark import spans as SP


def _docs(spark, texts):
    return SP.with_spans(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
    )


def test_scrub_redacts_text_spans_only(spark):
    # PII long enough that both halves carry some: an email in the first
    # half, an SSN + phone in the second
    text = (
        "reach alice.smith@example.com for access codes today "
        "records show ssn 123-45-6789 and phone 555-0142 on file"
    )
    out = SP.scrub_spans(_docs(spark, [text]))
    spans = out.select("spans").collect()[0]["spans"]
    assert [s["kind"] for s in spans] == ["text", "image", "text"]
    joined = spans[0]["text"] + spans[2]["text"]
    assert "[EMAIL]" in joined
    assert "[SSN]" in joined
    assert "[PHONE]" in joined
    assert "alice.smith@example.com" not in joined
    assert "123-45-6789" not in joined
    assert "555-0142" not in joined
    # media span byte-identical, offsets preserved
    orig = _docs(spark, [text]).select("spans").collect()[0]["spans"]
    assert spans[1] == orig[1]
    assert [s["offset"] for s in spans] == [s["offset"] for s in orig]


def test_scrub_preserves_clean_docs_exactly(spark):
    texts = ["plain words with no contact info at all", "another clean doc"]
    before = _docs(spark, texts)
    after = SP.scrub_spans(before)
    # full span-sequence invariant on PII-free docs
    assert SP.check_span_preservation(before, after) == 2


def test_scrub_plan_is_pure_codegen(spark):
    plan = (
        SP.scrub_spans(_docs(spark, ["x"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_media_ref_stats_default_key_unique_refs(spark):
    df = _docs(spark, [f"doc number {i}" for i in range(6)])
    rows = {r["blob_key"]: r for r in SP.media_ref_stats(df).collect()}
    assert len(rows) == 6  # ref://<doc_id> is unique per doc
    for i in range(6):
        r = rows[f"ref://{i}"]
        assert (r["n_spans"], r["n_docs"], r["n_kinds"]) == (1, 1, 1)
        assert r["canonical_doc"] == i


def test_media_ref_stats_content_collisions(spark):
    df = _docs(spark, [f"doc number {i}" for i in range(10)])
    key = F.concat(F.lit("b"), (F.col("doc_id") % 3).cast("string"))
    rows = {
        r["blob_key"]: r
        for r in SP.media_ref_stats(df, content_key=key).collect()
    }
    # residues mod 3 over 0..9: b0 -> {0,3,6,9}, b1 -> {1,4,7}, b2 -> {2,5,8}
    assert rows["b0"]["n_docs"] == 4 and rows["b0"]["canonical_doc"] == 0
    assert rows["b1"]["n_docs"] == 3 and rows["b1"]["canonical_doc"] == 1
    assert rows["b2"]["n_docs"] == 3 and rows["b2"]["canonical_doc"] == 2
    # even docs are image spans, odd audio: every residue class mixes both
    assert all(r["n_kinds"] == 2 for r in rows.values())
