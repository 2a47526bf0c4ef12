"""Pandas-oracle properties for the pipeline ops (sessionize, chunking)."""

import datetime as dt

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from ocgis_spark.operators import text as textops


def test_sessionize_matches_pandas(spark):
    """Random gaps: Spark sessionization == pandas cumsum-of-breaks."""
    rng = np.random.default_rng(42)
    rows = []
    t = dt.datetime(2024, 1, 1)
    for i in range(500):
        t += dt.timedelta(seconds=int(rng.integers(10, 5000)))
        rows.append((i, t, int(rng.integers(0, 5))))
    df = spark.createDataFrame(rows, "event_id int, ts timestamp, user_id int")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    sess = df.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = {
        (r.user_id, r.event_id): r.session_id for r in sess.collect()
    }

    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    expect = {}
    for uid, grp in pdf.groupby("user_id"):
        gaps = grp["ts"].diff().dt.total_seconds()
        breaks = (gaps.isna() | (gaps > 1800)).astype(int)
        sids = breaks.cumsum()
        for eid, sid in zip(grp["event_id"], sids):
            expect[(uid, eid)] = sid
    assert got == expect


def test_chunking_covers_every_token(spark):
    """Chunk union covers all tokens; consecutive chunks overlap by
    size - stride tokens; token totals are consistent."""
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(100))),
         (1, " ".join(f"u{i}" for i in range(7))),
         (2, "single")],
        "doc_id bigint, text string",
    )
    out = textops.chunk_documents(df, size=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
    # doc 0: 100 tokens -> ceil((100-32)/24)+1 = 4 chunks
    assert len(by_doc[0]) == 4
    seen = set()
    for cid, toks in sorted(by_doc[0].items()):
        if cid > 0:
            prev = by_doc[0][cid - 1]
            assert prev[-8:] == toks[:8]  # overlap = 32 - 24
        seen.update(toks)
    assert seen == {f"t{i}" for i in range(100)}
    # short docs: one chunk, whole text
    assert by_doc[1] == {0: [f"u{i}" for i in range(7)]}
    assert by_doc[2] == {0: ["single"]}


def test_tfidf_top_terms_golden(spark):
    """TF-IDF keyword extraction: the distinctive term of each doc wins;
    the term shared by every doc gets the idf floor."""
    import math as _m

    import pytest
    from ocgis_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "apple apple common"), (2, "banana common"),
         (3, "cherry cherry cherry common")],
        "doc_id int, text string",
    )
    out = {(r["doc_id"], r["rank"]): (r["w"], r["tfidf"])
           for r in T.tfidf_top_terms(docs, top_k=2).collect()}
    assert out[(1, 1)][0] == "apple"
    assert out[(2, 1)][0] == "banana"
    assert out[(3, 1)][0] == "cherry"
    # smoothed idf: unique term ln(4/2)+1; shared term ln(4/4)+1 = 1
    assert out[(1, 1)][1] == pytest.approx(
        round(2 * (_m.log(4 / 2) + 1), 6))
    assert out[(1, 2)] == ("common", 1.0)


def test_paragraph_dedup_boilerplate_semantics(spark):
    """C4-style corpus-frequency paragraph removal: every occurrence of a
    frequent paragraph is dropped, unique paragraphs survive in original
    order, all-boilerplate docs vanish, and counts add up (r4s10)."""
    from pyspark.sql import functions as F

    from ocgis_spark.operators import text as T

    rows = [
        (1, "alpha one\nSUBSCRIBE\nbody of one"),
        (2, "beta two\nSUBSCRIBE\nCOOKIES"),
        (3, "SUBSCRIBE\nCOOKIES"),          # all boilerplate -> dropped
        (4, "gamma four\nCOOKIES\ndelta four"),
        (5, "SUBSCRIBE\nepsilon five"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = T.paragraph_dedup(df, min_repeat=3).orderBy("doc_id")
    got = {r.doc_id: (r.text, r.n_kept, r.n_dropped) for r in out.collect()}
    # SUBSCRIBE x4 and COOKIES x3 cross the threshold; nothing else does
    assert got == {
        1: ("alpha one\nbody of one", 2, 1),
        2: ("beta two", 1, 2),
        4: ("gamma four\ndelta four", 2, 1),
        5: ("epsilon five", 1, 1),
    }

    plan = (
        T.paragraph_dedup(df, min_repeat=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # shuffle budget: frequency agg + per-doc rebuild (the tag join is a
    # broadcast); no Python anywhere
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_substr_rewrite_semantics(spark):
    """Lee et al. 2022 §4.2 rewrite: every position covered by a
    corpus-duplicated 8-word window is cut from ALL copies (within-doc
    repeats included); unique and short docs round-trip exactly,
    including consecutive-space word boundaries."""
    from ocgis_spark.operators.text import exact_substr_rewrite

    dup = "a b c d e f g h"  # the shared 8-word window
    rows = [
        (1, f"intro one {dup} tail1"),
        (2, f"other prelude {dup} tail2 extra"),
        (3, "completely unique words that never repeat anywhere at all"),
        (4, f"{dup} {dup}"),        # within-doc repetition -> fully cut
        (5, "short doc"),           # < n words: no window, round-trips
        (6, "x  y z q r s t u v"),  # double space -> empty word kept
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in exact_substr_rewrite(df, n=8).collect()}

    assert got[1].text_dedup == "intro one tail1"
    assert (got[1].n_words, got[1].n_kept) == (11, 3)
    assert got[2].text_dedup == "other prelude tail2 extra"
    assert got[3].text_dedup == rows[2][1]          # untouched
    assert got[4].text_dedup == "" and got[4].n_kept == 0
    assert got[5].text_dedup == "short doc" and got[5].n_kept == 2
    assert got[6].text_dedup == rows[5][1]          # split/join round-trip

    # structural invariants on every row
    for r in got.values():
        assert 0 <= r.n_kept <= r.n_words
        words = r.text_dedup.split(" ") if r.text_dedup != "" else []
        assert len(words) == r.n_kept

    plan = (
        exact_substr_rewrite(df, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_rewrite_pad_semantics(spark):
    """GPT-3-style rewrite: only benchmark-colliding windows (plus pad
    words each side, clamped at the document edges) are cut; clean docs
    and the benchmark-free remainder round-trip."""
    from ocgis_spark.operators.text import decontaminate_rewrite

    q = "what is the capital of france paris"       # 7-word bench span
    train = spark.createDataFrame(
        [
            (1, f"lead {q} trail words here"),      # hit mid-doc
            (2, "totally clean document with enough words to say"),
            (3, f"{q} immediately leading"),        # hit at position 1
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(900, q)], "doc_id int, text string")

    # pad=0: exactly the 7-word window is cut
    got0 = {r.doc_id: r for r in
            decontaminate_rewrite(train, bench, n=7, pad=0).collect()}
    assert got0[1].text_dedup == "lead trail words here"
    assert got0[2].text_dedup == train.collect()[1].text
    assert got0[3].text_dedup == "immediately leading"

    # pad=1: one extra word each side; low side clamps at the doc start
    got1 = {r.doc_id: r for r in
            decontaminate_rewrite(train, bench, n=7, pad=1).collect()}
    assert got1[1].text_dedup == "words here"       # 'lead'+'trail' padded away
    assert got1[3].text_dedup == "leading"          # clamp at pos 1, pad eats 'immediately'
    assert got1[2].text_dedup == got0[2].text_dedup # clean doc untouched

    plan = (
        decontaminate_rewrite(train, bench, n=7, pad=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
