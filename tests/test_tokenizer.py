"""BPE tokenizer training (operators/tokenizer.py) vs an independent
pure-Python textbook implementation (Sennrich et al. 2016), plus merge
semantics edge cases and a plan shape check.

Reference parity note: the reference engine ships no tokenizer — this is
one of the training-pipeline additions from the build brief; the
pure-Python model below is the independent oracle for the Spark fold.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from ocgis_spark.operators import tokenizer as TOK


# ---------------------------------------------------------------------------
# independent reference implementation (textbook greedy BPE)
# ---------------------------------------------------------------------------

def _ref_word_table(texts):
    words = Counter()
    for t in texts:
        words.update(re.findall(TOK.WORD_RE, t.lower()))
    return {w: (list(w) + [TOK.EOW], n) for w, n in words.items()}


def _ref_merge_pass(seq, lhs, rhs, merged):
    """Greedy leftmost non-overlapping merge (the fold semantics)."""
    out = []
    for s in seq:
        if out and out[-1] == lhs and s == rhs:
            out[-1] = merged
        else:
            out.append(s)
    return out


def _ref_bpe(texts, num_merges):
    state = _ref_word_table(texts)
    merges = []
    for step in range(1, num_merges + 1):
        pairs = Counter()
        for seq, n in state.values():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # count DESC then (lhs, rhs) ascending — the module's tie-break
        (lhs, rhs), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = lhs + rhs
        merges.append((step, lhs, rhs, merged, cnt))
        state = {
            w: (_ref_merge_pass(seq, lhs, rhs, merged), n)
            for w, (seq, n) in state.items()
        }
    return merges, state


def _ref_bpe_batched(texts, num_merges, batch):
    """Batched reference: picks top-`batch` symbol-disjoint merges per
    round (same greedy selection as TOK.select_disjoint) but applies them
    SEQUENTIALLY, one greedy pass each.  Equality with the Spark side's
    single-pass multi-rule fold is exactly the commutation claim."""
    state = _ref_word_table(texts)
    merges = []
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        pairs = Counter()
        for seq, n in state.values():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        cands = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        picked, used = [], set()
        for (l, r), cnt in cands:
            if len(picked) >= want:
                break
            syms = {l, r, l + r}
            if used & syms:
                continue
            picked.append((l, r, l + r, cnt))
            used |= syms
        for l, r, m, cnt in picked:
            merges.append((len(merges) + 1, l, r, m, cnt))
            state = {
                w: (_ref_merge_pass(seq, l, r, m), n)
                for w, (seq, n) in state.items()
            }
    return merges, state


CORPUS = [
    "low lower lowest low low",
    "new newer newest new wider wide",
    "low newer the the the widest wide",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_bpe_train_matches_reference(spark):
    got = TOK.bpe_train(spark, _docs(spark), num_merges=6).collect()
    want, _ = _ref_bpe(CORPUS, 6)
    assert [(r.step, r.lhs, r.rhs, r.merged, r.freq) for r in got] == want


def test_bpe_segment_matches_reference_and_roundtrips(spark):
    got = {
        r.word: (r.n, r.seg)
        for r in TOK.bpe_segment(spark, _docs(spark), num_merges=6).collect()
    }
    _, state = _ref_bpe(CORPUS, 6)
    want = {w: (n, "|".join(seq)) for w, (seq, n) in state.items()}
    assert got == want
    # concatenating the pieces (EOW stripped) reconstructs every word
    for w, (_, seg) in got.items():
        assert seg.replace("|", "").replace(TOK.EOW, "") == w


def test_bpe_vocab_frequencies_consistent(spark):
    vocab = {
        r.sym: r.freq
        for r in TOK.bpe_vocab(spark, _docs(spark), num_merges=4).collect()
    }
    _, state = _ref_bpe(CORPUS, 4)
    want = Counter()
    for seq, n in state.values():
        for s in seq:
            want[s] += n
    assert vocab == dict(want)


def test_greedy_leftmost_run_semantics(spark):
    """'aaaa' under merge (a,a) -> [aa, aa], never [aa, a, a] — and the
    reference model agrees."""
    df = spark.createDataFrame([("aaaa",)], "text string")
    merges = TOK.bpe_train(spark, df, num_merges=1).collect()
    assert (merges[0].lhs, merges[0].rhs) == ("a", "a")
    seg = TOK.bpe_segment(spark, df, num_merges=1).collect()[0].seg
    assert seg == f"aa|aa|{TOK.EOW}"
    assert _ref_merge_pass(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]


def test_bpe_exhausts_early_without_error(spark):
    """More merges than mergeable pairs: train stops at exhaustion and the
    segmentation collapses every word to one symbol (+ EOW merge)."""
    df = spark.createDataFrame([("ab ab",)], "text string")
    merges = TOK.bpe_train(spark, df, num_merges=10).collect()
    assert len(merges) < 10
    seg = TOK.bpe_segment(spark, df, num_merges=10).collect()
    assert [r.seg for r in seg] == [f"ab{TOK.EOW}"]


@pytest.mark.parametrize("num_merges", [5])
def test_bpe_random_corpus_property(spark, num_merges):
    """Deterministic pseudo-random corpora (multiplicative-hash chars, no
    RNG) agree with the reference implementation end to end."""
    texts = []
    for i in range(40):
        h = (i * 2654435761) % (2**32)
        word = "".join("abcd"[(h >> (2 * j)) & 3] for j in range(3 + i % 4))
        texts.append(word + " " + word[::-1])
    df = _docs(spark, texts)
    got = TOK.bpe_train(spark, df, num_merges=num_merges).collect()
    want, wstate = _ref_bpe(texts, num_merges)
    assert [(r.step, r.lhs, r.rhs, r.merged, r.freq) for r in got] == want
    gseg = {
        r.word: r.seg
        for r in TOK.bpe_segment(spark, df, num_merges=num_merges).collect()
    }
    assert gseg == {w: "|".join(seq) for w, (seq, n) in wstate.items()}


def test_select_disjoint_blocks_created_symbol_consumers():
    """A same-round rule consuming another rule's CREATED symbol would
    smuggle in sequential semantics with stale counts — it must be
    rejected, while unrelated rules still fill the batch."""
    picked = TOK.select_disjoint(
        [("a", "b", 10), ("ab", "c", 9), ("x", "y", 8)], batch=3
    )
    assert picked == [("a", "b", "ab", 10), ("x", "y", "xy", 8)]


def test_select_disjoint_blocks_shared_operands_and_reverse_creation():
    # shared rhs/lhs symbol 'b'; and ('c','ab') consumes a created symbol
    picked = TOK.select_disjoint(
        [("a", "b", 10), ("b", "c", 9), ("c", "ab", 8), ("d", "e", 7)],
        batch=4,
    )
    assert picked == [("a", "b", "ab", 10), ("d", "e", "de", 7)]


def test_select_disjoint_respects_batch_limit():
    cands = [("a", "b", 5), ("c", "d", 4), ("e", "f", 3)]
    assert len(TOK.select_disjoint(cands, batch=2)) == 2


def test_bpe_batched_matches_sequential_reference(spark):
    """batch=4 end state + merge table equal the sequential-application
    batched reference — the in-fold rules really do commute."""
    got = TOK.bpe_train(spark, _docs(spark), num_merges=8, batch=4).collect()
    want, wstate = _ref_bpe_batched(CORPUS, 8, 4)
    assert [(r.step, r.lhs, r.rhs, r.merged, r.freq) for r in got] == want
    gseg = {
        r.word: r.seg
        for r in TOK.bpe_segment(
            spark, _docs(spark), num_merges=8, batch=4
        ).collect()
    }
    assert gseg == {w: "|".join(seq) for w, (seq, n) in wstate.items()}
    # pieces still reconstruct every word under batched training
    for w, seg in gseg.items():
        assert seg.replace("|", "").replace(TOK.EOW, "") == w


def test_bpe_batched_random_corpus_property(spark):
    texts = []
    for i in range(40):
        h = (i * 2654435761) % (2**32)
        word = "".join("abcd"[(h >> (2 * j)) & 3] for j in range(3 + i % 4))
        texts.append(word + " " + word[::-1])
    df = _docs(spark, texts)
    got = TOK.bpe_train(spark, df, num_merges=6, batch=3).collect()
    want, wstate = _ref_bpe_batched(texts, 6, 3)
    assert [(r.step, r.lhs, r.rhs, r.merged, r.freq) for r in got] == want
    gvocab = {
        r.sym: r.freq
        for r in TOK.bpe_vocab(spark, df, num_merges=6, batch=3).collect()
    }
    wvocab = Counter()
    for seq, n in wstate.values():
        for s in seq:
            wvocab[s] += n
    assert gvocab == dict(wvocab)


def test_bpe_batch1_is_exact_textbook(spark):
    """Explicit batch=1 stays byte-identical to the textbook recurrence
    (what the SQL oracle replays)."""
    got = TOK.bpe_train(spark, _docs(spark), num_merges=6, batch=1).collect()
    want, _ = _ref_bpe(CORPUS, 6)
    assert [(r.step, r.lhs, r.rhs, r.merged, r.freq) for r in got] == want


def _docs_ids(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )


def test_bpe_encode_self_trained_matches_reference(spark):
    got = {
        r.doc_id: (r.tokens, r.n_tokens)
        for r in TOK.bpe_encode(
            spark, _docs_ids(spark, CORPUS), num_merges=6
        ).collect()
    }
    _, state = _ref_bpe(CORPUS, 6)
    lex = {w: seq for w, (seq, _) in state.items()}
    for i, t in enumerate(CORPUS):
        pieces = []
        for w in re.findall(TOK.WORD_RE, t.lower()):
            pieces.extend(lex[w])
        assert got[f"d{i}"] == ("|".join(pieces), len(pieces))


def test_bpe_encode_oov_falls_back_to_characters(spark):
    """Encode a held-out corpus against a lexicon trained elsewhere:
    unseen words decompose to characters + EOW, known words use their
    trained pieces."""
    lexicon = TOK.bpe_segment(spark, _docs(spark), num_merges=6)
    held_out = _docs_ids(spark, ["low zebra"])
    got = TOK.bpe_encode(
        spark, held_out, num_merges=6, lexicon=lexicon
    ).collect()
    _, state = _ref_bpe(CORPUS, 6)
    low = "|".join(state["low"][0])
    zebra = "|".join(list("zebra") + [TOK.EOW])
    assert [(r.doc_id, r.tokens, r.n_tokens) for r in got] == [
        ("d0", f"{low}|{zebra}", low.count("|") + 1 + 6)
    ]


def test_bpe_encode_lexicon_join_is_broadcast(spark):
    """The encode plan must broadcast the vocab-sized lexicon — a
    sort-merge join here would shuffle the corpus on the word column."""
    lexicon = TOK.bpe_segment(spark, _docs(spark), num_merges=4)
    plan = (
        TOK.bpe_encode(
            spark, _docs_ids(spark, CORPUS), num_merges=4, lexicon=lexicon
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_pass_is_single_scan_no_python(spark):
    """The corpus-sized stage (word_table) is one scan + one hash agg and
    never a Python UDF; the per-iteration work never touches the corpus."""
    plan = TOK.word_table(
        _docs(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan") == 1
