"""Text analysis for large-scale training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All pure `pyspark.sql.functions` — JVM-side, whole-stage codegen, no UDF.

Every operator has an exact DuckDB-SQL oracle (same expressions), so each
is a first-class `queries()` entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

#: BPE-ish token regex: words | numbers | single punctuation
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def tokens_col(text: str = "text"):
    """Whitespace tokens as array (shared split rule with the oracle)."""
    return F.split(F.col(text), " ")


def token_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace + regex token counts (SURVEY.md training-data ops)."""
    return df.select(
        "doc_id",
        F.size(tokens_col(text)).cast("bigint").alias("ws_tokens"),
        F.regexp_count(F.col(text), F.lit(TOKEN_RE)).cast("bigint").alias("re_tokens"),
        F.length(text).cast("bigint").alias("n_chars_calc"),
    )


def lang_ratio_col(text: str = "text"):
    """Stopword share of whitespace tokens (shared by lang_id and the
    agreement entry — one definition of the heuristic)."""
    toks = tokens_col(text)
    stop_n = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    )
    return stop_n.cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")


def lang_guess_col(text: str = "text"):
    """The lang_id decision as a reusable Column."""
    return F.when(lang_ratio_col(text) >= 0.05, "en").otherwise("unknown")


def lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic: en if common-English-word share of
    whitespace tokens ≥ 0.05, else unknown."""
    return df.select(
        "doc_id",
        F.round(lang_ratio_col(text), 6).alias("stop_ratio"),
        lang_guess_col(text).alias("lang_guess"),
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Length / punctuation / word-length quality signals + composite."""
    toks = tokens_col(text)
    n_chars = F.length(text).cast("double")
    n_tokens = F.greatest(F.size(toks), F.lit(1)).cast("double")
    punct = F.regexp_count(F.col(text), F.lit("[^A-Za-z0-9 ]")).cast("double")
    mean_tok_len = n_chars / n_tokens
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = len_score * (F.lit(1.0) - punct_ratio)
    return df.select(
        "doc_id",
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def chunk_documents(
    df: DataFrame, size: int = 32, stride: int = 24, text: str = "text"
) -> DataFrame:
    """Split documents into fixed-token-count chunks with overlap (the
    universal LLM training-data shaping op): chunk i covers whitespace
    tokens [i*stride, i*stride + size). Pure built-ins: split + sequence
    explode + slice + array_join — no UDF, one narrow map."""
    toks = F.split(F.col(text), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(size)) / F.lit(stride)) + 1, F.lit(1)
    ).cast("int")
    return (
        df.select("doc_id", toks.alias("ws"), n_chunks.alias("nc"))
        .select(
            "doc_id", "ws",
            F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.array_join(
                F.slice("ws", F.col("chunk_id") * stride + 1, size), " "
            ).alias("chunk_text"),
        )
        .withColumn("n_tokens", F.size(F.split("chunk_text", " ")).cast("bigint"))
    )


def fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set — key for fuzzy-dup grouping (locale-free, deterministic)."""
    toks = F.array_sort(F.array_distinct(tokens_col(text)))
    return df.select(
        "doc_id",
        F.md5(F.concat_ws(" ", toks)).alias("fp"),
    )


def paragraph_dedup(
    df: DataFrame,
    text: str = "text",
    min_repeat: int = 2,
    doc_id: str = "doc_id",
    broadcast_frequent: bool = True,
) -> DataFrame:
    """Corpus-wide repeated-paragraph removal — the C4/CCNet boilerplate
    stage (C4 discards lines occurring multiple times across the corpus;
    cookie banners / nav / subscribe prompts repeat across a domain).
    Paragraphs are newline-separated; EVERY occurrence of a paragraph
    whose corpus frequency ≥ ``min_repeat`` is dropped (boilerplate
    semantics — keep-one-per-corpus paragraph DEDUP is
    ``dedup.exact_dedup`` composed at paragraph granularity instead).
    Documents that were entirely boilerplate disappear from the output
    (they carry no trainable text).

    Returns (doc_id, text, n_kept, n_dropped) with ``text`` rebuilt from
    the surviving paragraphs in ORIGINAL order (posexplode +
    array_sort(struct) — never collect_list order, per repo convention).

    100-TB posture: split+posexplode is narrow; the frequency table costs
    ONE hash agg with map-side partials; the frequent set (count ≥
    min_repeat) is usually tiny vs distinct paragraphs and broadcasts for
    a narrow anti-join (``broadcast_frequent=False`` degrades to a
    shuffled anti-join when the boilerplate universe itself is huge);
    the rebuild costs the one per-doc shuffle any reassembly needs. The
    in-struct ``transform`` lambda is interpreted but touches only each
    doc's own ≤paragraph-count array."""
    paras = df.select(
        F.col(doc_id),
        F.posexplode(F.split(F.col(text), "\n")).alias("pos", "para"),
    )
    freq = (
        paras.groupBy("para")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_repeat)
        .select("para")
    )
    freq = freq.withColumn("_b", F.lit(1))
    if broadcast_frequent:
        freq = F.broadcast(freq)
    tagged = paras.join(freq, "para", "left")
    arr = F.array_sort(F.collect_list(F.struct("pos", "para", "_b")))
    survivors = F.filter(arr, lambda s: s["_b"].isNull())
    out = tagged.groupBy(doc_id).agg(
        F.concat_ws(
            "\n", F.transform(survivors, lambda s: s["para"])
        ).alias(text),
        F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("_b").isNull(), 0).otherwise(1))
        .cast("bigint").alias("n_dropped"),
    )
    return out.filter(F.col("n_kept") > 0)


def _word_ngrams(df: DataFrame, text: str, n: int,
                 min_words: int, keep_pos: bool = False) -> DataFrame:
    """(doc_id, g) word n-grams in one codegen stage: explode the
    position sequence, then slice/array_join the split array as plain
    projections. ``min_words >= n`` drops docs too short for a full
    n-gram (decontaminate's contract, ADVICE r2); ``min_words=1`` keeps
    one (possibly truncated) gram per short doc (repetition_ratio's
    historical contract, mirrored by its oracle). Values are identical
    to the old concat_ws/element_at lambda build — array_join over a
    short slice == concat_ws with the nulls it skipped."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism, "doc_id")
    base = df.select("doc_id", F.split(F.col(text), " ").alias("ws"))
    if min_words > 1:
        base = base.filter(F.size("ws") >= min_words)
        last = F.size("ws") - n + 1
    else:
        # size(null) = -1 with ANSI off: a NULL-text doc would otherwise
        # emit one null-gram row (the historical posexplode build emitted
        # nothing — r4 review finding)
        base = base.filter(F.size("ws") >= 1)
        last = F.greatest(F.size("ws") - n + 1, F.lit(1))
    ex = base.select(
        "doc_id", "ws",
        F.explode(F.sequence(F.lit(1), last)).alias("_i"),
    )
    gram = F.array_join(F.slice("ws", F.col("_i"), n), " ").alias("g")
    if keep_pos:
        # 1-based start index of the gram inside the split array —
        # consumers that rewrite text (exact_substr_rewrite) need it;
        # default callers keep the historical two-column shape (two of
        # them .distinct() the result, so the extra column is opt-in)
        return ex.select("doc_id", F.col("_i").cast("bigint").alias("i"),
                         gram)
    return ex.select("doc_id", gram)


def repetition_ratio(df: DataFrame, text: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of a document's
    word n-grams taken by its single most frequent n-gram, plus the
    distinct-ngram fraction. High top-fraction ⇒ boilerplate/looping text.
    Pure relational: explode n-grams (position-ordered), two grouped
    aggregations — no UDFs. N-grams come straight off the F.split array
    via explode(positions) + slice/array_join PROJECTIONS (one codegen
    stage; the earlier posexplode → collect_list → transform rebuild
    paid a full corpus shuffle to reconstruct the array split() already
    returns in order, plus the interpreted lambda evaluator — r4s5)."""
    grams = _word_ngrams(df, text, n, min_words=1)
    counts = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ngram_frac"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("distinct_frac"),
        F.sum("c").alias("n_ngrams"),
    )


def decontaminate(
    train: DataFrame, bench: DataFrame, text: str = "text", n: int = 8
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ANY word
    n-gram with any benchmark doc (the standard n-gram-overlap rule).
    Shape at scale: bench n-grams are the SMALL side (benchmarks are tiny
    vs the corpus) — distinct + broadcast; the corpus n-grams stream
    through one broadcast semi-ish join, then a per-doc count. Returns
    (doc_id, n_hits) for contaminated docs only."""
    # min_words=n: docs with fewer than n words have no n-gram at all
    # (ADVICE r2 — a truncated pseudo-gram would falsely flag short
    # docs); generation is one codegen stage, no corpus shuffle (r4s5)
    def ngrams(df):
        return _word_ngrams(df, text, n, min_words=n).distinct()

    bench_grams = ngrams(bench).select("g").distinct()
    hits = ngrams(train).join(F.broadcast(bench_grams), "g")
    return hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))


def bloom_decontaminate(
    train: DataFrame, bench: DataFrame, text: str = "text", n: int = 8
) -> DataFrame:
    """:func:`decontaminate`'s corpus-scale sibling: the benchmark n-gram
    set compressed to a fixed-size Bloom position sketch
    (sketch.py bloom_*) instead of a raw-gram broadcast. Right when the
    reference side is itself huge (every content fingerprint from prior
    crawls): the sketch is ≤ BLOOM_BITS rows NO MATTER how many grams went
    in, so it broadcasts forever, and the corpus side stays one narrow
    explode + broadcast join — never shuffled on the gram. One-sided:
    every exact hit is a bloom hit (no false negatives); false positives
    are deterministic (md5-slice hash) and engine-identical, so the DuckDB
    oracle replays them bit-for-bit. Returns (doc_id, n_hits_bloom) for
    screened docs only."""
    from .sketch import bloom_build, bloom_probe

    tg = _word_ngrams(train, text, n, min_words=n).distinct()
    bg = _word_ngrams(bench, text, n, min_words=n).select("g").distinct()
    member = bloom_probe(tg, bloom_build(bg, "g"), "g", keep=["doc_id"])
    return member.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits_bloom")
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 2048,
    n_buckets: int = 32,
    text: str = "text",
    weight: str | None = None,
    order: tuple = ("doc_id",),
) -> DataFrame:
    """Sequence packing for training-batch construction: assign documents
    to fixed-capacity token packs. True first-fit packing is sequential;
    the distributed-deterministic rule used here is FIRST-FIT-IN-ORDER
    WITHIN HASH BUCKETS: docs hash to ``n_buckets`` independent streams
    (parallelism — each bucket packs concurrently), and within a bucket
    the running token total assigns ``pack_id = floor(cum_before /
    capacity)`` in doc_id order. A document straddling a boundary starts
    in the pack its prefix sum lands in (packs can overflow by at most
    one document — the standard concat-then-chunk training layout).
    Pure integer window arithmetic: reproducible anywhere, exact oracle.
    At cluster scale the only shuffle is the bucket window partition.

    Pre-weighted units (e.g. span chunks from ``spans.chunk_spans_packed``
    that already carry ``n_tokens``) pack by passing ``weight`` (a bigint
    column name — skips the whitespace tokenizer) and ``order`` (the unit
    key columns, e.g. ``("doc_id", "chunk_id")``; the first one also
    drives the bucket hash, so a doc's chunks pack in the same bucket,
    contiguously)."""
    from .sampling import hash_bucket

    n = (F.col(weight).cast("bigint") if weight
         else F.size(tokens_col(text)).cast("bigint"))
    d = df.select(
        *order,
        hash_bucket(F.col(order[0]), n_buckets).alias("bucket"),
        n.alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        *order,
        "bucket",
        "n_tokens",
        (
            F.col("bucket") * F.lit(1_000_000)
            + F.floor(cum_before / F.lit(capacity))
        ).cast("bigint").alias("pack_id"),
    )


#: PII patterns — backslash-free so the same literal works in Java regex
#: (Spark) and RE2 (DuckDB). Character classes + bounded repetition only.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_SSN_RE = "[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]"
PII_PHONE_RE = "[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"

#: single-traversal alternation: the email branch captures its '@'
#: ($1) and the SSN branch its second dash ($2) as type tags; the phone
#: branch captures nothing. Replacement "[$1$2«]" therefore emits a
#: typed sentinel per match ([@«] / [-«] / [«]) in ONE regex pass —
#: Java appendReplacement renders non-participating groups as "".
#: Engine-cost design, measured at 2M docs / 700 MB:
#:  - the email branch leads with a one-char negative lookbehind +
#:    possessive local part: without it java.util.regex re-consumes the
#:    whole [class]+ run at EVERY position inside a word (O(len^2) per
#:    word on plain prose — letters are all local-part chars); with it,
#:    mid-run positions fail in O(1) and only run STARTS pay the scan;
#:  - SSN and phone share their "ddd-" prefix, factored so a non-digit
#:    position pays ONE class check for both.
#: Semantics equal the original SSN -> email -> phone chained replaces
#: except two corner families: an SSN/phone EMBEDDED in an email-shaped
#: token now counts as the email (the earlier match start wins whole —
#: arguably more correct), and an email starting immediately after a
#: previous match mid-run ('a@b.co9x@d.com') is not re-found. Both are
#: absent from every gated corpus — the fused==chained equality pytest
#: plus ZERO-diff sweeps at sf0.01 AND sf0.1 pin it (the chained oracle
#: in __spark_entry__ still matches hash-exactly).
PII_FUSED_RE = (
    "(?:(?<![A-Za-z0-9._%+-])[A-Za-z0-9._%+-]++(@)"
    "[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+)"
    "|(?:[0-9][0-9][0-9]-(?:[0-9][0-9](-)[0-9][0-9][0-9][0-9]"
    "|[0-9][0-9][0-9][0-9]))"
)
_PII_MARK = {"ssn": "[-«]", "email": "[@«]", "phone": "[«]"}


def pii_scan(df: DataFrame, text: str = "text") -> DataFrame:
    """PII detection + redaction (training-data scrubbing stage): per-doc
    counts of email / SSN / phone-shaped matches and a redacted copy with
    each replaced by a typed placeholder. One narrow JVM map, no shuffle.

    ONE regex traversal total (``PII_FUSED_RE`` — see its cost notes)
    plus the three literal normalize replaces, which double as the
    counters: the sentinels and placeholders have distinct lengths
    ([-«]4→[SSN]5: +1/match; [@«]4→[EMAIL]7: +3; [«]3→[PHONE]7: +4), so
    each typed count is a LENGTH DELTA of a pass that redaction needs
    anyway — no extra occurrence scans in the common case. One
    single-char scan of the original guards pre-existing '«' literals:
    when the original contains none (every real corpus), the raw deltas
    ARE the counts; otherwise a per-marker differencing branch restores
    exactness (Catalyst evaluates the CASE branch lazily per row).

    A pre-existing literal '[-«]'/'[@«]'/'[«]' in the input is
    normalized to its typed placeholder in ``redacted`` (counts stay
    exact via the guard); the old chained form had the mirror-image
    corner for pre-existing '[EMAIL]'.

    r6 fast path: a row with no '@', no "ddd-" digit-dash run and no
    '«' provably cannot match any branch of the fused regex (the email
    branch requires a literal '@', SSN/phone require three digits then
    '-') and cannot hit the '«'-normalization corner, so its outputs
    are exactly (0, 0, 0, text). Those rows pay three cheap JVM scans
    (two ``contains``, one 4-state ``rlike``) instead of the full PII
    automaton — the dominant per-position cost (guide §1.2 step 2: make
    the per-task work proportional to matches, not to text). Rows that
    pass the gate take the unchanged fused path, so the output is
    row-for-row identical to the ungated form on every input."""
    gate = (
        F.col(text).contains("@")
        | F.col(text).contains("«")
        | F.col(text).rlike("[0-9][0-9][0-9]-")
    )
    d = df.select(
        "doc_id",
        F.col(text).alias("_t"),
        gate.alias("_g"),
        F.when(
            gate,
            F.regexp_replace(F.col(text), PII_FUSED_RE, "[$1$2«]"),
        ).otherwise(F.col(text)).alias("_m"),
    )
    d = (
        d.withColumn(
            "_s1",
            F.when(
                F.col("_g"),
                F.replace(F.col("_m"), F.lit("[-«]"), F.lit("[SSN]")),
            ).otherwise(F.col("_m")),
        )
        .withColumn(
            "_s2",
            F.when(
                F.col("_g"),
                F.replace(F.col("_s1"), F.lit("[@«]"), F.lit("[EMAIL]")),
            ).otherwise(F.col("_s1")),
        )
        .withColumn(
            "redacted",
            F.when(
                F.col("_g"),
                F.replace(F.col("_s2"), F.lit("[«]"), F.lit("[PHONE]")),
            ).otherwise(F.col("_s2")),
        )
    )

    def occ(col, marker):
        return (
            F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit("")))
        ) / F.lit(len(marker))

    tguard = F.length("_t") - F.length(
        F.replace(F.col("_t"), F.lit("«"), F.lit(""))
    )

    def n_of(raw, kind):
        m = _PII_MARK[kind]
        return (
            F.when(~F.col("_g"), F.lit(0))
            .when(tguard == 0, raw)
            .otherwise(raw - occ(F.col("_t"), m))
            .cast("bigint")
        )

    n_ssns = n_of(F.length("_s1") - F.length("_m"), "ssn")
    n_emails = n_of(
        (F.length("_s2") - F.length("_s1")) / F.lit(3), "email"
    )
    n_phones = n_of(
        (F.length("redacted") - F.length("_s2")) / F.lit(4), "phone"
    )
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ssns.alias("n_ssns"),
        n_phones.alias("n_phones"),
        "redacted",
    )


def lexicon_score(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    text: str = "text",
) -> DataFrame:
    """Linear lexicon scorer — the shape of fastText-style quality
    classifiers (Dolma/FineWeb-style model filtering): score =
    sigmoid(bias + Σ w(token)·count(token)). ``weights`` is a small
    (word, w) relation — broadcast; the corpus explodes to (doc, word)
    counts once and inner-joins the lexicon, so per-doc cost is O(tokens)
    and the model ships like any other broadcast dim table (swap in real
    trained weights without touching the plan). Docs containing no
    lexicon word get score = sigmoid(bias) via the left join re-attach."""
    counts = (
        df.select("doc_id", F.explode(tokens_col(text)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    hits = counts.join(F.broadcast(weights), "w").groupBy("doc_id").agg(
        F.sum(F.col("c") * F.col("weight")).alias("_z")
    )
    z = F.coalesce(F.col("_z"), F.lit(0.0)) + F.lit(float(bias))
    return (
        df.select("doc_id").join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
        )
    )


def word_entropy(df: DataFrame, text: str = "text") -> DataFrame:
    """Shannon entropy (bits) of a document's whitespace-token
    distribution — a perplexity proxy for quality filtering (low entropy ⇒
    repetitive/boilerplate text). H = log2(n) − Σ c·log2(c) / n via one
    (doc, word) count + one per-doc aggregation; all JVM-side."""
    words = df.select(
        "doc_id", F.explode(tokens_col(text)).alias("w")
    ).filter(F.col("w") != "")
    counts = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    return counts.groupBy("doc_id").agg(
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            6,
        ).alias("entropy"),
        F.sum("c").cast("bigint").alias("n_tokens"),
    )


def tfidf_top_terms(
    df: DataFrame, text: str = "text", top_k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document — the relevance/keyword extractor
    of a training-data pipeline (e.g. topic tagging, boilerplate
    detection via degenerate top terms).

    idf = ln((N + 1) / (df_t + 1)) + 1 (smoothed, sklearn convention);
    score = tf · idf, ties broken lexically. Plan shape at 100 TB: one
    (doc, term) hash count (map-side partials), a VOCAB-sized document-
    frequency aggregate broadcast back onto it, and the per-doc top-k
    window — no corpus-sized join sides, no Python.
    """
    from pyspark.sql import Window

    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        # under-split local scans would run the explode + counts on one
        # core (dedup-shingle pattern); no-op on real multi-split inputs
        df = df.repartition(sc.defaultParallelism, "doc_id")
    words = df.select(
        "doc_id", F.explode(tokens_col(text)).alias("w")
    ).filter(F.col("w") != "")
    tf = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    n_docs = df.select(F.countDistinct("doc_id").alias("nd"))
    dfreq = (
        words.groupBy("w")
        .agg(F.countDistinct("doc_id").cast("double").alias("df_t"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "w",
            (
                F.log((F.col("nd").cast("double") + F.lit(1.0))
                      / (F.col("df_t") + F.lit(1.0)))
                + F.lit(1.0)
            ).alias("idf"),
        )
    )
    scored = tf.join(F.broadcast(dfreq), "w").select(
        "doc_id", "w", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf")
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("w")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "w", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def tfidf_top_terms_sql(table: str = "documents", text: str = "text",
                        top_k: int = 3) -> str:
    """Oracle twin of :func:`tfidf_top_terms` (same split rule as the
    other token ops: split on single space, empty tokens dropped)."""
    return (
        f"WITH words AS ("
        f"SELECT doc_id, unnest(string_split({text}, ' ')) AS w FROM {table}"
        f"), filt AS (SELECT doc_id, w FROM words WHERE w <> ''), "
        f"tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf "
        f"FROM filt GROUP BY doc_id, w), "
        f"nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd "
        f"FROM {table}), "
        f"idf AS (SELECT w, ln((nd + 1.0E0) / (CAST(count(DISTINCT doc_id) "
        f"AS DOUBLE) + 1.0E0)) + 1.0E0 AS idf FROM filt, nd GROUP BY w, nd), "
        f"scored AS (SELECT tf.doc_id, tf.w, round(tf.tf * idf.idf, 6) AS "
        f"tfidf FROM tf JOIN idf ON tf.w = idf.w) "
        f"SELECT doc_id, w, tfidf, CAST(rn AS INT) AS rank FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY doc_id "
        f"ORDER BY tfidf DESC, w ASC) AS rn FROM scored) t WHERE rn <= {top_k}"
    )


def dup_ngram_spans(df: DataFrame, text: str = "text", n: int = 8) -> DataFrame:
    """Exact-substring duplicate detection at word-window granularity —
    the relational form of ExactSubstr dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    length-``n`` word window occurring verbatim in >= 2 DISTINCT documents
    is a duplicated span. Per document: total windows, duplicated windows,
    duplicated fraction (docs shorter than ``n`` words have no window and
    are excluded, matching :func:`decontaminate`'s short-doc rule).

    Plan shape at 100 TB: windows are hashed to md5 immediately so the
    corpus-wide gram aggregate and the join back move fixed 32-char keys
    instead of arbitrary-length text; the whole operator is two hash
    aggregations (map-side partials) plus one equi-join on the gram key —
    no all-pairs stage, no Python. The reference has no text dedup; this
    extends the pipeline family (SURVEY.md training-data ops) alongside
    minhash/simhash, which catch NEAR-duplicates but miss verbatim spans
    embedded in otherwise-distinct documents.
    """
    # the gram contract (repartition guard, explode+slice projections,
    # short-doc rule) lives ONCE in _word_ngrams; this operator only adds
    # the md5 key (fixed 32-char shuffle keys instead of raw text)
    grams = _word_ngrams(df, text, n, min_words=n).select(
        "doc_id", F.md5("g").alias("gk")
    )
    dup = (
        grams.groupBy("gk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gk")
    )
    tot = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    dd = grams.join(dup, "gk").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup")
    )
    out = tot.join(dd, "doc_id", "left")
    n_dup = F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint")
    return out.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        n_dup.alias("n_dup"),
        F.round(
            n_dup.cast("double") / F.col("n_grams").cast("double"), 6
        ).alias("dup_frac"),
    )


def dup_ngram_spans_sql(table: str = "documents", text: str = "text",
                        n: int = 8) -> str:
    """Oracle twin of :func:`dup_ngram_spans` (DuckDB list slicing +
    array_to_string reproduce the identical window strings, md5 matches
    byte-for-byte across engines)."""
    return (
        f"WITH ws AS (SELECT doc_id, string_split({text}, ' ') AS w "
        f"FROM {table}), "
        f"ok AS (SELECT doc_id, w FROM ws WHERE len(w) >= {n}), "
        f"grams AS (SELECT doc_id, md5(array_to_string("
        f"w[CAST(i AS INT):CAST(i AS INT) + {n - 1}], ' ')) AS gk FROM ("
        f"SELECT doc_id, w, unnest(generate_series(1, len(w) - {n - 1})) "
        f"AS i FROM ok) s), "
        f"dup AS (SELECT gk FROM grams GROUP BY gk "
        f"HAVING count(DISTINCT doc_id) >= 2), "
        f"tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams "
        f"FROM grams GROUP BY doc_id), "
        f"dd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup "
        f"FROM grams JOIN dup USING (gk) GROUP BY doc_id) "
        f"SELECT doc_id, t.n_grams, "
        f"CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup, "
        f"round(CAST(coalesce(d.n_dup, 0) AS DOUBLE) / "
        f"CAST(t.n_grams AS DOUBLE), 6) AS dup_frac "
        f"FROM tot t LEFT JOIN dd d USING (doc_id)"
    )


def exact_substr_rewrite(df: DataFrame, text: str = "text", n: int = 8,
                         min_count: int = 2) -> DataFrame:
    """ExactSubstr dedup REWRITE (Lee et al. 2022 §4.2): cut every word
    position covered by a length-``n`` word window that occurs >=
    ``min_count`` times in the whole corpus (total occurrences — unlike
    :func:`dup_ngram_spans`'s distinct-document count, this also removes
    text repeated WITHIN one document, matching the paper's suffix-array
    semantics at word-window granularity), then rebuild each document
    from the surviving words in original order. All copies of a
    duplicated span are removed, the paper's default. Documents whose
    every window is duplicated rebuild to ``''``; NULL-text rows are
    dropped (no words to keep).

    Output: (doc_id, n_words, n_kept, text_dedup).

    Plan shape at 100 TB: grams are hashed to fixed 32-char md5 keys
    before the corpus-wide count (hash agg with map-side partials, no
    all-pairs); duplicated STARTS fan out only n positions each
    (explode(sequence)); the kept-word anti join and the per-doc rebuild
    are doc_id-keyed shuffles — the rebuild shuffle is the price of
    emitting a rewritten corpus, same posture as pack_sequences. Word
    order is reconstructed via array_sort(struct(pos, word)), never
    collect_list order. The reference has no text dedup; this completes
    the ExactSubstr pair begun by dup_ngram_spans (detection).
    """
    d = df.filter(F.col(text).isNotNull())
    grams = _word_ngrams(d, text, n, min_words=n, keep_pos=True).select(
        "doc_id", "i", F.md5("g").alias("gk")
    )
    dup = (
        grams.groupBy("gk")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gk")
    )
    starts = grams.join(dup, "gk").select("doc_id", "i")
    return _cut_covered_rewrite(d, starts, text, n)


def _cut_covered_rewrite(d: DataFrame, starts: DataFrame, text: str,
                         n: int, pad: int = 0) -> DataFrame:
    """Shared rewrite tail of the span-removal family: given the doc
    frame ``d`` (NULL text pre-filtered) and flagged window ``starts``
    (doc_id, i — 1-based), cut every word position in
    [i-pad, i+n-1+pad] and rebuild each doc from the surviving words in
    original order. Pad positions past the document end join-miss
    harmlessly; the low side clamps to 1. Word order is reconstructed
    via array_sort(struct(pos, word)), never collect_list order."""
    cov = (
        starts.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(1), F.col("i") - F.lit(pad)),
                    F.col("i") + F.lit(n - 1 + pad),
                )
            ).alias("pos"),
        )
        .distinct()
    )
    words = d.select(
        "doc_id", F.posexplode(F.split(F.col(text), " ")).alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "word")
    kept = words.join(cov, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "word"))).alias("a")
    )
    tot = d.select(
        "doc_id",
        F.size(F.split(F.col(text), " ")).cast("bigint").alias("n_words"),
    )
    return tot.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_words",
        # size(NULL) = -1 with ANSI off — guard the join miss explicitly
        F.when(F.col("a").isNull(), F.lit(0))
        .otherwise(F.size("a")).cast("bigint").alias("n_kept"),
        F.coalesce(
            F.array_join(F.transform("a", lambda x: x["word"]), " "),
            F.lit(""),
        ).alias("text_dedup"),
    )


def _gram_cte_sql(src: str, n: int, with_doc: bool = True) -> str:
    """(doc_id, i, gk) md5 word-window CTE body over ``src`` (a CTE name
    holding (doc_id, w) split arrays) — the slice expression matches
    :func:`_word_ngrams` + md5 byte-for-byte."""
    cols = "doc_id, CAST(i AS BIGINT) AS i, " if with_doc else ""
    inner = "doc_id, w," if with_doc else "w,"
    return (
        f"SELECT {cols}md5(array_to_string("
        f"w[CAST(i AS INT):CAST(i AS INT) + {n - 1}], ' ')) AS gk FROM ("
        f"SELECT {inner} unnest(generate_series(1, len(w) - {n - 1})) "
        f"AS i FROM {src} WHERE len(w) >= {n}) s"
    )


def _cut_covered_rewrite_sql(d_sql: str, extra_ctes: str, n: int,
                             pad: int = 0) -> str:
    """Shared DuckDB rewrite tail: ``d_sql`` yields (doc_id, t);
    ``extra_ctes`` must define a CTE ``starts`` with (doc_id, i) and may
    reference ``ws`` (doc_id, w split arrays). The rebuild is
    string_agg(word, ' ' ORDER BY pos) — explicitly ordered."""
    lo = f"greatest(1, i - {pad})" if pad else "i"
    return (
        f"WITH d AS ({d_sql}), "
        f"ws AS (SELECT doc_id, string_split(t, ' ') AS w FROM d), "
        f"words AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, "
        f"w[CAST(i AS INT)] AS word FROM (SELECT doc_id, w, "
        f"unnest(generate_series(1, len(w))) AS i FROM ws) s), "
        f"{extra_ctes}, "
        f"cov AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos "
        f"FROM (SELECT doc_id, "
        f"unnest(generate_series({lo}, i + {n - 1 + pad})) AS p "
        f"FROM starts) s), "
        f"kept AS (SELECT words.doc_id, words.pos, words.word FROM words "
        f"LEFT JOIN cov ON words.doc_id = cov.doc_id "
        f"AND words.pos = cov.pos WHERE cov.pos IS NULL), "
        f"agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
        f"string_agg(word, ' ' ORDER BY pos) AS text_dedup "
        f"FROM kept GROUP BY doc_id), "
        f"tot AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words "
        f"FROM ws) "
        f"SELECT t.doc_id, t.n_words, "
        f"CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept, "
        f"coalesce(a.text_dedup, '') AS text_dedup "
        f"FROM tot t LEFT JOIN agg a USING (doc_id)"
    )


def exact_substr_rewrite_sql(table: str = "documents", text: str = "text",
                             n: int = 8, min_count: int = 2) -> str:
    """Oracle twin of :func:`exact_substr_rewrite` (DuckDB list slicing
    reproduces the identical window strings)."""
    extra = (
        f"grams AS ({_gram_cte_sql('ws', n)}), "
        f"dup AS (SELECT gk FROM grams GROUP BY gk "
        f"HAVING count(*) >= {min_count}), "
        f"starts AS (SELECT doc_id, i FROM grams JOIN dup USING (gk))"
    )
    d_sql = (f"SELECT doc_id, {text} AS t FROM {table} "
             f"WHERE {text} IS NOT NULL")
    return _cut_covered_rewrite_sql(d_sql, extra, n)


def decontaminate_rewrite(train: DataFrame, bench: DataFrame,
                          text: str = "text", n: int = 8,
                          pad: int = 0) -> DataFrame:
    """Decontamination REWRITE (the GPT-3 appendix-C treatment, word
    granularity): instead of dropping a training document that shares an
    ``n``-gram with a benchmark (:func:`decontaminate` flags those), cut
    ONLY the colliding windows — plus ``pad`` surrounding words on each
    side — and keep the rest of the document. Salvages long documents
    with incidental benchmark overlap; at 100-TB corpus scale dropping
    whole docs over one quoted question wastes real data.

    Output: (doc_id, n_words, n_kept, text_dedup) for every non-NULL
    train doc.

    Plan shape: bench grams distinct + broadcast (benchmarks are tiny vs
    the corpus — same posture as decontaminate); the train corpus is
    exploded once for window starts and once for the word rebuild; the
    rebuild is the only corpus-width shuffle (the price of emitting the
    rewritten corpus, shared via _cut_covered_rewrite with
    exact_substr_rewrite)."""
    d = train.filter(F.col(text).isNotNull())
    grams = _word_ngrams(d, text, n, min_words=n, keep_pos=True).select(
        "doc_id", "i", F.md5("g").alias("gk")
    )
    bg = (
        _word_ngrams(bench.filter(F.col(text).isNotNull()), text, n,
                     min_words=n)
        .select(F.md5("g").alias("gk"))
        .distinct()
    )
    starts = grams.join(F.broadcast(bg), "gk").select("doc_id", "i")
    return _cut_covered_rewrite(d, starts, text, n, pad)


def decontaminate_rewrite_sql(train_sql: str, bench_sql: str,
                              text: str = "text", n: int = 8,
                              pad: int = 0) -> str:
    """Oracle twin of :func:`decontaminate_rewrite`; ``train_sql`` /
    ``bench_sql`` yield (doc_id, {text}) relations."""
    extra = (
        f"grams AS ({_gram_cte_sql('ws', n)}), "
        f"bws AS (SELECT string_split({text}, ' ') AS w "
        f"FROM ({bench_sql}) b0 WHERE {text} IS NOT NULL), "
        f"bg AS (SELECT DISTINCT gk FROM ("
        f"{_gram_cte_sql('bws', n, with_doc=False)}) g0), "
        f"starts AS (SELECT doc_id, i FROM grams JOIN bg USING (gk))"
    )
    d_sql = (f"SELECT doc_id, {text} AS t FROM ({train_sql}) t0 "
             f"WHERE {text} IS NOT NULL")
    return _cut_covered_rewrite_sql(d_sql, extra, n, pad)


def lm_score(
    df: DataFrame, text: str = "text", k: float = 0.5,
    cache_pairs: bool = True, cache_registry: list | None = None,
) -> DataFrame:
    """Average bigram log-likelihood per document under an add-k-smoothed
    corpus bigram LM — the perplexity quality gate of a training-data
    pipeline (CCNet/Dolma-style filtering: low avg log-likelihood ⇒
    out-of-distribution / garbled text).

    ll(doc) = mean over consecutive token pairs of
    ln((c(w1,w2) + k) / (c(w1) + k·V)), with c(·) corpus bigram counts,
    c(w1) = Σ_w2 c(w1,w2) (context count) and V = |distinct w2|.

    Plan shape at 100 TB: bigrams come from a NARROW per-row zip (no
    positional self-join); the LM tables are vocab²-bounded hash aggs
    with map-side partials; the scoring join is plain equi-join on
    (w1, w2) — AQE broadcasts when the LM fits, shuffles otherwise.
    Train on a sample by passing a sampled frame to a separate counts
    build if the full-corpus LM is not wanted. The bigram relation feeds
    THREE branches (both LM tables and the scoring join) — it is
    persisted by default so the corpus is exploded once, not three
    times (the minhash_dedup token-cache pattern). The cache lives as
    long as the returned plan: long-lived sessions should release it
    after consuming the result or pass ``cache_pairs=False``. Pass a
    list as ``cache_registry`` to receive a handle to every relation
    this call persists — ``[h.unpersist() for h in reg]`` releases
    exactly these caches without nuking the session's other cached
    work the way ``spark.catalog.clearCache()`` does (r4s13 review)."""
    arr = tokens_col(text)
    # explode adjacent positions + element_at PROJECTIONS (one codegen
    # stage). MUST be built in two steps with the split array as a NAMED
    # column the explode's bound references: aliasing the split inline in
    # the same select lets CollapseProject substitute split(text) into
    # the post-explode element_at, recomputing the split PER EXPLODED ROW
    # (O(tokens²) — measured 45 s vs 1.4 s on 500k docs at local[8];
    # the old zip_with lambda form sat between at 3.3 s) — r4s5.
    ws = df.select("doc_id", arr.alias("ws")).filter(F.size("ws") >= 2)
    pairs = ws.select(
        "doc_id", "ws",
        F.explode(F.sequence(F.lit(1), F.size("ws") - 1)).alias("_i"),
    ).select(
        "doc_id",
        F.element_at("ws", F.col("_i")).alias("w1"),
        F.element_at("ws", F.col("_i") + 1).alias("w2"),
    ).filter(
        (F.col("w1") != "") & (F.col("w2") != "")
    )
    if cache_pairs:
        pairs = pairs.persist()
        if cache_registry is not None:
            cache_registry.append(pairs)
    c12 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = pairs.agg(
        F.countDistinct("w2").cast("double").alias("v")
    )
    scored = (
        pairs.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.log(
                (F.col("c12") + F.lit(k))
                / (F.col("c1") + F.lit(k) * F.col("v"))
            ).alias("ll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("ll"), 6).alias("avg_ll"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
    )


def lm_score_sql(table: str = "documents", text: str = "text",
                 k: float = 0.5) -> str:
    """Oracle twin of :func:`lm_score` (same raw-position adjacency:
    consecutive single-space-split tokens, pairs with an empty side
    dropped after pairing)."""
    from ..fixtures import _f

    kf = _f(k)
    return (
        f"WITH toks AS (SELECT doc_id, string_split({text}, ' ') AS a "
        f"FROM {table}), "
        f"big0 AS (SELECT doc_id, a[CAST(i AS INT)] AS w1, "
        f"a[CAST(i AS INT) + 1] AS w2 FROM ("
        f"SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i "
        f"FROM toks) t), "
        f"big AS (SELECT * FROM big0 WHERE w1 <> '' AND w2 <> ''), "
        f"c12 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12 "
        f"FROM big GROUP BY w1, w2), "
        f"c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1), "
        f"v AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM big), "
        f"scored AS (SELECT b.doc_id, "
        f"ln((c12.c12 + {kf}) / (c1.c1 + {kf} * v.v)) AS ll "
        f"FROM big b JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2 "
        f"JOIN c1 ON b.w1 = c1.w1 CROSS JOIN v) "
        f"SELECT doc_id, round(avg(ll), 6) AS avg_ll, "
        f"CAST(count(*) AS BIGINT) AS n_bigrams "
        f"FROM scored GROUP BY doc_id"
    )


def feature_hash_embed(
    df: DataFrame, text: str = "text", dims: int = 16
) -> DataFrame:
    """Hashing-trick text embedding (feature hashing / \"the hashing
    vectorizer\"): token t adds ±1 to dimension ``md5_32(t) % dims``
    (sign from an independent md5 slice). No vocabulary, no training,
    fixed memory — the standard cheap text vector for dedup/retrieval
    preprocessing at corpus scale.

    The md5-slice hash is byte-identical in DuckDB, and the resulting
    vectors are INTEGER-valued, so downstream dot products and norms are
    exact and the whole embed→cosine-retrieval chain oracle-checks
    bit-for-bit (no FP summation-order drift). Docs with no non-empty
    tokens produce no row. Plan: one explode + two hash aggs, the map
    rebuilt into a dense ``array<double>`` per doc — no UDFs."""
    from .sketch import md5_slice_int_sql

    toks = df.select(
        "doc_id", F.explode(tokens_col(text)).alias("tok")
    ).filter(F.col("tok") != "")
    bucket = F.expr(f"({md5_slice_int_sql('tok', 0)} % {dims})")
    sgn = F.expr(
        f"CASE WHEN {md5_slice_int_sql('tok', 1)} % 2 = 0 "
        f"THEN 1.0E0 ELSE -1.0E0 END"
    )
    per = (
        toks.select("doc_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("v"))
    )
    m = per.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket").cast("int"), F.col("v")))
        ).alias("m")
    )
    return m.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda j: F.coalesce(F.element_at(F.col("m"), j), F.lit(0.0)),
        ).alias("embedding"),
    )


def _hash_embed_cte(table: str = "documents", text: str = "text",
                    dims: int = 16) -> str:
    """Shared CTE chain: per-(doc, bucket) signed counts — the sparse
    form both hash-embed oracles build on."""
    from .sketch import md5_slice_int_sql

    s0 = md5_slice_int_sql("tok", 0)
    s1 = md5_slice_int_sql("tok", 1)
    return (
        f"WITH toks0 AS (SELECT doc_id, unnest(string_split({text}, ' ')) "
        f"AS tok FROM {table}), "
        f"toks AS (SELECT doc_id, tok FROM toks0 WHERE tok <> ''), "
        f"b AS (SELECT doc_id, ({s0} % {dims}) AS bucket, "
        f"CASE WHEN {s1} % 2 = 0 THEN 1.0E0 ELSE -1.0E0 END AS sgn "
        f"FROM toks), "
        f"per AS (SELECT doc_id, bucket, sum(sgn) AS v FROM b "
        f"GROUP BY doc_id, bucket)"
    )


def feature_hash_embed_sql(table: str = "documents", text: str = "text",
                           dims: int = 16) -> str:
    """Oracle twin of :func:`feature_hash_embed`, exploded to
    (doc_id, dim, val) scalars for value comparison."""
    return (
        _hash_embed_cte(table, text, dims) + ", "
        f"docs AS (SELECT DISTINCT doc_id FROM toks), "
        f"dims AS (SELECT unnest(generate_series(0, {dims - 1})) AS dim) "
        f"SELECT d.doc_id, CAST(dim AS INT) AS dim, "
        f"round(coalesce(p.v, 0.0E0), 6) AS val "
        f"FROM docs d CROSS JOIN dims "
        f"LEFT JOIN per p ON p.doc_id = d.doc_id AND p.bucket = dim"
    )


def hash_embed_topk_sql(table: str = "documents", text: str = "text",
                        dims: int = 16, n_queries: int = 5,
                        k: int = 3) -> str:
    """Oracle for the embed → cosine top-k retrieval chain. Vectors are
    integer-valued, so dot/norm are exact in both engines and the
    rounded cos + (cos DESC, vec_id ASC) ranking cannot diverge."""
    return (
        _hash_embed_cte(table, text, dims) + ", "
        f"nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM per "
        f"GROUP BY doc_id), "
        f"q AS (SELECT p.* FROM per p JOIN nrm ON nrm.doc_id = p.doc_id "
        f"WHERE p.doc_id < {n_queries} AND nrm.nrm > 0.0E0), "
        f"c AS (SELECT p.* FROM per p JOIN nrm ON nrm.doc_id = p.doc_id "
        f"WHERE nrm.nrm > 0.0E0), "
        f"qd AS (SELECT DISTINCT doc_id FROM q), "
        f"cd AS (SELECT DISTINCT doc_id FROM c), "
        f"rawdot AS (SELECT q.doc_id AS query_id, c.doc_id AS vec_id, "
        f"sum(q.v * c.v) AS dot FROM q JOIN c ON q.bucket = c.bucket "
        f"GROUP BY q.doc_id, c.doc_id), "
        # zero-overlap pairs score cos=0 in the dense engine-side dot —
        # the oracle's pair domain must be the full cross product, not
        # just bucket-sharing pairs, or a sparse query's tail of the
        # top-k diverges
        f"dots AS (SELECT qd.doc_id AS query_id, cd.doc_id AS vec_id, "
        f"coalesce(r.dot, 0.0E0) AS dot FROM qd CROSS JOIN cd "
        f"LEFT JOIN rawdot r ON r.query_id = qd.doc_id "
        f"AND r.vec_id = cd.doc_id WHERE cd.doc_id <> qd.doc_id), "
        f"scored AS (SELECT query_id, vec_id, "
        f"round(dot / (nq.nrm * nc.nrm), 6) AS cos FROM dots "
        f"JOIN nrm nq ON nq.doc_id = query_id "
        f"JOIN nrm nc ON nc.doc_id = vec_id) "
        f"SELECT query_id, vec_id, cos, CAST(rn AS INT) AS rank FROM ("
        f"SELECT s.*, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY cos DESC, vec_id ASC) AS rn FROM scored s) t "
        f"WHERE rn <= {k}"
    )


def corpus_rollup(
    df: DataFrame, strata: tuple = ("lang",), text: str = "text"
) -> DataFrame:
    """Multi-level corpus accounting in ONE pass: docs / whitespace
    tokens / chars per stratum combination PLUS every subtotal level and
    the grand total, via ROLLUP (per-(lang, split) numbers, per-lang
    numbers, and the corpus total come out of a single map-side-partial
    aggregation instead of L separate jobs — the token-budget dashboard
    query of a training-data pipeline).

    Subtotal rows label the rolled-up stratum 'ALL' and carry a
    ``grouping_id`` bitmask (Spark ``grouping_id()`` == the SQL-standard
    ``GROUPING_ID``, identical in DuckDB) so a real stratum value 'ALL'
    cannot be confused with a subtotal."""
    nt = F.size(F.filter(tokens_col(text), lambda t: t != ""))
    base = df.select(
        *strata, nt.alias("_nt"), F.length(text).alias("_nc")
    )
    out = base.rollup(*strata).agg(
        F.grouping_id().cast("int").alias("grouping_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_nt").cast("bigint").alias("n_tokens"),
        F.sum("_nc").cast("bigint").alias("n_chars"),
    )
    return out.select(
        *[F.coalesce(F.col(c), F.lit("ALL")).alias(c) for c in strata],
        "grouping_id", "n_docs", "n_tokens", "n_chars",
    )


def corpus_rollup_sql(table: str = "documents", strata_sql=None,
                      text: str = "text") -> str:
    """Oracle twin of :func:`corpus_rollup`. ``strata_sql`` maps output
    column name -> dialect-neutral SQL expression (defaults to the raw
    ``lang`` column)."""
    strata_sql = strata_sql or {"lang": "lang"}
    names = list(strata_sql)
    sel = ", ".join(f"{v} AS {k}" for k, v in strata_sql.items())
    cols = ", ".join(names)
    outer = ", ".join(f"coalesce({k}, 'ALL') AS {k}" for k in names)
    return (
        f"WITH base AS (SELECT {sel}, "
        f"len(list_filter(string_split({text}, ' '), x -> x <> '')) AS nt, "
        f"length({text}) AS nc FROM {table}) "
        f"SELECT {outer}, CAST(GROUPING({cols}) AS INT) AS grouping_id, "
        f"CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(sum(nt) AS BIGINT) AS n_tokens, "
        f"CAST(sum(nc) AS BIGINT) AS n_chars "
        f"FROM base GROUP BY ROLLUP({cols})"
    )


def lang_id_ngram(
    df: DataFrame, text: str = "text", lang: str = "lang",
    profile_k: int = 40, n: int = 3,
) -> DataFrame:
    """Character-n-gram-profile language ID (the Cavnar–Trenkle shape
    that fastText-less pipelines actually run): per-language profiles =
    the top-``profile_k`` character trigrams of the TRAIN split (by
    corpus frequency, ties lexical); a doc's predicted language is the
    one whose profile covers the most of the doc's distinct trigrams
    (ties broken by language name). Returns (doc_id, pred_lang,
    is_correct) on the TEST split — self-evaluating against the label
    column.

    Plan at 100 TB: profiles are a (n_langs × k)-row broadcast table
    from one hash agg over the train split; classification is one
    distinct-trigram explode + broadcast join + per-doc argmax window.
    Everything is deterministic (hash split, lexical tie-breaks) and
    byte-identical in the DuckDB oracle."""
    from pyspark.sql import Window

    from .sampling import split_column

    lowered = F.lower(F.col(text))
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lowered) - (n - 1),
                                        F.lit(1))),
        lambda i: lowered.substr(i, F.lit(n)),
    ))
    base = df.select(
        "doc_id", F.col(lang).alias("lang"),
        split_column(F.col("doc_id")).alias("split"),
        F.explode(grams).alias("g"),
    ).filter(F.length("g") == n)
    train = base.filter(F.col("split") == "train")
    counts = train.groupBy("lang", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    wp = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    profile = (
        counts.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= profile_k)
        .select(F.col("lang").alias("cand"), "g")
    )
    test = base.filter(F.col("split") == "test")
    scores = (
        test.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "cand")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    ws = Window.partitionBy("doc_id").orderBy(
        F.desc("hits"), F.asc("cand")
    )
    return (
        scores.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") == 1)
        .select(
            "doc_id",
            F.col("cand").alias("pred_lang"),
            (F.col("cand") == F.col("lang")).alias("is_correct"),
        )
    )


def lang_id_ngram_sql(table: str = "documents", text: str = "text",
                      lang: str = "lang", profile_k: int = 40,
                      n: int = 3) -> str:
    """Oracle twin of :func:`lang_id_ngram` (same hash split, same
    lexical tie-breaks)."""
    from .sampling import HASH_MOD, HASH_MULT

    split = (f"CASE WHEN ((doc_id * {HASH_MULT}) % {HASH_MOD}) % 1000 "
             f"< 750 THEN 'train' ELSE 'test' END")
    return (
        f"WITH g0 AS (SELECT doc_id, {lang} AS lang, {split} AS split, "
        f"unnest(generate_series(1, greatest(length(lower({text})) - "
        f"{n - 1}, 1))) AS i, lower({text}) AS lt FROM {table}), "
        f"base AS (SELECT DISTINCT doc_id, lang, split, "
        f"substr(lt, CAST(i AS INT), {n}) AS g FROM g0 "
        f"WHERE length(substr(lt, CAST(i AS INT), {n})) = {n}), "
        f"counts AS (SELECT lang, g, count(*) AS c FROM base "
        f"WHERE split = 'train' GROUP BY lang, g), "
        f"profile AS (SELECT lang AS cand, g FROM ("
        f"SELECT c.*, row_number() OVER (PARTITION BY lang "
        f"ORDER BY c DESC, g ASC) AS r FROM counts c) t "
        f"WHERE r <= {profile_k}), "
        f"scores AS (SELECT b.doc_id, b.lang, p.cand, count(*) AS hits "
        f"FROM base b JOIN profile p ON b.g = p.g "
        f"WHERE b.split = 'test' GROUP BY b.doc_id, b.lang, p.cand) "
        f"SELECT doc_id, cand AS pred_lang, cand = lang AS is_correct "
        f"FROM (SELECT s.*, row_number() OVER (PARTITION BY doc_id "
        f"ORDER BY hits DESC, cand ASC) AS r FROM scores s) t "
        f"WHERE r = 1"
    )


# --------------------------------------------------------------------------
# Gopher quality-rule battery (Rae et al. 2021, appendix A1.1 shape)
# --------------------------------------------------------------------------

#: stopword floor list (Gopher uses a similar short function-word set)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style document quality battery: word-count bounds, mean
    word length window, symbol-to-word ratio (# and ...), bullet-line and
    ellipsis-line fractions, alphabetic-word fraction, stopword floor,
    plus the composite ``passes`` flag. ``keep`` passes extra input
    columns through (e.g. the text itself when gating inline — avoids a
    corpus-corpus join back onto the signals).

    Scale shape: every signal is a deterministic per-row expression over
    the text column — one narrow JVM map, 0 exchanges, 0 Python.  The two
    list lambdas (alpha filter, stopword filter) are interpreted HOFs but
    run over doc-bounded word lists, never a corpus-sized explode; all
    ratios are single-float divisions (no aggregation order), so the
    oracle parity is exact without rounding.
    """
    words = F.filter(F.split(F.col(text), " "), lambda w: w != F.lit(""))
    lines = F.split(F.col(text), "\n")
    n_words = F.size(words).cast("bigint")
    nw_d = F.greatest(F.size(words), F.lit(1)).cast("double")
    nl_d = F.greatest(F.size(lines), F.lit(1)).cast("double")
    word_chars = F.length(
        F.regexp_replace(F.col(text), r"\s", "")
    ).cast("double")
    mean_word_len = word_chars / nw_d
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("double")
    n_stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS))
    ).cast("bigint")
    symbol_ratio = (
        F.regexp_count(F.col(text), F.lit("#"))
        + F.regexp_count(F.col(text), F.lit(r"\.\.\."))
    ).cast("double") / nw_d
    bullet_frac = (
        F.size(
            F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
        ).cast("double")
        / nl_d
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
        ).cast("double")
        / nl_d
    )
    out = df.select(
        "doc_id",
        *keep,
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        (n_alpha / nw_d).alias("frac_alpha_words"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("frac_bullet_lines"),
        ellipsis_frac.alias("frac_ellipsis_lines"),
        n_stop.alias("n_stopwords"),
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("frac_bullet_lines") <= max_bullet_frac)
        & (F.col("frac_ellipsis_lines") <= max_ellipsis_frac)
        & (F.col("frac_alpha_words") >= min_alpha_frac)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    return out.withColumn("passes", passes)


def gopher_rules_sql(
    table: str = "documents",
    text: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> str:
    """Oracle twin of :func:`gopher_rules` (identical word/line split
    rules; float thresholds via the E-notation convention)."""
    from ..fixtures import _f

    stop = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split({text}, ' '), w -> w <> '') AS words,
         string_split({text}, chr(10)) AS lines,
         CAST(length(regexp_replace({text}, '\\s', '', 'g')) AS DOUBLE)
           AS word_chars,
         CAST(len(regexp_extract_all({text}, '#'))
              + len(regexp_extract_all({text}, '\\.\\.\\.'))
              AS DOUBLE) AS n_sym
  FROM {table}
),
sig AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         word_chars / CAST(greatest(len(words), 1) AS DOUBLE)
           AS mean_word_len,
         CAST(len(list_filter(words,
                w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
           / CAST(greatest(len(words), 1) AS DOUBLE) AS frac_alpha_words,
         n_sym / CAST(greatest(len(words), 1) AS DOUBLE) AS symbol_ratio,
         CAST(len(list_filter(lines,
                l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
           / CAST(greatest(len(lines), 1) AS DOUBLE) AS frac_bullet_lines,
         CAST(len(list_filter(lines,
                l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
              AS DOUBLE)
           / CAST(greatest(len(lines), 1) AS DOUBLE)
           AS frac_ellipsis_lines,
         CAST(len(list_filter(words, w -> lower(w) IN ({stop})))
              AS BIGINT) AS n_stopwords
  FROM base
)
SELECT *,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= {_f(min_mean_word_len)}
        AND mean_word_len <= {_f(max_mean_word_len)}
        AND symbol_ratio <= {_f(max_symbol_ratio)}
        AND frac_bullet_lines <= {_f(max_bullet_frac)}
        AND frac_ellipsis_lines <= {_f(max_ellipsis_frac)}
        AND frac_alpha_words >= {_f(min_alpha_frac)}
        AND n_stopwords >= {min_stopwords}) AS passes
FROM sig"""


def ccnet_buckets(
    df: DataFrame,
    text: str = "text",
    stratum: str = "lang",
    lo: float = -12.0,
    hi: float = 0.0,
    bins: int = 512,
    cache_scores: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al. 2020):
    score every document under the corpus bigram LM (:func:`lm_score`),
    then split each language into head / middle / tail terciles — 'head'
    is the highest avg log-likelihood (lowest perplexity) third, the
    slice CCNet keeps for training.

    Tercile thresholds come from ONE bounded (lang, bin) histogram pass
    (:func:`sketch.histogram_quantiles` — both cuts from the same count
    table), NOT a per-language full sort: at 100 TB the global
    window-sort CCNet itself uses becomes the bottleneck, while the
    histogram is ±(hi-lo)/2·bins exact and shuffles at most ``bins`` rows
    per language. Threshold comparison uses the rounded(6) midpoints both
    engines compute identically, so bucket assignment is deterministic.

    Plan: lm_score's bounded LM joins → one doc_id-keyed score join →
    histogram agg (map-side partials) → broadcast threshold join → CASE.
    The scored relation feeds the histogram AND the output, so it is
    persisted by default (the lm_score cache contract: pass a list as
    ``cache_registry`` to receive handles to every persisted relation —
    unpersisting those releases exactly this call's caches — or pass
    ``cache_scores=False``)."""
    from .sketch import histogram_quantiles

    lm = lm_score(df, text, cache_pairs=cache_scores,
                  cache_registry=cache_registry)
    scored = df.select("doc_id", stratum).join(lm, "doc_id")
    if cache_scores:
        scored = scored.persist()
        if cache_registry is not None:
            cache_registry.append(scored)
    cuts = histogram_quantiles(
        scored, [stratum], "avg_ll",
        [("t_tail", 1.0 / 3.0), ("t_head", 2.0 / 3.0)], lo, hi, bins,
    )
    bucket = (
        F.when(F.col("avg_ll") >= F.col("t_head"), F.lit("head"))
        .when(F.col("avg_ll") >= F.col("t_tail"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(cuts), stratum).select(
        "doc_id", stratum, "avg_ll", bucket.alias("bucket")
    )


def ccnet_buckets_sql(
    table: str = "documents",
    text: str = "text",
    stratum: str = "lang",
    lo: float = -12.0,
    hi: float = 0.0,
    bins: int = 512,
) -> str:
    """Oracle twin of :func:`ccnet_buckets` (lm_score_sql CTE + shared
    histogram-quantile arithmetic + the same CASE)."""
    from .sketch import histogram_quantiles_sql

    cuts = histogram_quantiles_sql(
        [stratum], "avg_ll", "scored_l",
        [("t_tail", 1.0 / 3.0), ("t_head", 2.0 / 3.0)], lo, hi, bins,
    )
    return (
        f"WITH lm AS ({lm_score_sql(table, text)}), "
        f"scored_l AS (SELECT lm.doc_id, d.{stratum}, lm.avg_ll "
        f"FROM lm JOIN {table} d ON lm.doc_id = d.doc_id), "
        f"cuts AS ({cuts}) "
        f"SELECT s.doc_id, s.{stratum}, s.avg_ll, "
        f"CASE WHEN s.avg_ll >= c.t_head THEN 'head' "
        f"WHEN s.avg_ll >= c.t_tail THEN 'middle' "
        f"ELSE 'tail' END AS bucket "
        f"FROM scored_l s JOIN cuts c ON s.{stratum} = c.{stratum}"
    )


# ----------------------------------------------------- Zipf law fit --

# ln-quantum for the rank/frequency log moments: |q| <= ln(1e12)*1e5
# ~ 2.77e6, q^2 <= 7.7e12, so the BIGINT moment sums hold ~1.19e6
# ranks (far above any min_count-filtered vocabulary) while the
# 1e-5 ln quantization is invisible at round(.,6) after the fit.
_ZIPF_SCALE = 10**5


def _zipf_out_sql() -> tuple:
    """Shared closing projection over the exact BIGINT moments
    (n_ranks, sx, sy, sxx, syy, sxy) of the quantized (ln rank,
    ln count) pairs. The OLS combination V·Sxy − Sx·Sy cancels
    catastrophically, which is exactly why the moments must be exact
    integers: both engines then run the IDENTICAL double ops on
    identical inputs. < 3 ranks or a constant side -> NULL fit."""
    q = f"{_ZIPF_SCALE}.0E0"
    v = "CAST(n_ranks AS DOUBLE)"
    num = (
        f"({v} * CAST(sxy AS DOUBLE) "
        f"- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    dx = (
        f"({v} * CAST(sxx AS DOUBLE) "
        f"- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    dy = (
        f"({v} * CAST(syy AS DOUBLE) "
        f"- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    slope = f"({num} / {dx})"
    ok = f"n_ranks >= 3 AND {dx} > 0.0E0"
    return (
        f"(CASE WHEN {ok} THEN round({slope}, 6) END) AS slope",
        f"(CASE WHEN {ok} THEN round((CAST(sy AS DOUBLE) "
        f"- {slope} * CAST(sx AS DOUBLE)) / ({v} * {q}), 6) END) "
        f"AS intercept",
        f"(CASE WHEN {ok} AND {dy} > 0.0E0 THEN "
        f"round({num} * {num} / ({dx} * {dy}), 6) END) AS r2",
    )


def zipf_fit(
    df: DataFrame, min_count: int = 5, text: str = "text"
) -> DataFrame:
    """Zipf-law fit of the corpus token rank-frequency curve: OLS of
    ln(count) on ln(rank) over the min_count-filtered vocabulary —
    the classic corpus-health diagnostic (natural text slopes ~ −1;
    boilerplate/spam/synthetic corpora bend the curve, and a drifting
    slope between two crawls is a cheap distribution-shift alarm;
    Zipf 1949, Piantadosi 2014 review).

    Ranks are ordinal over (count DESC, token ASC) — a deterministic
    total order in both engines. ln(rank)/ln(count) quantize to
    BIGINT at 1e-5 before the moment sums (order-independent; the
    OLS normal-equation combination cancels catastrophically, so
    inexact group sums would amplify there). The rank window is one
    single-partition pass over the FILTERED vocabulary (the
    spacetime_scan posture — bounded by min_count, not the corpus;
    the token count itself is a map-side-combined hash aggregate).

    Output: one row (n_ranks, n_tokens, slope, intercept, r2) —
    intercept in ln-count units; floats round(.,6); < 3 ranks ->
    NULL fit."""
    from pyspark.sql import Window

    if int(min_count) < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    c = (
        df.select(F.explode(tokens_col(text)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= int(min_count))
    )
    r = c.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("w"))
        ).cast("bigint"),
    )
    s = f"{_ZIPF_SCALE}.0E0"
    q = r.selectExpr(
        "cnt",
        f"CAST(round(ln(CAST(rnk AS DOUBLE)) * {s}, 0) AS BIGINT) AS qx",
        f"CAST(round(ln(CAST(cnt AS DOUBLE)) * {s}, 0) AS BIGINT) AS qy",
    )
    agg = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranks"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum("qx").cast("bigint").alias("sx"),
        F.sum("qy").cast("bigint").alias("sy"),
        F.expr("CAST(sum(qx * qx) AS BIGINT)").alias("sxx"),
        F.expr("CAST(sum(qy * qy) AS BIGINT)").alias("syy"),
        F.expr("CAST(sum(qx * qy) AS BIGINT)").alias("sxy"),
    )
    return agg.selectExpr("n_ranks", "n_tokens", *_zipf_out_sql())


def zipf_fit_sql(
    table: str = "documents", min_count: int = 5, text: str = "text"
) -> str:
    """Oracle twin of :func:`zipf_fit` (same split rule as the
    word_entropy oracle; same shared closing projection)."""
    if int(min_count) < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    s = f"{_ZIPF_SCALE}.0E0"
    outs = ", ".join(_zipf_out_sql())
    return (
        f"WITH w AS (SELECT unnest(string_split({text}, ' ')) AS w "
        f"FROM {table}), "
        f"c AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM w "
        f"WHERE w <> '' GROUP BY w HAVING count(*) >= {int(min_count)}), "
        f"r AS (SELECT cnt, CAST(row_number() OVER "
        f"(ORDER BY cnt DESC, w ASC) AS BIGINT) AS rnk FROM c), "
        f"q AS (SELECT cnt, "
        f"CAST(round(ln(CAST(rnk AS DOUBLE)) * {s}, 0) AS BIGINT) AS qx, "
        f"CAST(round(ln(CAST(cnt AS DOUBLE)) * {s}, 0) AS BIGINT) AS qy "
        f"FROM r), "
        f"agg AS (SELECT CAST(count(*) AS BIGINT) AS n_ranks, "
        f"CAST(sum(cnt) AS BIGINT) AS n_tokens, "
        f"CAST(sum(qx) AS BIGINT) AS sx, CAST(sum(qy) AS BIGINT) AS sy, "
        f"CAST(sum(qx * qx) AS BIGINT) AS sxx, "
        f"CAST(sum(qy * qy) AS BIGINT) AS syy, "
        f"CAST(sum(qx * qy) AS BIGINT) AS sxy FROM q) "
        f"SELECT n_ranks, n_tokens, {outs} FROM agg"
    )


# ------------------------------------------- inter-labeler agreement --


def agreement_kappa(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Cohen's kappa between two categorical label columns — THE
    chance-corrected agreement scalar of labeled-data QA (classifier
    vs gold label, two annotators, two heuristic taggers; Cohen 1960;
    Landis-Koch banding is the caller's readout). NULL labels on
    either side are excluded (no judgement was made).

    Everything is exact BIGINT to one division: one corpus hash
    aggregation to the bounded (a, b) confusion cells, the marginals
    re-aggregated from the CELL table (never the corpus) and joined
    on label, and kappa = (N·agree − Σ na·nb) / (N² − Σ na·nb) — the
    po/pe fractions cleared to a common denominator (headroom N < 3e9
    rated pairs). Degenerate pe = 1 (both sides constant and equal)
    -> NULL kappa.

    Output: one row (n_pairs, n_agree, po, pe, kappa), floats
    round(.,6)."""
    cells = (
        df.filter(
            F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
        )
        .groupBy(F.col(col_a).alias("la"), F.col(col_b).alias("lb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    na = cells.groupBy("la").agg(
        F.sum("c").cast("bigint").alias("na")
    )
    nb = cells.groupBy("lb").agg(
        F.sum("c").cast("bigint").alias("nb")
    )
    tot = cells.agg(
        F.sum("c").cast("bigint").alias("n_pairs"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN la = lb THEN c END), 0) "
            "AS BIGINT)"
        ).alias("n_agree"),
    )
    sab = (
        na.join(nb, na["la"] == nb["lb"])
        .agg(F.expr("CAST(coalesce(sum(na * nb), 0) AS BIGINT)")
             .alias("sab"))
    )
    return tot.crossJoin(sab).selectExpr(
        "n_pairs", "n_agree", *_kappa_out_sql()
    )


def _kappa_out_sql() -> tuple:
    """Shared closing projection over (n_pairs, n_agree, sab)."""
    nd = "CAST(n_pairs AS DOUBLE)"
    return (
        f"round(CAST(n_agree AS DOUBLE) / {nd}, 6) AS po",
        f"round(CAST(sab AS DOUBLE) / ({nd} * {nd}), 6) AS pe",
        "round(CAST(n_pairs * n_agree - sab AS DOUBLE) "
        "/ nullif(CAST(n_pairs * n_pairs - sab AS DOUBLE), 0.0E0), 6) "
        "AS kappa",
    )


def agreement_kappa_sql(src_sql: str, col_a: str, col_b: str) -> str:
    """Oracle twin of :func:`agreement_kappa` (same shared closing
    projection; same cell-table marginal join)."""
    outs = ", ".join(_kappa_out_sql())
    return (
        f"WITH cells AS (SELECT {col_a} AS la, {col_b} AS lb, "
        f"CAST(count(*) AS BIGINT) AS c FROM ({src_sql}) s "
        f"WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL "
        f"GROUP BY 1, 2), "
        f"ma AS (SELECT la, CAST(sum(c) AS BIGINT) AS na FROM cells "
        f"GROUP BY la), "
        f"mb AS (SELECT lb, CAST(sum(c) AS BIGINT) AS nb FROM cells "
        f"GROUP BY lb), "
        f"tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_pairs, "
        f"CAST(coalesce(sum(CASE WHEN la = lb THEN c END), 0) "
        f"AS BIGINT) AS n_agree FROM cells), "
        f"sj AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) "
        f"AS sab FROM ma JOIN mb ON ma.la = mb.lb) "
        f"SELECT n_pairs, n_agree, {outs} FROM tot CROSS JOIN sj"
    )


# --------------------------------------------- Benford digit screen --


def benford_digits(df: DataFrame, value: str = "value") -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic anomaly screen for machine-generated / fabricated numeric
    columns (Benford 1938; Nigrini's audit practice): natural
    multi-scale magnitudes follow P(d) = log10(1 + 1/d); synthetic
    fills, capped sensors, and unit bugs bend it.

    The first digit is floor(|v| / 10^floor(log10 |v|)) — one shared
    log10/power string (libm precedent; a digit flip needs |v|
    EXACTLY on a power-of-ten boundary where log10 is exact anyway).
    Zero/NULL values carry no leading digit and are excluded.
    Digits 1-9 are zero-filled from a
    9-literal table (the VALUES-unpivot convention), so the output
    shape is fixed. chi2 contribution per digit:
    (n_d − N·p_d)²/(N·p_d) — the caller sums contribs and reads the
    df=8 table.

    Plan: ONE corpus hash aggregation to <= 9 digit counts (plus the
    excluded tally in the same pass), the literal fan-out joining the
    9-row result — nothing after the aggregate exceeds 9 rows.
    Output: (digit, n_obs, share, expected, chi2_contrib),
    floats round(.,6)."""
    return benford_finalize(benford_digit_counts(df, value))


def benford_digit_sql(value: str) -> str:
    """The shared first-digit expression (NULL for zero/NULL values)."""
    d = (
        f"CAST(floor(abs({value}) "
        f"/ power(10.0E0, floor(log10(abs({value}))))) AS BIGINT)"
    )
    return (
        f"(CASE WHEN ({value}) IS NOT NULL AND ({value}) <> 0.0E0 "
        f"THEN {d} END)"
    )


def benford_digit_counts(
    df: DataFrame, value: str = "value"
) -> DataFrame:
    """The (d, c) digit-count table — a sum-monotone aggregate, so it
    is also the complete-mode state of the STREAMING screen (see
    streaming.pipeline.streaming_benford); finalize with
    :func:`benford_finalize`."""
    return (
        df.selectExpr(f"{benford_digit_sql(value)} AS d")
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def benford_finalize(counts: DataFrame) -> DataFrame:
    """Close a (d, c) digit-count table into the fixed 9-row screen
    (shared by the batch operator and the drained streaming state)."""
    import math as _m

    digits = ", ".join(
        f"struct(CAST({k} AS BIGINT) AS digit, "
        f"{repr(_m.log10(1.0 + 1.0 / k))}E0 AS p)"
        for k in range(1, 10)
    )
    tot = counts.filter("d IS NOT NULL").agg(
        F.sum("c").cast("bigint").alias("n_total")
    )
    base = (
        tot.selectExpr(
            "n_total", f"explode(array({digits})) AS s"
        )
        .selectExpr("n_total", "s.digit AS digit", "s.p AS p")
        .join(
            counts.filter("d IS NOT NULL")
            .withColumnRenamed("d", "digit"),
            "digit", "left",
        )
    )
    return base.selectExpr(
        "digit", *_benford_out_sql()
    ).orderBy("digit")


def _benford_out_sql() -> tuple:
    """Shared closing projection over (digit, n_total, p, c)."""
    n = "CAST(coalesce(c, 0) AS DOUBLE)"
    nt = "nullif(CAST(n_total AS DOUBLE), 0.0E0)"
    e = f"({nt} * p)"
    return (
        "CAST(coalesce(c, 0) AS BIGINT) AS n_obs",
        f"round({n} / {nt}, 6) AS share",
        "round(p, 6) AS expected",
        f"round(({n} - {e}) * ({n} - {e}) / {e}, 6) AS chi2_contrib",
    )


def benford_digits_sql(
    table: str = "events", value: str = "value"
) -> str:
    """Oracle twin of :func:`benford_digits` (VALUES digit table
    LEFT-joined, same shared strings)."""
    import math as _m

    d = (
        f"CAST(floor(abs({value}) "
        f"/ power(10.0E0, floor(log10(abs({value}))))) AS BIGINT)"
    )
    vals = ", ".join(
        f"({k}, CAST({repr(_m.log10(1.0 + 1.0 / k))}E0 AS DOUBLE))"
        for k in range(1, 10)
    )
    outs = ", ".join(_benford_out_sql())
    return (
        f"WITH src AS (SELECT (CASE WHEN ({value}) IS NOT NULL "
        f"AND ({value}) <> 0.0E0 THEN {d} END) AS d FROM {table}), "
        f"cnt AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM src "
        f"WHERE d IS NOT NULL GROUP BY d), "
        f"tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) "
        f"AS n_total FROM cnt), "
        f"dig(digit, p) AS (VALUES {vals}) "
        f"SELECT CAST(digit AS BIGINT) AS digit, {outs} "
        f"FROM dig CROSS JOIN tot LEFT JOIN cnt ON cnt.d = digit "
        f"ORDER BY digit"
    )


# ----------------------------------------------- readability scores --

# One shared syllable heuristic: vowel GROUPS per word approximate
# syllables (the standard cheap estimator; exact syllabification needs
# a dictionary). Counted corpus-wide with one regexp_count, so the
# whole operator is a narrow codegen map.
_VOWEL_GROUP_RE = "[aeiouyAEIOUY]+"
_SENT_RE = "[.!?]"


def _readability_exprs(text: str) -> tuple:
    """Shared (n_words, n_sents, n_syll, flesch, fk_grade) strings.

    Flesch reading ease = 206.835 − 1.015·(W/S) − 84.6·(Y/W);
    Flesch-Kincaid grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59
    (Kincaid 1975). Sentence count floors at 1 (fragments still rate);
    word count floors at 1 in the divisors. All three counts are exact
    integers from two regexp_counts + one size(split); the closing
    arithmetic is one shared double expression, round(.,6)."""
    w = (
        f"CAST(size(filter(split({text}, ' '), x -> x <> '')) "
        f"AS BIGINT)"
    )
    sents = (
        f"greatest(CAST(regexp_count({text}, '{_SENT_RE}') "
        f"AS BIGINT), 1)"
    )
    syll = (
        f"CAST(regexp_count({text}, '{_VOWEL_GROUP_RE}') AS BIGINT)"
    )
    wps = "(CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))"
    spw = (
        "(CAST(n_syll AS DOUBLE) "
        "/ CAST(greatest(n_words, 1) AS DOUBLE))"
    )
    flesch = (
        f"(206.835E0 - 1.015E0 * {wps} - 84.6E0 * {spw})"
    )
    fk = f"(0.39E0 * {wps} + 11.8E0 * {spw} - 15.59E0)"
    return w, sents, syll, (
        f"round({flesch}, 6) AS flesch",
        f"round({fk}, 6) AS fk_grade",
    )


def readability(df: DataFrame, text: str = "text") -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    oldest quality features in the text-filtering book (Kincaid 1975;
    still a standard column in corpus quality dashboards next to
    entropy and gopher rules: very low ease flags legalese/boilerplate,
    negative grades flag token soup). Vowel-group syllable heuristic;
    sentence count floors at 1. One narrow codegen map, 0 exchanges.

    Output: (doc_id, n_words, n_sents, n_syll, flesch, fk_grade)."""
    w, sents, syll, outs = _readability_exprs(text)
    return df.selectExpr(
        "doc_id",
        f"{w} AS n_words", f"{sents} AS n_sents", f"{syll} AS n_syll",
    ).selectExpr("doc_id", "n_words", "n_sents", "n_syll", *outs)


def readability_sql(table: str = "documents", text: str = "text") -> str:
    """Oracle twin of :func:`readability`. DuckDB has no regexp_count
    (len(regexp_extract_all) instead) and spells the word count via
    list_filter/string_split — the integer counts are dialect-local,
    the closing arithmetic strings are shared."""
    _, _, _, outs = _readability_exprs(text)
    wd = (
        f"CAST(len(list_filter(string_split({text}, ' '), "
        f"x -> x <> '')) AS BIGINT)"
    )
    sents_d = (
        f"greatest(CAST(len(regexp_extract_all({text}, "
        f"'{_SENT_RE}')) AS BIGINT), 1)"
    )
    syll_d = (
        f"CAST(len(regexp_extract_all({text}, "
        f"'{_VOWEL_GROUP_RE}')) AS BIGINT)"
    )
    return (
        f"SELECT doc_id, n_words, n_sents, n_syll, "
        + ", ".join(outs)
        + f" FROM (SELECT doc_id, {wd} AS n_words, "
        f"{sents_d} AS n_sents, {syll_d} AS n_syll FROM {table}) t"
    )


# -------------------------------------- length-profile lognormal fit --


def length_profile(df: DataFrame, length: str = "n_chars") -> DataFrame:
    """Lognormal fit of the document-length distribution — the corpus
    length FINGERPRINT (document lengths are canonically lognormal-ish;
    a drifting (mu, sigma) between two crawls flags truncation bugs,
    boilerplate floods, or extraction changes faster than eyeballing a
    histogram; the zipf_fit companion for the length axis).

    Method-of-moments on the log scale: mu = mean(ln x),
    sigma² = var(ln x) over positive lengths (non-positive/NULL
    excluded, counted). ln values quantize to BIGINT at 1e-5 (the
    zipf posture — exact order-independent moments; headroom q² <=
    7.7e12 ⇒ ~1.19e6·1e6 rows), so both engines close the same
    integers through one shared double expression. Implied median =
    e^mu and mode = e^{mu − sigma²} round(.,6).

    Output: one row (n_docs, n_excluded, mu, sigma, median_len,
    mode_len); sigma NULL for < 2 docs."""
    from .text import _ZIPF_SCALE as _S  # same quantum, same headroom

    s = f"{_S}.0E0"
    q = (
        f"(CASE WHEN ({length}) IS NOT NULL AND ({length}) > 0 THEN "
        f"CAST(round(ln(CAST({length} AS DOUBLE)) * {s}, 0) AS BIGINT) "
        f"END)"
    )
    agg = df.selectExpr(f"{q} AS ql").agg(
        F.expr("CAST(count(ql) AS BIGINT)").alias("n_docs"),
        F.expr(
            "CAST(count(CASE WHEN ql IS NULL THEN 1 END) AS BIGINT)"
        ).alias("n_excluded"),
        F.expr("CAST(coalesce(sum(ql), 0) AS BIGINT)").alias("sx"),
        F.expr("CAST(coalesce(sum(ql * ql), 0) AS BIGINT)").alias("sxx"),
    )
    return agg.selectExpr(
        "n_docs", "n_excluded", *_lenprof_out_sql()
    )


def _lenprof_out_sql() -> tuple:
    """Shared closing projection over (n_docs, sx, sxx)."""
    from .text import _ZIPF_SCALE as _S

    s = f"{_S}.0E0"
    n = "CAST(n_docs AS DOUBLE)"
    mu = f"(CAST(sx AS DOUBLE) / {n} / {s})"
    var = (
        f"((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) "
        f"* CAST(sx AS DOUBLE) / {n}) / ({n} - 1.0E0) / ({s} * {s}))"
    )
    sig = f"sqrt(greatest({var}, 0.0E0))"
    g = lambda e: f"(CASE WHEN n_docs >= 2 THEN {e} END)"
    return (
        f"(CASE WHEN n_docs >= 1 THEN round({mu}, 6) END) AS mu",
        g(f"round({sig}, 6)") + " AS sigma",
        f"(CASE WHEN n_docs >= 1 THEN round(exp({mu}), 6) END) "
        f"AS median_len",
        g(f"round(exp({mu} - {sig} * {sig}), 6)") + " AS mode_len",
    )


def length_profile_sql(
    table: str = "documents", length: str = "n_chars"
) -> str:
    """Oracle twin of :func:`length_profile`."""
    s = f"{_ZIPF_SCALE}.0E0"
    q = (
        f"(CASE WHEN ({length}) IS NOT NULL AND ({length}) > 0 THEN "
        f"CAST(round(ln(CAST({length} AS DOUBLE)) * {s}, 0) AS BIGINT) "
        f"END)"
    )
    outs = ", ".join(_lenprof_out_sql())
    return (
        f"WITH q AS (SELECT {q} AS ql FROM {table}), "
        f"agg AS (SELECT CAST(count(ql) AS BIGINT) AS n_docs, "
        f"CAST(count(CASE WHEN ql IS NULL THEN 1 END) AS BIGINT) "
        f"AS n_excluded, "
        f"CAST(coalesce(sum(ql), 0) AS BIGINT) AS sx, "
        f"CAST(coalesce(sum(ql * ql), 0) AS BIGINT) AS sxx FROM q) "
        f"SELECT n_docs, n_excluded, {outs} FROM agg"
    )
