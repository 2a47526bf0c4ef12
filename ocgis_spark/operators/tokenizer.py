"""Distributed BPE vocabulary training (Sennrich et al. 2016) for
large-scale training-data pipelines.

Scale shape: the corpus is touched EXACTLY ONCE — one explode + hash
aggregation (map-side partials) builds the (word, n) frequency table, and
every BPE iteration after that runs on the vocabulary table only, whose
size is independent of corpus size (a 100-TB corpus still has a ~1e7-row
word table).  Per iteration: one hash aggregation over the exploded
adjacent-pair list + a TakeOrdered(1) for the arg-max pair, then a pure
column-expression merge fold — no Python in any per-row path.  Each
iteration is `localCheckpoint`-pinned so round cost stays constant (the
connected-components-loop lesson).  `batch=1` (default) is the exact
textbook recurrence, which is what the oracle replays; `batch>1` is the
production path for real vocab sizes (~30k merges): up to `batch`
pairwise non-interacting merges per round (symbol sets disjoint incl.
the created symbol, so they commute exactly — see `select_disjoint`),
cutting driver round-trips ~`batch`x.

Merge semantics are the textbook greedy leftmost non-overlapping pass,
implemented as a left fold: scanning the symbol sequence, merge whenever
the last emitted symbol is `lhs` and the current one is `rhs` (a run
"aaaa" under merge (a,a) becomes [aa, aa], never [aa, a, a]).  The DuckDB
oracle reproduces the identical semantics relationally (gaps-and-islands
parity over match positions) with the K iterations unrolled as CTE
stages, so the whole train → vocab → segmentation chain is exactly
checkable.

Reference parity note: the reference engine has no tokenizer (this is one
of the training-pipeline additions the build brief asks for); the word
regex deliberately reuses the repo's lowercase alphanumeric convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: lowercase alphanumeric word rule, shared verbatim with the oracle SQL
WORD_RE = "[a-z0-9]+"

#: end-of-word marker symbol (Sennrich's </w>) — lets merged tokens
#: distinguish word-final from word-internal contexts
EOW = "</w>"

MERGE_SCHEMA = "step int, lhs string, rhs string, merged string, freq bigint"


def word_table(df: DataFrame, text: str = "text") -> DataFrame:
    """(word, n) corpus frequency table — the ONE corpus-sized pass."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(WORD_RE), 0)
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").cast("bigint").alias("n"))


def _initial_seq(words: DataFrame) -> DataFrame:
    chars = F.regexp_extract_all(F.col("word"), F.lit("."), 0)
    return words.withColumn("seq", F.concat(chars, F.array(F.lit(EOW))))


def _merge_fold(rules: list[tuple[str, str, str]]):
    """Greedy leftmost non-overlapping merge of one or more SYMBOL-DISJOINT
    (lhs, rhs) -> merged rules in a single left fold over the symbol array
    (pure column expressions).  Disjointness (enforced by the caller,
    incl. each rule's CREATED symbol) guarantees at most one rule can
    match any (last-emitted, current) pair, so one pass applies them all
    and the result equals applying the rules one at a time in any order.
    """
    empty = F.expr("CAST(array() AS ARRAY<STRING>)")

    def step_fn(acc, s):
        expr = F.concat(acc, F.array(s))
        for lhs, rhs, merged in rules:
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(lhs))
                & (s == F.lit(rhs))
            )
            expr = F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(expr)
        return expr

    return F.aggregate(F.col("seq"), empty, step_fn)


def select_disjoint(
    candidates: list[tuple[str, str, int]], batch: int
) -> list[tuple[str, str, str, int]]:
    """Greedy top-`batch` selection of pairwise NON-INTERACTING merges
    from (l, r, cnt) candidates already sorted by (cnt DESC, l, r).

    Two merges interact if their symbol sets overlap — including the
    symbol each merge CREATES: rule (a,b)->'ab' manufactures new 'ab'
    tokens that a same-round rule ('ab',c) would consume, which would
    smuggle in sequential semantics with stale counts.  Requiring
    {lhs, rhs, merged} pairwise disjoint makes the picked merges commute
    exactly: each one's round-start frequency is still exact when it
    applies, whatever the order.
    """
    picked: list[tuple[str, str, str, int]] = []
    used: set[str] = set()
    for l, r, cnt in candidates:
        if len(picked) >= batch:
            break
        syms = {l, r, l + r}
        if used & syms:
            continue
        picked.append((l, r, l + r, cnt))
        used |= syms
    return picked


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count.  Guard
    size(seq) >= 2: sequence(1, 0) would DESCEND, not return empty."""
    pairs = (
        words.filter(F.size("seq") >= 2)
        .select(
            "n",
            F.explode(F.sequence(F.lit(1), F.size("seq") - 1)).alias("i"),
            "seq",
        )
        .select(
            F.element_at("seq", F.col("i")).alias("l"),
            F.element_at("seq", F.col("i") + 1).alias("r"),
            "n",
        )
    )
    return pairs.groupBy("l", "r").agg(
        F.sum("n").cast("bigint").alias("cnt")
    )


def bpe_train_state(
    spark: SparkSession,
    df: DataFrame,
    text: str = "text",
    num_merges: int = 8,
    batch: int = 1,
) -> tuple[list[tuple], DataFrame]:
    """Run BPE training; return (merge rows, final symbol-seq word table).

    Each round collects a bounded candidate slice (the arg-max pairs) —
    the merge list is inherently driver state, like k-means centroids in
    ivf_train.  Ties break deterministically: count DESC, then (lhs, rhs)
    ascending (binary collation both engines).

    `batch=1` is the exact textbook recurrence (what the SQL oracle
    replays).  `batch>1` is the production path for real vocabularies
    (~30k merges): each round applies up to `batch` pairwise
    NON-INTERACTING merges (see :func:`select_disjoint`) in ONE fold
    pass, cutting the round count — and with it the driver round-trips
    and checkpoint barriers — by ~`batch`×.  Within a round the picked
    merges commute exactly, so every recorded frequency is the true
    corpus count at application time; across rounds the merge ORDER may
    differ from strict textbook order (the standard batched-BPE
    approximation).
    """
    words = _initial_seq(df.transform(word_table, text)).persist()
    n_words = words.count()  # materialize before the loop
    # Size the vocab-table layout from its MEASURED row count (~100k words
    # per partition): the iteration loop runs dozens of stages over this
    # table, and letting it inherit the corpus aggregation's shuffle
    # partitioning would pay 32-task scheduling per stage for a table that
    # may hold 31 rows (localCheckpoint pins the layout, so AQE never gets
    # to coalesce it).  At 100 TB (~1e7 words) this yields ~100 partitions.
    nparts = max(1, int(n_words) // 100_000)
    if nparts != words.rdd.getNumPartitions():
        words2 = words.repartition(nparts).persist()
        words2.count()
        words.unpersist()
        words = words2
    merges: list[tuple] = []
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        # over-fetch: the disjointness filter can reject candidates, and
        # 8x covers the worst realistic rejection rate without a re-query
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(max(8 * want, 8))
            .collect()
        )
        rules = select_disjoint(
            [(r["l"], r["r"], int(r["cnt"])) for r in top], want
        )
        if not rules:
            break  # fully merged corpus — oracle stages go empty too
        for lhs, rhs, merged, cnt in rules:
            merges.append((len(merges) + 1, lhs, rhs, merged, cnt))
        nxt = words.withColumn(
            "seq", _merge_fold([(l, r, m) for l, r, m, _ in rules])
        ).localCheckpoint()
        words.unpersist()
        words = nxt
    return merges, words


def bpe_train(
    spark: SparkSession,
    df: DataFrame,
    text: str = "text",
    num_merges: int = 8,
    batch: int = 1,
) -> DataFrame:
    """The learned merge table: (step, lhs, rhs, merged, freq)."""
    merges, words = bpe_train_state(spark, df, text, num_merges, batch)
    words.unpersist()
    return spark.createDataFrame(merges, schema=MERGE_SCHEMA)


def bpe_vocab(
    spark: SparkSession,
    df: DataFrame,
    text: str = "text",
    num_merges: int = 8,
    batch: int = 1,
) -> DataFrame:
    """Post-merge symbol inventory with corpus frequencies: (sym, freq)."""
    _, words = bpe_train_state(spark, df, text, num_merges, batch)
    out = (
        words.select(F.explode("seq").alias("sym"), "n")
        .groupBy("sym")
        .agg(F.sum("n").cast("bigint").alias("freq"))
    )
    return out


def bpe_segment(
    spark: SparkSession,
    df: DataFrame,
    text: str = "text",
    num_merges: int = 8,
    batch: int = 1,
) -> DataFrame:
    """Per-word trained segmentation: (word, n, seg) with seg the
    '|'-joined merged symbol sequence.  This lexicon IS the practical
    serving artifact: encoding a document stream is a broadcast join of
    its words against this table (OOV words fall back to characters), so
    inference never re-runs the fold."""
    _, words = bpe_train_state(spark, df, text, num_merges, batch)
    return words.select(
        "word", "n", F.array_join("seq", "|").alias("seg")
    )


def bpe_encode(
    spark: SparkSession,
    df: DataFrame,
    text: str = "text",
    doc_id: str = "doc_id",
    num_merges: int = 8,
    lexicon: DataFrame | None = None,
) -> DataFrame:
    """Encode documents with a trained segmentation lexicon — the
    corpus-scale serving path: per-doc word explode, BROADCAST join
    against the vocab-sized (word, pieces) lexicon, out-of-vocabulary
    words fall back to characters (+ EOW), then order-exact reassembly
    (posexplode position + array_sort(struct) — never bare collect_list
    order).  Output: (doc_id, tokens '|'-joined, n_tokens).

    At 100 TB this is one narrow explode + one broadcast hash join + one
    doc_id hash agg; nothing re-runs the merge fold.  Pass `lexicon` (a
    bpe_segment output) to encode against a previously-trained vocab;
    otherwise the lexicon is trained on `df` itself.
    """
    if lexicon is None:
        _, words = bpe_train_state(spark, df, text, num_merges)
        lex = words.select("word", F.col("seq").alias("pieces"))
    else:
        lex = lexicon.select(
            "word", F.split(F.col("seg"), r"\|").alias("pieces")
        )
    toks = df.select(
        doc_id,
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(WORD_RE), 0)
        ).alias("pos", "word"),
    )
    char_fallback = F.concat(
        F.regexp_extract_all(F.col("word"), F.lit("."), 0),
        F.array(F.lit(EOW)),
    )
    joined = toks.join(F.broadcast(lex), "word", "left").withColumn(
        "pieces", F.coalesce(F.col("pieces"), char_fallback)
    )
    return joined.groupBy(doc_id).agg(
        F.array_join(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda x: x["pieces"],
                )
            ),
            "|",
        ).alias("tokens"),
        F.sum(F.size("pieces")).cast("bigint").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# DuckDB oracle: the K iterations unrolled as CTE stages.  Merge pass =
# gaps-and-islands parity (leftmost non-overlapping == odd positions within
# each maximal run of consecutive matches), identical semantics to the fold.
# --------------------------------------------------------------------------

def _stage_sql(i: int) -> str:
    p = i - 1
    return f"""
p{i} AS MATERIALIZED (
  SELECT seq[t.i] AS l, seq[t.i + 1] AS r, CAST(sum(n) AS BIGINT) AS cnt
  FROM s{p}, unnest(generate_series(1, len(seq) - 1)) AS t(i)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT l, r, l || r AS m, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1
),
e{i} AS MATERIALIZED (
  SELECT s.word, s.n, t.i, s.seq[t.i] AS sym, len(s.seq) AS ln, b.l, b.r, b.m
  FROM s{p} s CROSS JOIN b{i} b, unnest(generate_series(1, len(s.seq))) AS t(i)
),
m{i} AS MATERIALIZED (
  SELECT word, n, i, sym, m,
         coalesce(i < ln AND sym = l
                  AND lead(sym) OVER (PARTITION BY word ORDER BY i) = r,
                  false) AS mt
  FROM e{i}
),
c{i} AS MATERIALIZED (
  SELECT word, n, i, sym, m,
         mt AND (ROW_NUMBER() OVER (PARTITION BY word, isl ORDER BY i) % 2 = 1) AS ch
  FROM (
    SELECT *, CASE WHEN mt
                   THEN i - ROW_NUMBER() OVER (PARTITION BY word, mt ORDER BY i)
              END AS isl
    FROM m{i}
  )
),
s{i} AS MATERIALIZED (
  SELECT word, n, list(CASE WHEN ch THEN m ELSE sym END ORDER BY i) AS seq
  FROM (
    SELECT *, coalesce(lag(ch) OVER (PARTITION BY word ORDER BY i), false) AS pch
    FROM c{i}
  )
  WHERE NOT pch
  GROUP BY word, n
)"""


def _prefix_sql(table: str, text: str, num_merges: int) -> str:
    stages = ",".join(_stage_sql(i) for i in range(1, num_merges + 1))
    return f"""WITH w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(lower({text}), '{WORD_RE}')) AS word
        FROM {table})
  GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT word, n, list_append(regexp_extract_all(word, '.'), '{EOW}') AS seq
  FROM w0
),{stages}"""


def bpe_train_sql(
    table: str = "documents", text: str = "text", num_merges: int = 8
) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, l AS lhs, r AS rhs, m AS merged, cnt AS freq FROM b{i}"
        for i in range(1, num_merges + 1)
    )
    return _prefix_sql(table, text, num_merges) + f"\n{unions}"


def bpe_vocab_sql(
    table: str = "documents", text: str = "text", num_merges: int = 8
) -> str:
    return _prefix_sql(table, text, num_merges) + f"""
SELECT u.sym AS sym, CAST(sum(s.n) AS BIGINT) AS freq
FROM s{num_merges} s, unnest(s.seq) AS u(sym)
GROUP BY u.sym"""


def bpe_segment_sql(
    table: str = "documents", text: str = "text", num_merges: int = 8
) -> str:
    return _prefix_sql(table, text, num_merges) + f"""
SELECT word, n, array_to_string(seq, '|') AS seg FROM s{num_merges}"""


def bpe_encode_sql(
    table: str = "documents",
    text: str = "text",
    doc_id: str = "doc_id",
    num_merges: int = 8,
) -> str:
    """Self-trained encode replay: the segment lexicon stages feed a word
    lookup with a character (+EOW) fallback, reassembled in word order."""
    return _prefix_sql(table, text, num_merges) + f""",
wexp AS MATERIALIZED (
  SELECT {doc_id}, t.i AS pos, words[t.i] AS word
  FROM (SELECT {doc_id},
               regexp_extract_all(lower({text}), '{WORD_RE}') AS words
        FROM {table}),
       unnest(generate_series(1, len(words))) AS t(i)
),
enc AS MATERIALIZED (
  SELECT w.{doc_id}, w.pos,
         coalesce(lex.seq,
                  list_append(regexp_extract_all(w.word, '.'), '{EOW}'))
           AS pieces
  FROM wexp w LEFT JOIN s{num_merges} lex ON w.word = lex.word
)
SELECT {doc_id},
       array_to_string(flatten(list(pieces ORDER BY pos)), '|') AS tokens,
       CAST(sum(len(pieces)) AS BIGINT) AS n_tokens
FROM enc GROUP BY {doc_id}"""
