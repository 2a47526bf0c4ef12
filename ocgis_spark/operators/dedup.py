"""Deduplication family for training-data pipelines.

* exact: hash-groupBy on normalized text (one shuffle; map-side combine);
* MinHash + LSH banding: shingle → minhash (md5-based, so the DuckDB
  oracle computes byte-identical signatures) → band → bucket self-join →
  exact Jaccard verify on candidates only;
* SimHash: per-bit majority vote over token hashes, bucket on the
  signature;
* n-gram Jaccard: exact verification metric on LSH candidates.

Scale notes: nothing here pairs the full corpus — candidate pairs come
only from equal LSH bands (bounded bucket join); token explosion is a
single map + two shuffles (groupBy doc, groupBy band). Verification joins
are candidate-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8
BAND_SIZE = 4  # 2 bands of 4 hashes (band collision prob = jaccard^4)
SIM_BITS = 16
SHINGLE_LEN = 12  # character shingles


def normalize(text="text"):
    col = F.expr(text) if isinstance(text, str) else text
    return F.lower(F.trim(col))


def exact_dups(df: DataFrame, text="text") -> DataFrame:
    """Groups of byte-identical (normalized) docs: canonical id + count."""
    return (
        df.select(F.col("doc_id"), normalize(text).alias("norm"))
        .groupBy("norm")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("dup_n"))
        .filter(F.col("dup_n") > 1)
        .select("canonical_id", "dup_n")
    )


def _doc_tokens(df: DataFrame, text: str = "text") -> DataFrame:
    """Distinct whitespace tokens per doc (unigram shingles — used by
    SimHash, where per-doc output keeps the small vocab harmless)."""
    return (
        df.select("doc_id", F.explode(F.split(normalize(text), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )


def doc_shingles(df: DataFrame, text: str = "text", n: int = SHINGLE_LEN,
                 carry: tuple = ()) -> DataFrame:
    """Distinct character n-gram shingles per doc. Character shingles keep
    the shingle space large even on a tiny vocabulary, so LSH buckets stay
    sparse (unigram-token sets on a 30-word vocab would put the whole
    corpus in one bucket → O(n²) candidate pairs)."""
    # dedup WITHIN the doc via array_distinct (a local array op) instead
    # of a global .distinct(): shingle uniqueness is per-document, so the
    # corpus-wide shuffle of the EXPLODED relation the old distinct paid
    # was pure waste (round 3). The explode is a ~text_length× row
    # expander, so rebalance the (much smaller) doc table first when the
    # scan is under-split — a no-op on real multi-split inputs, and it
    # keeps the 64-hash signature map on all cores for small local files.
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism, "doc_id")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1))),
            lambda i: F.col(text).substr(i, F.lit(n)),
        )
    )
    return df.select("doc_id", *carry, F.explode(shingles).alias("tok"))


def minhash_signatures(
    df: DataFrame, text: str = "text", hash_fn: str = "md5"
) -> DataFrame:
    """N minhashes per doc: h_i(doc) = min over shingles of hash(i, shingle).

    ``hash_fn='md5'``: md5(i || '#' || shingle) — byte-identical in DuckDB,
    used by the correctness gate. ``hash_fn='xxhash64'``: seeded xxhash64 —
    pure JVM, ~8x cheaper, the 100 TB path (identical banding semantics,
    no SQL oracle)."""
    return minhash_signatures_from_tokens(doc_shingles(df, text), hash_fn)


def lsh_candidates(sigs: DataFrame) -> DataFrame:
    """Candidate pairs sharing at least one LSH band (doc_a < doc_b)."""
    n_bands = N_MINHASH // BAND_SIZE
    bands = []
    for b in range(n_bands):
        cols = [f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)]
        bands.append(
            sigs.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("band_key"),
            )
        )
    all_bands = bands[0]
    for b in bands[1:]:
        all_bands = all_bands.unionByName(b)
    a = all_bands.alias("a")
    b2 = all_bands.alias("b")
    pairs = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def jaccard_verify(
    pairs: DataFrame, toks: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard on candidate pairs only: |A∩B| / |A∪B| ≥ t.

    Scale shape: every relation here is first semi-filtered to the docs
    that actually appear in a candidate pair — set sizes and the
    intersection join touch O(candidates), not O(corpus) (round 3; the
    old per-doc size aggregation shuffled the full shingle relation even
    when LSH produced a handful of pairs).

    The candidate-pair relation stays persisted while the returned plan
    is alive (four branches read it). Long-lived sessions should release
    it after consuming the result (``spark.catalog.clearCache()`` or pass
    an explicitly persisted ``pairs`` and unpersist your handle)."""
    # persist the candidate pairs: cand_docs/ta/tb/sizes all branch off
    # them, and an unpersisted LSH pipeline would re-run once per branch
    pairs = pairs.persist()
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    toks_c = toks.join(cand_docs, "doc_id", "leftsemi")
    ta = toks_c.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks_c.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = toks_c.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def minhash_dedup(
    df: DataFrame, text: str = "text", threshold: float = 0.5,
    hash_fn: str = "md5", cache_tokens: bool = True,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ t
    (Jaccard over the same character-shingle sets).

    The shingle set feeds FIVE plan branches (signatures, both sides of the
    intersection join, both size lookups); without caching, Catalyst
    re-explodes the corpus once per branch (seen as 6 repeated Exchanges in
    the physical plan), so the token set is persisted for the lifetime of
    the query."""
    toks = doc_shingles(df, text)
    if cache_tokens:
        toks = toks.persist()
    sigs = minhash_signatures_from_tokens(toks, hash_fn)
    return jaccard_verify(lsh_candidates(sigs), toks, threshold)


#: md5-family slicing: N_MINHASH independent 8-hex (32-bit) hash values
#: from TWO digests instead of one digest per hash (the md5-slice trick,
#: same as sketch.md5_slice_int_sql) — md5 dominated the md5-family
#: signature cost (r4s5). Fixed-width lowercase hex keeps the
#: lexicographic min == numeric min; byte-identical in DuckDB.
_MD5_WIDE = 64  # concat of 2 digests
assert N_MINHASH * 8 <= _MD5_WIDE


def _md5_wide(tok):
    return F.concat(F.md5(tok), F.md5(F.concat(F.lit("x#"), tok)))


def minhash_signatures_from_tokens(
    toks: DataFrame, hash_fn: str = "md5"
) -> DataFrame:
    if hash_fn == "md5":
        hs = toks.select("doc_id", _md5_wide(F.col("tok")).alias("_h"))
        aggs = [
            F.min(F.substring(F.col("_h"), 1 + 8 * i, 8)).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
        return hs.groupBy("doc_id").agg(*aggs)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("tok"))).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def minhash_signatures_grouped(
    df: DataFrame, text: str = "text", hash_fn: str = "xxhash64",
    carry: tuple = (),
) -> DataFrame:
    """Explode + hash-agg signature form for BATCH frames — bit-identical
    values to :func:`minhash_signatures_narrow` (min over the per-doc
    distinct shingle set == min over the raw shingle array) but ~6x
    cheaper per doc: the per-shingle hash runs inside whole-stage codegen
    instead of the interpreted higher-order-function evaluator (measured
    175 s -> 30 s for 500k ~300-char docs x 8 xxhash64 at local[8]). The
    groupBy is NOT a real shuffle cost at scale: doc_id is unique
    pre-explode, so the map-side partial min already collapses each doc
    to one row and the exchange ships exactly the narrow form's output.
    Streaming paths must keep the narrow form (a stream groupBy would
    need watermarked state; the narrow map is stateless).

    Shingles come from explode(sequence) + a substr PROJECTION rather
    than ``doc_shingles``'s transform-lambda array (another interpreted
    per-element path; a further measured −28%): Generate → Project →
    partial agg fuse into one codegen stage, so the text column carried
    through the explode never materializes per row. No array_distinct —
    min is duplicate-insensitive, so in-doc repeats only add agg rows to
    the same codegen loop. Values stay bit-identical (parity-tested)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism, "doc_id")
    n = SHINGLE_LEN
    ex = df.select(
        "doc_id", *carry, F.col(text).alias("_t"),
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1))
        )).alias("_i"),
    )
    toks = ex.select(
        "doc_id", *carry,
        F.col("_t").substr(F.col("_i"), F.lit(n)).alias("tok"),
    )
    if hash_fn == "md5":
        hs = toks.select(
            "doc_id", *carry, _md5_wide(F.col("tok")).alias("_h")
        )
        aggs = [
            F.min(F.substring(F.col("_h"), 1 + 8 * i, 8)).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
        return hs.groupBy("doc_id", *carry).agg(*aggs)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("tok"))).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    return toks.groupBy("doc_id", *carry).agg(*aggs)


def minhash_signatures_narrow(
    df: DataFrame, text: str = "text", hash_fn: str = "xxhash64",
    n: int = SHINGLE_LEN, carry: tuple = (),
) -> DataFrame:
    """MinHash signatures as a pure NARROW MAP: build the shingle array
    per row and take ``array_min`` of the transformed hashes — min is
    duplicate-insensitive, so skipping the distinct/groupBy changes
    nothing. ZERO shuffle: the signature stage of a 100-TB banding run
    costs one scan. (The groupBy form stays for pipelines that need the
    exploded token set anyway — exact-Jaccard verification reuses it.)

    Shingling matches :func:`doc_shingles` exactly (raw column; callers
    pre-normalize, as minhash_dedup's corpus derivation does). ``carry``
    names extra columns to keep alongside the signature (e.g. an
    event-time column for watermarked streaming)."""
    col = F.col(text)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(n)),
    )
    # NOTE: the lambda must be UNARY — F.transform passes the array index
    # as a second argument to binary callables (a `lambda s, i=i:` closure
    # silently receives the position instead of the captured seed)
    if hash_fn == "md5":
        # hoist the wide digest into its OWN projection: slicing inside
        # each of the 8 per-hash transforms re-hashed every shingle per
        # column (16 digests/shingle instead of 2 — r4 review finding).
        # The multi-use, non-cheap alias blocks CollapseProject, so the
        # wide array is computed once per row (plan-asserted pytest).
        base = df.select(
            "doc_id", *carry,
            F.transform(shingles, _md5_wide).alias("_hs"),
        )

        def mk_slice(i: int):
            return lambda h: F.substring(h, 1 + 8 * i, 8)

        cols = [
            F.array_min(F.transform(F.col("_hs"), mk_slice(i))).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
        return base.select("doc_id", *carry, *cols)

    def mk(i: int):
        return lambda s: F.xxhash64(F.lit(i), s)

    cols = [
        F.array_min(F.transform(shingles, mk(i))).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    return df.select("doc_id", *carry, *cols)


def band_keys(sigs: DataFrame, carry: tuple = ()) -> DataFrame:
    """(doc_id, band, band_key) from a signature frame as ONE narrow map
    + posexplode — band_key text identical to :func:`lsh_candidates`'s
    ``concat_ws('|', mh...)`` per band, without its N-band union (one
    scan instead of N)."""
    n_bands = N_MINHASH // BAND_SIZE
    arr = F.array(*[
        F.concat_ws(
            "|", *[F.col(f"mh{b * BAND_SIZE + j}") for j in range(BAND_SIZE)]
        )
        for b in range(n_bands)
    ])
    return sigs.select(
        "doc_id", *carry, F.posexplode(arr).alias("band", "band_key")
    )


def lsh_band_index(
    df: DataFrame, text: str = "text", hash_fn: str = "xxhash64"
) -> DataFrame:
    """Distinct (band, band_key) bucket table over a historical corpus —
    the STATIC side of ingest-time near-dup screening. At 100 TB this is
    built once per index refresh (codegen signature agg → posexplode →
    distinct) and written bucketed by (band, band_key) so every
    subsequent probe join is co-located."""
    sigs = minhash_signatures_grouped(df, text, hash_fn)
    return band_keys(sigs).select("band", "band_key").distinct()


def near_dup_hits(
    df_new: DataFrame, index: DataFrame, text: str = "text",
    hash_fn: str = "xxhash64", event_time: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """doc_ids among ``df_new`` sharing ≥ 1 LSH band bucket with an
    indexed corpus (:func:`lsh_band_index`) — the ingest-time screen
    that keeps NEW data from re-adding near-duplicates of the training
    corpus. The same logical chain runs on a batch frame or a readStream
    source: signatures → posexplode → (stream-)static LEFT SEMI
    equi-join on (band, band_key) → per-doc dedup. Batch frames take the
    codegen grouped signature form (~6x cheaper per doc, identical
    values); streams keep the stateless narrow map (a stream groupBy
    would need watermarked agg state). Streaming state holds only
    emitted hit ids; pass ``event_time`` to bound it with a watermark
    (``dropDuplicatesWithinWatermark`` — state expires after
    ``watermark_delay``, the right call when a doc_id cannot recur
    later than that). Nothing ever pairs documents."""
    stream_wm = event_time is not None and df_new.isStreaming
    if stream_wm:
        df_new = df_new.withWatermark(event_time, watermark_delay)
    carry = (event_time,) if event_time else ()
    sig_fn = (minhash_signatures_narrow if df_new.isStreaming
              else minhash_signatures_grouped)
    sigs = sig_fn(df_new, text, hash_fn, carry=carry)
    hits = band_keys(sigs, carry=carry).join(
        index, ["band", "band_key"], "left_semi"
    )
    hits = hits.select("doc_id", *carry)
    if stream_wm:
        return hits.dropDuplicatesWithinWatermark(["doc_id"])
    return hits.dropDuplicates(["doc_id"])


def simhash(df: DataFrame, text: str = "text",
            tokens: str = "unigram") -> DataFrame:
    """SIM_BITS-bit SimHash: bit b votes -1/+1 per token by the parity
    class of hex digit b+1 of ONE md5(token) digest; sign of the vote
    sum sets the bit. The digits of a single digest are independent coin
    flips, so this carries the same statistics as the earlier
    one-digest-PER-BIT formula at 1/SIM_BITS of the hash cost (md5 was
    ~the entire signature cost — r4s5; oracle rule updated in lockstep).

    ``tokens='shingle'`` votes over character n-gram shingles instead of
    whitespace unigrams — on small shared vocabularies unigram signatures
    collapse corpus-wide (every doc shares most words), while shingles
    keep them doc-specific; use shingles for near-dup banding."""
    toks = (doc_shingles(df, text) if tokens == "shingle"
            else _doc_tokens(df, text))
    hashed = toks.select("doc_id", F.md5(F.col("tok")).alias("h"))
    bit_cols = []
    for b in range(SIM_BITS):
        vote = F.when(
            F.substring(F.col("h"), b + 1, 1).isin(*"01234567"), -1
        ).otherwise(1)
        bit_cols.append(F.sum(vote).alias(f"v{b}"))
    votes = hashed.groupBy("doc_id").agg(*bit_cols)
    bits = [
        F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(SIM_BITS)
    ]
    return votes.select("doc_id", F.concat(*bits).alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-duplicate pairs — the banding step the bare signature
    lacks: split the SIM_BITS signature into ``bands`` equal bit bands;
    candidates share at least one band verbatim (a pair within
    ``max_hamming`` bits must agree on ≥1 band when
    ``max_hamming < bands`` — pigeonhole, same guarantee as MinHash/LSH
    banding); exact Hamming distance verifies.

    Relational throughout: band buckets are substrings of the bit-string
    signature (bucket join, never all-pairs); the Hamming sum is
    SIM_BITS per-position compares — pure codegen, dialect-identical to
    the DuckDB oracle. Returns (doc_a, doc_b, hamming)."""
    if SIM_BITS % bands != 0:
        raise ValueError("bands must divide SIM_BITS")
    width = SIM_BITS // bands
    sigs = simhash(df, text, tokens="shingle")
    banded = sigs.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.concat(
                    F.lit(f"{b}:"),
                    F.substring("simhash", 1 + b * width, width),
                )
                for b in range(bands)
            ])
        ).alias("band"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
        "band",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
        "band",
    )
    pairs = (
        a.join(b, "band")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = None
    for i in range(1, SIM_BITS + 1):
        term = F.when(
            F.substring("sig_a", i, 1) != F.substring("sig_b", i, 1), 1
        ).otherwise(0)
        ham = term if ham is None else ham + term
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def duplicate_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate PAIRS — the keep-one-per-
    cluster step a fuzzy-dedup pipeline runs after MinHash verification
    (pairs alone over-remove: A~B, B~C must collapse to ONE cluster even
    if A!~C directly).

    Min-label propagation: every node starts labeled with itself; each
    round joins labels across edges (both directions) and takes the min;
    stops when a round changes nothing. Rounds needed = graph diameter —
    near-dup clusters are tiny/dense, so 2-3 rounds in practice; the loop
    is join + min-agg (shuffle on node id, AQE-coalesced), nothing is
    collected. At extreme scale swap in large-star/small-star; the
    convergence check is one count per round.

    Returns (node, component) with component = min doc id reachable.

    Iteration hygiene: every round's frame is ``localCheckpoint``-ed, not
    just persisted — persist caches DATA but the logical plan still nests
    one level per round, and Catalyst re-analyzes the whole plan at every
    action, so round latency grows without bound (measured 4 s → 12 s →
    38 s per round at sf0.01 before truncation). Checkpointing pins each
    round to its materialized result; round cost is then constant. On a
    cluster, set a checkpoint dir and swap in ``checkpoint()`` if
    executor loss must be survivable mid-loop."""
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iters):
        # candidate labels flowing across edges
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component").unionByName(nbr)
            .groupBy("node").agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # propagation advances one hop per round, so a chain with graph
        # diameter > max_iters would otherwise return silently SPLIT
        # components (ADVICE r2) — fail loudly; callers raise max_iters
        # (or swap in large-star/small-star for log-diameter rounds).
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing); the pair graph has "
            f"diameter > {max_iters} — raise max_iters"
        )
    return labels


def duplicate_components_star(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the extreme-scale variant of :func:`duplicate_components`: rounds
    scale with O(log² n) INDEPENDENT of graph diameter, so a
    million-link duplicate chain converges in a handful of rounds where
    one-hop min-label propagation would need a round per link.

    * large-star: every node attaches its STRICTLY LARGER neighbors to
      the minimum of its neighborhood (incl. itself);
    * small-star: with edges oriented large→small, every node attaches
      its smaller neighbors (and itself) to the neighborhood minimum.

    Both steps are one groupBy + one join over the edge list; each round
    is ``localCheckpoint``-ed (see :func:`duplicate_components` for why
    persist alone is not enough in iterative plans). Converged when the
    oriented edge set stops changing; at that point the graph is a
    forest of stars and the edge list IS the (node, component) labeling.

    Returns (node, component) for every node in ``pairs`` — same
    contract as :func:`duplicate_components`."""
    E = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        # ---- large-star ----
        nbrs = E.unionByName(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            nbrs.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        E1 = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # ---- small-star (orient large→small first) ----
        oriented = E1.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(mins2, "u")
            .select(F.col("v").alias("node"), F.col("m"), F.col("u").alias("center"))
        )
        E2 = (
            small.select(F.col("node").alias("u"), F.col("m").alias("v"))
            .unionByName(
                mins2.select(F.col("u"), F.col("m").alias("v"))
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        changed = E2.exceptAll(E).count() + E.exceptAll(E2).count()
        E = E2
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"duplicate_components_star did not converge in {max_iters} "
            f"rounds — raise max_iters (rounds grow ~log² of the largest "
            f"component)"
        )
    # converged edge set is a star forest oriented large→small: every
    # non-root node has exactly one outgoing edge to its component root
    labels = E.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = E.select(F.col("v").alias("node")).distinct().join(
        labels.select(F.col("node")), "node", "left_anti"
    ).withColumn("component", F.col("node"))
    return labels.unionByName(roots)


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, doc_id: str = "doc_id"
) -> DataFrame:
    """Drop every near-duplicate except the smallest doc id of its
    component (docs in no pair survive untouched)."""
    comp = duplicate_components(pairs)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(doc_id)
    )
    return docs.join(losers, doc_id, "left_anti")


# -------------------------------------- cross-source duplication map --


def _overlap_out_sql() -> tuple:
    """Shared closing projection over (src_a, src_b, n_pairs, na, nb):
    dup_rate normalizes the verified-pair count by the number of
    POSSIBLE cross-pairs (na*nb across sources, C(na,2) within), so
    rates are comparable between source pairs of different sizes —
    exact BIGINT to one division."""
    den = (
        "(CASE WHEN src_a = src_b THEN na * (na - 1) / 2 "
        "ELSE na * nb END)"
    )
    return (
        "n_pairs",
        "na AS n_docs_a",
        "nb AS n_docs_b",
        f"round(CAST(n_pairs AS DOUBLE) "
        f"/ nullif(CAST({den} AS DOUBLE), 0.0E0), 6) AS dup_rate",
    )


def source_overlap(
    pairs: DataFrame,
    labels: DataFrame,
    doc_id: str = "doc_id",
    label: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: roll verified near-dup pairs
    (``doc_a``, ``doc_b`` — :func:`minhash_dedup` output) up to the
    label (source/crawl/dump) level — WHO copies from WHOM, the
    curation readout that decides which feed to dedup against which
    (the inter-dump overlap tables in CommonCrawl-scale corpus work,
    e.g. Penedo et al. 2023 §3). Unordered label pairs canonicalize
    via least/greatest; the rate denominator is the number of
    possible pairs (na*nb across, C(na,2) within).

    Plan: two doc_id equi-joins of the CANDIDATE-sized pair table
    against the label map (never corpus x corpus), one bounded
    (label, label) hash aggregate, and a broadcast of the
    label-sizes dim onto it. Output: (src_a, src_b, n_pairs,
    n_docs_a, n_docs_b, dup_rate), rate round(.,6)."""
    la = labels.selectExpr(f"{doc_id} AS _ida", f"{label} AS _la")
    lb = labels.selectExpr(f"{doc_id} AS _idb", f"{label} AS _lb")
    tagged = (
        pairs.select("doc_a", "doc_b")
        .join(la, F.col("doc_a") == F.col("_ida"))
        .join(lb, F.col("doc_b") == F.col("_idb"))
        .selectExpr(
            "least(_la, _lb) AS src_a", "greatest(_la, _lb) AS src_b"
        )
    )
    cnt = tagged.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    sizes = labels.groupBy(F.col(label).alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    out = (
        cnt.join(
            F.broadcast(sizes.selectExpr("_s AS _sa", "_n AS na")),
            F.col("src_a") == F.col("_sa"),
        )
        .join(
            F.broadcast(sizes.selectExpr("_s AS _sb", "_n AS nb")),
            F.col("src_b") == F.col("_sb"),
        )
    )
    return out.selectExpr("src_a", "src_b", *_overlap_out_sql())


def source_overlap_sql(
    pairs_sql: str,
    labels_sql: str,
) -> str:
    """Oracle twin of :func:`source_overlap` — ``pairs_sql`` must
    yield (doc_a, doc_b), ``labels_sql`` (doc_id, source); same
    shared closing projection."""
    outs = ", ".join(_overlap_out_sql())
    return (
        f"WITH mp AS ({pairs_sql}), "
        f"lab AS (SELECT doc_id, source FROM ({labels_sql}) l), "
        f"tg AS (SELECT least(a.source, b.source) AS src_a, "
        f"greatest(a.source, b.source) AS src_b "
        f"FROM mp JOIN lab a ON mp.doc_a = a.doc_id "
        f"JOIN lab b ON mp.doc_b = b.doc_id), "
        f"cnt AS (SELECT src_a, src_b, "
        f"CAST(count(*) AS BIGINT) AS n_pairs FROM tg GROUP BY 1, 2), "
        f"sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n "
        f"FROM lab GROUP BY source), "
        f"jn AS (SELECT src_a, src_b, n_pairs, sa.n AS na, sb.n AS nb "
        f"FROM cnt JOIN sz sa ON cnt.src_a = sa.source "
        f"JOIN sz sb ON cnt.src_b = sb.source) "
        f"SELECT src_a, src_b, {outs} FROM jn"
    )
