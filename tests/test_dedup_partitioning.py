"""Dedup quality (planted near-dups), hash-fn equivalence, multimodal stub,
and salting/skew control."""

import pytest
from pyspark.sql import functions as F

from ocgis_spark import spans as SP
from ocgis_spark.operators import dedup, multimodal, partitioning

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def corpus_with_dups(spark, docs):
    base = docs.selectExpr("doc_id", "lower(trim(text)) AS text")
    mutants = docs.selectExpr(
        "doc_id + 1000000 AS doc_id",
        "lower(trim(substr(text, 1, greatest(length(text) - 10, 1)))) AS text",
    )
    return base.unionByName(mutants)


def test_minhash_finds_planted_dups(spark, corpus_with_dups):
    pairs = dedup.minhash_dedup(corpus_with_dups, "text", threshold=0.5).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    # most originals should pair with their own mutant
    planted = {(i, i + 1000000) for i in range(500)}
    hits = found & planted
    assert len(hits) > 400  # LSH recall on ~0.95-jaccard pairs
    for r in pairs:
        assert r.jaccard >= 0.5


def test_minhash_xxhash64_equivalent_candidates(spark, corpus_with_dups):
    """Both hash functions drive the same LSH mechanics; verified pairs
    (post exact-Jaccard) must be near-identical sets."""
    a = {(r.doc_a, r.doc_b)
         for r in dedup.minhash_dedup(corpus_with_dups, "text", 0.5, "md5").collect()}
    b = {(r.doc_a, r.doc_b)
         for r in dedup.minhash_dedup(corpus_with_dups, "text", 0.5, "xxhash64").collect()}
    # candidate generation is probabilistic per hash family; require heavy overlap
    inter = len(a & b)
    assert inter / max(len(a), 1) > 0.9
    assert inter / max(len(b), 1) > 0.9


def test_exact_dups_on_planted_copies(spark, docs):
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    out = dedup.exact_dups(doubled, "text").collect()
    assert len(out) == 500
    assert all(r.dup_n == 2 for r in out)


def test_simhash_identical_for_same_tokens(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "delta epsilon")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert out[1] == out[2]  # same token set -> same signature
    assert out[1] != out[3]
    assert len(out[1]) == dedup.SIM_BITS


def test_multimodal_stub(spark, docs):
    ds = SP.with_spans(docs)
    feats = multimodal.extract_features(ds, real=False)
    rows = feats.collect()
    assert len(rows) == 500  # one media span per doc
    r = rows[0]
    assert r.kind in ("image", "audio")
    assert r.feat_bytes == len(r.media_ref) * 1024
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(real=True)


def test_salted_repartition_spreads_hot_key(spark):
    """One key holds 90% of rows; salting must spread it across tasks."""
    df = spark.createDataFrame(
        [(i, 7 if i % 10 else i) for i in range(10000)], "doc_id bigint, cell_prefix bigint"
    )
    hot = partitioning.detect_hot_keys(df, "cell_prefix", fraction_threshold=0.5,
                                       sample_fraction=1.0)
    assert hot == [7]
    salted = partitioning.salted_repartition(df, "cell_prefix", n_salt=8, hot_keys=hot)
    # the hot key fans out over all 8 salt buckets; cold keys keep salt 0
    fan = {r.cell_prefix: r.n_salts for r in
           salted.groupBy("cell_prefix")
           .agg(F.countDistinct("salt").alias("n_salts")).collect()}
    assert fan[7] == 8
    assert all(v == 1 for k, v in fan.items() if k != 7)
    # with AQE coalescing disabled (tiny test data would be merged into one
    # partition otherwise), the physical spread is visible too
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        salted2 = partitioning.salted_repartition(df, "cell_prefix", n_salt=8,
                                                  hot_keys=hot)
        sizes = [
            r.n for r in salted2.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        # without salting the hot key would pin ~9000 rows to one partition
        assert max(sizes) < 4000
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # salt column is deterministic (resume-safe)
    s1 = salted.select("doc_id", "salt").collect()
    s2 = partitioning.salted_repartition(df, "cell_prefix", n_salt=8, hot_keys=hot
                                         ).select("doc_id", "salt").collect()
    assert {(r.doc_id, r.salt) for r in s1} == {(r.doc_id, r.salt) for r in s2}


def test_cell_prefix(spark):
    df = spark.createDataFrame([(0, 0), (7, 7), (8, 8), (63, 63)],
                               "cell_y int, cell_x int")
    out = {(r.cell_y, r.cell_x): r.cell_prefix
           for r in partitioning.with_cell_prefix(df).collect()}
    assert out[(0, 0)] == 0 and out[(7, 7)] == 0
    assert out[(8, 8)] == 4097  # (1)*4096 + 1
    assert out[(63, 63)] == 7 * 4096 + 7


def test_embedding_near_dup_banding_improves_recall(spark):
    """2 independent plane bands find a superset of single-band pairs."""
    from ocgis_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    mut = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) * 1.01),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(mut)
    planes = emb.filter(F.col("vec_id") < 8)
    one = {(r.vec_a, r.vec_b) for r in similarity.embedding_near_dups(
        corpus, planes, 0.98, bands=1).collect()}
    two = {(r.vec_a, r.vec_b) for r in similarity.embedding_near_dups(
        corpus, planes, 0.98, bands=2).collect()}
    assert one <= two
    planted = {(i, i + 100000) for i in range(500)}
    # at this corpus size a single band already has full recall; banding
    # must never lose pairs and must recover every planted dup
    assert len(two & planted) >= len(one & planted)
    assert len(two & planted) == 500


def test_duplicate_components_chain_and_keep_canonical(spark):
    """A~B, B~C, D~E: two components; dedup keeps exactly one doc per
    component plus all unpaired docs."""
    import pandas as pd

    from ocgis_spark.operators import dedup

    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 10], "doc_b": [2, 3, 11]})
    )
    comp = dedup.duplicate_components(pairs).toPandas()
    got = dict(zip(comp.node, comp.component))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 10, 11, 99],
                      "text": ["a"] * 6})
    )
    kept = dedup.dedup_keep_canonical(docs, pairs).toPandas()
    assert sorted(kept.doc_id) == [1, 10, 99]


def test_minhash_narrow_signatures_match_grouped(spark):
    """The zero-shuffle array_min signature path is bit-identical to the
    explode+groupBy path (min is duplicate-insensitive), for both hash
    families, and its plan has no Exchange."""
    from ocgis_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for fn in ("md5", "xxhash64"):
        a = dedup.minhash_signatures(docs, "text", hash_fn=fn).toPandas()
        b = dedup.minhash_signatures_narrow(docs, "text", hash_fn=fn).toPandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)
    plan = dedup.minhash_signatures_narrow(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_duplicate_components_raises_on_nonconvergence(spark):
    """ADVICE r2: min-label propagation advances one hop per round — a
    chain with diameter > max_iters must fail loudly, not return split
    components."""
    import pytest
    from ocgis_spark.operators import dedup

    # a 6-node chain: diameter 5, so max_iters=1 cannot converge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a bigint, doc_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_components(pairs, max_iters=1)
    # and with enough rounds the same chain collapses to one component
    comp = dedup.duplicate_components(pairs, max_iters=10)
    assert {r["component"] for r in comp.collect()} == {1}


def test_star_components_match_min_label(spark):
    """Large-star/small-star components == min-label components on random
    graphs (the extreme-scale variant must be a drop-in)."""
    import random

    from ocgis_spark.operators import dedup

    rng = random.Random(11)
    nodes = list(range(1, 120))
    edges = set()
    for _ in range(150):
        u, v = rng.sample(nodes, 2)
        edges.add((min(u, v), max(u, v)))
    pairs = spark.createDataFrame(sorted(edges), "doc_a bigint, doc_b bigint")
    want = {(r["node"], r["component"])
            for r in dedup.duplicate_components(pairs, max_iters=50).collect()}
    got = {(r["node"], r["component"])
           for r in dedup.duplicate_components_star(pairs).collect()}
    assert got == want


def test_star_components_deep_chain_few_rounds(spark):
    """A 60-link chain (diameter 60) converges within the default star
    round budget — one-hop min-label propagation would need 60 rounds."""
    from ocgis_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 61)], "doc_a bigint, doc_b bigint"
    )
    comp = dedup.duplicate_components_star(pairs, max_iters=10)
    rows = comp.collect()
    assert {r["component"] for r in rows} == {1}
    assert {r["node"] for r in rows} == set(range(1, 62))


def test_simhash_near_dups_finds_mutations(spark):
    """near-copies (trailing chars cut) land within hamming<=2 of their
    original (a 3-char cut can flip up to ~2 of 16 bits); unrelated docs
    with distinct shingle sets do not pair."""
    from ocgis_spark.operators import dedup

    base = [
        (1, "the quick brown fox jumps over the lazy dog repeatedly"),
        (2, "completely different content about spark shuffles and joins"),
        (3, "orthogonal third text mentioning geodesic grids and tiles"),
    ]
    rows = list(base) + [(100 + i, t[:-3]) for i, t in base]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r["doc_a"], r["doc_b"])
           for r in dedup.simhash_near_dups(df, max_hamming=2).collect()}
    assert {(1, 101), (2, 102), (3, 103)} <= got
    # unrelated originals must not pair
    assert not {(1, 2), (1, 3), (2, 3)} & got


def test_narrow_md5_signatures_hash_once(spark):
    """Regression (r4 review): slicing _md5_wide inside each per-hash
    transform re-hashed every shingle per column (16 digests instead of
    2); the hoisted projection must keep exactly 2 md5 calls in the
    executed plan."""
    from ocgis_spark.operators import dedup as D

    plan = D.minhash_signatures_narrow(
        spark.createDataFrame([(1, "abcdef")], "doc_id long, text string"),
        hash_fn="md5",
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("md5(") == 2


def test_components_star_random_graphs_match_union_find(spark):
    """Property: large-star/small-star labels == a sequential union-find
    on random sparse graphs (many components, varied shapes) — hardening
    beyond the chain/star goldens."""
    import numpy as np

    def union_find(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical: min node id per component
        comp = {}
        for n in nodes:
            r = find(n)
            comp.setdefault(r, []).append(n)
        return {n: min(m) for r, m in comp.items() for n in m}

    rng = np.random.default_rng(17)
    for trial in range(4):
        n_nodes = int(rng.integers(8, 40))
        n_edges = int(rng.integers(4, 60))
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
            if a != b
        ]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        want = union_find(edges, nodes)
        pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
        got = {
            r["node"]: r["component"]
            for r in dedup.duplicate_components_star(pairs).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"
