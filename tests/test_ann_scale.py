"""Scale-posture tests for the ANN family (VERDICT r1 findings #1/#2):

* ``ivf_assign`` must work with hundreds of centroids WITHOUT inlining them
  into the Catalyst plan (broadcast matrix + Arrow argmax) and match a plain
  NumPy reference assignment exactly;
* ``lsh_buckets`` must be a narrow map (no corpus shuffle / row
  multiplication) and agree with a NumPy sign computation.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocgis_spark.operators import similarity


def _emb_df(spark, n, dim, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.normal(size=(n, dim)).astype("f4")
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype="i8"),
                        "embedding": list(vecs)})
    return spark.createDataFrame(pdf), vecs.astype("f8")


def test_ivf_assign_256_centroids_matches_numpy(spark):
    emb, V = _emb_df(spark, 1200, 32)
    cents = emb.filter(F.col("vec_id") < 256)
    out = similarity.ivf_assign(emb, cents).select("vec_id", "bucket").toPandas()
    out = out.sort_values("vec_id").reset_index(drop=True)

    C = V[:256]
    cos = (V @ C.T) / (
        np.sqrt((V * V).sum(1))[:, None] * np.sqrt((C * C).sum(1))[None, :]
    )
    cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
    expected = np.argmax(cos, axis=1)
    assert (out["bucket"].to_numpy() == expected).all()


def test_ivf_assign_plan_has_no_shuffle(spark):
    emb, _ = _emb_df(spark, 200, 8)
    cents = emb.filter(F.col("vec_id") < 16)
    plan = similarity.ivf_assign(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # plan size must not scale with centroid count: no inlined arrays
    assert len(plan) < 20_000


def test_lsh_buckets_narrow_and_correct(spark):
    emb, V = _emb_df(spark, 300, 16)
    planes = emb.filter(F.col("vec_id") < 6)
    out = similarity.lsh_buckets(emb, planes).toPandas()
    out = out.sort_values("vec_id").reset_index(drop=True)

    P = V[:6]
    bits = (V @ P.T) >= 0
    expected = ["".join("1" if b else "0" for b in row) for row in bits]
    assert list(out["bucket"]) == expected

    plan = similarity.lsh_buckets(emb, planes)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_knn_cells_is_distributed_single_plan(spark):
    """knn_cells routes through the batch knn_join (no collect-per-ring API)."""
    from ocgis_spark.fixtures import DOC_GRID
    from ocgis_spark.operators import knn

    cells = spark.createDataFrame(
        pd.DataFrame({
            "cell_y": np.repeat(np.arange(10), 10).astype("i4"),
            "cell_x": np.tile(np.arange(10), 10).astype("i4"),
        })
    )
    out = knn.knn_cells(cells, DOC_GRID, -105.3, 36.8, k=4).toPandas()
    assert len(out) == 4
    assert list(out["rank"]) == [1, 2, 3, 4]
    assert (out["dist"].to_numpy() == np.sort(out["dist"].to_numpy())).all()


def test_ivf_train_beats_naive_centroids(spark):
    """Trained spherical-kmeans centroids serve a clustered corpus better
    than the naive first-k vectors: higher mean max-cosine, and every
    planted cluster gets its own bucket."""
    rng = np.random.RandomState(42)
    k, per, dim = 6, 120, 24
    means = rng.normal(size=(k, dim)) * 3
    vecs = np.vstack([
        means[j] + rng.normal(scale=0.3, size=(per, dim)) for j in range(k)
    ]).astype("f4")
    labels = np.repeat(np.arange(k), per)
    order = rng.permutation(len(vecs))
    vecs, labels = vecs[order], labels[order]
    pdf = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype="i8"),
                        "embedding": list(vecs)})
    emb = spark.createDataFrame(pdf)

    trained = similarity.ivf_train(emb, k=k, iters=15)
    assigned = similarity.ivf_assign(emb, trained).toPandas()
    assigned = assigned.sort_values("vec_id").reset_index(drop=True)
    # each planted cluster maps (almost) purely to one bucket
    import collections
    purity = 0
    for j in range(k):
        c = collections.Counter(assigned["bucket"][labels == j])
        purity += c.most_common(1)[0][1]
    assert purity / len(vecs) > 0.95
    assert assigned["bucket"].nunique() == k  # no empty/duplicate buckets

    # objective comparison vs naive first-k centroids
    def mean_max_cos(cents_df):
        C = np.array([list(map(float, r["embedding"]))
                      for r in cents_df.orderBy("vec_id").collect()], dtype="f8")
        C = C / np.linalg.norm(C, axis=1)[:, None]
        V = vecs.astype("f8")
        V = V / np.linalg.norm(V, axis=1)[:, None]
        return (V @ C.T).max(axis=1).mean()

    naive = emb.filter(F.col("vec_id") < k)
    assert mean_max_cos(trained) > mean_max_cos(naive) + 0.05


def test_ivf_recall_vs_brute_force(spark):
    """Honest ANN quality metric: IVF top-k recall@10 vs brute-force
    cosine on the driver embeddings fixture. With nprobe=4 of 8 trained
    centroids, recall must clear 0.7 (the coarse-quantizer trade
    documented in similarity.py); nprobe=8 (exhaustive probing) must be
    exact."""
    from ocgis_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 15)
    cent = SIM.ivf_train(emb, k=8, iters=10)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["qid"] if "qid" in r.__fields__ else r["query_id"],
                           set()).add(r["vec_id"] if "vec_id" in r.__fields__
                                      else r["hit_id"])
        return out

    brute = SIM.brute_topk(emb, queries, k=10)
    bcols = brute.columns
    ivf4 = SIM.ivf_topk(emb, cent, queries, k=10, nprobe=4)
    ivf8 = SIM.ivf_topk(emb, cent, queries, k=10, nprobe=8)

    def as_sets(df):
        qcol = [c for c in df.columns if "query" in c or c == "qid"][0]
        hcol = [c for c in df.columns if c != qcol and ("vec" in c or "hit" in c)][0]
        out = {}
        for r in df.collect():
            out.setdefault(r[qcol], set()).add(r[hcol])
        return out

    b, i4, i8 = as_sets(brute), as_sets(ivf4), as_sets(ivf8)
    recalls4 = [len(b[q] & i4.get(q, set())) / len(b[q]) for q in b]
    recall4 = sum(recalls4) / len(recalls4)
    assert recall4 >= 0.7, f"IVF nprobe=4 recall {recall4:.2f}"
    recalls8 = [len(b[q] & i8.get(q, set())) / len(b[q]) for q in b]
    assert sum(recalls8) / len(recalls8) == pytest.approx(1.0), "nprobe=all must be exact"


# --- product quantization ----------------------------------------------------


def test_pq_encode_matches_numpy(spark):
    """pq_encode == plain NumPy argmin over HALF_UP-rounded L2² distances
    (ties to the smallest code), using the fixed-rows codebook."""
    df, X = _emb_df(spark, 120, 64, seed=11)
    cb = similarity.pq_codebook_from_rows(df)
    got = {r["vec_id"]: r["codes"]
           for r in similarity.pq_encode(df, cb).collect()}
    C = similarity._collect_codebook(cb)
    m, k, dsub = C.shape
    for v in range(120):
        for s in range(m):
            xs = X[v, s * dsub:(s + 1) * dsub]
            d2 = ((xs[None, :] - C[s]) ** 2).sum(axis=1)
            want = int(np.argmin(similarity._round_half_up(d2, 6)))
            assert got[v][s] == want, (v, s)


def test_pq_encode_plan_is_one_narrow_arrow_map(spark):
    df, _ = _emb_df(spark, 8, 64)
    cb = similarity.pq_codebook_from_rows(df)
    plan = similarity.pq_encode(df, cb)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan  # corpus never shuffled to encode


def test_pq_train_beats_rows_codebook(spark):
    """Per-subspace k-means must quantize better than arbitrary fixed
    rows: mean reconstruction L2² strictly drops."""
    df, X = _emb_df(spark, 400, 64, seed=13)

    def mse(cb):
        C = similarity._collect_codebook(cb)
        m, k, dsub = C.shape
        total = 0.0
        for s in range(m):
            xs = X[:, s * dsub:(s + 1) * dsub]
            d2 = ((xs[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
            total += d2.min(axis=1).mean()
        return total

    naive = mse(similarity.pq_codebook_from_rows(df))
    trained = mse(similarity.pq_train(df, max_sample=400, iters=8))
    assert trained < 0.8 * naive, (trained, naive)


def test_pq_topk_recall_vs_brute_on_clustered_data(spark):
    """ADC search with a TRAINED codebook on clustered embeddings: top-10
    recall vs exact brute-force cosine must be high (codes preserve the
    cluster geometry); scoring never touches raw corpus vectors."""
    rng = np.random.RandomState(5)
    centers = rng.normal(size=(10, 64)) * 3.0
    vecs = np.vstack([
        centers[i % 10] + rng.normal(size=64) * 0.3 for i in range(300)
    ]).astype("f8")
    # L2-normalize: ADC ranks by inner product, brute_topk by cosine —
    # on the unit sphere the two orderings coincide (the standard
    # PQ-for-cosine setup), so recall measures quantization loss only
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pdf = pd.DataFrame({"vec_id": np.arange(300, dtype="i8"),
                        "embedding": list(vecs.astype("f4"))})
    df = spark.createDataFrame(pdf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    cb = similarity.pq_train(df, max_sample=300, iters=10)
    queries = df.filter(F.col("vec_id") < 5)
    # the standard two-stage shape: PQ is the CANDIDATE GENERATOR (coarse
    # scores from codes alone — within-cluster detail is quantization-
    # flattened by design), exact re-rank runs on the small candidate set
    cand = similarity.pq_topk(df, cb, queries, k=50)
    brute = similarity.brute_topk(df, queries, k=10)

    def as_sets(res, hits=10):
        out = {}
        qcol = [c for c in res.columns if "query" in c][0]
        for r in res.collect():
            if "rank" not in res.columns or r["rank"] <= hits or hits >= 50:
                out.setdefault(r[qcol], set()).add(r["vec_id"])
        return out

    b = as_sets(brute)
    c50 = as_sets(cand, hits=50)
    # candidate recall: the true top-10 is (almost) inside the PQ top-50
    rec_cand = [len(b[q] & c50.get(q, set())) / len(b[q]) for q in b]
    assert sum(rec_cand) / len(rec_cand) >= 0.8, rec_cand
    # and the TOP-ranked PQ candidates are from the query's own cluster
    # (codes preserve the coarse geometry; k=50 necessarily spills past
    # the 30-member cluster, so purity is asserted on the top 10)
    c10 = as_sets(cand, hits=10)
    for q, hits in c10.items():
        assert all(h % 10 == q % 10 for h in hits), (q, sorted(hits))


def test_pq_topk_plan_single_encode_no_vector_join(spark):
    """The scoring side never moves raw vectors and the encode UDF runs
    ONCE (posexplode_outer avoids the optimizer's duplicated UDF under
    the generate pre-filter): 1 ArrowEvalPython, broadcast LUT joins, no
    SortMergeJoin."""
    df, _ = _emb_df(spark, 16, 64)
    cb = similarity.pq_codebook_from_rows(df)
    q = df.filter(F.col("vec_id") < 2)
    plan = similarity.pq_topk(df, cb, q, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_ivfpq_topk_matches_pq_within_probed_lists(spark):
    """IVF-PQ == PQ restricted to the probed lists (same ADC arithmetic),
    and with nprobe = all lists it equals plain pq_topk exactly."""
    df, _ = _emb_df(spark, 200, 64, seed=3)
    cb = similarity.pq_codebook_from_rows(df)
    cents = df.filter(F.col("vec_id") < 8)
    q = df.filter(F.col("vec_id").between(100, 102))
    full = similarity.ivfpq_topk(df, cents, cb, q, k=5, nprobe=8)
    plain = similarity.pq_topk(df, cb, q, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, plain.collect()))
    # nprobe=1 returns at most k per query, all from probed buckets
    n1 = similarity.ivfpq_topk(df, cents, cb, q, k=5, nprobe=1)
    counts = {r["query_id"]: 0 for r in n1.collect()}
    for r in n1.collect():
        counts[r["query_id"]] += 1
    assert all(v <= 5 for v in counts.values())


def test_ann_search_two_stage_equals_brute_when_exhaustive(spark):
    """ann_search with exhaustive probing + full expansion must equal
    brute_topk row-for-row (same output shape, same exact re-rank); with
    tight settings it stays a valid top-k subset of its own candidates."""
    df, _ = _emb_df(spark, 150, 64, seed=9)
    cents = df.filter(F.col("vec_id") < 8)
    cb = similarity.pq_codebook_from_rows(df)
    q = df.filter(F.col("vec_id").between(100, 102))
    full = similarity.ann_search(df, cents, cb, q, k=5, nprobe=8, expand=30)
    brute = similarity.brute_topk(df, q, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, brute.collect()))
    tight = similarity.ann_search(df, cents, cb, q, k=5, nprobe=2, expand=4)
    per_q = {}
    for r in tight.collect():
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
