"""PageRank operator (graph quality prior; engine-side addition)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ocgis_spark.operators import graph as G


def test_pagerank_cycle_is_uniform(spark):
    # symmetric cycle: stationary distribution is uniform at every
    # damping and iteration count
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    out = {r["node"]: r["rank"] for r in G.pagerank(edges, iters=7).collect()}
    for v in out.values():
        assert v == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_dangling_mass_conserved(spark):
    # B has no out-edges: its rank must be redistributed, keeping the
    # total at 1 (a naive implementation leaks it)
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    out = {r["node"]: r["rank"] for r in G.pagerank(edges, iters=10).collect()}
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-5)
    assert out[1] > out[0]  # the sink receives everything A sends


def test_pagerank_authority_ordering(spark):
    # star: every node links to 0 -> node 0 must dominate
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], "src long, dst long"
    )
    out = {r["node"]: r["rank"] for r in G.pagerank(edges, iters=15).collect()}
    assert out[0] == max(out.values())
    assert out[0] > 3 * out[2]


def test_pagerank_matches_unrolled_sql(spark):
    # the DataFrame loop and the unrolled-SQL twin agree on a pseudo-
    # random graph at the oracle's fixed iteration count
    n = 50
    rows = [(i % 23, (i * 31 + 7) % 23) for i in range(n)]
    rows = [(a, b) for a, b in rows if a != b]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank(edges, iters=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE edges AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in rows)
        + ") t(src, dst)"
    )
    sql = G.pagerank_sql("SELECT src, dst FROM edges", iters=5)
    want = dict(con.sql(sql).fetchall())
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_pagerank_empty_edges_returns_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert G.pagerank(edges, iters=3).count() == 0


# --------------------------------------------------- triangle counts


def test_triangle_stats_brute(spark):
    from itertools import combinations

    from ocgis_spark.operators import graph as G

    # K4 on 0-3 (4 triangles), a pendant 4, an isolated edge 5-6,
    # plus duplicate / reverse / self-loop noise that must collapse
    edges = (list(combinations(range(4), 2))
             + [(3, 4), (5, 6), (1, 0), (2, 2), (0, 1), (6, 5)])
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = {r.node: r for r in G.triangle_stats(df).collect()}

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for n, nbrs in adj.items():
        t = sum(1 for x, y in combinations(sorted(nbrs), 2)
                if tuple(sorted((x, y))) in und)
        d = len(nbrs)
        r = out[n]
        assert r.degree == d and r.triangles == t, n
        if d < 2:
            assert r.clustering is None
        else:
            assert r.clustering == pytest.approx(
                round(2 * t / (d * (d - 1)), 6), abs=1e-9)
    assert out[0].triangles == 3   # inside K4
    assert out[4].triangles == 0 and out[4].clustering is None
    assert out[3].clustering == pytest.approx(round(3 / 6, 6))
    plan = G.triangle_stats(df)._jdf.queryExecution(
    ).executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_assortativity_brute(spark):
    from itertools import combinations

    from ocgis_spark.operators import graph as G

    # star (disassortative) vs clique+pendant mix; noise edges collapse
    edges = ([(0, i) for i in range(1, 6)]
             + list(combinations(range(10, 13), 2)) + [(12, 13), (5, 0)])
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    r = G.assortativity(df).collect()[0]

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in und:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    m2 = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    exp = (m2 * sxy - sx * sx) / (m2 * sxx - sx * sx)
    assert r.n_edges == len(und) and r.n_nodes == len(deg)
    assert r.assortativity == pytest.approx(round(exp, 6), abs=1e-9)
    assert r.assortativity < 0  # star-dominated -> disassortative
    # regular graph (cycle): zero degree variance -> NULL
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src bigint, dst bigint")
    assert G.assortativity(cyc).collect()[0].assortativity is None


def test_kcore_brute_and_fixpoint(spark):
    from itertools import combinations

    from ocgis_spark.operators import graph as G

    # K4 core + a 3-cycle tail chained to it + pendants: the 3-core
    # is exactly the K4; peeling must cascade through the chain
    edges = (list(combinations(range(4), 2))        # K4
             + [(3, 10), (10, 11), (11, 12), (12, 10)]  # tail + triangle
             + [(0, 20), (20, 21)])                     # pendant path
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out3 = {r.node: r.core_degree for r in G.kcore(df, 3).collect()}
    assert out3 == {0: 3, 1: 3, 2: 3, 3: 3}
    out2 = {r.node: r.core_degree for r in G.kcore(df, 2).collect()}
    # 2-core: K4 plus the triangle (the chain 3-10 peels: bridge
    # edges leave both endpoints below 2 only outside cycles)
    brute = dict(out2)
    assert set(out2) == {0, 1, 2, 3, 10, 11, 12}
    assert out2[10] >= 2 and out2[0] >= 2
    # fixed-rounds mode at high R equals the fixpoint result
    fixed = {r.node: r.core_degree
             for r in G.kcore(df, 3, rounds=8).collect()}
    assert fixed == out3
    with pytest.raises(ValueError, match="k must be"):
        G.kcore(df, 1)
    with pytest.raises(ValueError, match="rounds"):
        G.kcore(df, 2, rounds=0)


def test_powerlaw_alpha_brute(spark):
    import math

    from ocgis_spark.operators import graph as G

    # hub-and-spoke star + a chain: degrees 8,3,... known exactly
    edges = ([(0, i) for i in range(1, 9)]
             + [(1, 2), (2, 3), (20, 21)])
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    r = G.powerlaw_alpha(df, dmin=2).collect()[0]
    und = {tuple(sorted(e)) for e in edges}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    tail = [d for d in deg.values() if d >= 2]
    ql = [round(math.log(d / 1.5) * 1e5) for d in tail]
    alpha = 1 + len(ql) / (sum(ql) / 1e5)
    assert r.n_nodes == len(deg) and r.n_tail == len(tail)
    assert r.alpha == pytest.approx(round(alpha, 6), abs=1e-9)
    assert r.alpha_se == pytest.approx(
        round((alpha - 1) / math.sqrt(len(tail)), 6), abs=1e-9)
    # all-degree-1 graph: empty tail -> NULL alpha
    iso = spark.createDataFrame([(0, 1), (2, 3)], "src bigint, dst bigint")
    assert G.powerlaw_alpha(iso).collect()[0].alpha is None
    with pytest.raises(ValueError, match="dmin"):
        G.powerlaw_alpha(df, dmin=1)
