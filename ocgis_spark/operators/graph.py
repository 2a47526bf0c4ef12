"""Link-graph operators for corpus curation.

PageRank as a quality prior: web-scale training corpora weight or
filter documents by the rank of their source host in the crawl link
graph (the CommonCrawl-derived pipelines' standard signal). The
reference has no graph operators — this family is an engine-side
addition alongside connected components (``dedup.duplicate_components``).

Scale shape: one power-iteration round = an equi-join of the edge list
with the current rank vector + a hash aggregation on the destination —
both shuffle on node id and nothing is ever collected; the dangling
mass is a single scalar agg broadcast back. Rounds are
``localCheckpoint``-ed (the components-loop hygiene: persist alone
leaves a plan that grows one nesting level per round and re-analyzes
every action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over an edge list.

    Nodes = union of both endpoints; ranks start uniform at 1/N; each
    round distributes rank/outdeg along out-edges, with the dangling
    mass (rank parked on nodes without out-edges) redistributed
    uniformly — so ranks sum to 1 every round:

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + dangling/N)

    Returns (node, rank). Exact twin: :func:`pagerank_sql` unrolls the
    same recurrence as dialect-neutral SQL for a fixed iteration count.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct().localCheckpoint()
    )
    n_count = nodes.count()  # one scalar; the only driver-side value
    if n_count == 0:
        # empty edge list (e.g. every candidate edge was a self-loop):
        # an empty rank vector, not a ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_count))
    base = (1.0 - damping) / n_count
    # pin the lineage every few rounds, not every round: plan nesting
    # over 3 rounds is still cheap to analyze, and each localCheckpoint
    # is an eager job — this cuts the fixed per-round scheduling cost 3x
    # while keeping round cost bounded (the components-loop lesson)
    checkpoint_every = 3
    for it in range(iters):
        linked = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left")
        contribs = (
            linked.filter(F.col("deg").isNotNull())
            .join(e, "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            linked.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0))
                       + F.col("dm") / F.lit(float(n_count)))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def pagerank_sql(
    edges_sql: str, iters: int = 5, damping: float = 0.85
) -> str:
    """Dialect-neutral unrolled-SQL twin of :func:`pagerank` for a FIXED
    iteration count: the oracle the correctness gate runs. ``edges_sql``
    must yield (src, dst)."""
    from ..fixtures import _f

    d = _f(damping)
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) e0),",
        "nodes AS (SELECT src AS node FROM e UNION "
        "SELECT dst AS node FROM e),",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),",
        "outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg "
        "FROM e GROUP BY src),",
        "r0 AS (SELECT node, 1.0E0 / nn.n AS rank FROM nodes "
        "CROSS JOIN nn),",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        cur = f"r{i}"
        parts.append(
            f"in{i} AS (SELECT e.dst AS node, sum(p.rank / o.deg) AS "
            f"inflow FROM {prev} p JOIN outdeg o ON p.node = o.src "
            f"JOIN e ON e.src = p.node GROUP BY e.dst),"
        )
        parts.append(
            f"dm{i} AS (SELECT coalesce(sum(p.rank), 0.0E0) AS dm "
            f"FROM {prev} p LEFT JOIN outdeg o ON p.node = o.src "
            f"WHERE o.src IS NULL),"
        )
        parts.append(
            f"{cur} AS (SELECT nodes.node, "
            f"(1.0E0 - {d}) / nn.n + {d} * "
            f"(coalesce(i.inflow, 0.0E0) + dm{i}.dm / nn.n) AS rank "
            f"FROM nodes LEFT JOIN in{i} i ON nodes.node = i.node "
            f"CROSS JOIN nn CROSS JOIN dm{i}),"
        )
        prev = cur
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\n"
        f"SELECT node, round(rank, 6) AS rank FROM {prev}"
    )


# ------------------------------------------ triangles / clustering --


def _tri_out_sql() -> tuple:
    """Shared closing projection over (node, degree, triangles)."""
    return (
        "round(2.0E0 * CAST(triangles AS DOUBLE) "
        "/ nullif(CAST(degree AS DOUBLE) "
        "* CAST(degree - 1 AS DOUBLE), 0.0E0), 6) AS clustering",
    )


def triangle_stats(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simple graph of the edge list — the link-farm /
    community-density signal next to :func:`pagerank` (mutually
    linking host cliques are the classic spam pattern; Watts-Strogatz
    1998 for c_i; Suri-Vassilvitskii 2011 for the MapReduce shape).

    Exact via the degree-ordering count: every triangle is counted
    exactly once from its lowest-(degree, id) apex — edges orient
    from the smaller (degree, id) endpoint to the larger, wedges are
    the self-join of oriented edges on the apex, and a wedge closes
    iff its (b, c) pair is itself an oriented edge. The orientation
    bounds the wedge fan-out per apex by O(sqrt(m)) regardless of
    skew (a celebrity node has huge in-orientation but tiny
    out-orientation), which is what makes this the 100-TB-safe plan:
    three node-keyed shuffles, never degree² on a hub.

    Output: one row per node: (node, degree, triangles, clustering);
    clustering = 2T/(d(d−1)), NULL for degree < 2 nodes; self-loops
    and duplicate/reverse edges are collapsed first."""
    # und/deg/o feed MANY downstream branches (degree lookups x2, the
    # wedge self-join x2, the closure probe, the final join); Spark
    # re-derives an uncached DataFrame PER REFERENCE, which re-ran the
    # whole upstream edge derivation — 47 corpus scans in the executed
    # plan of the registry fixture (r5 read-amplification audit).
    # localCheckpoint() pins each bounded table (edges after distinct;
    # the node dim) eagerly: computed once, every branch reads the
    # materialized blocks, and — unlike persist(), which r5's ADVICE
    # flagged as accumulating cached tables across repeated calls in a
    # long session — the blocks are owned by this call's lineage and
    # freed with it (the gridstats-twin pattern). The 100-TB posture
    # materializes these bounded tables anyway.
    und = (
        df.selectExpr(
            f"least({src}, {dst}) AS u", f"greatest({src}, {dst}) AS v"
        )
        .filter("u <> v AND u IS NOT NULL AND v IS NOT NULL")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.selectExpr("u AS node")
        .unionAll(und.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .localCheckpoint()
    )
    # orient each edge from the smaller (degree, id) endpoint
    du = deg.selectExpr("node AS u", "degree AS dg_u")
    dv = deg.selectExpr("node AS v", "degree AS dg_v")
    ed = und.join(du, "u").join(dv, "v")
    o = ed.selectExpr(
        "(CASE WHEN dg_u < dg_v OR (dg_u = dg_v AND u < v) "
        "THEN u ELSE v END) AS a",
        "(CASE WHEN dg_u < dg_v OR (dg_u = dg_v AND u < v) "
        "THEN v ELSE u END) AS b",
        "(CASE WHEN dg_u < dg_v OR (dg_u = dg_v AND u < v) "
        "THEN dg_v ELSE dg_u END) AS dg_b",
    )
    o = o.localCheckpoint()
    e1 = o.selectExpr("a", "b", "dg_b")
    e2 = o.selectExpr("a", "b AS c", "dg_b AS dg_c")
    wedges = e1.join(e2, "a").filter(
        "dg_b < dg_c OR (dg_b = dg_c AND b < c)"
    )
    tri = wedges.join(
        o.selectExpr("a AS b", "b AS c").withColumn(
            "closed", F.lit(1)
        ),
        ["b", "c"],
    ).select("a", "b", "c")
    per_node = (
        tri.selectExpr("a AS node")
        .unionAll(tri.selectExpr("b AS node"))
        .unionAll(tri.selectExpr("c AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    out = deg.join(per_node, "node", "left").selectExpr(
        "node", "degree",
        "CAST(coalesce(triangles, 0) AS BIGINT) AS triangles",
    )
    return out.selectExpr("node", "degree", "triangles", *_tri_out_sql())


def triangle_stats_sql(
    edges_sql: str, src: str = "src", dst: str = "dst"
) -> str:
    """Oracle twin of :func:`triangle_stats` — the same degree-ordered
    wedge-closure count as chained CTEs."""
    outs = ", ".join(_tri_out_sql())
    return (
        f"WITH und AS (SELECT DISTINCT least({src}, {dst}) AS u, "
        f"greatest({src}, {dst}) AS v FROM ({edges_sql}) e "
        f"WHERE {src} <> {dst} AND {src} IS NOT NULL "
        f"AND {dst} IS NOT NULL), "
        f"deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree "
        f"FROM (SELECT u AS node FROM und "
        f"UNION ALL SELECT v FROM und) n GROUP BY node), "
        f"o AS (SELECT (CASE WHEN du.degree < dv.degree "
        f"OR (du.degree = dv.degree AND u < v) THEN u ELSE v END) AS a, "
        f"(CASE WHEN du.degree < dv.degree "
        f"OR (du.degree = dv.degree AND u < v) THEN v ELSE u END) AS b, "
        f"(CASE WHEN du.degree < dv.degree "
        f"OR (du.degree = dv.degree AND u < v) "
        f"THEN dv.degree ELSE du.degree END) AS dg_b "
        f"FROM und JOIN deg du ON du.node = u "
        f"JOIN deg dv ON dv.node = v), "
        f"tri AS (SELECT e1.a, e1.b, e2.b AS c "
        f"FROM o e1 JOIN o e2 ON e1.a = e2.a "
        f"AND (e1.dg_b < e2.dg_b "
        f"OR (e1.dg_b = e2.dg_b AND e1.b < e2.b)) "
        f"JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b), "
        f"pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles "
        f"FROM (SELECT a AS node FROM tri "
        f"UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) t "
        f"GROUP BY node), "
        f"jn AS (SELECT deg.node, deg.degree, "
        f"CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles "
        f"FROM deg LEFT JOIN pn ON pn.node = deg.node) "
        f"SELECT node, degree, triangles, {outs} FROM jn"
    )


# ------------------------------------------- degree assortativity --


def _assort_out_sql() -> tuple:
    """Shared projection over (m2 = directed-stub count, sx, sxx,
    sxy): Newman 2002 degree assortativity = Pearson r of the REMAINING
    degrees... computed here in its plain endpoint-degree form over
    both edge orientations (the symmetric marginals make x/y moments
    identical, so only three sums survive). Exact BIGINT to the final
    double combination (the zipf_fit cancellation discipline)."""
    m = "CAST(m2 AS DOUBLE)"
    num = (
        f"({m} * CAST(sxy AS DOUBLE) "
        f"- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    den = (
        f"({m} * CAST(sxx AS DOUBLE) "
        f"- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return (
        f"round(CASE WHEN {den} > 0.0E0 THEN {num} / {den} END, 6) "
        "AS assortativity",
    )


def assortativity(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity of the undirected simple graph (Newman
    2002): do high-degree hosts link to other hubs (r > 0, social
    shape) or to leaves (r < 0, web/hub-and-spoke shape)? A one-scalar
    structure fingerprint next to :func:`triangle_stats` — crawl-graph
    drift in r between dumps is a cheap link-spam alarm.

    Pearson r over the endpoint-degree pairs of every directed stub
    (both orientations — the symmetric marginals collapse the x/y
    moments into one): all moments are exact BIGINTs from integer
    degrees (headroom: Σd·d' ≤ 2m·d_max² — d_max < ~2e6 at 2m = 1e6
    stubs scales far beyond any host graph); regular graphs (zero
    degree variance) -> NULL.

    Output: one row (n_nodes, n_edges, assortativity)."""
    # bounded edge/node tables localCheckpoint-pinned — multi-referenced
    # downstream; see triangle_stats (r5 read-amplification audit)
    und = (
        df.selectExpr(
            f"least({src}, {dst}) AS u", f"greatest({src}, {dst}) AS v"
        )
        .filter("u <> v AND u IS NOT NULL AND v IS NOT NULL")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.selectExpr("u AS node")
        .unionAll(und.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .localCheckpoint()
    )
    stubs = (
        und.join(deg.selectExpr("node AS u", "degree AS da"), "u")
        .join(deg.selectExpr("node AS v", "degree AS db"), "v")
        .selectExpr("da AS x", "db AS y")
    )
    both = stubs.unionAll(stubs.selectExpr("y AS x", "x AS y"))
    counts = und.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    ).crossJoin(
        deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    mom = both.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum("x").cast("bigint").alias("sx"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("sxx"),
        F.expr("CAST(sum(x * y) AS BIGINT)").alias("sxy"),
    )
    return counts.crossJoin(mom).selectExpr(
        "n_nodes", "n_edges", *_assort_out_sql()
    )


def assortativity_sql(
    edges_sql: str, src: str = "src", dst: str = "dst"
) -> str:
    """Oracle twin of :func:`assortativity`."""
    outs = ", ".join(_assort_out_sql())
    return (
        f"WITH und AS (SELECT DISTINCT least({src}, {dst}) AS u, "
        f"greatest({src}, {dst}) AS v FROM ({edges_sql}) e "
        f"WHERE {src} <> {dst} AND {src} IS NOT NULL "
        f"AND {dst} IS NOT NULL), "
        f"deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree "
        f"FROM (SELECT u AS node FROM und "
        f"UNION ALL SELECT v FROM und) n GROUP BY node), "
        f"st AS (SELECT da.degree AS x, db.degree AS y FROM und "
        f"JOIN deg da ON da.node = u JOIN deg db ON db.node = v), "
        f"bo AS (SELECT x, y FROM st "
        f"UNION ALL SELECT y AS x, x AS y FROM st), "
        f"mom AS (SELECT CAST(count(*) AS BIGINT) AS m2, "
        f"CAST(sum(x) AS BIGINT) AS sx, "
        f"CAST(sum(x * x) AS BIGINT) AS sxx, "
        f"CAST(sum(x * y) AS BIGINT) AS sxy FROM bo), "
        f"cnt AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM und) "
        f"AS n_edges, (SELECT CAST(count(*) AS BIGINT) FROM deg) "
        f"AS n_nodes) "
        f"SELECT n_nodes, n_edges, {outs} FROM cnt CROSS JOIN mom"
    )


# --------------------------------------------------- k-core peel --


def kcore(
    df: DataFrame,
    k: int,
    rounds: int = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Nodes of the k-core — the maximal subgraph where every node
    keeps degree >= k (Seidman 1983; the standard "dense kernel"
    filter for link-spam nests and community seeds, one notch
    stronger than a triangle screen). Computed by synchronous
    peeling: each round drops every node whose degree IN THE
    SURVIVING subgraph is < k; the fixpoint is the k-core.

    ``rounds=None`` iterates to the fixpoint (one count() action per
    round, the components-loop shape, localCheckpoint hygiene);
    an integer runs EXACTLY that many peel rounds — the
    oracle-parity mode matching the unrolled-CTE twin (the pagerank
    K=5 convention), an upper bound on the core when the peel hasn't
    converged. Peel depth is bounded by the degeneracy ordering
    length, in practice a handful of rounds.

    Output: (node, core_degree) for surviving nodes — core_degree is
    the node's degree inside the surviving subgraph (>= k at the
    fixpoint)."""
    if not int(k) >= 2:
        raise ValueError(f"k must be >= 2 (k-core with edges), got {k}")
    if rounds is not None and not int(rounds) >= 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = (
        df.selectExpr(
            f"least({src}, {dst}) AS u", f"greatest({src}, {dst}) AS v"
        )
        .filter("u <> v AND u IS NOT NULL AND v IS NOT NULL")
        .distinct()
    )

    def degrees(ed):
        return (
            ed.selectExpr("u AS node")
            .unionAll(ed.selectExpr("v AS node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )

    def peel(ed):
        d = degrees(ed)
        keep = d.filter(F.col("c") >= int(k)).select("node")
        return (
            ed.join(keep.selectExpr("node AS u"), "u")
            .join(keep.selectExpr("node AS v"), "v")
            .select("u", "v")
        )

    if rounds is not None:
        for _ in range(int(rounds)):
            e = peel(e).localCheckpoint(eager=False)
    else:
        n = e.count()
        while True:
            e = peel(e).localCheckpoint(eager=False)
            m = e.count()
            if m == n:
                break
            n = m
    return degrees(e).selectExpr("node", "c AS core_degree")


def kcore_sql(
    edges_sql: str,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> str:
    """Oracle twin of :func:`kcore` with ``rounds`` peel rounds
    UNROLLED as a CTE chain (recursive CTEs cannot aggregate in the
    recursive term, so the loop unrolls — the pagerank convention).
    Every CTE is MATERIALIZED: DuckDB otherwise re-inlines each
    reference and the d/e chain expands 3^rounds scans of the base
    table (found as an fd-exhaustion failure at rounds=6)."""
    if not int(k) >= 2:
        raise ValueError(f"k must be >= 2 (k-core with edges), got {k}")
    if not 1 <= int(rounds) <= 12:
        raise ValueError(
            f"rounds must be in 1..12 (unrolled CTE chain), got {rounds}"
        )
    ctes = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT least({src}, {dst}) AS u, "
        f"greatest({src}, {dst}) AS v FROM ({edges_sql}) e "
        f"WHERE {src} <> {dst} AND {src} IS NOT NULL "
        f"AND {dst} IS NOT NULL)"
    ]
    for i in range(1, int(rounds) + 1):
        p = i - 1
        ctes.append(
            f"d{i} AS MATERIALIZED "
            f"(SELECT node, CAST(count(*) AS BIGINT) AS c "
            f"FROM (SELECT u AS node FROM e{p} "
            f"UNION ALL SELECT v FROM e{p}) n GROUP BY node)"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM e{p} "
            f"JOIN d{i} du ON du.node = e{p}.u AND du.c >= {int(k)} "
            f"JOIN d{i} dv ON dv.node = e{p}.v AND dv.c >= {int(k)})"
        )
    R = int(rounds)
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT node, CAST(count(*) AS BIGINT) AS core_degree "
        f"FROM (SELECT u AS node FROM e{R} "
        f"UNION ALL SELECT v FROM e{R}) n GROUP BY node"
    )


# -------------------------------------- degree power-law tail fit --

_PL_SCALE = 10**5  # ln quantum (the zipf posture: exact BIGINT moments)


def powerlaw_alpha(
    df: DataFrame, dmin: int = 2, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Power-law exponent of the degree-distribution tail via the
    Clauset-Shalizi-Newman (2009) continuous-MLE approximation for
    discrete data: alpha = 1 + n_tail / sum ln(d_i/(dmin − 1/2)) over
    nodes with degree >= dmin, with the standard error
    (alpha − 1)/sqrt(n_tail) — the scale-free-ness scalar that
    completes the graph panel (assortativity: who links whom;
    clustering: how dense; alpha: how heavy the hub tail; a crawl
    whose alpha drops toward 2 is growing super-hubs).

    ln values quantize to BIGINT at 1e-5 (the zipf posture), so the
    tail sum is an exact integer both engines and alpha closes as one
    shared double expression. Output: one row (n_nodes, n_tail,
    alpha, alpha_se), round(.,6); empty tail -> NULL alpha."""
    if not int(dmin) >= 2:
        raise ValueError(f"dmin must be >= 2, got {dmin}")
    # bounded edge/node tables localCheckpoint-pinned — multi-referenced
    # downstream; see triangle_stats (r5 read-amplification audit)
    und = (
        df.selectExpr(
            f"least({src}, {dst}) AS u", f"greatest({src}, {dst}) AS v"
        )
        .filter("u <> v AND u IS NOT NULL AND v IS NOT NULL")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.selectExpr("u AS node")
        .unionAll(und.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .localCheckpoint()
    )
    s = f"{_PL_SCALE}.0E0"
    dm = f"(CAST({int(dmin)} AS DOUBLE) - 0.5E0)"
    q = (
        f"(CASE WHEN degree >= {int(dmin)} THEN "
        f"CAST(round(ln(CAST(degree AS DOUBLE) / {dm}) * {s}, 0) "
        f"AS BIGINT) END)"
    )
    agg = deg.selectExpr("degree", f"{q} AS ql").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.expr("CAST(count(ql) AS BIGINT)").alias("n_tail"),
        F.expr("CAST(coalesce(sum(ql), 0) AS BIGINT)").alias("sl"),
    )
    return agg.selectExpr("n_nodes", "n_tail", *_pl_out_sql())


def _pl_out_sql() -> tuple:
    """Shared closing projection over (n_tail, sl)."""
    s = f"{_PL_SCALE}.0E0"
    nt = "CAST(n_tail AS DOUBLE)"
    al = f"(1.0E0 + {nt} / (CAST(sl AS DOUBLE) / {s}))"
    ok = "n_tail >= 1 AND sl > 0"
    return (
        f"(CASE WHEN {ok} THEN round({al}, 6) END) AS alpha",
        f"(CASE WHEN {ok} THEN "
        f"round(({al} - 1.0E0) / sqrt({nt}), 6) END) AS alpha_se",
    )


def powerlaw_alpha_sql(
    edges_sql: str, dmin: int = 2, src: str = "src", dst: str = "dst"
) -> str:
    """Oracle twin of :func:`powerlaw_alpha`."""
    if not int(dmin) >= 2:
        raise ValueError(f"dmin must be >= 2, got {dmin}")
    s = f"{_PL_SCALE}.0E0"
    dm = f"(CAST({int(dmin)} AS DOUBLE) - 0.5E0)"
    outs = ", ".join(_pl_out_sql())
    return (
        f"WITH und AS (SELECT DISTINCT least({src}, {dst}) AS u, "
        f"greatest({src}, {dst}) AS v FROM ({edges_sql}) e "
        f"WHERE {src} <> {dst} AND {src} IS NOT NULL "
        f"AND {dst} IS NOT NULL), "
        f"deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree "
        f"FROM (SELECT u AS node FROM und "
        f"UNION ALL SELECT v FROM und) n GROUP BY node), "
        f"q AS (SELECT degree, (CASE WHEN degree >= {int(dmin)} THEN "
        f"CAST(round(ln(CAST(degree AS DOUBLE) / {dm}) * {s}, 0) "
        f"AS BIGINT) END) AS ql FROM deg), "
        f"agg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes, "
        f"CAST(count(ql) AS BIGINT) AS n_tail, "
        f"CAST(coalesce(sum(ql), 0) AS BIGINT) AS sl FROM q) "
        f"SELECT n_nodes, n_tail, {outs} FROM agg"
    )
