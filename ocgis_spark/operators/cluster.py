"""Grid-density spatial clustering (distributed DBSCAN on cell counts).

Exact DBSCAN needs an eps-neighborhood query per point — a self-join the
reference never ships and that at 100 TB is the classic quadratic trap.
The standard scale-out reshape (GriT/GRID-DBSCAN family) clusters CELLS
instead: snap points to a fixed graticule, keep cells with >= min_pts
points (density gate), and connect ADJACENT dense cells (8-neighborhood)
into clusters. Points in dense cells inherit the cell's cluster; points
in sparse cells are noise (NULL). Semantics: DBSCAN with eps ~= cell
diagonal and the density test binned to the grid — deterministic,
relational, and independent of point order (plain DBSCAN's border-point
assignment is famously order-dependent; this one never is).

Scale posture: ONE corpus aggregation (map-side partial counts) down to
the CELL table, which is bounded by the GRATICULE (<= nx*ny rows), not
the corpus — everything after runs on cells. Adjacency is a 4-offset
explode + equi-join on the neighbor's cell id (each undirected edge found
once); components via the same large-star/small-star machinery as fuzzy
dedup (log²-round convergence). The final point->cluster join broadcasts
the labeled cell table when the graticule is small enough, else falls
back to a hash join on cell_id.

Longitude cells WRAP: cx is taken modulo nx (= 360/cell_deg, validated
integral), so a cluster straddling the antimeridian connects — the same
seam discipline as the rest of the geo family. Latitude does not wrap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import duplicate_components_star

#: neighbor offsets covering the 8-neighborhood once per undirected edge
#: (the mirrored four arrive from the other cell's perspective)
_OFFS = ((1, 0), (1, 1), (0, 1), (-1, 1))

#: broadcast the labeled cell table below this many graticule cells
_BCAST_CELLS = 4_000_000


def _grid_params(cell_deg: float) -> tuple:
    """(nx, nyoff, nytot) for a cell size that divides 360 evenly."""
    if not cell_deg > 0:
        raise ValueError(f"cell_deg must be positive, got {cell_deg}")
    nx = 360.0 / cell_deg
    if abs(nx - round(nx)) > 1e-9:
        raise ValueError(
            f"cell_deg must divide 360 evenly for seam wrap "
            f"(got {cell_deg}: 360/cell = {nx})"
        )
    nx = int(round(nx))
    nyoff = int(math.ceil(90.0 / cell_deg)) + 1
    return nx, nyoff, 2 * nyoff + 2


def cell_id_sql(
    cell_deg: float, lon: str = "lon", lat: str = "lat"
) -> tuple:
    """(cell_id, cx, cy) SQL strings — dialect-neutral floor/%/CAST
    arithmetic. cx wraps modulo nx (seam-safe); the id packs
    (cx, cy + nyoff), both non-negative, into one BIGINT."""
    from .crs import _pf

    nx, nyoff, nytot = _grid_params(cell_deg)
    c = _pf(float(cell_deg))
    cx = (
        f"(((CAST(floor(({lon}) / {c}) AS BIGINT) % {nx}) + {nx}) % {nx})"
    )
    cy = f"CAST(floor(({lat}) / {c}) AS BIGINT)"
    return f"({cx} * {nytot} + ({cy} + {nyoff}))", cx, cy


def grid_cluster(
    df: DataFrame,
    cell_deg: float,
    min_pts: int,
    lon: str = "lon",
    lat: str = "lat",
    max_iters: int = 25,
) -> DataFrame:
    """Cluster points by dense-cell adjacency (module docstring). Returns
    the input columns + ``cell_id`` (BIGINT) + ``cluster_id`` (BIGINT,
    NULL = noise). ``cluster_id`` is the minimum dense cell_id of the
    connected component — deterministic across engines and partitionings.
    """
    cid, cx, cy = cell_id_sql(cell_deg, lon, lat)
    nx, nyoff, nytot = _grid_params(cell_deg)
    pts = df.withColumn("cell_id", F.expr(cid))
    dense = (
        pts.selectExpr("cell_id", f"{cx} AS cx", f"{cy} AS cy")
        .groupBy("cell_id", "cx", "cy")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= int(min_pts))
    )
    offs = ", ".join(f"struct({dx} AS dx, {dy} AS dy)" for dx, dy in _OFFS)
    nbr = dense.selectExpr(
        "cell_id AS u",
        f"explode(array({offs})) AS o",
        "cx", "cy",
    ).selectExpr(
        "u",
        f"(((cx + o.dx + {nx}) % {nx}) * {nytot} + (cy + o.dy + {nyoff})) "
        f"AS v",
    )
    pairs = (
        nbr.join(dense.select(F.col("cell_id").alias("v")), "v")
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
    )
    # star components label only nodes that appear in an edge; isolated
    # dense cells are their own cluster (coalesce to self below)
    if pairs.isEmpty():
        labeled = dense.select(
            "cell_id", F.col("cell_id").alias("cluster_id"))
    else:
        labels = duplicate_components_star(pairs, "u", "v",
                                           max_iters=max_iters)
        labeled = (
            dense.join(
                labels.withColumnRenamed("node", "cell_id"),
                "cell_id", "left")
            .select(
                "cell_id",
                F.coalesce("component", "cell_id").alias("cluster_id"),
            )
        )
    if nx * nytot <= _BCAST_CELLS:
        labeled = F.broadcast(labeled)
    return pts.join(labeled, "cell_id", "left").select(
        *df.columns, "cell_id", "cluster_id"
    )


def grid_cluster_sql(
    src_sql: str,
    cell_deg: float,
    min_pts: int,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`grid_cluster` — the full replay (snap,
    density gate, wrapped 4-offset adjacency, recursive-CTE min-label
    components, left-join assignment) in one DuckDB string. Min-label
    propagation and large-star/small-star provably agree on the label
    (both emit the component's minimum node id)."""
    cid, cx, cy = cell_id_sql(cell_deg, lon, lat)
    nx, nyoff, nytot = _grid_params(cell_deg)
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS)
    return (
        f"WITH RECURSIVE pts AS (SELECT *, {cid} AS cell_id, {cx} AS _cx, "
        f"{cy} AS _cy FROM ({src_sql}) s), "
        f"dense AS (SELECT cell_id, _cx, _cy FROM pts "
        f"GROUP BY cell_id, _cx, _cy HAVING count(*) >= {int(min_pts)}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"nbr AS (SELECT d.cell_id AS u, "
        f"(((d._cx + o.dx + {nx}) % {nx}) * {nytot} + (d._cy + o.dy + "
        f"{nyoff})) AS v FROM dense d CROSS JOIN offs o), "
        f"pairs AS (SELECT n.u, n.v FROM nbr n "
        f"JOIN dense t ON t.cell_id = n.v WHERE n.u <> n.v), "
        f"edges AS (SELECT u AS src, v AS dst FROM pairs "
        f"UNION SELECT v, u FROM pairs), "
        f"reach(node, label) AS ("
        f"SELECT cell_id, cell_id FROM dense "
        f"UNION "
        f"SELECT e.src, r.label FROM edges e JOIN reach r "
        f"ON r.node = e.dst), "
        f"lab AS (SELECT node, min(label) AS cluster_id FROM reach "
        f"GROUP BY node) "
        f"SELECT * EXCLUDE (_cx, _cy, node) FROM pts "
        f"LEFT JOIN lab ON lab.node = pts.cell_id"
    )
