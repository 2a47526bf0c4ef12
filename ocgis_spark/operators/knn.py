"""kNN nearest-cell lookup (north rule), generalizing the reference's
``select_nearest`` top-1 (``/root/reference/src/ocgis/variable/geom.py:803-821``,
wired at ``ops/engine.py:152-155``).

Strategy (scale-first): ring expansion around the query point's cell —
Chebyshev-disk range predicates (Catalyst-pushable, no geometry) select
candidate cells; exact centroid distance + ``row_number`` pick the top k.
A disk of cell radius r is exhaustive once the k-th candidate distance is
≤ (r - 0.5)·res, because any excluded cell's centroid is at least that far
away — so the loop never scans the full grid for local queries.

Tie-break: (dist, cell_y, cell_x) ascending — the reference's argmin takes
the first hit in y-major array order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..geo.cellindex import GridSpec


def knn_cells(
    df: DataFrame,
    grid: GridSpec,
    qlon: float,
    qlat: float,
    k: int = 1,
    cell_y: str = "cell_y",
    cell_x: str = "cell_x",
) -> DataFrame:
    """k nearest distinct cells (by centroid distance) to (qlon, qlat)
    among the cells present in ``df``. Returns
    ``cell_y, cell_x, dist`` ordered by (dist, cell_y, cell_x)."""
    qcx = int(math.floor((qlon - grid.lon0) / grid.res))
    qcy = int(math.floor((qlat - grid.lat0) / grid.res))

    cells = df.select(cell_y, cell_x).distinct()
    lat_c = F.lit(grid.lat0) + (F.col(cell_y) + 0.5) * F.lit(grid.res)
    lon_c = F.lit(grid.lon0) + (F.col(cell_x) + 0.5) * F.lit(grid.res)
    dist = F.sqrt(
        (lon_c - F.lit(qlon)) * (lon_c - F.lit(qlon))
        + (lat_c - F.lit(qlat)) * (lat_c - F.lit(qlat))
    )

    r = max(1, int(math.ceil(math.sqrt(k))))
    grid_diam = max(grid.nx, grid.ny)
    while True:
        disk = cells.filter(
            (F.col(cell_x) >= qcx - r) & (F.col(cell_x) <= qcx + r)
            & (F.col(cell_y) >= qcy - r) & (F.col(cell_y) <= qcy + r)
        ).withColumn("dist", dist)
        top = disk.orderBy("dist", cell_y, cell_x).limit(k).collect()
        if len(top) >= k and top[-1]["dist"] <= (r - 0.5) * grid.res:
            break
        if r >= grid_diam:  # disk covers the whole grid — exhaustive
            break
        r *= 2
    w = Window.orderBy("dist", cell_y, cell_x)
    return (
        disk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(cell_y, cell_x, "dist", "rank")
    )
