"""Raster↔vector tile schema + chunk assignment — the reference's
``GridChunker`` pipeline re-expressed relationally.

Semantics reproduced:

* ``get_tile_schema(nrow, ncol, tdim)`` — row-major tile grid with
  half-open index bounds (``/root/reference/src/ocgis/calc/tile.py:6-32``);
* destination tiles partition the grid (every destination cell in exactly
  one tile); source cells may appear in multiple tiles because each tile's
  extent is buffered by ``2 x resolution`` before the source subset
  (``spatial/grid_chunker.py:503-689``, buffer modifier
  ``constants.py:512``);
* the per-tile index/bounds rows the chunker writes
  (``grid_chunker.py:781-818``) become a small broadcast DataFrame.

Destination assignment is pure index arithmetic (no join at all); source
assignment is a broadcast range join cells x tiles — at 100 TB the big side
is scanned once, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo.cellindex import GridSpec
from ..session import local_df

BUFFER_RESOLUTION_MODIFIER = 2.0  # constants.py:512


def tile_schema_df(
    spark: SparkSession, grid: GridSpec, tdim: int, buffer_res: float | None = None
) -> DataFrame:
    """All tiles as rows: index bounds (half-open) + buffered extent."""
    if buffer_res is None:
        buffer_res = BUFFER_RESOLUTION_MODIFIER * grid.res
    ntx = (grid.nx + tdim - 1) // tdim
    nty = (grid.ny + tdim - 1) // tdim
    rows = []
    for ty in range(nty):
        for tx in range(ntx):
            y0, y1 = ty * tdim, min((ty + 1) * tdim, grid.ny)
            x0, x1 = tx * tdim, min((tx + 1) * tdim, grid.nx)
            rows.append(
                (
                    ty * ntx + tx,
                    y0, y1, x0, x1,
                    grid.lon0 + x0 * grid.res - buffer_res,
                    grid.lat0 + y0 * grid.res - buffer_res,
                    grid.lon0 + x1 * grid.res + buffer_res,
                    grid.lat0 + y1 * grid.res + buffer_res,
                )
            )
    return local_df(
        spark, rows,
        "tile_id int, y_start int, y_stop int, x_start int, x_stop int, "
        "buffered_minx double, buffered_miny double, buffered_maxx double, "
        "buffered_maxy double",
    )


def assign_dest_tiles(df: DataFrame, grid: GridSpec, tdim: int) -> DataFrame:
    """Destination tile id per row — index arithmetic, exactly-one rule
    (``grid_chunker.py:29-35``: destination elements globally unique)."""
    ntx = (grid.nx + tdim - 1) // tdim
    tile = (
        F.floor(F.col("cell_y") / tdim) * F.lit(ntx) + F.floor(F.col("cell_x") / tdim)
    ).cast("int")
    return df.withColumn("tile_id", tile)


def tile_schema_vector_df(
    spark: SparkSession, vg, tdim: int, buffer_res: float | None = None
) -> DataFrame:
    """GridChunker tile schema for a NON-UNIFORM (VectorGridSpec) grid:
    index bounds stay half-open row-major; buffered extents come from the
    edge vectors; the buffer defaults to 2 × the MAX cell size (the
    reference buffers by resolution — the conservative equivalent on a
    stretched grid, guaranteeing the source superset property)."""
    import numpy as np

    xb, yb = vg.xb(), vg.yb()
    if buffer_res is None:
        buffer_res = BUFFER_RESOLUTION_MODIFIER * float(
            max(np.diff(xb).max(), np.diff(yb).max())
        )
    ntx = (vg.nx + tdim - 1) // tdim
    nty = (vg.ny + tdim - 1) // tdim
    rows = []
    for ty in range(nty):
        for tx in range(ntx):
            y0, y1 = ty * tdim, min((ty + 1) * tdim, vg.ny)
            x0, x1 = tx * tdim, min((tx + 1) * tdim, vg.nx)
            rows.append(
                (
                    ty * ntx + tx, y0, y1, x0, x1,
                    float(xb[x0]) - buffer_res, float(yb[y0]) - buffer_res,
                    float(xb[x1]) + buffer_res, float(yb[y1]) + buffer_res,
                )
            )
    return local_df(
        spark, rows,
        "tile_id int, y_start int, y_stop int, x_start int, x_stop int, "
        "buffered_minx double, buffered_miny double, buffered_maxx double, "
        "buffered_maxy double",
    )


def assign_dest_tiles_vector(df: DataFrame, vg, tdim: int,
                             cell_x: str = "vcx", cell_y: str = "vcy") -> DataFrame:
    """Destination tiles on a vector grid: still pure index arithmetic
    (tile membership is by INDEX block, independent of cell widths)."""
    ntx = (vg.nx + tdim - 1) // tdim
    tile = (
        F.floor(F.col(cell_y) / tdim) * F.lit(ntx) + F.floor(F.col(cell_x) / tdim)
    ).cast("int")
    return df.withColumn("tile_id", tile)


def assign_source_tiles_vector(
    df: DataFrame, tiles: DataFrame, spark: SparkSession, vg,
    cell_x: str = "vcx", cell_y: str = "vcy",
) -> DataFrame:
    """Source assignment on a vector grid: cell bounds attach via the
    broadcast per-axis bounds tables, then the same broadcast range join."""
    from . import vectorgrid as VG

    b = df
    if "lon_lb" not in df.columns:
        renamed = df
        if cell_x != "vcx":
            renamed = renamed.withColumnRenamed(cell_x, "vcx")
        if cell_y != "vcy":
            renamed = renamed.withColumnRenamed(cell_y, "vcy")
        b = VG.with_cell_bounds(renamed, spark, vg)
    cond = (
        (b["lon_lb"] <= tiles["buffered_maxx"]) & (b["lon_ub"] >= tiles["buffered_minx"])
        & (b["lat_lb"] <= tiles["buffered_maxy"]) & (b["lat_ub"] >= tiles["buffered_miny"])
    )
    return b.join(
        F.broadcast(tiles.select("tile_id", "buffered_minx", "buffered_miny",
                                 "buffered_maxx", "buffered_maxy")),
        cond, "inner",
    ).drop("buffered_minx", "buffered_miny", "buffered_maxx", "buffered_maxy")


def split_selection_by_tiles(
    spark: SparkSession, grid: GridSpec, tdim: int, rings,
) -> DataFrame:
    """Split a selection polygon into per-tile pieces (UNbuffered tile
    extents) — the chunked-regrid source-geometry split, emitted as a
    broadcastable DataFrame (tile_id, piece_wkb, piece_area, n_vertices).
    Pieces are computed driver-side (n_tiles is small by construction) and
    shipped as one Arrow block; each tile's worker then clips only against
    its own piece."""
    import numpy as np
    import pandas as pd

    from ..geo import geometry as G
    from ..geo import wkb as WKB

    ntx = (grid.nx + tdim - 1) // tdim
    nty = (grid.ny + tdim - 1) // tdim
    boxes, tile_ids = [], []
    for ty in range(nty):
        for tx in range(ntx):
            y0, y1 = ty * tdim, min((ty + 1) * tdim, grid.ny)
            x0, x1 = tx * tdim, min((tx + 1) * tdim, grid.nx)
            boxes.append((
                grid.lon0 + x0 * grid.res, grid.lat0 + y0 * grid.res,
                grid.lon0 + x1 * grid.res, grid.lat0 + y1 * grid.res,
            ))
            tile_ids.append(ty * ntx + tx)
    rings = [np.asarray(r, dtype="f8") for r in rings]
    pieces = G.split_polygon_by_boxes(rings, boxes)
    pdf = pd.DataFrame({
        "tile_id": [tile_ids[i] for i, _ in pieces],
        "piece_wkb": [bytearray(WKB.polygon_to_wkb(p)) for _, p in pieces],
        "piece_area": [G.polygon_area(p) for _, p in pieces],
        "n_vertices": [int(sum(len(r) for r in p)) for _, p in pieces],
    })
    schema = ("tile_id int, piece_wkb binary, piece_area double, "
              "n_vertices int")
    return spark.createDataFrame(pdf, schema=schema)


def assign_source_tiles(
    df: DataFrame, tiles: DataFrame, grid: GridSpec
) -> DataFrame:
    """Source assignment: a cell belongs to every tile whose buffered extent
    intersects the cell box (closed test) — source duplication across tile
    boundaries is intended (``grid_chunker.py:503-689``)."""
    lon_lb = F.lit(grid.lon0) + F.col("cell_x") * F.lit(grid.res)
    lon_ub = F.lit(grid.lon0) + (F.col("cell_x") + 1) * F.lit(grid.res)
    lat_lb = F.lit(grid.lat0) + F.col("cell_y") * F.lit(grid.res)
    lat_ub = F.lit(grid.lat0) + (F.col("cell_y") + 1) * F.lit(grid.res)
    cond = (
        (lon_lb <= tiles["buffered_maxx"]) & (lon_ub >= tiles["buffered_minx"])
        & (lat_lb <= tiles["buffered_maxy"]) & (lat_ub >= tiles["buffered_miny"])
    )
    return df.join(F.broadcast(tiles.select("tile_id", "buffered_minx",
                                            "buffered_miny", "buffered_maxx",
                                            "buffered_maxy")), cond, "inner").drop(
        "buffered_minx", "buffered_miny", "buffered_maxx", "buffered_maxy"
    )
