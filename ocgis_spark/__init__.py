"""ocgis_spark — a from-scratch PySpark-native re-creation of the
NCPP/ocgis (OpenClimateGIS) geoprocessing core.

Reference semantics: /root/reference (ocgis v2.1.1). This package is NOT a
port — it re-expresses the reference's query semantics (spatial subset
intersects/clip, point-in-polygon, kNN nearest-cell, area-weighted
aggregation, temporal grouping, tiling/chunking) as idiomatic Spark
DataFrame plans plus a small number of Arrow-vectorized pandas UDFs for
geometry-exact refinement.

Layout:
    geo/        pure-NumPy geometry kernel (WKB, PIP, clip, cell index)
    operators/  DataFrame -> DataFrame transforms (the operator inventory)
    fixtures    deterministic synthetic inputs derived from driver tables
    spans       interleaved text+media document span model (input_hint)
    checkpoint  per-partition lineage/metrics + resume filter
"""

__version__ = "0.1.0"
