"""Pure-NumPy geometry kernel.

The container ships no shapely/GEOS and no h3, so the geometry math the
reference delegates to Shapely (``/root/reference/src/ocgis/variable/geom.py``)
is implemented here directly, vectorized with NumPy so it runs inside
Arrow-batched pandas UDFs with no per-row Python (input_hint requirement).
"""
