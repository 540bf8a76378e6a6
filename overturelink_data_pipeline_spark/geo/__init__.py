"""Geometry layer (SURVEY.md §7.1 step 3).

Representation choice (SURVEY.md §7.0): geometry travels through the
engine as WKB ``BinaryType`` in a column named ``geometry``, CRS fixed
at EPSG:4326 by convention. All geometry math is a dependency-free
WKB codec (``wkb.py``) + computational-geometry core (``geom.py``)
exposed to Spark as Arrow pandas UDFs (``functions.py``) — the one
legitimate Python-UDF family in this engine (reference's shapely ops,
SURVEY.md §2.9). Everything *around* the UDFs (bbox prefilters,
family CASE, column derivations) stays in Catalyst expressions.
"""
