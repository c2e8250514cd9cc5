"""pycuda_raster_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-creation of the query/data-processing capabilities of the
reference ``aFuerst/PyCUDA-Raster`` (focal raster analytics: slope, aspect,
hillshade via 3x3 moving-window kernels with halo-row exchange between tile
partitions — see SURVEY.md §0.1), expressed as idiomatic Spark DataFrame
pipelines over an Iceberg-shaped table of image/caption pairs.

Design rules (BASELINE.json:14-15):
  * DataFrame-first; no RDDs.
  * No per-row Python: every UDF is Arrow-vectorized (pandas UDF /
    mapInPandas / applyInPandas over NumPy blocks).
  * Explicit partitioning / salting / AQE for skew.
  * Per-partition lineage + metrics manifest; resumable via anti-join.

NOTE ON CITATIONS: the reference mount /root/reference was EMPTY this
session (verified; see SURVEY.md §0), so reference behavior is cited via
BASELINE.json line numbers (``B:<n>``) which the driver authored to
describe the reference, plus public knowledge of the repo layout marked
``[ref?: <module>]`` (unverifiable here, flagged as such).
"""

NODATA = -9999.0

from .session import get_spark  # noqa: E402,F401
