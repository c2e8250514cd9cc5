"""Raster mosaic — gdal_merge/BuildVRT parity: compose MANY source rasters
onto ONE shared destination grid (the reference's users merge adjacent DEM
tiles into a working canvas before gdaldem; the engine's per-image
operators needed the multi-raster composition step to close that loop).

Plan shape (100 TB posture):

1. every source image warps onto the SHARED destination grid via
   ``warp_affine_tiles(..., absolute_origin=True)`` — the band-routed
   regrid, pixels shuffle exactly once; images that miss the canvas
   contribute all-NODATA seed tiles only;
2. one ``groupBy(destination tile)`` merges the per-image candidate tiles
   ELEMENTWISE with pure JVM array folds: ``collect_list(struct(image_id,
   px))`` -> ``array_sort`` (deterministic image order regardless of
   partitioning) -> ``aggregate``/``zip_with`` fold under the merge rule.
   No Python in the merge at all; the per-group payload is
   (#overlapping images) x tile pixels — bounded by overlap depth, not
   corpus size, and the groupBy key count is the canvas tile count, so
   AQE splits hot canvases.

Merge rules (NODATA-aware, deterministic):
* ``first`` — first non-NODATA value in ascending image_id order
  (gdal_merge's default last-on-top inverted to an explicit stable rule);
* ``last``  — last non-NODATA wins;
* ``max`` / ``min`` — elementwise extremum over non-NODATA values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .warp import warp_affine_tiles

NODATA = -9999.0

RULES = ("first", "last", "max", "min")


def _merge_fn(rule: str, nd):
    if rule == "first":
        return lambda acc, v: F.when(acc != nd, acc).otherwise(v)
    if rule == "last":
        return lambda acc, v: F.when(v != nd, v).otherwise(acc)
    if rule == "max":
        return lambda acc, v: (
            F.when(acc == nd, v)
            .when(v == nd, acc)
            .otherwise(F.greatest(acc, v)))
    return lambda acc, v: (
        F.when(acc == nd, v)
        .when(v == nd, acc)
        .otherwise(F.least(acc, v)))


def mosaic_tiles(
    tiles: DataFrame,
    out_h: int,
    out_w: int,
    dcell: float,
    x0: float,
    y0: float,
    method: str = "nearest",
    rule: str = "first",
    dest_crs: str | None = None,
    out_tile_rows: int = 8,
    nodata: float = NODATA,
    image_id: str = "mosaic",
    max_depth: int = 64,
) -> DataFrame:
    """Mosaic every image in ``tiles`` onto the ``out_h x out_w`` canvas
    with origin ``(x0, y0)`` and cell size ``dcell`` -> a tiles-shaped
    DataFrame for ONE composite image (``image_id``), ready for the same
    focal/zonal/export pipeline as any decoded raster.

    The output carries ONE crs: ``dest_crs`` when given, else the sources'
    shared label — mixed source crs without ``dest_crs`` fails fast via a
    JVM assert (crs is NOT a grouping key, so label drift can no longer
    split a canvas tile into duplicate composites). ``max_depth`` bounds
    the per-tile merge payload (overlap depth x tile pixels); a canvas
    tile covered by more sources fails fast instead of building a giant
    row AQE cannot split — raise it deliberately for deep stacks."""
    if rule not in RULES:
        raise ValueError(f"unsupported merge rule {rule} ({'/'.join(RULES)})")
    warped = warp_affine_tiles(
        tiles, out_h, out_w, dcell, dx_off=float(x0), dy_off=float(y0),
        method=method, dest_crs=dest_crs, out_tile_rows=out_tile_rows,
        nodata=nodata, absolute_origin=True)

    nd = F.lit(float(nodata)).cast("float")
    init = F.array_repeat(nd, (F.col("th") * F.col("w")).cast("int"))
    merge = _merge_fn(rule, nd)
    # folded into px (a pruned free-standing assert column never runs):
    # sources must agree on crs within the tile unless dest_crs overrides,
    # and the overlap stack must stay within the documented depth bound
    def guarded_px(crs_ok):
        depth_ok = F.assert_true(
            F.size("__srcs") <= F.lit(int(max_depth)),
            F.lit("mosaic_tiles: overlap depth exceeds max_depth — "
                  "raise max_depth for deep stacks"))
        fold = F.aggregate(
            "__srcs", init, lambda acc, s: F.zip_with(acc, s["px"], merge))
        return F.when(depth_ok.isNull() & crs_ok.isNull(), fold)

    crs_ok = F.assert_true(
        F.lit(dest_crs is not None) | (F.col("__crs_min") == F.col("__crs_max")),
        F.lit("mosaic_tiles: sources carry mixed crs labels — pass "
              "dest_crs to resolve the output crs"))
    merged = (
        warped.groupBy("tile_y", "ty0", "th", "w", "h", "cellsize",
                       "x0", "y0")
        .agg(F.array_sort(
            F.collect_list(F.struct("image_id", "px"))).alias("__srcs"),
            F.min("crs").alias("__crs_min"),
            F.max("crs").alias("__crs_max"))
        .withColumn("px", guarded_px(crs_ok))
        .withColumn("crs", F.lit(dest_crs) if dest_crs is not None
                    else F.col("__crs_min"))
        .drop("__srcs", "__crs_min", "__crs_max")
    )
    return merged.select(
        F.lit(image_id).alias("image_id"), "tile_y", "ty0", "th", "w", "h",
        "cellsize", "x0", "y0", "crs", "px")
