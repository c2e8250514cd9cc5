"""raster<->vector materialization (north rule B:14).

* ``zonal_stats``: raster -> vector. Per-zone pixel statistics with the
  classic partial+final aggregate pattern: per-tile partials (count, sum,
  sum-of-squares, min, max) are computed with Spark's HIGHER-ORDER ARRAY
  FUNCTIONS — ``filter``/``aggregate``/``array_min``/``array_max`` run
  JVM-side inside whole-stage codegen, so the map-side combine touches no
  Python at all — then a tiny groupBy(zone) finalizes. The shuffle carries
  5 doubles per (tile, zone), never pixels.

* ``rasterize_zones``: vector -> raster. Per-tile zone-id masks: every
  pixel center is point-in-polygon tested against the candidate zones
  (cover-cell prefiltered, broadcast), vectorized NumPy per tile.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fixtures import point_in_ring
from ..functions.codecs import NODATA
from .spatial import pip_join_full, tile_centroids

ZONE_STATS_COLS = ("n_px", "sum_px", "min_px", "max_px", "mean_px", "std_px")


def tile_pixel_partials(tiles: DataFrame, value_col: str = "px") -> DataFrame:
    """Attach per-tile pixel partials (NODATA-filtered) as plain columns.
    Pure built-in expressions — zero Python."""
    valid = F.filter(F.col(value_col), lambda v: v != F.lit(float(NODATA)))
    dbl = F.transform(valid, lambda v: v.cast("double"))
    return (
        tiles.withColumn("__valid", dbl)
        .withColumn("pn", F.size("__valid").cast("long"))
        .withColumn("ps", F.aggregate("__valid", F.lit(0.0), lambda a, v: a + v))
        .withColumn("pss", F.aggregate("__valid", F.lit(0.0), lambda a, v: a + v * v))
        .withColumn("pmin", F.array_min("__valid"))
        .withColumn("pmax", F.array_max("__valid"))
        .drop("__valid")
    )


def _zone_res(zones: DataFrame) -> int:
    import numpy as _np

    from ..functions.cellindex import cell_res

    return int(cell_res(_np.int64(
        zones.select(F.element_at("cover_cells", 1)).first()[0])))


def zonal_stats(
    tiles: DataFrame,
    zones: DataFrame,
    res: int | None = None,
    value_col: str = "px",
    exact_sums: bool = False,
) -> DataFrame:
    """Per-zone stats over the pixels of tiles whose centroid falls in the
    zone -> (zone_id, n_px, sum_px, min_px, max_px, mean_px, std_px).

    SINGLE pixel pass: partials and centroid geometry are projected from
    the same tile rows (pixels are dropped immediately after the partial
    reduction), so the PIP join and final aggregate touch only scalars —
    the upstream decode/scan runs once, not three times.
    """
    zres = res if res is not None else _zone_res(zones)
    slim = tile_pixel_partials(tiles, value_col).select(
        "image_id", "tile_y", "ty0", "th", "w", "x0", "y0", "cellsize",
        "pn", "ps", "pss", "pmin", "pmax",
    )
    return zonal_stats_from_partials(slim, zones, res=zres, exact_sums=exact_sums)


def zonal_stats_from_partials(
    partials: DataFrame, zones: DataFrame, res: int | None = None,
    exact_sums: bool = False,
) -> DataFrame:
    """Finalize zonal stats from any DF carrying tile geometry + pixel
    partials (pn/ps/pss/pmin/pmax) — e.g. ``focal.decode_focal`` output,
    which makes the whole zonal stage pixel-free.

    ``exact_sums``: route the per-tile double partials through
    DECIMAL(30,10) before the final SUM. Decimal addition is exact and
    order-independent, so the result is reproducible across partitionings,
    retries and engines (a raw double SUM over a shuffled set is not) —
    the property the DuckDB oracle comparison and any 1000-executor
    re-run-stability requirement both need."""
    zres = res if res is not None else _zone_res(zones)
    cent = tile_centroids(partials, zres).withColumnRenamed(
        "cx", "x"
    ).withColumnRenamed("cy", "y")
    # partials ride THROUGH the broadcast PIP join — one linear pipeline,
    # the fact side is never shuffled or recomputed
    joined = pip_join_full(cent, zones, res=zres)
    if exact_sums:
        dec = lambda c: F.col(c).cast("decimal(30,10)")  # noqa: E731
        sum_px = F.sum(dec("ps")).cast("double")
        sum_ss = F.sum(dec("pss")).cast("double")
    else:
        sum_px, sum_ss = F.sum("ps"), F.sum("pss")
    agg = joined.groupBy("zone_id").agg(
        F.sum("pn").alias("n_px"),
        sum_px.alias("sum_px"),
        sum_ss.alias("__ss"),
        F.min("pmin").alias("min_px"),
        F.max("pmax").alias("max_px"),
    )
    mean = F.col("sum_px") / F.col("n_px")
    var = F.greatest(F.col("__ss") / F.col("n_px") - mean * mean, F.lit(0.0))
    return agg.select(
        "zone_id", "n_px", "sum_px", "min_px", "max_px",
        mean.alias("mean_px"), F.sqrt(var).alias("std_px"),
    )


RASTERIZE_SCHEMA = (
    "image_id string, tile_y int, ty0 int, th int, w int, zone_mask array<long>"
)


def rasterize_zones(tiles: DataFrame, zones: DataFrame) -> DataFrame:
    """vector -> raster: per-tile int64 mask of containing zone_id per pixel
    center (-1 where no zone). Candidate zones are prefiltered by
    bbox-vs-bbox overlap against the BROADCAST zone list, then the exact
    ray cast runs vectorized over the tile's pixel-center lattice."""
    zrows = zones.select("zone_id", "ring").collect()
    zdata = [
        (
            int(r.zone_id),
            [{"x": v["x"], "y": v["y"]} for v in r.ring],
            (
                min(v["x"] for v in r.ring), min(v["y"] for v in r.ring),
                max(v["x"] for v in r.ring), max(v["y"] for v in r.ring),
            ),
        )
        for r in zrows
    ]
    sc = tiles.sparkSession.sparkContext
    bz = sc.broadcast(zdata)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zs = bz.value
        for pdf in batches:
            masks = []
            for row in pdf.itertuples(index=False):
                th, w, cs = int(row.th), int(row.w), float(row.cellsize)
                xs = row.x0 + (np.arange(w) + 0.5) * cs
                ys = row.y0 + (row.ty0 + np.arange(th) + 0.5) * cs
                gx, gy = np.meshgrid(xs, ys)
                gx, gy = gx.ravel(), gy.ravel()
                mask = np.full(gx.shape, -1, dtype=np.int64)
                tx0, ty0w, tx1, ty1w = xs[0], ys[0], xs[-1], ys[-1]
                for zid, ring, (bx0, by0, bx1, by1) in zs:
                    if bx1 < tx0 or bx0 > tx1 or by1 < ty0w or by0 > ty1w:
                        continue
                    hit = point_in_ring(gx, gy, ring)
                    mask[hit] = zid  # later zones win overlaps (deterministic order)
                masks.append(mask)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"], "tile_y": pdf["tile_y"],
                    "ty0": pdf["ty0"], "th": pdf["th"], "w": pdf["w"],
                    "zone_mask": masks,
                }
            )

    cols = ["image_id", "tile_y", "ty0", "th", "w", "cellsize", "x0", "y0"]
    return tiles.select(*cols).mapInPandas(gen, schema=RASTERIZE_SCHEMA)
