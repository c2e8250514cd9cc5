"""Scattered-point interpolation to a raster grid (gdal_grid parity,
``invdist`` algorithm) — the inverse of zonal statistics: each output
cell takes the inverse-distance-weighted mean of the points within
``radius`` of its center,

    z(cell) = sum_i(z_i / d_i^p) / sum_i(1 / d_i^p),   d_i <= radius,

with GDAL's exact-hit rule (a point coinciding with the cell center
wins outright — smallest point_id if several) and NODATA where no point
is in range.  Powers 1 and 2 are EXACT cross-engine (p=2 needs only
``1/d2``; p=1 adds one correctly-rounded sqrt); other powers would go
through ``pow`` whose libm/JVM ulp differences break bit-parity, so
they are rejected rather than silently approximate.

Determinism: the weighted sums fold in ``point_id`` order — the engine
sorts each cell's candidate list (``sort_array`` on a struct keyed by
point_id) and folds with ``F.aggregate``; the DuckDB oracle mirrors it
with ``list_reduce(list_prepend(0.0, list(term ORDER BY point_id)))``.
Identical operand order + correctly-rounded double ops = bit-identical
results (the repo's established fold recipe).

Distribution (100 TB posture): ZERO Python stages — everything is
Column expressions and one JVM aggregation.  Points and cells are
bucketed into radius-sized squares; the cell side expands to its 3x3
bucket neighborhood (slim rows: bucket + center coords only) and
equi-joins the points on the bucket id, so the join is a hash join on a
bounded key, never a cross product.  A point within ``radius`` of a
cell center is always within one bucket step (bucket width = radius),
so the expansion is lossless; the exact ``d2 <= radius^2`` filter runs
on the joined pairs.  Skewed point clusters shuffle by bucket id —
AQE's skew-join splitting applies.  Output cardinality is the grid
itself (one row per cell), built from ``spark.range`` — no driver-side
loops, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NODATA = -9999.0


def grid_idw(
    spark: SparkSession,
    points: DataFrame,
    x0: float,
    y0: float,
    cellsize: float,
    out_h: int,
    out_w: int,
    radius: float,
    power: int = 2,
    nodata: float = NODATA,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
    id_col: str = "point_id",
) -> DataFrame:
    """gdal_grid invdist onto an ``out_h`` x ``out_w`` grid anchored at
    (``x0``, ``y0``) with square cells of ``cellsize``: returns
    ``(r, c, z)`` — one row per output cell, ``z`` = IDW mean of the
    points within ``radius`` of the cell center (NODATA if none;
    exact-hit points win outright)."""
    if power not in (1, 2):
        raise ValueError("grid_idw: only powers 1 and 2 are exact "
                         "cross-engine; refusing approximate pow()")
    R = float(radius)
    w = int(out_w)

    cells = spark.range(int(out_h) * w).select(
        ((F.col("id") - F.pmod("id", F.lit(w))) / w).cast("long").alias("r"),
        F.pmod("id", F.lit(w)).cast("long").alias("c"),
    ).select(
        "r", "c",
        (F.lit(float(x0)) + (F.col("c").cast("double") + F.lit(0.5))
         * F.lit(float(cellsize))).alias("cx"),
        (F.lit(float(y0)) + (F.col("r").cast("double") + F.lit(0.5))
         * F.lit(float(cellsize))).alias("cy"),
    )

    # 3x3 bucket expansion on the slim cell side (bucket width = radius)
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    cells9 = cells.select(
        "r", "c", "cx", "cy", F.explode(offs).alias("o")
    ).select(
        "r", "c", "cx", "cy",
        (F.floor(F.col("cx") / F.lit(R)).cast("long")
         + F.col("o.dx")).alias("bx"),
        (F.floor(F.col("cy") / F.lit(R)).cast("long")
         + F.col("o.dy")).alias("by"),
    )

    pts = points.select(
        F.col(id_col).alias("__pid"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
        F.col(z_col).cast("double").alias("__z"),
        F.floor(F.col(x_col).cast("double") / F.lit(R)).cast("long")
        .alias("bx"),
        F.floor(F.col(y_col).cast("double") / F.lit(R)).cast("long")
        .alias("by"),
    )

    d2 = ((F.col("cx") - F.col("__x")) * (F.col("cx") - F.col("__x"))
          + (F.col("cy") - F.col("__y")) * (F.col("cy") - F.col("__y")))
    cand = (cells9.join(pts, ["bx", "by"])
            .withColumn("d2", d2)
            .filter(F.col("d2") <= F.lit(R * R)))

    cl = F.sort_array(F.collect_list(
        F.struct(F.col("__pid").alias("pid"), F.col("__z").alias("z"),
                 F.col("d2").alias("d2"))))

    def _wsum(term):
        # fold only the d2 > 0 elements: ANSI mode (Spark 4 default)
        # makes x/0 THROW, and an exact-hit cell must not evaluate the
        # IDW branch's divisions. Closure factory — a defaulted second
        # lambda param would bind the array index (the repo's documented
        # HOF arity gotcha).
        nz = F.filter(F.col("__cl"), lambda t: t["d2"] > F.lit(0.0))
        return F.aggregate(nz, F.lit(0.0), lambda acc, t: acc + term(t))

    if power == 2:
        wnum = _wsum(lambda t: t["z"] / t["d2"])
        wden = _wsum(lambda t: F.lit(1.0) / t["d2"])
    else:  # power == 1: one correctly-rounded sqrt, still exact
        wnum = _wsum(lambda t: t["z"] / F.sqrt(t["d2"]))
        wden = _wsum(lambda t: F.lit(1.0) / F.sqrt(t["d2"]))

    hits = F.filter(F.col("__cl"), lambda t: t["d2"] == F.lit(0.0))
    agg = (cand.groupBy("r", "c").agg(cl.alias("__cl"))
           .select(
               "r", "c",
               F.when(F.size(hits) > 0,
                      F.element_at(hits, 1)["z"])
               .otherwise(wnum / wden).alias("__z")))

    return (cells.select("r", "c")
            .join(agg, ["r", "c"], "left")
            .select("r", "c",
                    F.coalesce(F.col("__z"), F.lit(float(nodata)))
                    .alias("z")))


def sample_points(
    tiles: DataFrame,
    points: DataFrame,
    value_col: str = "px",
) -> DataFrame:
    """Raster -> points (gdallocationinfo / GRASS r.what parity): the
    raster value at each point's containing cell, one output row per
    (point, image) whose extent contains the point.

    Cell rule (south-up, shared verbatim by the DuckDB oracle): row
    r = floor((y - y0) / cellsize), col c = floor((x - x0) / cellsize),
    kept iff 0 <= r < h and 0 <= c < w. One subtraction + one division
    + floor per axis — identical operand order in both engines gives
    identical doubles, so boundary points floor the same way. The value
    is a bit-copy of the input cell (NODATA passes through — callers
    filter if they want valid-only).

    Scale shape: ZERO Python stages beyond the upstream decode (which
    runs ONCE — each tile row carries its own geometry, so there is no
    extents side-branch re-executing the lineage) and the pixel payload
    never shuffles: the (small) point set broadcasts onto the tiles,
    each tile row keeps only the points its band contains, then one
    ``element_at`` per hit. For billion-point sets swap the broadcast
    for the bucketed cell-index join (``grid_idw``'s shape); this path
    is the small/medium query-set tool.
    """
    p = points.select("point_id", "x", "y")
    j = (tiles.select("image_id", "ty0", "th", "w", "x0", "y0",
                      "cellsize", value_col)
         .join(F.broadcast(p))
         .withColumn("r", F.floor((F.col("y") - F.col("y0"))
                                  / F.col("cellsize")).cast("long"))
         .withColumn("c", F.floor((F.col("x") - F.col("x0"))
                                  / F.col("cellsize")).cast("long"))
         .filter((F.col("r") >= F.col("ty0"))
                 & (F.col("r") < F.col("ty0") + F.col("th"))
                 & (F.col("c") >= 0) & (F.col("c") < F.col("w"))))
    return j.select(
        "point_id", "image_id", "r", "c",
        F.element_at(
            F.col(value_col),
            ((F.col("r") - F.col("ty0")) * F.col("w") + F.col("c")
             + F.lit(1)).cast("int")).alias("val"))


def profile_tiles(
    tiles: DataFrame,
    start: tuple[int, int],
    end: tuple[int, int],
    value_col: str = "px",
) -> DataFrame:
    """Transect sampling (GRASS r.profile / gdallocationinfo along a
    line): S+1 evenly spaced samples on the cell-space segment from
    ``start`` = (r0, c0) to ``end`` = (r1, c1) inclusive, with
    S = max(|dr|, |dc|, 1); each sample snaps to its nearest cell and
    yields one row per (image, step) whose snapped cell lies inside the
    image -> (image_id, step, r, c, dist, val).

    Exactness (cross-engine): sample positions are exact rationals
    (num = a*(S-k) + b*k over denominator S) snapped with pure integer
    arithmetic r_k = (2*num + S) // (2*S) (round half up — operands are
    nonnegative); ``dist`` = sqrt(dr^2 + dc^2) (correctly-rounded sqrt
    of an exact integer) * cellsize * k / S in that operand order; the
    value is a bit-copy of the input cell.

    Scale shape: the step table is ``spark.range`` + pure Column math,
    broadcast onto the tiles (sample_points' shape); pixels never
    shuffle; one ``element_at`` per hit."""
    r0, c0 = int(start[0]), int(start[1])
    r1, c1 = int(end[0]), int(end[1])
    if min(r0, c0, r1, c1) < 0:
        raise ValueError("profile endpoints must be non-negative cells")
    S = max(abs(r1 - r0), abs(c1 - c0), 1)
    spark = tiles.sparkSession
    steps = spark.range(S + 1).select(F.col("id").alias("step"))

    def snap(a, b):
        num = (F.lit(a) * (F.lit(S) - F.col("step"))
               + F.lit(b) * F.col("step"))
        x = F.lit(2) * num + F.lit(S)
        d = F.lit(2 * S)
        return ((x - F.pmod(x, d)) / d).cast("long")

    pts = steps.select("step", snap(r0, r1).alias("r"),
                       snap(c0, c1).alias("c"))
    d2 = (r1 - r0) * (r1 - r0) + (c1 - c0) * (c1 - c0)
    j = (tiles.select("image_id", "ty0", "th", "w", "cellsize", value_col)
         .join(F.broadcast(pts))
         .filter((F.col("r") >= F.col("ty0"))
                 & (F.col("r") < F.col("ty0") + F.col("th"))
                 & (F.col("c") >= 0) & (F.col("c") < F.col("w"))))
    dist = (F.sqrt(F.lit(float(d2))) * F.col("cellsize")
            * F.col("step").cast("double") / F.lit(float(S)))
    return j.select(
        "image_id", "step", "r", "c", dist.alias("dist"),
        F.element_at(
            F.col(value_col),
            ((F.col("r") - F.col("ty0")) * F.col("w") + F.col("c")
             + F.lit(1)).cast("int")).alias("val"))
