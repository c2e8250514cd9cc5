"""Raster algebra and windowed crop — gdal_calc.py / gdal_translate parity.

The reference's users run ``gdal_calc.py -A a.tif -B b.tif --calc=...`` for
per-pixel band algebra (NDVI-style normalized difference, sums, ratios) and
``gdal_translate -srcwin xoff yoff xsize ysize`` to cut a sub-window out of
a raster before further processing. Both are re-expressed here as pure-JVM
Column programs over the engine's tiles representation:

* ``raster_calc`` — joins the two rasters' tiles on the row-band key
  (slim equi-join, one shuffle keyed by ``tile_y``; at 100 TB the two
  scans co-partition on the same key so AQE can pick a shuffled-hash or
  sort-merge join without skew) and evaluates the expression elementwise
  with ``zip_with`` inside whole-stage codegen. Zero Python in the math.
  All arithmetic is double-precision with a FIXED operand order and a
  float32 output cast, so a DuckDB twin over the ground-truth pixel table
  reproduces every cell bit-for-bit (plain + - * / are correctly rounded;
  the single float rounding at the end absorbs nothing because both
  engines round the same double).
* ``crop_tiles`` — a NARROW transformation (no shuffle at all): each
  source band slices its intersecting rows/columns with
  ``slice``/``transform``/``flatten`` Column ops and re-labels the tile
  origin. Filters prune non-intersecting bands before any work, so a
  county-sized crop of a continent-sized mosaic touches only the bands
  it keeps.

NODATA semantics (both ops): any NODATA input cell yields NODATA output;
``raster_calc`` additionally maps guarded denominators (``a + b == 0`` for
``ndiff``, ``b == 0`` for ``ratio``) to NODATA instead of inf/NaN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NODATA = -9999.0

#: preset per-pixel expressions (gdal_calc --calc analogues); each builder
#: takes DOUBLE Columns (a, b) and returns the DOUBLE result Column.
#: Guards returning None mean "no denominator guard".
CALC_OPS = {
    "add": (lambda a, b: a + b, None),
    "sub": (lambda a, b: a - b, None),
    "mul": (lambda a, b: a * b, None),
    "ratio": (lambda a, b: a / b, lambda a, b: b == 0.0),
    # normalized difference (NDVI-shaped): (a - b) / (a + b)
    "ndiff": (lambda a, b: (a - b) / (a + b), lambda a, b: (a + b) == 0.0),
}


def _calc_cell(op: str, nodata: float):
    """zip_with merge lambda for one preset op (closure factory — lambda
    defaults would capture the array index, see engineering notes)."""
    expr_fn, guard_fn = CALC_OPS[op]
    ndf = F.lit(float(nodata)).cast("float")

    def cell(a: Column, b: Column) -> Column:
        ad, bd = a.cast("double"), b.cast("double")
        bad = (ad == float(nodata)) | (bd == float(nodata))
        if guard_fn is not None:
            bad = bad | guard_fn(ad, bd)
        return F.when(bad, ndf).otherwise(expr_fn(ad, bd).cast("float"))

    return cell


def raster_calc(
    tiles: DataFrame,
    a_id: str,
    b_id: str,
    ops: tuple[str, ...] = ("ndiff",),
    out_id: str | None = None,
    nodata: float = NODATA,
) -> DataFrame:
    """Per-pixel algebra between two same-grid rasters in ``tiles``.

    Returns a tiles-shaped DataFrame for ONE derived image carrying one
    ``px_<op>`` array column per requested op (single join, all ops
    evaluated in the same projection — one pass over the pixels however
    many expressions are asked for). Header columns come from raster A;
    a JVM-side ``assert_true`` fails fast if the two rasters' band shapes
    disagree (different h/w/tiling) instead of silently mispairing rows.
    """
    for op in ops:
        if op not in CALC_OPS:
            raise ValueError(f"unsupported op {op} ({'/'.join(CALC_OPS)})")
    if not ops:
        raise ValueError("ops must name at least one CALC_OPS entry")

    cols = ["tile_y", "ty0", "th", "w", "h", "cellsize", "x0", "y0",
            "crs", "px"]
    a = (tiles.filter(F.col("image_id") == a_id).select(*cols))
    b = (tiles.filter(F.col("image_id") == b_id)
         .select("tile_y", F.col("th").alias("__bth"),
                 F.col("w").alias("__bw"), F.col("h").alias("__bh"),
                 F.col("px").alias("__bpx")))

    joined = a.join(b, "tile_y")

    # the shape assertion is folded into the FIRST px expression (a value
    # wrapped in when(assert_true(..).isNull(), ..)) — a free-standing
    # asserted column would be pruned away by Catalyst before evaluating
    shape_ok = F.assert_true(
        (F.col("th") == F.col("__bth")) & (F.col("w") == F.col("__bw"))
        & (F.col("h") == F.col("__bh")),
        F.lit(f"raster_calc: {a_id} and {b_id} band shapes "
              "differ — rasters must share one grid"))

    def px_col(i: int, op: str) -> Column:
        col = F.zip_with("px", "__bpx", _calc_cell(op, nodata))
        if i == 0:
            col = F.when(shape_ok.isNull(), col)
        return col.alias(f"px_{op}")

    return joined.select(
        F.lit(out_id or f"calc_{a_id}_{b_id}").alias("image_id"),
        "tile_y", "ty0", "th", "w", "h", "cellsize", "x0", "y0", "crs",
        *[px_col(i, op) for i, op in enumerate(ops)],
    )


def crop_tiles(
    tiles: DataFrame,
    r0: int,
    c0: int,
    out_h: int,
    out_w: int,
) -> DataFrame:
    """Cut the window rows ``[r0, r0 + out_h)`` x cols ``[c0, c0 + out_w)``
    out of every image in ``tiles`` (gdal_translate ``-srcwin`` with the
    engine's south-up row order: row 0 sits at ``y0``).

    Narrow plan: bands that miss the window are filtered out BEFORE any
    array work; surviving bands slice their overlap rows/columns with
    Column ops only (no shuffle, no Python). Output band origins are
    re-based so the result is a normal full-coverage tiles table —
    ``tile_y`` stays the source band index (still strictly increasing
    with ``ty0``, which is all the exporters and downstream operators
    key on). Requesting a window that leaves the grid raises (JVM
    ``assert_true`` folded into the band FILTER so it evaluates on every
    band BEFORE rows are discarded — a window entirely beyond the row
    extent fails fast too, instead of silently filtering to empty).
    """
    if min(r0, c0) < 0 or min(out_h, out_w) < 1:
        raise ValueError("crop window must be non-negative with size >= 1")

    cs = F.col("cellsize")
    lo = F.greatest(F.col("ty0"), F.lit(r0))                      # incl
    hi = F.least(F.col("ty0") + F.col("th"), F.lit(r0 + out_h))   # excl

    def row_slice(r: Column) -> Column:
        # local source row r -> out_w cells starting at column c0 (1-based)
        return F.slice("px", (r * F.col("w") + c0 + 1).cast("int"), out_w)

    # extent assertion folded into the px expression (see raster_calc note
    # — a dropped asserted column would be pruned before evaluating)
    fits = F.assert_true(
        (F.col("h") >= r0 + out_h) & (F.col("w") >= c0 + out_w),
        F.lit(f"crop_tiles: window {r0}+{out_h} x {c0}+{out_w} "
              "exceeds the raster extent"))

    # the slice is computed in a withColumn BEFORE the renaming select:
    # inside one select, Spark's lateral-column-alias resolution would bind
    # the expression's "w"/"h" to the NEW out_w/out_h aliases, not the
    # source columns (observed: slice stride 9 instead of 32)
    sliced = (
        tiles
        .filter(F.when(fits.isNull(),
                       (F.col("ty0") < r0 + out_h)
                       & (F.col("ty0") + F.col("th") > r0)))
        .withColumn("__px", F.when(fits.isNull(), F.flatten(F.transform(
            F.sequence((lo - F.col("ty0")).cast("int"),
                       (hi - F.col("ty0")).cast("int") - 1),
            row_slice))))
    )
    return sliced.select(
        "image_id", "tile_y",
        (lo - r0).cast("int").alias("ty0"),
        (hi - lo).cast("int").alias("th"),
        F.lit(out_w).alias("w"),
        F.lit(out_h).alias("h"),
        "cellsize",
        (F.col("x0") + c0 * cs).alias("x0"),
        (F.col("y0") + r0 * cs).alias("y0"),
        "crs",
        F.col("__px").alias("px"))


def scale_tiles(
    tiles: DataFrame,
    lo_out: float = 0.0,
    hi_out: float = 255.0,
    nodata: float = NODATA,
    pinned: bool = True,
) -> DataFrame:
    """Linear contrast stretch (gdal_translate ``-scale`` with auto
    src range): map each image's valid [min, max] onto [lo_out, hi_out],
    round half-up to integer levels, clamp, NODATA passes through.

    Plan shape: per-TILE extrema via ``array_min``/``array_max`` (JVM, no
    pixel explode), a tile-count-sized groupBy per image, and a broadcast
    join of the tiny per-image range table back onto the tiles — the
    stretch itself is whole-stage codegen. Auto-range scaling is
    inherently TWO passes over the tiles (range first, then stretch);
    ``pinned=True`` (default) pins the input with an eager
    ``localCheckpoint`` — the leak-free persist (ContextCleaner frees
    blocks when the frame goes unreachable) — so an expensive lineage
    (e.g. decode) runs ONCE; pass ``pinned=False`` when the caller
    already cached (tradeoff at cluster scale: truncated lineage means a
    lost block fails the job instead of recomputing). Degenerate
    flat images (max == min) map valid cells to ``lo_out``.

    Exactness: scale = (hi_out - lo_out) / (max - min) is ONE correctly
    rounded division; each cell is then (v - min) * scale + lo_out and a
    half-up round — the same doubles in Spark and DuckDB (round() agrees
    half-away-from-zero for the nonnegative outputs used here).
    """
    nd = float(nodata)
    if pinned:
        tiles = tiles.localCheckpoint(eager=True)
    valid = lambda: F.filter("px", lambda v: v != F.lit(nd))  # noqa: E731

    per_tile = tiles.select(
        "image_id",
        F.array_min(valid()).alias("__tmin"),
        F.array_max(valid()).alias("__tmax"),
    )
    rng = per_tile.groupBy("image_id").agg(
        F.min("__tmin").cast("double").alias("__lo"),
        F.max("__tmax").cast("double").alias("__hi"),
    )

    span = F.col("__hi") - F.col("__lo")
    scale = F.when(span > 0.0,
                   (F.lit(float(hi_out)) - F.lit(float(lo_out))) / span
                   ).otherwise(F.lit(0.0))

    def cell(v):
        x = F.round((v.cast("double") - F.col("__lo")) * F.col("__scale")
                    + F.lit(float(lo_out)), 0)
        x = F.least(F.greatest(x, F.lit(float(lo_out))),
                    F.lit(float(hi_out)))
        return F.when(v == F.lit(nd), F.lit(nd).cast("float")
                      ).otherwise(x.cast("float"))

    out = (
        tiles.join(F.broadcast(rng.withColumn("__scale", scale)), "image_id")
        .withColumn("px", F.transform("px", cell))
        .drop("__lo", "__hi", "__scale")
    )
    return out


def raster_histogram(
    tiles: DataFrame,
    bins: int = 16,
    lo: float = 0.0,
    hi: float = 256.0,
    value_col: str = "px",
    nodata: float = NODATA,
) -> DataFrame:
    """Per-image value histogram (gdalinfo -hist parity): fixed-width
    buckets over [lo, hi) with out-of-range values clamped into the edge
    buckets -> (image_id, bin, n). Bucket rule (shared verbatim with the
    DuckDB oracle): bin = clamp(floor((v - lo) / width), 0, bins-1) with
    width = (hi - lo) / bins computed ONCE driver-side — one subtraction
    + one division on identical operands, so boundary values bucket the
    same way in both engines; counts are exact integers.

    Scale shape: the explode feeds the hash aggregate inside the scan
    stage (map-side combine) — the shuffle carries one row per
    (image, bin), never pixels."""
    width = (float(hi) - float(lo)) / float(bins)
    nd = F.lit(float(nodata)).cast("float")
    z = (tiles.select("image_id", F.explode(value_col).alias("v"))
         .filter(F.col("v") != nd))
    b = F.least(
        F.lit(int(bins) - 1),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((F.col("v").cast("double") - F.lit(float(lo)))
                    / F.lit(width)).cast("long")))
    return (z.select("image_id", b.alias("bin"))
            .groupBy("image_id", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def raster_stats(
    tiles: DataFrame,
    value_col: str = "px",
    nodata: float = NODATA,
) -> DataFrame:
    """Per-image statistics (gdalinfo -stats parity): valid count,
    min/max (bit-copies), mean and population stddev ->
    (image_id, n_valid, vmin, vmax, mean, stddev).

    Cross-engine exactness: the value sum and square sum are fixed
    (r, c)-order double folds (x*x written as multiplication, never
    pow), mean = s/n, var = sq/n - mean*mean clamped at 0 (rounding can
    push a constant grid's variance a hair negative), stddev =
    correctly-rounded sqrt — every step replays in DuckDB with identical
    operand order. The per-image fold collects each image's valid cells
    into one row: the ORACLE CONFIGURATION (at scale, switch the folds
    for decimal partials as basin_stats does and accept last-digit
    cross-engine drift)."""
    nd = F.lit(float(nodata)).cast("float")
    z = (tiles.select(
        "image_id", "ty0", "w",
        F.posexplode(value_col).alias("pos", "v"))
        .filter(F.col("v") != nd)
        .select(
            "image_id",
            (F.col("ty0") + ((F.col("pos") - F.pmod("pos", F.col("w")))
                             / F.col("w"))).cast("long").alias("r"),
            F.pmod("pos", F.col("w")).cast("long").alias("c"),
            F.col("v").cast("double").alias("v")))
    ordered = F.sort_array(F.collect_list(F.struct("r", "c", "v")))
    s = F.aggregate(ordered, F.lit(0.0), lambda a, t: a + t["v"])
    sq = F.aggregate(ordered, F.lit(0.0),
                     lambda a, t: a + t["v"] * t["v"])
    agg = z.groupBy("image_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_valid"),
        F.min("v").alias("vmin"), F.max("v").alias("vmax"),
        s.alias("__s"), sq.alias("__sq"))
    n = F.col("n_valid").cast("double")
    mean = F.col("__s") / n
    var = F.greatest(F.lit(0.0), F.col("__sq") / n - mean * mean)
    return agg.select("image_id", "n_valid", "vmin", "vmax",
                      mean.alias("mean"), F.sqrt(var).alias("stddev"))
