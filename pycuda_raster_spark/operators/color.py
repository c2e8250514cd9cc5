"""gdaldem-style color-relief as PURE JVM Column expressions.

Maps elevation to packed 24-bit RGB through a piecewise-linear color ramp
(ascending ``(elevation, r, g, b)`` breakpoints; values below the first /
above the last breakpoint clamp to its color; NODATA -> packed 0). The
whole mapping is a chained CASE over ``transform(px, ...)`` — zero Python
in the plan (whole-stage codegen does the per-pixel work, the test gates
it), which is the point: a color ramp is exactly the kind of scalar map
that must NOT fall back to a UDF at 100 TB.

Channel interpolation for elevation v in [e_i, e_{i+1}):
``c_i + (v - e_i) / (e_{i+1} - e_i) * (c_{i+1} - c_i)``, rounded half-up
(Spark ``round`` == DuckDB ``round`` for the nonnegative channel values),
then packed ``r*65536 + g*256 + b``. Every step is plain correctly-rounded
double arithmetic in a FIXED order, so the DuckDB oracle reproduces the
packed ints exactly; per-tile SUMs of packed ints are integer-exact in any
order (the contract row's aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NODATA = -9999.0

# a classic hypsometric ramp spanning the synthetic corpus (86..51000)
DEFAULT_RAMP: tuple[tuple[float, int, int, int], ...] = (
    (0.0, 0, 97, 71),
    (500.0, 16, 122, 47),
    (2000.0, 232, 215, 125),
    (8000.0, 161, 67, 0),
    (20000.0, 130, 30, 30),
    (51000.0, 255, 255, 255),
)


def _channel(v: Column, ramp, idx: int) -> Column:
    es = [p[0] for p in ramp]
    cs = [float(p[idx]) for p in ramp]
    w = F.when(v <= F.lit(es[0]), F.lit(cs[0]))
    for i in range(len(es) - 1):
        t = (v - F.lit(es[i])) / F.lit(es[i + 1] - es[i])
        w = w.when(v < F.lit(es[i + 1]),
                   F.lit(cs[i]) + t * F.lit(cs[i + 1] - cs[i]))
    return w.otherwise(F.lit(cs[-1]))


def packed_rgb(v: Column, ramp=DEFAULT_RAMP) -> Column:
    """elevation Column (double) -> packed r*65536 + g*256 + b (long);
    NODATA -> 0."""
    r = F.round(_channel(v, ramp, 1), 0)
    g = F.round(_channel(v, ramp, 2), 0)
    b = F.round(_channel(v, ramp, 3), 0)
    packed = (r * F.lit(65536.0) + g * F.lit(256.0) + b).cast("long")
    return F.when(v == F.lit(NODATA), F.lit(0).cast("long")).otherwise(packed)


def color_relief(tiles: DataFrame, ramp=DEFAULT_RAMP,
                 px_col: str = "px", out_col: str = "rgb") -> DataFrame:
    """tiles -> tiles + ``rgb array<long>`` (packed 24-bit colors, NODATA
    pixels 0). JVM-only; no shuffle, no Python."""
    return tiles.withColumn(
        out_col,
        F.transform(F.col(px_col), lambda v: packed_rgb(v.cast("double"), ramp)),
    )


def ramp_numpy(grid, ramp=DEFAULT_RAMP):
    """NumPy twin for tests (same order of operations; round half-up)."""
    import numpy as np

    v = np.asarray(grid, dtype=np.float64)
    es = [p[0] for p in ramp]

    def chan(idx):
        cs = [float(p[idx]) for p in ramp]
        out = np.full(v.shape, cs[-1])
        for i in range(len(es) - 2, -1, -1):
            t = (v - es[i]) / (es[i + 1] - es[i])
            out = np.where(v < es[i + 1], cs[i] + t * (cs[i + 1] - cs[i]), out)
        out = np.where(v <= es[0], cs[0], out)
        return np.floor(out + 0.5)  # round half-up on nonnegative channels

    packed = (chan(1) * 65536.0 + chan(2) * 256.0 + chan(3)).astype(np.int64)
    return np.where(v == NODATA, np.int64(0), packed)
