"""Horn-method 3x3 focal kernels: slope, aspect, hillshade — vectorized NumPy.

These are the engine's re-implementation of the reference's CUDA kernels
(BASELINE.json:6: "slope, aspect, hillshade via 3x3 moving-window kernels";
[ref?: embedded CUDA-C strings in gpuCalc.py]). The math is the public
Horn (1981) method that ``gdaldem`` implements — the reference's own golden
tests compare against gdaldem output (B:6), so gdaldem-compatible formulas
are the spec. Used both by the Spark operator (inside mapInPandas batches)
and by the whole-grid NumPy oracle in tests — a single source of truth.

Window layout over grid ``g`` (rows increase downward / southward):

        a b c
        d e f
        g h i

    dzdx = ((c + 2f + i) - (a + 2d + g)) / (8 * cellsize)
    dzdy = ((g + 2h + i) - (a + 2b + c)) / (8 * cellsize)

Edge & NODATA policy (SURVEY.md §2.2 ops 8-9, pinned by the oracle tests):
the grid is conceptually padded with one NODATA ring, and any 3x3 window
containing NODATA produces NODATA — so the outermost ring of the output is
always NODATA and NODATA islands dilate by one cell, matching the
propagating-sentinel behavior of gdaldem's default (no -compute_edges).
"""

from __future__ import annotations

import numpy as np

NODATA = -9999.0
FLAT_ASPECT = -1.0  # gdaldem flat-cell convention
DEFAULT_AZIMUTH_DEG = 315.0
DEFAULT_ALTITUDE_DEG = 45.0


def _padded(grid: np.ndarray, halo_top: np.ndarray | None, halo_bot: np.ndarray | None) -> np.ndarray:
    """Assemble (h+2, w+2) float64 working grid: vertical halos (from the
    neighbor tiles, or NODATA at image edges) + NODATA columns left/right."""
    h, w = grid.shape
    out = np.full((h + 2, w + 2), NODATA, dtype=np.float64)
    out[1:-1, 1:-1] = grid
    if halo_top is not None:
        out[0, 1:-1] = halo_top
    if halo_bot is not None:
        out[-1, 1:-1] = halo_bot
    return out


def horn_products(
    grid: np.ndarray,
    cellsize: float,
    halo_top: np.ndarray | None = None,
    halo_bot: np.ndarray | None = None,
    azimuth_deg: float = DEFAULT_AZIMUTH_DEG,
    altitude_deg: float = DEFAULT_ALTITUDE_DEG,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compute (slope_deg, aspect_deg, hillshade) for an (h, w) float grid.

    One pass computes all three products — the Spark analogue of the
    reference's one-input-pass/many-outputs scheduler fan-out
    ([ref?: scheduler.py (output, func) pairs]); sharing dzdx/dzdy beats
    re-running the stencil per product.

    ``halo_top``/``halo_bot`` are the boundary rows of the adjacent tiles
    (the halo-row exchange of B:6); None means true image edge.
    Returns float32 arrays shaped like ``grid``; NODATA propagates.
    """
    g = _padded(np.asarray(grid, dtype=np.float64), halo_top, halo_bot)
    nd = g == NODATA

    a, b, c = g[:-2, :-2], g[:-2, 1:-1], g[:-2, 2:]
    d, e, f = g[1:-1, :-2], g[1:-1, 1:-1], g[1:-1, 2:]
    gg, hh, ii = g[2:, :-2], g[2:, 1:-1], g[2:, 2:]

    bad = (
        nd[:-2, :-2] | nd[:-2, 1:-1] | nd[:-2, 2:]
        | nd[1:-1, :-2] | nd[1:-1, 1:-1] | nd[1:-1, 2:]
        | nd[2:, :-2] | nd[2:, 1:-1] | nd[2:, 2:]
    )

    # The ufunc SEQUENCE below is exactly the round-1 expression chain —
    # dzdx = ((c + 2f + ii) - (a + 2d + gg)) / (8 cs), etc. — with the
    # ~25 whole-grid temporaries reduced to 4 reused buffers (out=).
    # Reusing output buffers changes WHERE results land, never their
    # bits (each IEEE op sees identical operands in identical order), so
    # the SQL oracles that pin slope/aspect/hillshade stay value-exact;
    # measured ~20% off the kernel (the bench raster hot path).
    den = 8.0 * cellsize
    t1 = np.multiply(f, 2.0)
    np.add(c, t1, out=t1)
    np.add(t1, ii, out=t1)
    t2 = np.multiply(d, 2.0)
    np.add(a, t2, out=t2)
    np.add(t2, gg, out=t2)
    np.subtract(t1, t2, out=t1)
    dzdx = np.divide(t1, den, out=t1)
    t3 = np.multiply(hh, 2.0)
    np.add(gg, t3, out=t3)
    np.add(t3, ii, out=t3)
    t4 = np.multiply(b, 2.0)
    np.add(a, t4, out=t4)
    np.add(t4, c, out=t4)
    np.subtract(t3, t4, out=t3)
    dzdy = np.divide(t3, den, out=t3)

    # slope_rad = arctan(sqrt(dzdx^2 + dzdy^2)); slope = degrees(...)
    np.multiply(dzdx, dzdx, out=t2)
    sr = np.multiply(dzdy, dzdy, out=t4)
    np.add(t2, sr, out=sr)
    np.sqrt(sr, out=sr)
    np.arctan(sr, out=sr)
    slope = np.degrees(sr)

    # aspect: compass degrees clockwise from north, flat -> -1
    flat = (dzdx == 0.0) & (dzdy == 0.0)
    asp = np.negative(dzdx, out=t2)
    np.arctan2(dzdy, asp, out=asp)  # CCW from +x (degrees below)
    np.degrees(asp, out=asp)
    np.subtract(90.0, asp, out=asp)
    np.mod(asp, 360.0, out=asp)
    aspect = np.where(flat, FLAT_ASPECT, asp)

    # hillshade: 0..255, azimuth/altitude defaults = gdaldem defaults
    zen = np.radians(90.0 - altitude_deg)
    az = np.radians(azimuth_deg)
    asp_rad = np.where(flat, 0.0, aspect)
    np.radians(asp_rad, out=asp_rad)
    ca = np.cos(sr)
    np.multiply(np.cos(zen), ca, out=ca)       # cos(zen) * cos(slope_rad)
    np.sin(sr, out=sr)                         # sin(slope_rad)
    np.multiply(np.sin(zen), sr, out=sr)       # sin(zen) * sin(slope_rad)
    np.subtract(az, asp_rad, out=asp_rad)
    np.cos(asp_rad, out=asp_rad)               # cos(az - asp_rad)
    np.multiply(sr, asp_rad, out=sr)
    hs = np.add(ca, sr, out=ca)
    np.multiply(255.0, hs, out=hs)
    np.clip(hs, 0.0, 255.0, out=hs)
    np.rint(hs, out=hs)

    slope = np.where(bad, NODATA, slope).astype(np.float32)
    aspect = np.where(bad, NODATA, aspect).astype(np.float32)
    hillshade = np.where(bad, NODATA, hs).astype(np.float32)
    return slope, aspect, hillshade


MD_AZIMUTHS_DEG = (225.0, 270.0, 315.0, 360.0)


def hillshade_md(
    grid: np.ndarray,
    cellsize: float,
    halo_top: np.ndarray | None = None,
    halo_bot: np.ndarray | None = None,
    altitude_deg: float = DEFAULT_ALTITUDE_DEG,
) -> np.ndarray:
    """Multidirectional hillshade (gdaldem ``-multidirectional``, after
    Mark 1992 / USGS): four azimuths 225/270/315/360 combined with weights
    ``sin^2(aspect - azimuth)`` (which sum to 2 for 45-degree-spaced
    azimuths, hence the /2), each direction's raw shading clamped at 0
    (no negative light) before weighting. Output rint'd to [0, 255]
    integers like the single-azimuth product — which keeps the DuckDB
    oracle exact (integer-valued floats sum exactly in any order). Same
    NODATA/edge policy as ``horn_products``; float32 output."""
    g = _padded(np.asarray(grid, dtype=np.float64), halo_top, halo_bot)
    nd = g == NODATA

    a, b, c = g[:-2, :-2], g[:-2, 1:-1], g[:-2, 2:]
    d = g[1:-1, :-2]
    f = g[1:-1, 2:]
    gg, hh, ii = g[2:, :-2], g[2:, 1:-1], g[2:, 2:]

    bad = (
        nd[:-2, :-2] | nd[:-2, 1:-1] | nd[:-2, 2:]
        | nd[1:-1, :-2] | nd[1:-1, 1:-1] | nd[1:-1, 2:]
        | nd[2:, :-2] | nd[2:, 1:-1] | nd[2:, 2:]
    )

    dzdx = ((c + 2.0 * f + ii) - (a + 2.0 * d + gg)) / (8.0 * cellsize)
    dzdy = ((gg + 2.0 * hh + ii) - (a + 2.0 * b + c)) / (8.0 * cellsize)

    slope_rad = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
    flat = (dzdx == 0.0) & (dzdy == 0.0)
    asp_math = np.degrees(np.arctan2(dzdy, -dzdx))
    aspect = np.mod(90.0 - asp_math, 360.0)
    asp_rad = np.radians(np.where(flat, 0.0, aspect))

    zen = np.radians(90.0 - altitude_deg)
    num = 0.0
    for az_deg in MD_AZIMUTHS_DEG:
        az = np.radians(az_deg)
        s = np.sin(asp_rad - az)
        w = s * s
        hs_az = (np.cos(zen) * np.cos(slope_rad)
                 + np.sin(zen) * np.sin(slope_rad) * np.cos(az - asp_rad))
        num = num + w * np.maximum(hs_az, 0.0)
    hs = 255.0 * (num / 2.0)
    out = np.rint(np.clip(hs, 0.0, 255.0))
    return np.where(bad, NODATA, out).astype(np.float32)


def terrain_products(
    grid: np.ndarray,
    halo_top: np.ndarray | None = None,
    halo_bot: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The other three gdaldem 3x3 terrain products (same public tool the
    reference's golden tests compare against, B:6) — none uses cellsize:

    * **TRI** (Riley): sqrt of the sum of squared center-vs-neighbor
      differences;
    * **TPI**: center minus the mean of the 8 neighbors;
    * **roughness**: window max minus window min (all 9 cells).

    Same padded-window / NODATA-propagation / edge policy as
    ``horn_products``; float32 outputs. Operand order is FIXED
    (left-associative sums, x*x squares) so the DuckDB oracle reproduces
    the doubles before the float32 cast (CLAUDE.md parity recipe)."""
    g = _padded(np.asarray(grid, dtype=np.float64), halo_top, halo_bot)
    nd = g == NODATA

    a, b, c = g[:-2, :-2], g[:-2, 1:-1], g[:-2, 2:]
    d, e, f = g[1:-1, :-2], g[1:-1, 1:-1], g[1:-1, 2:]
    gg, hh, ii = g[2:, :-2], g[2:, 1:-1], g[2:, 2:]

    bad = (
        nd[:-2, :-2] | nd[:-2, 1:-1] | nd[:-2, 2:]
        | nd[1:-1, :-2] | nd[1:-1, 1:-1] | nd[1:-1, 2:]
        | nd[2:, :-2] | nd[2:, 1:-1] | nd[2:, 2:]
    )

    tri = np.sqrt(
        (a - e) * (a - e) + (b - e) * (b - e) + (c - e) * (c - e)
        + (d - e) * (d - e) + (f - e) * (f - e) + (gg - e) * (gg - e)
        + (hh - e) * (hh - e) + (ii - e) * (ii - e)
    )
    tpi = e - (a + b + c + d + f + gg + hh + ii) / 8.0
    rough = (
        np.maximum.reduce([a, b, c, d, e, f, gg, hh, ii])
        - np.minimum.reduce([a, b, c, d, e, f, gg, hh, ii])
    )

    tri = np.where(bad, NODATA, tri).astype(np.float32)
    tpi = np.where(bad, NODATA, tpi).astype(np.float32)
    rough = np.where(bad, NODATA, rough).astype(np.float32)
    return tri, tpi, rough


def curvature_products(
    grid: np.ndarray,
    cellsize: float,
    halo_top: np.ndarray | None = None,
    halo_bot: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Zevenbergen & Thorne (1987) profile and plan curvature (GRASS
    r.slope.aspect / ArcGIS Curvature family). With the 3x3 letters
    a b c / d e f / g h i and L = cellsize:

        D = ((d + f) * 0.5 - e) / L^2      E = ((b + h) * 0.5 - e) / L^2
        F = (((c - a) + g) - i) / (4 L^2)
        G = (f - d) / (2 L)                H = (b - h) / (2 L)
        profile = (-2 (D G^2 + E H^2 + F G H)) / (G^2 + H^2)
        plan    = ( 2 (D H^2 + E G^2 - F G H)) / (G^2 + H^2)

    Flat windows (G = H = 0) emit 0. Profile/plan are invariant under
    axis reflection (F, G each flip sign with an axis, F*G*H and the
    squares do not change), so the south-up row convention needs no sign
    fixups. Same padded-window / NODATA one-ring policy as the other
    kernels; every op is fixed-order double arithmetic cast to float32,
    so the DuckDB oracle reproduces both outputs bit-for-bit."""
    g = _padded(np.asarray(grid, dtype=np.float64), halo_top, halo_bot)
    nd = g == NODATA

    a, b, c = g[:-2, :-2], g[:-2, 1:-1], g[:-2, 2:]
    d, e, f = g[1:-1, :-2], g[1:-1, 1:-1], g[1:-1, 2:]
    gg, hh, ii = g[2:, :-2], g[2:, 1:-1], g[2:, 2:]

    bad = (
        nd[:-2, :-2] | nd[:-2, 1:-1] | nd[:-2, 2:]
        | nd[1:-1, :-2] | nd[1:-1, 1:-1] | nd[1:-1, 2:]
        | nd[2:, :-2] | nd[2:, 1:-1] | nd[2:, 2:]
    )

    L = float(cellsize)
    L2 = L * L
    D = ((d + f) * 0.5 - e) / L2
    E = ((b + hh) * 0.5 - e) / L2
    FF = (((c - a) + gg) - ii) / (4.0 * L2)
    G = (f - d) / (2.0 * L)
    H = (b - hh) / (2.0 * L)
    den = G * G + H * H
    flat = den == 0.0
    den_safe = np.where(flat, 1.0, den)
    prof = (-2.0 * ((D * (G * G) + E * (H * H)) + FF * G * H)) / den_safe
    plan = (2.0 * ((D * (H * H) + E * (G * G)) - FF * G * H)) / den_safe
    prof = np.where(flat, 0.0, prof)
    plan = np.where(flat, 0.0, plan)

    prof = np.where(bad, NODATA, prof).astype(np.float32)
    plan = np.where(bad, NODATA, plan).astype(np.float32)
    return prof, plan


# 1/sqrt(2) as the fixed double literal shared with the SQL oracle
# (interpolated there as CAST('0.7071067811865476' AS DOUBLE))
INV_SQRT2 = 0.7071067811865476

#: D8 codes in PRIORITY order (ESRI encoding; south-up grids, row+1 = N):
#: E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128 — the first direction
#: in this order attaining the max drop wins ties.
D8_CODES = (1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0)


def flow_dir(
    grid: np.ndarray,
    halo_top: np.ndarray | None = None,
    halo_bot: np.ndarray | None = None,
) -> np.ndarray:
    """D8 flow direction (ESRI encoding): the steepest-descent neighbor's
    code, 0 for flats/pits (no strictly positive drop). Diagonal drops are
    distance-weighted by ``INV_SQRT2``; cellsize cancels out of the argmax
    so the kernel needs no georeference. Same padded-window / NODATA /
    edge policy as the other 3x3 products; float32 output (codes and
    NODATA are exactly representable).

    Every drop is one subtraction (+ one multiply for diagonals) of the
    SAME doubles both engines hold, and the winner is picked by strict
    equality against ``greatest`` in a fixed priority order — so the
    DuckDB oracle reproduces the codes exactly, ties included."""
    g = _padded(np.asarray(grid, dtype=np.float64), halo_top, halo_bot)
    nd = g == NODATA

    a, b, c = g[:-2, :-2], g[:-2, 1:-1], g[:-2, 2:]
    d, e, f = g[1:-1, :-2], g[1:-1, 1:-1], g[1:-1, 2:]
    gg, hh, ii = g[2:, :-2], g[2:, 1:-1], g[2:, 2:]

    bad = (
        nd[:-2, :-2] | nd[:-2, 1:-1] | nd[:-2, 2:]
        | nd[1:-1, :-2] | nd[1:-1, 1:-1] | nd[1:-1, 2:]
        | nd[2:, :-2] | nd[2:, 1:-1] | nd[2:, 2:]
    )

    # south-up: row-1 (a/b/c) is SOUTH of the center, row+1 (gg/hh/ii)
    # NORTH. Drops listed in D8_CODES priority order.
    drops = (
        e - f,                  # E   = 1
        (e - c) * INV_SQRT2,    # SE  = 2
        e - b,                  # S   = 4
        (e - a) * INV_SQRT2,    # SW  = 8
        e - d,                  # W   = 16
        (e - gg) * INV_SQRT2,   # NW  = 32
        e - hh,                 # N   = 64
        (e - ii) * INV_SQRT2,   # NE  = 128
    )
    maxd = np.maximum.reduce(drops)
    code = np.select([dr == maxd for dr in drops], D8_CODES, 0.0)
    code = np.where(maxd <= 0.0, 0.0, code)
    return np.where(bad, NODATA, code).astype(np.float32)


def oracle_whole_grid(grid: np.ndarray, cellsize: float) -> dict[str, np.ndarray]:
    """Whole-grid (untiled) golden oracle — plays the role GDAL played for
    the reference's comparison tests (B:6; GDAL absent in sandbox). The
    tiled engine output must match this exactly: that is the
    halo-correctness gate (SURVEY.md §5.1-5.2)."""
    s, a, h = horn_products(grid, cellsize)
    tri, tpi, rough = terrain_products(grid)
    return {"slope": s, "aspect": a, "hillshade": h,
            "tri": tri, "tpi": tpi, "roughness": rough,
            "hillshade_md": hillshade_md(grid, cellsize),
            "flow_dir": flow_dir(grid)}
