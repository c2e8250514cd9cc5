"""Viewshed (gdal_viewshed parity, exact deterministic variant) — for
an observer cell (``orow``, ``ocol``) raised ``oz`` above the terrain,
every cell is classified visible (1) or hidden (0): a target T is
visible iff every intermediate sample on the observer->T line has a
line-of-sight slope strictly below the target's,

    max_k (z_k - z_obs) / d_k  <  (z_T - z_obs) / d_T .

Line definition (the documented exact variant — GDAL interpolates edge
crossings instead): nearest-cell DDA on the dominant axis.  With
dr = r_T - orow, dc = c_T - ocol, n = max(|dr|, |dc|), sample k
(k = 1..n-1) sits at the half-up-rounded position

    sr_k = orow + floor((2 k dr + n) / (2 n)),
    sc_k = ocol + floor((2 k dc + n) / (2 n)),

pure integers in both engines (floor-division; the DuckDB oracle
rebuilds floor from truncating ``//`` via the pmod identity).  The
dominant-axis offset is exactly k, so no sample ever collapses onto the
observer.  Slopes divide by the CELL-UNIT distance sqrt(dr^2 + dc^2)
(one correctly-rounded sqrt of an integer -> bit-identical doubles;
multiplying by cellsize would scale both sides of every comparison
equally, so it is omitted).  NODATA rules: a NODATA target is hidden; a
NODATA intermediate is transparent (does not block); a NODATA observer
hides the whole image.  Equality blocks (grazing rays are hidden) —
deterministic in both engines.

Distribution (100 TB posture): the observer's window is assembled per
image with ``applyInPandas`` — gdal_viewshed has the same per-observer
in-memory window, bounded by ``max_dist`` (its ``-md``): bands farther
than ``max_dist`` from the observer row are FILTERED BEFORE the
shuffle, so per-observer work is (2 md / cellsize)^2 cells regardless of
raster size, and many observers/images parallelize across groups.  The
per-image compute is fully vectorized: one pass over k = 1..n_max with
whole-grid gathers and a running max (O(n_max) vector steps).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODATA = -9999.0

VIEWSHED_SCHEMA = (
    "image_id string, tile_y int, ty0 int, th int, w int, h int, "
    "cellsize double, x0 double, y0 double, crs string, "
    "visible array<int>"
)


def viewshed_grid(
    z: np.ndarray, orow: int, ocol: int, oz: float = 2.0,
    max_dist: float | None = None, nodata: float = NODATA,
) -> np.ndarray:
    """Whole-grid NumPy twin: int visibility grid (observer cell = 1
    when valid).  Targets beyond ``max_dist`` (cell units) are 0."""
    g = np.asarray(z, dtype=np.float32)
    h, w = g.shape
    out = np.zeros((h, w), dtype=np.int64)
    if g[orow, ocol] == np.float32(nodata):
        return out
    z0 = float(g[orow, ocol]) + float(oz)
    rr, cc = np.mgrid[0:h, 0:w]
    dr = rr - orow
    dc = cc - ocol
    n = np.maximum(np.abs(dr), np.abs(dc))
    d2 = dr * dr + dc * dc
    valid = g != np.float32(nodata)

    vmax = np.full((h, w), -np.inf)
    for k in range(1, int(n.max())):
        live = n > k  # k is an intermediate sample only when k < n
        if not live.any():
            break
        nn = np.where(live, n, 1)
        # clip the dead lanes' garbage positions — masked out below
        sr = np.clip(orow + np.floor_divide(2 * k * dr + nn, 2 * nn),
                     0, h - 1)
        sc = np.clip(ocol + np.floor_divide(2 * k * dc + nn, 2 * nn),
                     0, w - 1)
        zk = g[sr, sc]
        sd2 = (sr - orow) ** 2 + (sc - ocol) ** 2
        sk = (zk.astype(np.float64) - z0) / np.sqrt(sd2.astype(np.float64))
        sk = np.where(zk == np.float32(nodata), -np.inf, sk)  # transparent
        vmax = np.where(live, np.maximum(vmax, sk), vmax)

    with np.errstate(divide="ignore", invalid="ignore"):
        st = (g.astype(np.float64) - z0) / np.sqrt(d2.astype(np.float64))
    out[valid & (n > 0) & (vmax < st)] = 1
    out[orow, ocol] = 1  # observer (valid by the guard above)
    if max_dist is not None:
        out[d2 > float(max_dist) * float(max_dist)] = 0
        if d2[orow, ocol] == 0:
            out[orow, ocol] = 1
    return out


def viewshed_tiles(
    tiles: DataFrame,
    orow: int,
    ocol: int,
    oz: float = 2.0,
    max_dist: float | None = None,
    nodata: float = NODATA,
) -> DataFrame:
    """Tiled viewshed over ``decode_tiles`` output: tiles-shaped result
    with ``visible array<int>``.  With ``max_dist``, bands farther than
    it from the observer row are dropped BEFORE the per-image shuffle
    (the gdal_viewshed -md bound); dropped bands simply do not appear in
    the output (their cells are out of range by definition)."""
    keep = ["image_id", "tile_y", "ty0", "th", "w", "h", "cellsize",
            "x0", "y0", "crs", "px"]
    t = tiles.select(*keep)
    if max_dist is not None:
        md = float(max_dist)
        t = t.filter(
            (F.col("ty0") <= F.lit(float(orow) + md))
            & (F.col("ty0") + F.col("th") > F.lit(float(orow) - md)))

    def per_image(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ty0")
        w = int(pdf["w"].iat[0])
        h = int(pdf["h"].iat[0])
        full = np.full((h, w), NODATA, dtype=np.float32)
        for i in range(len(pdf)):
            ty0, th = int(pdf["ty0"].iat[i]), int(pdf["th"].iat[i])
            full[ty0:ty0 + th] = np.asarray(
                pdf["px"].iat[i], dtype=np.float32).reshape(th, w)
        vis = viewshed_grid(full, orow, ocol, oz, max_dist, nodata)
        out = {c: pdf[c] for c in pdf.columns if c != "px"}
        out["visible"] = [
            vis[int(pdf["ty0"].iat[i]):int(pdf["ty0"].iat[i])
                + int(pdf["th"].iat[i])].ravel()
            for i in range(len(pdf))
        ]
        return pd.DataFrame(out)

    return t.groupBy("image_id").applyInPandas(
        per_image, schema=VIEWSHED_SCHEMA)
