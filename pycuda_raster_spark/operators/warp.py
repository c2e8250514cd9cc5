"""Axis-aligned affine warp (regrid) — the gdalwarp core the resample
operator didn't cover (VERDICT r3 missing #3 / next #6): resample the
source raster onto an ARBITRARY destination grid (different origin, cell
size and extent), with an optional axis-aligned affine between the
destination's world frame and the source's (scale + translate per axis —
the datum-sharing EPSG subset, e.g. unit conversion or a shifted tiling
scheme). No rotation/shear (axis-aligned by design) and no curved datum
shift (that needs a proj database the sandbox doesn't have — documented
engine scope).

Sampling semantics (shared verbatim by the DuckDB oracle and the NumPy
twin — the CLAUDE.md bit-parity recipe: identical operand order in plain
+-*/ gives identical doubles in every engine):

* destination pixel (R, C) has world center
  ``xd = dx0 + (C + 0.5) * dcell``,  ``yd = dy0 + (R + 0.5) * dcell``;
* the affine maps it into the source frame:
  ``xs = sx * xd + tx``, ``ys = sy * yd + ty`` (sx, sy > 0);
* source-pixel-space position: ``pc = (xs - x0) / cs - 0.5``,
  ``pr = (ys - y0) / cs - 0.5`` — each step one IEEE op in a FIXED order;
* **out-of-extent** destination pixels (pc or pr outside [0, n-1]) are
  NODATA — the warp never clamps into the source (unlike pure resample,
  where in- and output extents coincide by construction);
* **nearest** picks ``floor(p + 0.5)``; **bilinear** folds the 4 corners
  in the same fixed order as operators/resample.py, float32 cast at the
  end, with NODATA poisoning exactly the nonzero-weight corners.

Distribution: identical shape to resample_tiles — every output tile needs
a CONTIGUOUS band of source rows, so input tiles route their overlapping
row slices via JVM-only Column arithmetic (explode over a conservative
output-tile range + exact band-intersection filter + ``slice`` of the
pixel payload), then ``groupBy(image_id, out_ty).applyInPandas`` assembles
and interpolates one output tile per group. Pixels shuffle exactly once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODATA = -9999.0

OUT_SCHEMA = (
    "image_id string, tile_y int, ty0 int, th int, w int, h int, "
    "cellsize double, x0 double, y0 double, crs string, px array<float>"
)


def _pos(i: np.ndarray, d0: float, dcell: float, scale: float, trans: float,
         src0: float, cs: float) -> np.ndarray:
    """pos = ((scale * (d0 + (i + 0.5) * dcell) + trans) - src0) / cs - 0.5
    — one op per step, fixed order (mirrored verbatim in the SQL oracle)."""
    return (scale * (d0 + (i + 0.5) * dcell) + trans - src0) / cs - 0.5


def warp_affine_tiles(
    tiles: DataFrame,
    out_h: int,
    out_w: int,
    dcell: float,
    dx_off: float = 0.0,
    dy_off: float = 0.0,
    affine: tuple[float, float, float, float] = (1.0, 0.0, 1.0, 0.0),
    method: str = "bilinear",
    dest_crs: str | None = None,
    out_tile_rows: int = 8,
    nodata: float = NODATA,
    absolute_origin: bool = False,
) -> DataFrame:
    """Warp every image onto a destination grid of ``out_h x out_w``
    cells of size ``dcell``. By default the grid's origin is PER-IMAGE:
    the image's own origin shifted by ``(dx_off, dy_off)``. With
    ``absolute_origin=True``, ``(dx_off, dy_off)`` IS the destination
    origin in world coordinates — ONE shared grid for every image, the
    prerequisite for mosaicking (operators/mosaic.py). ``affine =
    (sx, tx, sy, ty)`` maps destination world coords into the source
    frame (sx, sy > 0). ``dest_crs`` relabels the output CRS
    (axis-aligned EPSG subset)."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unsupported method {method} (nearest/bilinear)")
    if out_h < 1 or out_w < 1 or dcell <= 0:
        raise ValueError("output grid must be non-empty with dcell > 0")
    sx, tx, sy, ty = (float(v) for v in affine)
    if sx <= 0 or sy <= 0:
        raise ValueError("axis-aligned warp requires positive scales "
                         f"(got sx={sx}, sy={sy})")

    tr = int(out_tile_rows)
    bilinear = method == "bilinear"
    n_out_tiles = -(-out_h // tr)

    # --- JVM-side row routing ------------------------------------------
    # dest row R's source-row position, as Column math (double — used only
    # for CONSERVATIVE routing, so a +-2-row margin absorbs any rounding;
    # the value math happens in the grouped NumPy stage below):
    #   pr(R) = ((sy * (y0 + dy_off + (R + 0.5) * dcell) + ty) - y0) / cs - 0.5
    cs = F.col("cellsize")
    y0 = F.col("y0")
    o = F.col("__o").cast("double")
    R0 = o * tr
    R1 = F.least(o * tr + tr, F.lit(float(out_h))) - 1.0

    dy0_expr = F.lit(dy_off) if absolute_origin else y0 + F.lit(dy_off)

    def pr(R):
        yd = dy0_expr + (R + 0.5) * F.lit(dcell)
        return (F.lit(sy) * yd + F.lit(ty) - y0) / cs - 0.5

    pad = 1.0 if bilinear else 0.5
    need_lo = F.greatest(F.floor(pr(R0) - pad).cast("long"),
                         F.lit(0).cast("long"))
    need_hi = F.least(F.ceil(pr(R1) + pad).cast("long"),
                      F.col("h").cast("long") - 1)

    # conservative dest-tile range overlapping this input tile:
    #   R(ys) = (((ys - ty) / sy - y0 - dy_off) / dcell) - 0.5, at the
    # tile's two world edges, +-2 margin
    ty0c, thc = F.col("ty0").cast("double"), F.col("th").cast("double")

    def R_of(src_row):
        ys = y0 + (src_row + 0.5) * cs
        yd = (ys - F.lit(ty)) / F.lit(sy)
        return (yd - dy0_expr) / F.lit(dcell) - 0.5

    o_first = F.greatest(
        F.lit(0).cast("long"),
        F.floor((R_of(ty0c - 2.0)) / tr).cast("long") - 1)
    o_last = F.least(
        F.lit(int(n_out_tiles - 1)).cast("long"),
        F.ceil((R_of(ty0c + thc + 2.0)) / tr).cast("long") + 1)

    routed = (
        tiles.select(
            "image_id", "ty0", "th", "w", "h", "cellsize", "x0", "y0",
            "crs", "px",
            F.explode(F.sequence(o_first, o_last)).alias("__o"),
        )
        .withColumn("__lo", F.greatest(need_lo, F.col("ty0").cast("long")))
        .withColumn("__hi", F.least(
            need_hi, F.col("ty0").cast("long") + F.col("th").cast("long") - 1))
        .filter(F.col("__hi") >= F.col("__lo"))
        .select(
            "image_id",
            F.col("__o").cast("int").alias("out_ty"),
            F.col("__lo").cast("int").alias("send_lo"),
            "w", "h", "cellsize", "x0", "y0", "crs",
            F.expr(
                "slice(px, cast((__lo - ty0) * w + 1 as int), "
                "cast((__hi - __lo + 1) * w as int))"
            ).alias("rows"),
        )
    )

    # seed rows: one empty-payload row per (image, output tile), derived
    # from each image's ty0==0 tile — guarantees fully-out-of-extent
    # destination tiles still materialize (as all-NODATA) even when no
    # input band routes to them
    seed = (
        tiles.filter(F.col("ty0") == 0)
        .select(
            "image_id", "w", "h", "cellsize", "x0", "y0", "crs",
            F.explode(F.sequence(
                F.lit(0), F.lit(int(n_out_tiles - 1)))).alias("__o"),
        )
        .select(
            "image_id", F.col("__o").cast("int").alias("out_ty"),
            F.lit(-1).cast("int").alias("send_lo"),
            "w", "h", "cellsize", "x0", "y0", "crs",
            F.expr("cast(array() as array<float>)").alias("rows"),
        )
    )
    routed = routed.unionByName(seed)

    ow = int(out_w)
    nd = float(nodata)
    nd32 = np.float32(nd)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        in_h, in_w = int(first.h), int(first.w)
        cs_, sx0, sy0 = float(first.cellsize), float(first.x0), float(first.y0)
        o_ty = int(first.out_ty)
        r0, r1 = o_ty * tr, min((o_ty + 1) * tr, out_h) - 1

        d0y = dy_off if absolute_origin else sy0 + dy_off
        d0x = dx_off if absolute_origin else sx0 + dx_off
        prs = _pos(np.arange(r0, r1 + 1, dtype=np.float64),
                   d0y, dcell, sy, ty, sy0, cs_)
        pcs = _pos(np.arange(ow, dtype=np.float64),
                   d0x, dcell, sx, tx, sx0, cs_)

        live = pdf[pdf["send_lo"] >= 0].sort_values("send_lo", kind="mergesort")
        if len(live):
            band = np.concatenate(
                [np.asarray(v, dtype=np.float32) for v in live["rows"]]
            ).reshape(-1, in_w)
            base0 = int(live["send_lo"].iloc[0])
            out = _interp_band(band, base0, band.shape[0], in_h, in_w,
                               prs, pcs, bilinear, nd, nd32)
        else:
            r_ok = (prs >= 0.0) & (prs <= float(in_h - 1))
            c_ok = (pcs >= 0.0) & (pcs <= float(in_w - 1))
            if r_ok.any() and c_ok.any():
                raise AssertionError(
                    f"warp routing delivered no band for in-extent tile "
                    f"{first.image_id}/{o_ty}")
            out = np.full((r1 - r0 + 1, ow), nd32, dtype=np.float32)
        return pd.DataFrame({
            "image_id": [first.image_id],
            "tile_y": [o_ty],
            "ty0": [r0],
            "th": [r1 - r0 + 1],
            "w": [ow],
            "h": [int(out_h)],
            "cellsize": [float(dcell)],
            "x0": [d0x],
            "y0": [d0y],
            "crs": [dest_crs if dest_crs is not None else first.crs],
            "px": [out.ravel()],
        })

    return routed.groupBy("image_id", "out_ty").applyInPandas(
        assemble, schema=OUT_SCHEMA)


def _interp_band(band: np.ndarray, base0: int, n_band: int, in_h: int,
                 in_w: int, prs: np.ndarray, pcs: np.ndarray,
                 bilinear: bool, nd: float, nd32: np.float32) -> np.ndarray:
    """Interpolate dest rows x cols given source positions — shared by the
    tiled operator (band = routed slice) and the whole-grid twin
    (band = full grid, base0 = 0).

    Validity: bilinear needs the CENTER SPAN [0, n-1] (the 4-corner
    stencil must exist); nearest needs only the source EXTENT — its
    nearest index floor(p + 0.5) in [0, n-1], i.e. p in [-0.5, n-0.5).
    The distinction matters for mosaics: center-span validity on nearest
    left 1-ulp cracks along seams of abutting tiles (a dest center on the
    shared edge rounded a hair outside BOTH neighbors' center spans)."""
    if bilinear:
        r_ok = (prs >= 0.0) & (prs <= float(in_h - 1))
        c_ok = (pcs >= 0.0) & (pcs <= float(in_w - 1))
    else:
        ri = np.floor(prs + 0.5)
        ci = np.floor(pcs + 0.5)
        r_ok = (ri >= 0) & (ri <= in_h - 1)
        c_ok = (ci >= 0) & (ci <= in_w - 1)
    if r_ok.any():
        # routing-coverage invariant: every VALID dest row's stencil must
        # lie inside the routed band (the +-pad margin guarantees it; a
        # clip here would silently read the wrong row on a routing bug)
        if bilinear:
            vb = np.floor(prs[r_ok]).astype(np.int64)
            lo, hi = int(vb.min()), min(int(vb.max()) + 1, in_h - 1)
        else:
            vn = np.floor(prs[r_ok] + 0.5).astype(np.int64)
            lo, hi = int(vn.min()), int(vn.max())
        if lo < base0 or hi > base0 + n_band - 1:
            raise AssertionError(
                f"warp routing under-covered rows [{lo},{hi}] vs band "
                f"[{base0},{base0 + n_band - 1}]")
    if bilinear:
        rbase = np.floor(prs).astype(np.int64)
        cbase = np.floor(pcs).astype(np.int64)
        rfrac = prs - rbase
        cfrac = pcs - cbase
        # clamp indices for the gather only; validity handled via r_ok/c_ok
        rb = np.clip(rbase, 0, in_h - 1)
        cb = np.clip(cbase, 0, in_w - 1)
        rb1 = np.minimum(rb + 1, in_h - 1)
        cb1 = np.minimum(cb + 1, in_w - 1)
        g = lambda rr, cc: band[np.clip(rr - base0, 0, n_band - 1)][:, cc]  # noqa: E731
        v00 = g(rb, cb).astype(np.float64)
        v01 = g(rb, cb1).astype(np.float64)
        v10 = g(rb1, cb).astype(np.float64)
        v11 = g(rb1, cb1).astype(np.float64)
        fr = rfrac[:, None]
        fc = cfrac[None, :]
        out = ((v00 * (1.0 - fc) + v01 * fc) * (1.0 - fr)
               + (v10 * (1.0 - fc) + v11 * fc) * fr).astype(np.float32)
        poison = (
            ((v00 == nd) & ((1.0 - fr) * (1.0 - fc) > 0))
            | ((v01 == nd) & ((1.0 - fr) * fc > 0))
            | ((v10 == nd) & (fr * (1.0 - fc) > 0))
            | ((v11 == nd) & (fr * fc > 0))
        )
        out[poison] = nd32
    else:
        rsrc = np.floor(prs + 0.5).astype(np.int64)
        csrc = np.floor(pcs + 0.5).astype(np.int64)
        rs = np.clip(rsrc, 0, in_h - 1)
        csq = np.clip(csrc, 0, in_w - 1)
        out = band[np.clip(rs - base0, 0, n_band - 1)][:, csq].copy()
    out[~r_ok, :] = nd32
    out[:, ~c_ok] = nd32
    return out


def warp_affine_grid(grid: np.ndarray, out_h: int, out_w: int, dcell: float,
                     x0: float = 0.0, y0: float = 0.0, cellsize: float = 1.0,
                     dx_off: float = 0.0, dy_off: float = 0.0,
                     affine: tuple[float, float, float, float] = (1.0, 0.0, 1.0, 0.0),
                     method: str = "bilinear",
                     nodata: float = NODATA,
                     absolute_origin: bool = False) -> np.ndarray:
    """Whole-grid NumPy oracle — identical math to the tiled operator
    (tests assert bit-for-bit equality across tilings)."""
    sx, tx, sy, ty = (float(v) for v in affine)
    in_h, in_w = grid.shape
    d0y = dy_off if absolute_origin else y0 + dy_off
    d0x = dx_off if absolute_origin else x0 + dx_off
    prs = _pos(np.arange(out_h, dtype=np.float64), d0y, dcell,
               sy, ty, y0, cellsize)
    pcs = _pos(np.arange(out_w, dtype=np.float64), d0x, dcell,
               sx, tx, x0, cellsize)
    return _interp_band(grid.astype(np.float32), 0, in_h, in_h, in_w,
                        prs, pcs, method == "bilinear", float(nodata),
                        np.float32(nodata))
