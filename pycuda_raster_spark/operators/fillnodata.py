"""Nearest-valid fill (gdal_fillnodata-style hole filling, nearest
variant) — every cell that fails a validity predicate takes the VALUE of
the nearest valid cell of the same image, with the fully deterministic
tiebreak ``min (dist2, src_r, src_c)``; valid cells keep their own value
(their nearest valid cell is themselves at distance 0, so the semantics
are uniform).  gdal_fillnodata's default mode interpolates (IDW over a
search ring + smoothing); the nearest-value variant here is its exact,
order-free cousin — every output is a bit-copy of some input cell, so
the whole operator is value-exact cross-engine with zero float
arithmetic (the oracle brute-forces ``argmin`` over valid cells with the
same composite key).

Distribution: identical posture to ``operators/proximity.py`` (separable
Felzenszwalb-Huttenlocher EDT, bands = full-width row slabs) with value
and source tracking threaded through both passes:

1. **Pass 1** (band-local): per column, the first/last VALID global row
   *and the pixel values at those rows* — one slim row per
   (band, column).
2. **Cross-band** (pure JVM window): per (image, column) ordered by
   band, ``max(struct(lt, lval))`` over preceding bands / ``min(struct
   (ft, fval))`` over following bands give each band the nearest
   external valid row above/below *with its value* (struct comparison is
   lexicographic and band row-ranges are disjoint, so the value rides
   along exactly).  Pixels never shuffle.
3. **Pass 2** (band-local): column scans keep, per cell, the nearest
   in-column valid row (tie -> smaller row, consistent with the global
   key) plus its value; the adaptive offset sweep then minimizes the
   composite ``(g^2 + d^2, src_r, src_c)`` with fully vectorized
   lexicographic compares.  The sweep terminates once ``d^2`` exceeds
   the band's current max distance — at that point no candidate can win
   OR tie.

Output per tile: ``filled`` (array<float> — px where valid, nearest
valid value where not, NODATA when the image has no valid cell),
``dist2`` / ``src_r`` / ``src_c`` (array<long>, -1 sentinels for the
no-valid-cell case).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .proximity import NODATA, _INF

FILL_SCHEMA = (
    "image_id string, tile_y int, ty0 int, th int, w int, h int, "
    "cellsize double, x0 double, y0 double, crs string, "
    "filled array<float>, dist2 array<long>, "
    "src_r array<long>, src_c array<long>"
)
_COL_SCHEMA = (
    "image_id string, tile_y int, ty0 int, c int, "
    "ft long, fval double, lt long, lval double"
)
_BIG = np.int64(1) << 30  # larger than any real row index; safe to square
_NOSRC = np.int64(1) << 40  # source sentinel: loses every tiebreak


def _column_fill(
    valid: np.ndarray, px: np.ndarray, ty0: int,
    above: np.ndarray, aval: np.ndarray,
    below: np.ndarray, bval: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per cell: nearest valid row IN ITS COLUMN (in-band two-scan +
    external above/below rows), tie -> smaller row.  Returns (g, src_r,
    val): column distance (``>= _BIG`` = none), global source row, and
    the source value."""
    th, w = valid.shape
    gu = np.empty((th, w), dtype=np.int64)
    ur = np.empty((th, w), dtype=np.int64)
    uv = np.empty((th, w), dtype=np.float32)
    up_r = np.where(above >= 0, above, -_BIG)
    up_v = aval.astype(np.float32)
    for lr in range(th):
        r = ty0 + lr
        up_r = np.where(valid[lr], r, up_r)
        up_v = np.where(valid[lr], px[lr], up_v)
        gu[lr] = r - up_r
        ur[lr] = up_r
        uv[lr] = up_v
    gd = np.empty((th, w), dtype=np.int64)
    dr = np.empty((th, w), dtype=np.int64)
    dv = np.empty((th, w), dtype=np.float32)
    dn_r = np.where(below >= 0, below, np.int64(2) * _BIG)
    dn_v = bval.astype(np.float32)
    for lr in range(th - 1, -1, -1):
        r = ty0 + lr
        dn_r = np.where(valid[lr], r, dn_r)
        dn_v = np.where(valid[lr], px[lr], dn_v)
        gd[lr] = dn_r - r
        dr[lr] = dn_r
        dv[lr] = dn_v
    # tie -> up (smaller source row), matching the global (d2, r, c) key
    take_up = gu <= gd
    g = np.minimum(np.where(take_up, gu, gd), _BIG)
    src_r = np.where(take_up, ur, dr)
    val = np.where(take_up, uv, dv).astype(np.float32)
    return g, src_r, val


def _row_fill(
    g: np.ndarray, src_r: np.ndarray, val: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Composite-minimizing row transform: per cell, min over source
    columns c' of the key ``(g[r,c']^2 + (c-c')^2, src_r[r,c'], c')``,
    carrying the winner's value.  Adaptive offset sweep, exact — the
    loop runs while ``d^2 <= max(dt2)`` so ties (key-compare wins at
    equal distance) are still reachable when the sweep stops."""
    th, w = g.shape
    none = g >= _BIG
    g2 = np.where(none, _INF, g.astype(np.int64) ** 2)
    cols = np.broadcast_to(np.arange(w, dtype=np.int64), (th, w))
    dt2 = g2.copy()
    out_r = np.where(none, _NOSRC, src_r)
    out_c = np.where(none, _NOSRC, cols)
    out_v = np.where(none, np.float32(NODATA), val).astype(np.float32)
    if not (g2 < _INF).any():
        return dt2, out_r, out_c, out_v
    cand_r0 = np.where(none, _NOSRC, src_r)

    def _apply(sl_t: slice, sl_s: slice, d: int) -> None:
        dd = np.int64(d) * d
        cand2 = g2[:, sl_s] + dd
        cr = cand_r0[:, sl_s]
        cc = cols[:, sl_s]
        cv = val[:, sl_s]
        t2, tr, tc = dt2[:, sl_t], out_r[:, sl_t], out_c[:, sl_t]
        win = (cand2 < t2) | (
            (cand2 == t2) & ((cr < tr) | ((cr == tr) & (cc < tc))))
        dt2[:, sl_t] = np.where(win, cand2, t2)
        out_r[:, sl_t] = np.where(win, cr, tr)
        out_c[:, sl_t] = np.where(win, cc, tc)
        out_v[:, sl_t] = np.where(win, cv, out_v[:, sl_t])

    d = 1
    while d < w and np.int64(d) * d <= dt2.max():
        _apply(slice(d, None), slice(None, -d), d)   # source left of cell
        _apply(slice(None, -d), slice(d, None), d)   # source right of cell
        d += 1
    return dt2, out_r, out_c, out_v


def fill_nearest_grid(
    px: np.ndarray,
    valid: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    nodata: float = NODATA,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Whole-grid NumPy twin.  Returns (filled, dist2, src_r, src_c);
    ``valid`` defaults to ``px != nodata`` (classic hole filling); pass
    a predicate to treat only matching cells as sources (everything else
    is refilled from them).  Tests assert the tiled operator equals this
    exactly across tilings."""
    p = np.asarray(px, dtype=np.float32)
    v = (p != np.float32(nodata)) if valid is None \
        else (valid(p) & (p != np.float32(nodata)))
    h, w = p.shape
    none = np.full(w, -1, dtype=np.int64)
    nov = np.full(w, NODATA, dtype=np.float32)
    g, src_r, val = _column_fill(v, p, 0, none, nov, none, nov)
    dt2, out_r, out_c, out_v = _row_fill(g, src_r, val)
    hole = dt2 >= _INF
    return (
        np.where(hole, np.float32(nodata), out_v).astype(np.float32),
        np.where(hole, np.int64(-1), dt2),
        np.where(hole, np.int64(-1), out_r),
        np.where(hole, np.int64(-1), out_c),
    )


def fill_nearest_tiles(
    tiles: DataFrame,
    valid: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    nodata: float = NODATA,
    pinned: bool = True,
) -> DataFrame:
    """Tiled nearest-valid fill over ``decode_tiles`` output — see the
    module docstring for the two-pass plan.  ``valid`` as in
    :func:`fill_nearest_grid`."""
    keep = ["image_id", "tile_y", "ty0", "th", "w", "h", "cellsize",
            "x0", "y0", "crs", "px"]
    t = tiles.select(*keep)
    if pinned:
        t = t.localCheckpoint(eager=True)
    nd32 = np.float32(nodata)

    def _valid(px: np.ndarray) -> np.ndarray:
        base = px != nd32
        return base if valid is None else (valid(px) & base)

    # ---- pass 1: per (band, column) first/last valid row + values ------
    def p1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "tile_y", "ty0", "c",
                                    "ft", "fval", "lt", "lval")}
            for i in range(len(pdf)):
                th, w = int(pdf["th"].iat[i]), int(pdf["w"].iat[i])
                ty0 = int(pdf["ty0"].iat[i])
                px = np.asarray(
                    pdf["px"].iat[i], dtype=np.float32).reshape(th, w)
                v = _valid(px)
                any_v = v.any(axis=0)
                ft_l = np.argmax(v, axis=0)
                lt_l = th - 1 - np.argmax(v[::-1], axis=0)
                ci = np.arange(w)
                fval = px[ft_l, ci].astype(np.float64)
                lval = px[lt_l, ci].astype(np.float64)
                rows["image_id"].extend([pdf["image_id"].iat[i]] * w)
                rows["tile_y"].extend([int(pdf["tile_y"].iat[i])] * w)
                rows["ty0"].extend([ty0] * w)
                rows["c"].extend(range(w))
                rows["ft"].extend(
                    np.where(any_v, ty0 + ft_l, -1).tolist())
                rows["fval"].extend(fval.tolist())
                rows["lt"].extend(
                    np.where(any_v, ty0 + lt_l, -1).tolist())
                rows["lval"].extend(lval.tolist())
            out = pd.DataFrame(rows)
            out["ft"] = out["ft"].astype("Int64")
            out["lt"] = out["lt"].astype("Int64")
            out.loc[out["ft"] < 0, "ft"] = pd.NA
            out.loc[out["lt"] < 0, "lt"] = pd.NA
            yield out

    cols = t.mapInPandas(p1, schema=_COL_SCHEMA)

    # ---- cross-band: nearest external valid row above/below + value ----
    wup = (Window.partitionBy("image_id", "c").orderBy("ty0")
           .rowsBetween(Window.unboundedPreceding, -1))
    wdn = (Window.partitionBy("image_id", "c").orderBy("ty0")
           .rowsBetween(1, Window.unboundedFollowing))
    lstruct = F.when(F.col("lt").isNotNull(), F.struct("lt", "lval"))
    fstruct = F.when(F.col("ft").isNotNull(), F.struct("ft", "fval"))
    ext = cols.select(
        "image_id", "tile_y", "c",
        F.max(lstruct).over(wup).alias("__a"),
        F.min(fstruct).over(wdn).alias("__b"),
    ).select(
        "image_id", "tile_y", "c",
        F.col("__a.lt").alias("above"), F.col("__a.lval").alias("aval"),
        F.col("__b.ft").alias("below"), F.col("__b.fval").alias("bval"),
    )
    per_band = (ext.groupBy("image_id", "tile_y")
                .agg(F.collect_list(
                    F.struct("c", "above", "aval", "below", "bval"))
                     .alias("__ext")))

    seeded = t.join(F.broadcast(per_band), ["image_id", "tile_y"], "left")

    # ---- pass 2: column fill + composite-min row transform -------------
    def p2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "image_id": pdf["image_id"], "tile_y": pdf["tile_y"],
                "ty0": pdf["ty0"], "th": pdf["th"], "w": pdf["w"],
                "h": pdf["h"], "cellsize": pdf["cellsize"],
                "x0": pdf["x0"], "y0": pdf["y0"], "crs": pdf["crs"],
                "filled": [None] * len(pdf), "dist2": [None] * len(pdf),
                "src_r": [None] * len(pdf), "src_c": [None] * len(pdf),
            }
            for i in range(len(pdf)):
                th, w = int(pdf["th"].iat[i]), int(pdf["w"].iat[i])
                ty0 = int(pdf["ty0"].iat[i])
                px = np.asarray(
                    pdf["px"].iat[i], dtype=np.float32).reshape(th, w)
                v = _valid(px)
                above = np.full(w, -1, dtype=np.int64)
                below = np.full(w, -1, dtype=np.int64)
                aval = np.full(w, NODATA, dtype=np.float32)
                bval = np.full(w, NODATA, dtype=np.float32)
                lst = pdf["__ext"].iat[i]
                if lst is not None and not (
                        isinstance(lst, float) and pd.isna(lst)):
                    for s in lst:
                        c = int(s["c"])
                        if s["above"] is not None and not pd.isna(s["above"]):
                            above[c] = int(s["above"])
                            aval[c] = np.float32(s["aval"])
                        if s["below"] is not None and not pd.isna(s["below"]):
                            below[c] = int(s["below"])
                            bval[c] = np.float32(s["bval"])
                g, src_r, val = _column_fill(
                    v, px, ty0, above, aval, below, bval)
                dt2, out_r, out_c, out_v = _row_fill(g, src_r, val)
                hole = dt2 >= _INF
                out["filled"][i] = np.where(
                    hole, np.float32(nodata), out_v).astype(np.float32).ravel()
                out["dist2"][i] = np.where(hole, np.int64(-1), dt2).ravel()
                out["src_r"][i] = np.where(hole, np.int64(-1), out_r).ravel()
                out["src_c"][i] = np.where(hole, np.int64(-1), out_c).ravel()
            yield pd.DataFrame(out)

    return seeded.mapInPandas(p2, schema=FILL_SCHEMA)
