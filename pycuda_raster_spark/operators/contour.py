"""Contour lines (gdal_contour parity; VERDICT r4 next #7): iso-elevation
line segments via marching squares, per level, in world coordinates.

Semantics (shared verbatim by the DuckDB oracle and the NumPy twin):

* a 2x2 cell window (corners P00=(r,c), P01=(r,c+1), P11=(r+1,c+1),
  P10=(r+1,c), at CELL CENTERS) is skipped if any corner is NODATA;
* corner state: ``v > L`` (strictly above; equality counts as below —
  no epsilon, deterministic);
* edges in FIXED order a=(P00,P01), b=(P01,P11), c=(P11,P10),
  d=(P10,P00); an edge crosses iff its corner states differ; the
  crossing point interpolates ``t = (L - va) / (vb - va)`` from the
  edge's FIRST corner (one subtraction, one division — correctly
  rounded, identical doubles in every engine);
* crossings collected in edge order -> segments (e0,e1) and, for the
  4-crossing saddle, (e2,e3) — a fixed pairing (no center-average
  disambiguation; documented determinism over GDAL's saddle heuristic);
* world coords: a horizontal edge point is
  ``x = x0 + ((c + 0.5) + t) * cs``, ``y = y0 + (r + 0.5) * cs``
  (vertical mirrored) — fixed op order.

Distribution: windows are assigned to the band containing their TOP-LEFT
row; the one extra row each band needs is exactly the decode-time halo
(``halo_bot``), so contouring is a single Python stage over the tiles —
no shuffle at all until the caller aggregates. ``contour_polylines``
optionally stitches segments into line ids with the CC machinery
(segments sharing an endpoint — exact double equality, safe because the
shared edge's crossing is computed from identical operands in both
adjacent windows).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODATA = -9999.0

SEG_SCHEMA = (
    "image_id string, level double, r int, c int, seg int, "
    "x1 double, y1 double, x2 double, y2 double"
)


def _segments_for_block(vals: np.ndarray, r0: int, n_win_rows: int,
                        level: float, x0: float, y0: float, cs: float,
                        nodata: float) -> list[tuple]:
    """Marching-squares segments for windows with top-left rows
    ``r0 .. r0 + n_win_rows - 1`` (``vals`` holds those rows plus one).
    Returns (r, c, seg, x1, y1, x2, y2) tuples with GLOBAL rows."""
    v = vals.astype(np.float64)
    h, w = v.shape
    out = []
    p00 = v[:-1, :-1]
    p01 = v[:-1, 1:]
    p11 = v[1:, 1:]
    p10 = v[1:, :-1]
    nd = float(nodata)
    ok = (p00 != nd) & (p01 != nd) & (p11 != nd) & (p10 != nd)
    b0, b1, b2, b3 = p00 > level, p01 > level, p11 > level, p10 > level
    ea, eb = b0 ^ b1, b1 ^ b2
    ec, ed = b2 ^ b3, b3 ^ b0
    any_cross = ok & (ea | eb | ec | ed)
    rows, cols = np.nonzero(any_cross)
    for rr, cc in zip(rows, cols):
        if rr >= n_win_rows:
            continue
        pts = []
        L = level
        if ea[rr, cc]:
            t = (L - p00[rr, cc]) / (p01[rr, cc] - p00[rr, cc])
            pts.append((x0 + ((cc + 0.5) + t) * cs, y0 + (r0 + rr + 0.5) * cs))
        if eb[rr, cc]:
            t = (L - p01[rr, cc]) / (p11[rr, cc] - p01[rr, cc])
            pts.append((x0 + (cc + 1 + 0.5) * cs, y0 + ((r0 + rr + 0.5) + t) * cs))
        if ec[rr, cc]:
            t = (L - p11[rr, cc]) / (p10[rr, cc] - p11[rr, cc])
            pts.append((x0 + ((cc + 1 + 0.5) - t) * cs, y0 + (r0 + rr + 1 + 0.5) * cs))
        if ed[rr, cc]:
            t = (L - p10[rr, cc]) / (p00[rr, cc] - p10[rr, cc])
            pts.append((x0 + (cc + 0.5) * cs, y0 + ((r0 + rr + 1 + 0.5) - t) * cs))
        for s in range(len(pts) // 2):
            (xa, ya), (xb, yb) = pts[2 * s], pts[2 * s + 1]
            out.append((r0 + rr, cc, s, xa, ya, xb, yb))
    return out


def contour_tiles(
    tiles: DataFrame,
    levels: Sequence[float],
    nodata: float = NODATA,
) -> DataFrame:
    """Marching-squares contour segments for every image in ``tiles``
    (the decode_tiles shape WITH halo columns): one row per (window,
    level, segment), world-coordinate endpoints. Windows belong to the
    band holding their top-left row; ``halo_bot`` supplies the one extra
    row, so the whole extraction is a single shuffle-free Python stage."""
    if not levels:
        raise ValueError("levels must be non-empty")
    lv = [float(x) for x in levels]
    nd = float(nodata)

    cols = ["image_id", "ty0", "th", "w", "h", "cellsize", "x0", "y0",
            "px", "halo_bot"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "level", "r", "c", "seg",
                                    "x1", "y1", "x2", "y2")}
            for i in range(len(pdf)):
                th, w = int(pdf["th"].iat[i]), int(pdf["w"].iat[i])
                ty0, h = int(pdf["ty0"].iat[i]), int(pdf["h"].iat[i])
                cs = float(pdf["cellsize"].iat[i])
                x0, y0 = float(pdf["x0"].iat[i]), float(pdf["y0"].iat[i])
                grid = np.asarray(
                    pdf["px"].iat[i], dtype=np.float32).reshape(th, w)
                hb = pdf["halo_bot"].iat[i]
                if hb is not None and len(hb):
                    grid = np.vstack(
                        [grid, np.asarray(hb, np.float32).reshape(1, w)])
                n_win = grid.shape[0] - 1
                if ty0 + n_win > h - 1:
                    n_win = (h - 1) - ty0
                if n_win <= 0:
                    continue
                iid = pdf["image_id"].iat[i]
                for L in lv:
                    for (r, c, s, xa, ya, xb, yb) in _segments_for_block(
                            grid, ty0, n_win, L, x0, y0, cs, nd):
                        rows["image_id"].append(iid)
                        rows["level"].append(L)
                        rows["r"].append(r)
                        rows["c"].append(c)
                        rows["seg"].append(s)
                        rows["x1"].append(xa)
                        rows["y1"].append(ya)
                        rows["x2"].append(xb)
                        rows["y2"].append(yb)
            yield pd.DataFrame(rows)

    return tiles.select(*cols).mapInPandas(gen, schema=SEG_SCHEMA)


def contour_grid(grid: np.ndarray, levels: Sequence[float],
                 x0: float = 0.0, y0: float = 0.0, cellsize: float = 1.0,
                 nodata: float = NODATA) -> list[tuple]:
    """Whole-grid NumPy twin: (level, r, c, seg, x1, y1, x2, y2) tuples —
    identical math to the tiled operator."""
    out = []
    g = np.asarray(grid, dtype=np.float32)
    for L in (float(x) for x in levels):
        for (r, c, s, xa, ya, xb, yb) in _segments_for_block(
                g, 0, g.shape[0] - 1, L, float(x0), float(y0),
                float(cellsize), float(nodata)):
            out.append((L, r, c, s, xa, ya, xb, yb))
    return out


def contour_polylines(segments: DataFrame) -> DataFrame:
    """Stitch contour segments into polyline ids: segments sharing an
    endpoint (exact double equality — both adjacent windows compute the
    shared crossing from identical operands) join into one line via the
    pointer-jumping CC machinery. Returns the segments plus a ``line_id``
    column (min segment key of the connected line)."""
    from .dedup import dedup_clusters

    seg_key = F.format_string(
        "%s|%.6f|%012d", F.col("image_id"), F.col("level"),
        (F.col("r").cast("long") * 1000000 + F.col("c") * 4 + F.col("seg")))
    s = segments.withColumn("__sid", seg_key)
    pts = s.select(
        "image_id", "level", "__sid",
        F.explode(F.array(
            F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
            F.struct(F.col("x2").alias("x"), F.col("y2").alias("y")),
        )).alias("p"))
    a = pts.select("image_id", "level", "p",
                   F.col("__sid").alias("sid_a"))
    b = pts.select(F.col("image_id").alias("i2"),
                   F.col("level").alias("l2"),
                   F.col("p").alias("p2"),
                   F.col("__sid").alias("sid_b"))
    edges = (a.join(b, (F.col("image_id") == F.col("i2"))
                    & (F.col("level") == F.col("l2"))
                    & (F.col("p") == F.col("p2"))
                    & (F.col("sid_a") < F.col("sid_b")))
             .select(F.col("sid_a").alias("id_a"),
                     F.col("sid_b").alias("id_b"))
             .distinct())
    nodes = s.select(F.col("__sid").alias("doc_id")).distinct()
    lines = dedup_clusters(edges, nodes, id_col="doc_id")
    return (s.join(lines.select(F.col("doc_id").alias("__sid"),
                                F.col("cluster_id").alias("line_id")),
                   "__sid")
            .drop("__sid"))
