"""Raster -> vector extraction (gdal_polygonize parity) — connected
same-value regions of a classified raster as labeled zones, closing the
raster->vector loop that ``zonal.rasterize_zones`` only half-covers
(VERDICT r4 missing #3).

Region semantics (shared by the DuckDB recursive-CTE oracle and the
NumPy twin): cells with value != NODATA; 4-connected equal-valued cells
form one region; the region label is the MIN flat cell index
(``r * w + c``) of its members — deterministic and partition-invariant
(the q_dedup_clusters min-label convention).

Distribution (100 TB posture) — the same two-level shape as flow
accumulation: almost all work is band-local, the global step sees only
band-EDGE cells:

1. **Pass 1 (one Python stage)**: per band, vectorized label-equivalence
   CC (the classic GPU algorithm: neighbor-min + pointer jumping, O(log)
   vector steps — no scipy); emits per-local-region stats rows
   (count/bbox, keyed by the region's min GLOBAL flat index) and slim
   seam rows for the band's first/last pixel rows.
2. **Seam resolution (slim, JVM)**: adjacent bands' facing rows join on
   (image, column, equal value) -> a label-graph edge list; global
   min-label via the pointer-jumping CC machinery (``dedup_clusters`` on
   zero-padded keys, so lexicographic min == numeric min).
3. **Finalize**: one groupBy merges per-local-region stats under the
   resolved global labels. No pixels ever shuffle.

Ring extraction (``region_rings``) is a per-region outline trace
(rectilinear outer boundary, cell-edge exact) — grouped per region and
bounded by ``max_ring_cells`` (a region larger than the bound fails
fast rather than building an unsplittable row; gdal_polygonize has the
same in-memory reality per polygon). Holes are not emitted (outer ring
only — documented limitation); the pytest round-trip
polygonize -> rasterize_zones == identity pins ring correctness on
hole-free regions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODATA = -9999.0

_P1_SCHEMA = (
    "image_id string, kind int, gkey long, val double, n long, "
    "r0 long, r1 long, c0 long, c1 long, r long, c long"
)

REGIONS_SCHEMA = (
    "image_id string, label long, val double, n_cells long, "
    "r0 int, r1 int, c0 int, c1 int"
)


def label_grid(vals: np.ndarray, nodata: float = NODATA) -> np.ndarray:
    """Vectorized 4-connected CC labeling of equal-valued cells: label =
    min flat index of the component; NODATA cells -> -1. The label-
    equivalence loop (neighbor-min then label <- label[label]) converges
    in O(log diameter) vector steps."""
    th, w = vals.shape
    valid = vals != np.float32(nodata)
    lab = np.arange(th * w, dtype=np.int64).reshape(th, w)
    lab[~valid] = -1

    def nbr_min(la):
        out = la.copy()
        same_h = valid[:, 1:] & valid[:, :-1] & (vals[:, 1:] == vals[:, :-1])
        out[:, 1:][same_h] = np.minimum(out[:, 1:], la[:, :-1])[same_h]
        out[:, :-1][same_h] = np.minimum(out[:, :-1], la[:, 1:])[same_h]
        same_v = valid[1:, :] & valid[:-1, :] & (vals[1:, :] == vals[:-1, :])
        out[1:, :][same_v] = np.minimum(out[1:, :], la[:-1, :])[same_v]
        out[:-1, :][same_v] = np.minimum(out[:-1, :], la[1:, :])[same_v]
        return out

    for _ in range(2 * int(np.ceil(np.log2(max(th * w, 2)))) + 4):
        stepped = nbr_min(lab)
        flat = stepped.ravel().copy()
        ok = flat >= 0
        # pointer jumping: chase the label's label (labels are flat
        # indices into the same grid)
        flat[ok] = flat.reshape(-1)[flat[ok]]
        flat[ok] = np.where(flat[ok] >= 0, flat[ok], stepped.ravel()[ok])
        nxt = flat.reshape(th, w)
        if np.array_equal(nxt, lab):
            return lab
        lab = nxt
    # fallback: iterate neighbor-min to fixpoint (guaranteed but slower)
    while True:
        stepped = nbr_min(lab)
        if np.array_equal(stepped, lab):
            return lab
        lab = stepped


def polygonize_tiles(
    tiles: DataFrame,
    value_col: str = "px",
    nodata: float = NODATA,
    pinned: bool = True,
) -> DataFrame:
    """Connected equal-valued regions of every image in ``tiles`` ->
    ``(image_id, label, val, n_cells, r0, r1, c0, c1)`` with ``label`` =
    min global flat index of the region (gdal_polygonize's region
    inventory; feed ``region_rings`` for ring geometry)."""
    from .dedup import dedup_clusters

    keep = ["image_id", "tile_y", "ty0", "th", "w", "h", value_col]
    t = tiles.select(*keep).withColumnRenamed(value_col, "__v")
    if pinned:
        t = t.localCheckpoint(eager=True)
    nd = float(nodata)

    def p1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "kind", "gkey", "val", "n",
                                    "r0", "r1", "c0", "c1", "r", "c")}

            def emit(iid, kind, gkey=0, val=0.0, n=0, r0=0, r1=0, c0=0,
                     c1=0, r=0, c=0):
                rows["image_id"].append(iid)
                rows["kind"].append(kind)
                rows["gkey"].append(int(gkey))
                rows["val"].append(float(val))
                rows["n"].append(int(n))
                rows["r0"].append(int(r0))
                rows["r1"].append(int(r1))
                rows["c0"].append(int(c0))
                rows["c1"].append(int(c1))
                rows["r"].append(int(r))
                rows["c"].append(int(c))

            for i in range(len(pdf)):
                th, w = int(pdf["th"].iat[i]), int(pdf["w"].iat[i])
                ty0 = int(pdf["ty0"].iat[i])
                iid = pdf["image_id"].iat[i]
                vals = np.asarray(
                    pdf["__v"].iat[i], dtype=np.float32).reshape(th, w)
                lab = label_grid(vals, nd)
                flat = lab.ravel()
                ok = flat >= 0
                # per-local-region stats keyed by GLOBAL min flat index
                # (local root flat -> global: row + ty0)
                roots, inv = np.unique(flat[ok], return_inverse=True)
                gkeys = (roots // w + ty0) * w + roots % w
                counts = np.bincount(inv)
                rr = np.repeat(np.arange(th), w)[ok]
                cc = np.tile(np.arange(w), th)[ok]
                r_min = np.full(roots.size, th, dtype=np.int64)
                r_max = np.full(roots.size, -1, dtype=np.int64)
                c_min = np.full(roots.size, w, dtype=np.int64)
                c_max = np.full(roots.size, -1, dtype=np.int64)
                np.minimum.at(r_min, inv, rr)
                np.maximum.at(r_max, inv, rr)
                np.minimum.at(c_min, inv, cc)
                np.maximum.at(c_max, inv, cc)
                vflat = vals.ravel()
                for j in range(roots.size):
                    emit(iid, 0, gkeys[j], vflat[roots[j]], counts[j],
                         r_min[j] + ty0, r_max[j] + ty0, c_min[j], c_max[j])
                # seam rows: first/last pixel rows of the band (kind 2 =
                # top face, kind 1 = bottom face), carrying the local
                # region's global key
                for lr, kind in ((0, 2), (th - 1, 1)):
                    for col in range(w):
                        root = lab[lr, col]
                        if root < 0:
                            continue
                        g = (root // w + ty0) * w + root % w
                        emit(iid, kind, g, vals[lr, col], 0,
                             r=ty0 + lr, c=col)
            yield pd.DataFrame(rows)

    p1_out = t.mapInPandas(p1, schema=_P1_SCHEMA).localCheckpoint(eager=True)
    stats = p1_out.filter(F.col("kind") == 0)
    bot = (p1_out.filter(F.col("kind") == 1)
           .select("image_id", "gkey", "val", "r", "c"))
    top = (p1_out.filter(F.col("kind") == 2)
           .select(F.col("image_id").alias("image_id2"),
                   F.col("gkey").alias("gkey2"),
                   F.col("val").alias("val2"), F.col("r").alias("r2"),
                   F.col("c").alias("c2")))

    # seam edges: facing rows of adjacent bands, same column, equal value
    pad = lambda img, col: F.format_string("%s:%012d", img, col)  # noqa: E731
    edges = (bot.join(
        top, (F.col("image_id") == F.col("image_id2"))
        & (F.col("r2") == F.col("r") + 1) & (F.col("c2") == F.col("c"))
        & (F.col("val2") == F.col("val")))
        .select(pad(F.col("image_id"), F.col("gkey")).alias("id_a"),
                pad(F.col("image_id"), F.col("gkey2")).alias("id_b"))
        .distinct())

    nodes = stats.select(
        pad(F.col("image_id"), F.col("gkey")).alias("doc_id")).distinct()
    resolved = dedup_clusters(edges, nodes, id_col="doc_id")
    root_of = resolved.select(
        F.col("doc_id").alias("__id"),
        F.split(F.col("cluster_id"), ":").getItem(1).cast("long")
        .alias("label"))

    return (stats.withColumn("__id", pad(F.col("image_id"), F.col("gkey")))
            .join(root_of, "__id")
            .groupBy("image_id", "label")
            .agg(F.min("val").alias("val"),
                 F.sum("n").alias("n_cells"),
                 F.min("r0").cast("int").alias("r0"),
                 F.max("r1").cast("int").alias("r1"),
                 F.min("c0").cast("int").alias("c0"),
                 F.max("c1").cast("int").alias("c1")))


def _outline_ring(mask: np.ndarray, r_off: int) -> list[tuple[int, int]]:
    """Rectilinear outer-boundary ring of a hole-free region mask —
    cell-edge exact, counter-clockwise in (row, col) corner coords
    (global rows via ``r_off``). Segments: every cell edge bordering a
    non-member; stitched into the single outer cycle."""
    th, w = mask.shape
    seg = {}
    for r in range(th):
        for c in range(w):
            if not mask[r, c]:
                continue
            # corners: (r, c) is the cell's low corner
            if r == 0 or not mask[r - 1, c]:        # low edge, left->right
                seg[(r, c)] = (r, c + 1)
            if r == th - 1 or not mask[r + 1, c]:   # high edge, right->left
                seg[(r + 1, c + 1)] = (r + 1, c)
            if c == 0 or not mask[r, c - 1]:        # left edge, up->down
                seg[(r + 1, c)] = (r, c)
            if c == w - 1 or not mask[r, c + 1]:    # right edge, down->up
                seg[(r, c + 1)] = (r + 1, c + 1)
    start = min(seg)
    ring = [start]
    cur = seg[start]
    for _ in range(len(seg)):
        ring.append(cur)
        if cur == start:
            break
        cur = seg[cur]
    if ring[-1] != start:
        raise AssertionError("region outline did not close (holes?)")
    return [(r + r_off, c) for r, c in ring[:-1]]


def region_rings(
    tiles: DataFrame,
    regions: DataFrame,
    value_col: str = "px",
    nodata: float = NODATA,
    max_ring_cells: int = 65536,
) -> DataFrame:
    """World-coordinate outer rings for every region in ``regions``
    (the ``polygonize_tiles`` output): ``(image_id, label, val, ring)``
    with ``ring`` an array of (x, y) structs compatible with
    ``zonal.rasterize_zones`` zones. Regions larger than
    ``max_ring_cells`` fail fast (documented bound — a ring row must fit
    in one task)."""
    nd = float(nodata)
    keep = ["image_id", "tile_y", "ty0", "th", "w", "cellsize", "x0", "y0",
            value_col]
    t = tiles.select(*keep).withColumnRenamed(value_col, "__v")
    chk = F.assert_true(
        F.col("n_cells") <= F.lit(int(max_ring_cells)),
        F.lit("region_rings: region exceeds max_ring_cells"))
    reg = regions.withColumn("label", F.when(chk.isNull(), F.col("label")))

    # route only the bands overlapping each region's bbox
    j = t.join(
        F.broadcast(reg),
        (t["image_id"] == reg["image_id"])
        & (t["ty0"] <= reg["r1"]) & (t["ty0"] + t["th"] > reg["r0"])
    ).select(t["image_id"], "tile_y", "ty0", "th", "w", "cellsize",
             "x0", "y0", "__v", "label", "val",
             reg["r0"], reg["r1"], reg["c0"], reg["c1"])

    schema = ("image_id string, label long, val double, "
              "ring array<struct<x: double, y: double>>")

    def trace(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        r0, r1 = int(first.r0), int(first.r1)
        label, val = int(first.label), float(first.val)
        w = int(first.w)
        cs, x0, y0 = float(first.cellsize), float(first.x0), float(first.y0)
        pdf = pdf.sort_values("ty0")
        # assemble only the bbox rows
        rows = []
        for _, row in pdf.iterrows():
            ty0, th = int(row.ty0), int(row.th)
            g = np.asarray(row["__v"], dtype=np.float32).reshape(th, w)
            lo, hi = max(r0 - ty0, 0), min(r1 + 1 - ty0, th)
            rows.append((ty0 + lo, g[lo:hi]))
        rows.sort(key=lambda x: x[0])
        base = rows[0][0]
        block = np.vstack([g for _, g in rows])
        lab = label_grid(block, nd)
        flat = lab.ravel()
        # the region's min global index maps to a local root
        lr, lc = label // w - base, label % w
        mask = lab == lab[lr, lc]
        ring = _outline_ring(mask, base)
        pts = [{"x": x0 + c * cs, "y": y0 + r * cs} for r, c in ring]
        return pd.DataFrame({"image_id": [first.image_id],
                             "label": [label], "val": [val],
                             "ring": [pts]})

    return j.groupBy("image_id", "label").applyInPandas(trace, schema=schema)


# --------------------------------------------------------------- r.lake


LAKE_SCHEMA = (
    "image_id string, tile_y int, ty0 int, th int, w int, h int, "
    "cellsize double, x0 double, y0 double, crs string, "
    "lake array<float>"
)


def lake_grid(
    grid: np.ndarray,
    seed: tuple[int, int],
    level: float,
    nodata: float = NODATA,
) -> np.ndarray:
    """Whole-grid twin of ``lake_tiles``: BFS flood fill from ``seed``
    over 4-connected cells with value <= ``level``; output is the lake
    DEPTH (float32 of level - value) inside the lake, NODATA outside.
    A dry/invalid/out-of-grid seed yields an all-NODATA grid."""
    nd32 = np.float32(nodata)
    th, w = grid.shape
    out = np.full((th, w), nd32, dtype=np.float32)
    sr, sc = int(seed[0]), int(seed[1])
    lvl = float(level)
    mask = (grid != nd32) & (grid.astype(np.float64) <= lvl)
    if not (0 <= sr < th and 0 <= sc < w and mask[sr, sc]):
        return out
    seen = np.zeros((th, w), dtype=bool)
    seen[sr, sc] = True
    stack = [(sr, sc)]
    while stack:
        r, c = stack.pop()
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if (0 <= nr < th and 0 <= nc < w and mask[nr, nc]
                    and not seen[nr, nc]):
                seen[nr, nc] = True
                stack.append((nr, nc))
    out[seen] = (lvl - grid[seen].astype(np.float64)).astype(np.float32)
    return out


def lake_tiles(
    tiles: DataFrame,
    seed: tuple[int, int],
    level: float,
    value_col: str = "px",
    nodata: float = NODATA,
    pinned: bool = True,
    max_iterations: int = 25,
) -> DataFrame:
    """Flood fill / lake extent (GRASS r.lake parity): per image, the
    4-connected region of cells with value <= ``level`` containing the
    GLOBAL seed cell ``(seed_r, seed_c)``, emitted as a tiles-shaped
    DEPTH product (float32 of level - elevation inside the lake, NODATA
    outside — images whose seed is dry/invalid emit all-NODATA tiles).
    Depth is one double subtraction + float32 cast, bit-replayable
    cross-engine; membership is pure integer graph work.

    Two-level band algorithm (the polygonize machinery re-seeded):
    pass 1 labels the thresholded mask band-locally (vectorized
    label-equivalence CC) and emits SLIM rows only — one row per local
    region, band-face seam rows, and the seed's local key;
    ``dedup_clusters`` resolves cross-band equivalence over the
    edge-sized label graph; the lake's local-region keys per image
    (region-count-sized) broadcast back into pass 2, which re-runs the
    band-local labeling and paints depth. Pixels never shuffle."""
    from .dedup import dedup_clusters

    geo = ["image_id", "tile_y", "ty0", "th", "w", "h", "cellsize",
           "x0", "y0", "crs"]
    t = tiles.select(*geo, F.col(value_col).alias("__v"))
    if pinned:
        t = t.localCheckpoint(eager=True)
    nd = float(nodata)
    lvl = float(level)
    sr, sc = int(seed[0]), int(seed[1])

    def classify(vals: np.ndarray) -> np.ndarray:
        mask = ((vals != np.float32(nd))
                & (vals.astype(np.float64) <= lvl))
        return np.where(mask, np.float32(1.0), np.float32(nd))

    def p1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "kind", "gkey", "r", "c")}

            def emit(iid, kind, gkey, r=0, c=0):
                rows["image_id"].append(iid)
                rows["kind"].append(int(kind))
                rows["gkey"].append(int(gkey))
                rows["r"].append(int(r))
                rows["c"].append(int(c))

            for i in range(len(pdf)):
                th, w = int(pdf["th"].iat[i]), int(pdf["w"].iat[i])
                ty0 = int(pdf["ty0"].iat[i])
                iid = pdf["image_id"].iat[i]
                vals = np.asarray(
                    pdf["__v"].iat[i], dtype=np.float32).reshape(th, w)
                lab = label_grid(classify(vals), nd)

                def gk(root):
                    return (root // w + ty0) * w + root % w

                for root in np.unique(lab[lab >= 0]):
                    emit(iid, 0, gk(root))
                for lr, kind in ((0, 2), (th - 1, 1)):
                    for col in range(w):
                        root = lab[lr, col]
                        if root >= 0:
                            emit(iid, kind, gk(root), r=ty0 + lr, c=col)
                if ty0 <= sr < ty0 + th and 0 <= sc < w:
                    root = lab[sr - ty0, sc]
                    if root >= 0:
                        emit(iid, 3, gk(root))
            yield pd.DataFrame(rows)

    p1o = t.mapInPandas(
        p1, schema="image_id string, kind int, gkey long, r long, c long"
    ).localCheckpoint(eager=True)
    pad = lambda img, g: F.format_string("%s:%012d", img, g)  # noqa: E731
    bot = p1o.filter(F.col("kind") == 1).select("image_id", "gkey", "r", "c")
    top = p1o.filter(F.col("kind") == 2).select(
        F.col("image_id").alias("i2"), F.col("gkey").alias("g2"),
        F.col("r").alias("r2"), F.col("c").alias("c2"))
    edges = (bot.join(
        top, (F.col("image_id") == F.col("i2"))
        & (F.col("r2") == F.col("r") + 1) & (F.col("c2") == F.col("c")))
        .select(pad(F.col("image_id"), F.col("gkey")).alias("id_a"),
                pad(F.col("i2"), F.col("g2")).alias("id_b")).distinct())
    nodes = p1o.filter(F.col("kind") == 0).select(
        pad(F.col("image_id"), F.col("gkey")).alias("doc_id"))
    resolved = dedup_clusters(edges, nodes, id_col="doc_id",
                              max_iterations=max_iterations)
    # cluster ids are min member keys -> globally unique (edges never
    # cross images), so the seed's cluster pins its image's lake
    seed_lab = (p1o.filter(F.col("kind") == 3)
                .select(pad(F.col("image_id"), F.col("gkey"))
                        .alias("doc_id"))
                .join(resolved, "doc_id")
                .select(F.col("cluster_id").alias("__lake")))
    lake_roots = (resolved.join(
        seed_lab, F.col("cluster_id") == F.col("__lake"))
        .select(F.split("doc_id", ":").getItem(0).alias("image_id"),
                F.split("doc_id", ":").getItem(1).cast("long")
                .alias("gkey")))
    keysets = (lake_roots.groupBy("image_id")
               .agg(F.collect_set("gkey").alias("__keys")))
    j = t.join(F.broadcast(keysets), "image_id", "left")

    def p2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "tile_y", "ty0", "th", "w",
                                   "h", "cellsize", "x0", "y0", "crs",
                                   "lake")}
            for i in range(len(pdf)):
                th, w = int(pdf["th"].iat[i]), int(pdf["w"].iat[i])
                ty0 = int(pdf["ty0"].iat[i])
                vals = np.asarray(
                    pdf["__v"].iat[i], dtype=np.float32).reshape(th, w)
                depth = np.full(th * w, np.float32(nd), dtype=np.float32)
                keys = pdf["__keys"].iat[i]
                if keys is not None and len(keys):
                    lab = label_grid(classify(vals), nd)
                    flat = lab.ravel()
                    ok = flat >= 0
                    g = (flat[ok] // w + ty0) * w + flat[ok] % w
                    member = np.isin(
                        g, np.asarray(list(keys), dtype=np.int64))
                    idx = np.flatnonzero(ok)[member]
                    depth[idx] = (lvl - vals.ravel()[idx]
                                  .astype(np.float64)).astype(np.float32)
                for col in ("image_id", "tile_y", "ty0", "th", "w", "h",
                            "cellsize", "x0", "y0", "crs"):
                    out[col].append(pdf[col].iat[i])
                out["lake"].append(depth)
            yield pd.DataFrame(out)

    return j.mapInPandas(p2, schema=LAKE_SCHEMA)
