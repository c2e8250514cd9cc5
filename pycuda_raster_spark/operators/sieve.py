"""Sieve filter (gdal_sieve parity, deterministic variant) — connected
same-value regions smaller than ``threshold`` cells are merged into
their LARGEST adjacent region (8-neighbor adjacency is gdal_sieve's
``-8``; this implements the default 4-connected case), taking that
region's value.  Ties on neighbor size break to the SMALLEST neighbor
label, making the whole operator deterministic and partition-invariant.

Deviation from GDAL, documented: gdal_sieve merges polygons one at a
time in an internal processing order, so a cascade of merges can depend
on that order; this operator evaluates every small region against the
ORIGINAL region map in one shot (no cascade — a merged region is not
re-examined, and neighbor sizes are pre-merge sizes).  That makes the
result independent of any processing order and exactly reproducible in
SQL, at the cost of possibly leaving a post-merge region still below the
threshold (run the operator again to converge if desired).

Region semantics are shared with ``vectorize.polygonize_tiles``:
4-connected equal-valued non-NODATA cells; label = min global flat index
(r * w + c).  NODATA cells never merge and are never merge targets.

Distribution (100 TB posture) — same two-level shape as polygonize:

1. **Pass 1** (band-local): vectorized label-equivalence CC per band;
   emits per-local-region stats rows, seam rows for the band's facing
   pixel rows, and slim IN-BAND adjacency pairs (distinct pairs of
   local-region keys touching with different values).
2. **Slim JVM resolution**: same-value seam edges -> global min-labels
   via ``dedup_clusters`` pointer jumping; adjacency pairs (in-band +
   cross-band different-value seam pairs) mapped to global labels;
   region sizes aggregated; each small region's merge target picked by
   a two-step max-size / min-label aggregation (no packed-key overflow
   at any raster size).  Pixels never shuffle.
3. **Apply pass** (band-local): the slim (band, local-region, new value)
   map is broadcast-joined back; each band relabels locally and rewrites
   the affected regions' pixels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .vectorize import NODATA, label_grid

_P1_SCHEMA = (
    "image_id string, kind int, tile_y int, gkey long, gkey2 long, "
    "val double, n long, r0 long, r1 long, c0 long, c1 long, "
    "r long, c long"
)

REGIONS_SCHEMA = (
    "image_id string, label long, val double, n_cells long, "
    "new_label long, sieved_val double"
)


def sieve_grid(
    vals: np.ndarray, threshold: int, nodata: float = NODATA
) -> tuple[np.ndarray, list[tuple[int, float, int, int, float]]]:
    """Whole-grid NumPy twin.  Returns (sieved grid, region rows) where
    region rows are (label, val, n_cells, new_label, sieved_val) sorted
    by label.  Tests assert the tiled operator equals this exactly."""
    v = np.asarray(vals, dtype=np.float32)
    h, w = v.shape
    lab = label_grid(v, nodata)
    flat = lab.ravel()
    ok = flat >= 0
    roots, inv = np.unique(flat[ok], return_inverse=True)
    counts = np.bincount(inv)
    size_of = dict(zip(roots.tolist(), counts.tolist()))
    val_of = {int(rt): float(v.ravel()[rt]) for rt in roots}

    # adjacency: 4-neighbor pairs with BOTH valid and different values
    pairs = set()
    a, b = lab[:, :-1], lab[:, 1:]
    m = (a >= 0) & (b >= 0) & (a != b)
    pairs.update(zip(a[m].tolist(), b[m].tolist()))
    a, b = lab[:-1, :], lab[1:, :]
    m = (a >= 0) & (b >= 0) & (a != b)
    pairs.update(zip(a[m].tolist(), b[m].tolist()))
    nbrs: dict[int, set[int]] = {}
    for x, y in pairs:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)

    out = v.copy()
    rows = []
    for rt in sorted(size_of):
        n = size_of[rt]
        new_label, sieved = rt, val_of[rt]
        if n < threshold and nbrs.get(rt):
            # largest neighbor, tie -> smallest label (pre-merge sizes)
            new_label = min(nbrs[rt], key=lambda l: (-size_of[l], l))
            sieved = val_of[new_label]
            out[lab == rt] = np.float32(sieved)
        rows.append((rt, val_of[rt], n, new_label, sieved))
    return out, rows


def _sieve_core(
    tiles: DataFrame, threshold: int, value_col: str, nodata: float,
    pinned: bool,
):
    """Shared slim pipeline: returns (t, p1_out, root_of, regions) where
    ``regions`` carries (image_id, label, val, n_cells, new_label,
    sieved_val)."""
    from .dedup import dedup_clusters

    keep = ["image_id", "tile_y", "ty0", "th", "w", "h", value_col]
    extra = [c for c in ("cellsize", "x0", "y0", "crs")
             if c in tiles.columns]
    t = (tiles.select(*keep, *extra).withColumnRenamed(value_col, "__v"))
    if pinned:
        t = t.localCheckpoint(eager=True)
    nd = float(nodata)

    def p1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("image_id", "kind", "tile_y", "gkey", "gkey2", "val",
                     "n", "r0", "r1", "c0", "c1", "r", "c")}

            def emit(iid, kind, tile_y, gkey=0, gkey2=0, val=0.0, n=0,
                     r0=0, r1=0, c0=0, c1=0, r=0, c=0):
                rows["image_id"].append(iid)
                rows["kind"].append(kind)
                rows["tile_y"].append(int(tile_y))
                rows["gkey"].append(int(gkey))
                rows["gkey2"].append(int(gkey2))
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
                tile_y = int(pdf["tile_y"].iat[i])
                iid = pdf["image_id"].iat[i]
                vals = np.asarray(
                    pdf["__v"].iat[i], dtype=np.float32).reshape(th, w)
                lab = label_grid(vals, nd)
                glab = np.where(
                    lab >= 0, (lab // w + ty0) * w + lab % w, -1)
                flat = lab.ravel()
                ok = flat >= 0
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
                    emit(iid, 0, tile_y, gkeys[j], 0, vflat[roots[j]],
                         counts[j], r_min[j] + ty0, r_max[j] + ty0,
                         c_min[j], c_max[j])
                # in-band adjacency: distinct local-region pairs touching
                # with different values (right + down neighbors)
                prs = []
                for ga, gb in (
                        (glab[:, :-1], glab[:, 1:]),
                        (glab[:-1, :], glab[1:, :])):
                    m = (ga >= 0) & (gb >= 0) & (ga != gb)
                    if m.any():
                        prs.append(np.stack([ga[m], gb[m]], axis=1))
                if prs:
                    for ga, gb in np.unique(
                            np.vstack(prs), axis=0).tolist():
                        emit(iid, 3, tile_y, ga, gb)
                # seam rows (kind 1 = bottom face, 2 = top face)
                for lr, kind in ((0, 2), (th - 1, 1)):
                    gl = glab[lr]
                    for col in range(w):
                        if gl[col] < 0:
                            continue
                        emit(iid, kind, tile_y, gl[col], 0, vals[lr, col],
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
    pad = lambda img, col: F.format_string("%s:%012d", img, col)  # noqa: E731

    # same-value seam edges -> global min-label resolution
    seam = bot.join(
        top, (F.col("image_id") == F.col("image_id2"))
        & (F.col("r2") == F.col("r") + 1) & (F.col("c2") == F.col("c")))
    cc_edges = (seam.filter(F.col("val2") == F.col("val"))
                .select(pad(F.col("image_id"), F.col("gkey")).alias("id_a"),
                        pad(F.col("image_id"), F.col("gkey2")).alias("id_b"))
                .distinct())
    nodes = stats.select(
        pad(F.col("image_id"), F.col("gkey")).alias("doc_id")).distinct()
    resolved = dedup_clusters(cc_edges, nodes, id_col="doc_id")
    root_of = resolved.select(
        F.col("doc_id").alias("__id"),
        F.split(F.col("cluster_id"), ":").getItem(1).cast("long")
        .alias("label")).localCheckpoint(eager=True)

    reg = (stats.withColumn("__id", pad(F.col("image_id"), F.col("gkey")))
           .join(root_of, "__id")
           .groupBy("image_id", "label")
           .agg(F.min("val").alias("val"),
                F.sum("n").alias("n_cells")))

    # adjacency edges on resolved labels (in-band + cross-band pairs)
    inband = (p1_out.filter(F.col("kind") == 3)
              .select("image_id", "gkey", "gkey2"))
    crossband = (seam.filter(F.col("val2") != F.col("val"))
                 .select("image_id", "gkey", "gkey2"))
    raw = inband.unionByName(crossband)
    lab_a = root_of.select(F.col("__id").alias("__ia"),
                           F.col("label").alias("label_a"))
    lab_b = root_of.select(F.col("__id").alias("__ib"),
                           F.col("label").alias("label_b"))
    e = (raw.withColumn("__ia", pad(F.col("image_id"), F.col("gkey")))
         .withColumn("__ib", pad(F.col("image_id"), F.col("gkey2")))
         .join(lab_a, "__ia").join(lab_b, "__ib")
         .select("image_id", "label_a", "label_b"))
    edges = (e.unionByName(
        e.select("image_id", F.col("label_b").alias("label_a"),
                 F.col("label_a").alias("label_b")))
        .filter(F.col("label_a") != F.col("label_b")).distinct())

    # merge target: largest neighbor, tie -> smallest label (two-step
    # aggregation -- no packed-key range assumptions)
    nbr = edges.join(
        reg.select("image_id", F.col("label").alias("label_b"),
                   F.col("n_cells").alias("nb"),
                   F.col("val").alias("vb")),
        ["image_id", "label_b"])
    mx = (nbr.groupBy("image_id", "label_a")
          .agg(F.max("nb").alias("nb_max")))
    win = (nbr.join(mx, ["image_id", "label_a"])
           .filter(F.col("nb") == F.col("nb_max"))
           .groupBy("image_id", "label_a")
           .agg(F.min("label_b").alias("win_label")))
    win_val = win.join(
        reg.select("image_id", F.col("label").alias("win_label"),
                   F.col("val").alias("win_val")),
        ["image_id", "win_label"])

    small = F.col("n_cells") < F.lit(int(threshold))
    regions = (reg.join(
        win_val.select("image_id", F.col("label_a").alias("label"),
                       "win_label", "win_val"),
        ["image_id", "label"], "left")
        .select(
            "image_id", "label", "val", "n_cells",
            F.when(small & F.col("win_label").isNotNull(),
                   F.col("win_label")).otherwise(F.col("label"))
            .alias("new_label"),
            F.when(small & F.col("win_label").isNotNull(),
                   F.col("win_val")).otherwise(F.col("val"))
            .alias("sieved_val"),
        ))
    return t, stats, root_of, regions, pad


def sieve_regions(
    tiles: DataFrame,
    threshold: int,
    value_col: str = "px",
    nodata: float = NODATA,
    pinned: bool = True,
) -> DataFrame:
    """Region-level sieve decision table: ``(image_id, label, val,
    n_cells, new_label, sieved_val)`` — ``new_label``/``sieved_val``
    differ from ``label``/``val`` exactly for the merged small
    regions."""
    _, _, _, regions, _ = _sieve_core(
        tiles, threshold, value_col, nodata, pinned)
    return regions


def sieve_tiles(
    tiles: DataFrame,
    threshold: int,
    value_col: str = "px",
    nodata: float = NODATA,
    pinned: bool = True,
) -> DataFrame:
    """Sieved raster: ``tiles`` with ``value_col`` rewritten (small
    regions replaced by their merge target's value).  One extra
    band-local pass over the pixels; the merge map arrives as a
    broadcast of slim (band, local-region, value) rows."""
    t, stats, root_of, regions, pad = _sieve_core(
        tiles, threshold, value_col, nodata, pinned)
    nd32 = np.float32(nodata)

    changed = regions.filter(F.col("new_label") != F.col("label")).select(
        "image_id", "label", "sieved_val")
    band_map = (stats
                .withColumn("__id", pad(F.col("image_id"), F.col("gkey")))
                .join(root_of, "__id")
                .join(changed, ["image_id", "label"])
                .groupBy("image_id", "tile_y")
                .agg(F.collect_list(F.struct("gkey", "sieved_val"))
                     .alias("__map")))
    seeded = t.join(F.broadcast(band_map), ["image_id", "tile_y"], "left")

    out_cols = [c for c in seeded.columns if c not in ("__v", "__map")]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in seeded.schema.fields if f.name in out_cols
    ) + ", px array<float>"

    def p2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c] for c in out_cols}
            out["px"] = [None] * len(pdf)
            for i in range(len(pdf)):
                th, w = int(pdf["th"].iat[i]), int(pdf["w"].iat[i])
                ty0 = int(pdf["ty0"].iat[i])
                vals = np.asarray(
                    pdf["__v"].iat[i], dtype=np.float32).reshape(th, w)
                lst = pdf["__map"].iat[i]
                if lst is None or (isinstance(lst, float) and pd.isna(lst)) \
                        or len(lst) == 0:
                    out["px"][i] = vals.ravel()
                    continue
                lab = label_grid(vals, float(nd32))
                px = vals.copy()
                for s in lst:
                    local = int(s["gkey"]) - ty0 * w
                    px[lab == local] = np.float32(s["sieved_val"])
                out["px"][i] = px.ravel()
            yield pd.DataFrame(out)

    return seeded.mapInPandas(p2, schema=schema)
