"""Polygonize (gdal_polygonize parity): tiled CC labeling vs brute
flood fill, seam invariance across tilings, and the ring round-trip
polygonize -> region_rings -> rasterize_zones == identity on labels.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import FMT_CYCLE, CorpusSpec, build_images, grid_for
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.vectorize import (
    NODATA,
    label_grid,
    polygonize_tiles,
    region_rings,
)

SPEC = CorpusSpec(n_images=4, w=32, h=32, nodata_every=3)


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


def _decoded(i: int) -> np.ndarray:
    src = i
    if SPEC.dup_every and i % SPEC.dup_every == SPEC.dup_every - 1 and i >= SPEC.dup_every:
        src = i - SPEC.dup_every
    fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
    g = grid_for(i, SPEC)
    return codecs.decode(codecs.encode(g, fmt), fmt, SPEC.w, SPEC.h)


def _classify(g: np.ndarray, k: float = 16.0) -> np.ndarray:
    """Quantize a continuous DEM into classes (polygonize needs a
    classified raster); NODATA passes through."""
    out = np.floor(g / np.float32(k)).astype(np.float32)
    out[g == np.float32(NODATA)] = np.float32(NODATA)
    return out


def brute_labels(vals: np.ndarray) -> np.ndarray:
    """BFS flood fill, 4-connected equal values, label = min flat index."""
    th, w = vals.shape
    valid = vals != np.float32(NODATA)
    lab = np.full((th, w), -1, dtype=np.int64)
    for r in range(th):
        for c in range(w):
            if not valid[r, c] or lab[r, c] >= 0:
                continue
            comp = [(r, c)]
            seen = {(r, c)}
            q = [(r, c)]
            while q:
                cr, cc = q.pop()
                for nr, nc in ((cr-1, cc), (cr+1, cc), (cr, cc-1), (cr, cc+1)):
                    if (0 <= nr < th and 0 <= nc < w and (nr, nc) not in seen
                            and valid[nr, nc] and vals[nr, nc] == vals[cr, cc]):
                        seen.add((nr, nc))
                        q.append((nr, nc))
                        comp.append((nr, nc))
            root = min(rr * w + cc for rr, cc in comp)
            for rr, cc in comp:
                lab[rr, cc] = root
    return lab


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_label_grid_matches_brute(seed):
    rng = np.random.default_rng(seed)
    g = np.floor(rng.random((24, 19)) * 4).astype(np.float32)
    if seed == 2:
        g[5:9, 3:9] = np.float32(NODATA)
    np.testing.assert_array_equal(label_grid(g), brute_labels(g))


def test_label_grid_snake():
    """A one-cell-wide serpentine region (worst-case diameter) — the
    pointer-jumped label equivalence must still converge to the min."""
    g = np.zeros((12, 11), dtype=np.float32)
    g[:, :] = 5.0
    for r in range(0, 12, 2):
        if (r // 2) % 2 == 0:
            g[r, :-1] = 1.0
        else:
            g[r, 1:] = 1.0
    for r in range(1, 12, 2):
        g[r, 0 if ((r - 1) // 2) % 2 else -1] = 1.0
    np.testing.assert_array_equal(label_grid(g), brute_labels(g))


def _twin_regions(vals: np.ndarray) -> dict[int, tuple]:
    lab = brute_labels(vals)
    out = {}
    for root in np.unique(lab[lab >= 0]):
        rr, cc = np.nonzero(lab == root)
        out[int(root)] = (
            float(vals[rr[0], cc[0]]), len(rr),
            int(rr.min()), int(rr.max()), int(cc.min()), int(cc.max()))
    return out


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_polygonize_matches_twin_across_tilings(spark, images_df, tile_rows):
    tiles = decode_tiles(images_df, tile_rows=tile_rows).withColumn(
        "px", F.transform(
            "px", lambda v: F.when(v == F.lit(float(NODATA)), v)
            .otherwise(F.floor(v / F.lit(16.0)).cast("float"))))
    got = polygonize_tiles(tiles)
    rows = got.collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, {})[int(r.label)] = (
            float(r.val), int(r.n_cells), r.r0, r.r1, r.c0, r.c1)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = _twin_regions(_classify(_decoded(i)))
        assert per.get(iid) == want, f"{iid} tr={tile_rows}"


def test_roundtrip_rings_rasterize_identity(spark):
    """polygonize -> region_rings -> rasterize_zones reproduces the
    label grid exactly (hole-free classified raster)."""
    from pycuda_raster_spark.fixtures import IMAGES_DDL
    from pycuda_raster_spark.functions.cellindex import cells_covering_bbox
    from pycuda_raster_spark.operators.zonal import rasterize_zones

    g = np.zeros((16, 12), dtype=np.float32)
    g[:, :] = 1.0
    g[2:9, 2:6] = 2.0
    g[10:14, 4:10] = 3.0
    g[0:2, 8:12] = 4.0
    df = spark.createDataFrame(
        [("poly", bytearray(g.astype("<f4").tobytes()), 12, 16, "raw",
          "poly", 0)], schema=IMAGES_DDL)
    tiles = decode_tiles(df, tile_rows=8)
    first = tiles.first()
    x0, y0, cs = float(first.x0), float(first.y0), float(first.cellsize)

    regions = polygonize_tiles(tiles)
    rings = region_rings(tiles, regions).collect()
    want_lab = brute_labels(g)
    assert {int(r.label) for r in rings} == set(
        int(v) for v in np.unique(want_lab[want_lab >= 0]))

    res = 6
    zones = spark.createDataFrame([
        {
            "zone_id": int(r.label),
            "name": f"region_{r.label}",
            "ring": [{"x": p["x"], "y": p["y"]} for p in r.ring],
            "cover_cells": [int(c) for c in cells_covering_bbox(
                min(p["x"] for p in r.ring), min(p["y"] for p in r.ring),
                max(p["x"] for p in r.ring), max(p["y"] for p in r.ring),
                res)],
        }
        for r in rings
    ])
    masks = rasterize_zones(tiles, zones, res=res).collect()
    masks.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(m.zone_mask, dtype=np.int64).reshape(
        m.th, m.w) for m in masks])
    np.testing.assert_array_equal(got, want_lab)


def test_ring_bound_guard(spark, images_df):
    tiles = decode_tiles(images_df, tile_rows=8).withColumn(
        "px", F.transform("px", lambda v: F.lit(1.0).cast("float")))
    regions = polygonize_tiles(tiles)
    with pytest.raises(Exception, match="max_ring_cells|ASSERT"):
        region_rings(tiles, regions, max_ring_cells=10).collect()


def test_cli_polygonize(spark, images_df, tmp_path):
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out_r = str(tmp_path / "regions")
    assert main([inp, out_r, "regions", "--polygonize=16",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = spark.read.parquet(out_r).filter(
        F.col("image_id") == "img000000").collect()
    want = _twin_regions(_classify(_decoded(0)))
    got = {int(r.label): (float(r.val), int(r.n_cells),
                          r.r0, r.r1, r.c0, r.c1) for r in rows}
    assert got == want


# ------------------------------------------------------------------ r.lake


def test_lake_grid_basin_shape():
    """Hand-built bowl: seed inside fills the bowl up to the level, the
    disconnected second depression stays dry, the rim stays dry."""
    from pycuda_raster_spark.operators.vectorize import lake_grid

    g = np.full((7, 9), 50.0, dtype=np.float32)
    g[2:5, 1:4] = 10.0            # bowl A
    g[3, 2] = 5.0                 # deepest point
    g[2:5, 6:8] = 8.0             # bowl B (disconnected)
    out = lake_grid(g, (3, 2), 20.0)
    nd = np.float32(NODATA)
    want_wet = np.zeros_like(g, dtype=bool)
    want_wet[2:5, 1:4] = True
    assert ((out != nd) == want_wet).all()
    assert out[3, 2] == np.float32(20.0 - 5.0)
    assert out[2, 1] == np.float32(20.0 - 10.0)
    # dry seed -> all NODATA
    assert (lake_grid(g, (0, 0), 20.0) == nd).all()
    # out-of-grid seed -> all NODATA
    assert (lake_grid(g, (99, 0), 20.0) == nd).all()


def brute_lake(g: np.ndarray, seed, level):
    """Independent reference: mask + BFS from seed (not lake_grid)."""
    nd = np.float32(NODATA)
    th, w = g.shape
    mask = (g != nd) & (g.astype(np.float64) <= float(level))
    out = np.full((th, w), nd, dtype=np.float32)
    sr, sc = seed
    if not (0 <= sr < th and 0 <= sc < w and mask[sr, sc]):
        return out
    from collections import deque
    seen = {(sr, sc)}
    q = deque([(sr, sc)])
    while q:
        r, c = q.popleft()
        for nr, nc in ((r + 1, c), (r - 1, c), (r, c + 1), (r, c - 1)):
            if (0 <= nr < th and 0 <= nc < w and mask[nr, nc]
                    and (nr, nc) not in seen):
                seen.add((nr, nc))
                q.append((nr, nc))
    for r, c in seen:
        out[r, c] = np.float32(float(level) - float(g[r, c]))
    return out


@pytest.mark.parametrize("tile_rows", [4, 8, 13, 32])
def test_lake_tiles_matches_brute(spark, images_df, tile_rows):
    from pycuda_raster_spark.operators.vectorize import lake_grid, lake_tiles

    seed, level = (16, 16), 128.0
    out = lake_tiles(decode_tiles(images_df, tile_rows=tile_rows),
                     seed, level)
    rows = out.collect()
    got = {}
    for r in rows:
        got.setdefault(r.image_id, []).append(
            (r.ty0, np.asarray(r.lake, np.float32).reshape(r.th, r.w)))
    wet_somewhere = 0
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        g = _decoded(i)
        want = brute_lake(g, seed, level)
        np.testing.assert_array_equal(want, lake_grid(g, seed, level))
        parts = sorted(got[iid])
        full = np.vstack([p for _, p in parts])
        np.testing.assert_array_equal(full, want,
                                      err_msg=f"{iid} tr={tile_rows}")
        wet_somewhere += int((want != np.float32(NODATA)).any())
    assert wet_somewhere > 0  # the level actually wets some image


def test_cli_lake(spark, images_df, tmp_path):
    from pycuda_raster_spark.__main__ import main
    from pycuda_raster_spark.operators.vectorize import lake_grid

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out = str(tmp_path / "lake")
    assert main([inp, out, "lake", "--lake=16,16,128",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = (spark.read.parquet(out)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.lake, np.float32).reshape(r.th, r.w)
                     for r in rows])
    np.testing.assert_array_equal(
        got, lake_grid(_decoded(0), (16, 16), 128.0))
