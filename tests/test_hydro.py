"""D8 flow accumulation vs brute-force path walking + tiled vs twin.

The tiled two-pass operator (band partials -> slim port-graph routing ->
seeded second sweep) must equal the whole-grid twin EXACTLY across tile
heights — integer counts, so equality is strict. The twin itself is
pinned against an independent brute-force that walks every cell's
drainage path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import FMT_CYCLE, CorpusSpec, build_images, grid_for
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.functions.focal_kernels import flow_dir
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.focal import flow_dir_tiles
from pycuda_raster_spark.operators.hydro import (
    D8_DC,
    D8_DR,
    NODATA,
    flow_accum_grid,
    flow_accum_tiles,
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


def brute_accum(dirs: np.ndarray) -> np.ndarray:
    """Independent oracle: walk every valid cell's path, incrementing
    each strictly-downstream dir-valid cell."""
    th, w = dirs.shape
    valid = dirs != np.float32(NODATA)
    code = np.where(valid, dirs, 0.0).astype(np.int64)
    acc = np.zeros((th, w), dtype=np.int64)
    for r in range(th):
        for c in range(w):
            if not valid[r, c]:
                continue
            cr, cc = r, c
            for _ in range(th * w + 1):
                k = code[cr, cc]
                if k == 0:
                    break
                nr, nc = cr + D8_DR[k], cc + D8_DC[k]
                if not (0 <= nr < th and 0 <= nc < w) or not valid[nr, nc]:
                    break
                acc[nr, nc] += 1
                cr, cc = nr, nc
            else:
                raise AssertionError("cycle in flow graph")
    out = acc.astype(np.float32)
    out[~valid] = np.float32(NODATA)
    return out


def _serpentine_elevation(h: int, w: int) -> np.ndarray:
    """A column-zigzag valley: the drainage path descends column 0, rises
    back up column 2, down column 4, ... (spaced columns, so D8 can't
    shortcut across the ridge between them). Ascending columns re-enter
    every band from below — the re-entry stress case for the coarse port
    routing. Walls tilt toward the valley so they drain into it."""
    g = np.full((h, w), 0.0, dtype=np.float32)
    path = []
    col = 0
    down = True
    while col < w:
        rows = range(h) if down else range(h - 1, -1, -1)
        for r in rows:
            path.append((r, col))
        end_r = h - 1 if down else 0
        if col + 2 < w:
            path.append((end_r, col + 1))
        col += 2
        down = not down
    n = len(path)
    wall = np.float32(4.0 * n)
    for r in range(h):
        for c in range(w):
            g[r, c] = wall + np.float32(r + c)  # unique-ish, no flats
    for i, (r, c) in enumerate(path):
        g[r, c] = np.float32(n - i)
    return g


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_twin_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    g = (rng.random((20, 17)) * 50).astype(np.float32)
    if seed == 1:  # carve a NODATA hole to exercise dilation + sinks
        g[6:9, 4:7] = np.float32(NODATA)
    dirs = flow_dir(g)
    np.testing.assert_array_equal(flow_accum_grid(dirs), brute_accum(dirs))


def test_twin_matches_brute_on_serpentine():
    g = _serpentine_elevation(16, 9)
    dirs = flow_dir(g)
    np.testing.assert_array_equal(flow_accum_grid(dirs), brute_accum(dirs))
    # sanity: the valley terminus accumulates at least two full columns
    # of path cells (the path really threads multiple band re-entries)
    acc = flow_accum_grid(dirs)
    valid = acc != np.float32(NODATA)
    assert acc[valid].max() >= 24  # ~2 full interior columns of path


def test_bowl_pit_collects_everything():
    """A radial bowl: the pit cell's count is every other valid cell."""
    h = w = 15
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy - 7) ** 2 + (xx - 7) ** 2).astype(np.float32)
    dirs = flow_dir(g)
    acc = flow_accum_grid(dirs)
    valid = acc != np.float32(NODATA)
    assert dirs[7, 7] == 0.0
    assert acc[7, 7] == valid.sum() - 1


def _collect_grids(out_df):
    rows = out_df.select("image_id", "ty0", "th", "w", "h",
                         "flow_accum").collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r)
    grids = {}
    for iid, tiles in per.items():
        tiles.sort(key=lambda r: r.ty0)
        assert sum(t.th for t in tiles) == tiles[0].h
        grids[iid] = np.vstack(
            [np.asarray(t.flow_accum, dtype=np.float32).reshape(t.th, t.w)
             for t in tiles])
    return grids


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_tiled_matches_twin_across_tilings(spark, images_df, tile_rows):
    dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=tile_rows))
    got = _collect_grids(flow_accum_tiles(dirs_df))
    assert set(got) == {f"img{i:06d}" for i in range(SPEC.n_images)}
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = flow_accum_grid(flow_dir(_decoded(i)))
        np.testing.assert_array_equal(got[iid], want,
                                      err_msg=f"{iid} tr={tile_rows}")


def test_tiled_serpentine_band_reentry(spark):
    """The boustrophedon valley at tile_rows=2: the main path re-enters
    every band repeatedly, so the coarse port routing must deliver and
    forward inflows through many rounds."""
    g = _serpentine_elevation(16, 9)
    from pycuda_raster_spark.fixtures import IMAGES_DDL

    df = spark.createDataFrame(
        [("serp", bytearray(g.astype("<f4").tobytes()), 9, 16, "raw",
          "serp", 0)], schema=IMAGES_DDL)
    dirs_df = flow_dir_tiles(decode_tiles(df, tile_rows=2))
    got = _collect_grids(flow_accum_tiles(dirs_df))["serp"]
    want = flow_accum_grid(flow_dir(g))
    np.testing.assert_array_equal(got, want)


def test_accum_plan_shape(spark, images_df):
    """Two Python stages (band partials + seeded finalize) over pinned
    dir tiles; the coarse routing never touches pixel payloads."""
    dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=8))
    out = flow_accum_tiles(dirs_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # pass 2 reads the pinned dir tiles: exactly one MapInPandas in the
    # final plan (pass 1 + the coarse loop already ran at build time)
    assert plan.count("MapInPandas") == 1, plan


def test_cli_flow_accum(spark, images_df, tmp_path):
    """flow_accum as a CLI product, on both the default path and composed
    with a regrid (--crop)."""
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out_a = str(tmp_path / "accum")
    out_s = str(tmp_path / "slope")
    assert main([inp, out_a, "flow_accum", out_s, "slope",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = (spark.read.parquet(out_a)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.flow_accum, np.float32).reshape(r.th, r.w)
                     for r in rows])
    want = flow_accum_grid(flow_dir(_decoded(0)))
    np.testing.assert_array_equal(got, want)
    assert spark.read.parquet(out_s).count() > 0  # fused path still ran

    out_c = str(tmp_path / "accum_crop")
    assert main([inp, out_c, "flow_accum", "--crop=4,4,24x24",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = (spark.read.parquet(out_c)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.flow_accum, np.float32).reshape(r.th, r.w)
                     for r in rows])
    want = flow_accum_grid(flow_dir(_decoded(0)[4:28, 4:28]))
    np.testing.assert_array_equal(got, want)


def brute_basins(dirs: np.ndarray) -> np.ndarray:
    """Independent oracle: walk each cell's path to its terminal."""
    th, w = dirs.shape
    valid = dirs != np.float32(NODATA)
    code = np.where(valid, dirs, 0.0).astype(np.int64)
    lab = np.full((th, w), -1, dtype=np.int64)
    for r in range(th):
        for c in range(w):
            if not valid[r, c]:
                continue
            cr, cc = r, c
            for _ in range(th * w + 1):
                k = code[cr, cc]
                if k == 0:
                    break
                nr, nc = cr + D8_DR[k], cc + D8_DC[k]
                if not (0 <= nr < th and 0 <= nc < w) or not valid[nr, nc]:
                    break
                cr, cc = nr, nc
            else:
                raise AssertionError("cycle")
            lab[r, c] = cr * w + cc
    return lab


@pytest.mark.parametrize("seed", [0, 1])
def test_basins_twin_matches_brute(seed):
    from pycuda_raster_spark.operators.hydro import basins_grid

    rng = np.random.default_rng(seed)
    g = (rng.random((20, 17)) * 50).astype(np.float32)
    if seed == 1:
        g[6:9, 4:7] = np.float32(NODATA)
    dirs = flow_dir(g)
    np.testing.assert_array_equal(basins_grid(dirs), brute_basins(dirs))


def test_bowl_is_one_basin():
    from pycuda_raster_spark.operators.hydro import basins_grid

    h = w = 15
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy - 7) ** 2 + (xx - 7) ** 2).astype(np.float32)
    lab = basins_grid(flow_dir(g))
    valid = lab >= 0
    assert set(np.unique(lab[valid])) == {7 * w + 7}


def _collect_basins(out_df):
    rows = out_df.select("image_id", "ty0", "th", "w", "h",
                         "basin").collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r)
    return {
        iid: np.vstack([
            np.asarray(t.basin, dtype=np.int64).reshape(t.th, t.w)
            for t in sorted(ts, key=lambda r: r.ty0)])
        for iid, ts in per.items()
    }


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_basins_tiled_matches_twin(spark, images_df, tile_rows):
    from pycuda_raster_spark.operators.hydro import basins_grid, basins_tiles

    dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=tile_rows))
    got = _collect_basins(basins_tiles(dirs_df))
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = basins_grid(flow_dir(_decoded(i)))
        np.testing.assert_array_equal(got[iid], want,
                                      err_msg=f"{iid} tr={tile_rows}")


def test_basins_serpentine_reentry(spark):
    from pycuda_raster_spark.fixtures import IMAGES_DDL
    from pycuda_raster_spark.operators.hydro import basins_grid, basins_tiles

    g = _serpentine_elevation(16, 9)
    df = spark.createDataFrame(
        [("serp", bytearray(g.astype("<f4").tobytes()), 9, 16, "raw",
          "serp", 0)], schema=IMAGES_DDL)
    dirs_df = flow_dir_tiles(decode_tiles(df, tile_rows=2))
    got = _collect_basins(basins_tiles(dirs_df))["serp"]
    want = basins_grid(flow_dir(g))
    np.testing.assert_array_equal(got, want)
