"""Viewshed (gdal_viewshed parity, exact DDA variant): tiled ==
whole-grid twin == explicit per-target reference exactly (integer
sample positions + one correctly-rounded sqrt per slope -> the
comparisons are deterministic). Covers random terrain, NODATA
observer/target/intermediate rules, grazing equality (blocked),
max_dist, and seam invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, build_images
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.viewshed import (
    NODATA,
    viewshed_grid,
    viewshed_tiles,
)


def slow_viewshed(z, orow, ocol, oz=2.0, max_dist=None):
    """Independent reference: explicit per-target sample loop."""
    g = np.asarray(z, dtype=np.float32)
    h, w = g.shape
    out = np.zeros((h, w), dtype=np.int64)
    if g[orow, ocol] == np.float32(NODATA):
        return out
    z0 = float(g[orow, ocol]) + oz
    for r in range(h):
        for c in range(w):
            if g[r, c] == np.float32(NODATA):
                continue
            dr, dc = r - orow, c - ocol
            n = max(abs(dr), abs(dc))
            d2 = dr * dr + dc * dc
            if max_dist is not None and d2 > max_dist * max_dist:
                continue
            if n == 0:
                out[r, c] = 1
                continue
            st = (float(g[r, c]) - z0) / np.sqrt(float(d2))
            blocked = False
            for k in range(1, n):
                sr = orow + (2 * k * dr + n) // (2 * n)
                sc = ocol + (2 * k * dc + n) // (2 * n)
                if g[sr, sc] == np.float32(NODATA):
                    continue
                sd2 = (sr - orow) ** 2 + (sc - ocol) ** 2
                sk = (float(g[sr, sc]) - z0) / np.sqrt(float(sd2))
                if not (sk < st):
                    blocked = True
                    break
            if not blocked:
                out[r, c] = 1
    return out


def _terrain(seed, h=24, w=18):
    rng = np.random.default_rng(seed)
    g = rng.uniform(90.0, 150.0, size=(h, w)).astype(np.float32)
    if seed % 2:
        g[3:6, 2:5] = NODATA
    return g


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_grid_twin_vs_slow(seed):
    g = _terrain(seed)
    got = viewshed_grid(g, 10, 9)
    want = slow_viewshed(g, 10, 9)
    assert np.array_equal(got, want)


def test_nodata_observer_all_hidden():
    g = _terrain(0)
    g[5, 5] = NODATA
    assert (viewshed_grid(g, 5, 5) == 0).all()


def test_wall_blocks_and_transparency():
    """A high wall hides the cells behind it; making the wall NODATA
    (transparent) un-hides them."""
    g = np.full((1, 7), 100.0, dtype=np.float32)
    g[0, 3] = 200.0  # wall between observer (0,0) and the far cells
    vis = viewshed_grid(g, 0, 0, oz=2.0)
    assert vis[0, 3] == 1          # the wall top itself is visible
    assert (vis[0, 4:] == 0).all()  # behind the wall: hidden
    g[0, 3] = NODATA
    vis2 = viewshed_grid(g, 0, 0, oz=2.0)
    assert (vis2[0, 4:] == 1).all()  # transparent now
    assert vis2[0, 3] == 0           # NODATA target stays hidden


def test_grazing_equality_blocked():
    """Flat terrain at the observer's eye level: every slope chain hits
    equality (sk == st) -> strictly-less test hides the far cells."""
    g = np.full((1, 5), 100.0, dtype=np.float32)
    vis = viewshed_grid(g, 0, 0, oz=0.0)
    assert vis[0, 0] == 1 and vis[0, 1] == 1  # adjacent: no intermediates
    assert (vis[0, 2:] == 0).all()
    want = slow_viewshed(g, 0, 0, oz=0.0)
    assert np.array_equal(vis, want)


def test_max_dist(seed=0):
    g = _terrain(seed)
    got = viewshed_grid(g, 10, 9, max_dist=6.0)
    want = slow_viewshed(g, 10, 9, max_dist=6.0)
    assert np.array_equal(got, want)
    rr, cc = np.mgrid[0:g.shape[0], 0:g.shape[1]]
    far = (rr - 10) ** 2 + (cc - 9) ** 2 > 36
    assert (got[far] == 0).all()


SPEC = CorpusSpec(n_images=4, w=32, h=32, nodata_every=3)


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


@pytest.mark.parametrize("tile_rows", [4, 8, 32])
def test_tiled_equals_twin(spark, images_df, tile_rows):
    from pycuda_raster_spark.functions import codecs
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for

    out = viewshed_tiles(
        decode_tiles(images_df, tile_rows=tile_rows), orow=16, ocol=16)
    rows = out.select("image_id", "ty0", "th", "w", "visible").collect()
    got = {}
    for r in rows:
        got.setdefault(r["image_id"], {})[r["ty0"]] = r
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        fmt = FMT_CYCLE[i % len(FMT_CYCLE)]
        g = codecs.decode(
            codecs.encode(grid_for(i, SPEC), fmt), fmt, SPEC.w, SPEC.h)
        want = viewshed_grid(g, 16, 16)
        bands = got[iid]
        assert sum(b["th"] for b in bands.values()) == SPEC.h
        for ty0, b in bands.items():
            v = np.asarray(b["visible"], np.int64).reshape(b["th"], b["w"])
            assert np.array_equal(v, want[ty0:ty0 + b["th"]]), (iid, ty0)


def test_cli_viewshed(spark, images_df, tmp_path):
    """--viewshed CLI mode == grid twin on image 0."""
    from pycuda_raster_spark.functions import codecs
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out = str(tmp_path / "vs")
    assert main([inp, out, "viewshed", "--viewshed=16,16,2.0",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = (spark.read.parquet(out)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.visible, np.int64).reshape(r.th, r.w)
                     for r in rows])
    fmt = FMT_CYCLE[0]
    g = codecs.decode(
        codecs.encode(grid_for(0, SPEC), fmt), fmt, SPEC.w, SPEC.h)
    np.testing.assert_array_equal(got, viewshed_grid(g, 16, 16))


def test_tiled_max_dist_prunes_bands(spark, images_df):
    """With max_dist, bands outside the observer window are dropped
    before the shuffle and absent from the output."""
    out = viewshed_tiles(
        decode_tiles(images_df, tile_rows=4), orow=4, ocol=16, max_dist=6.0)
    rows = out.select("image_id", "ty0", "th", "w", "visible").collect()
    assert rows
    assert all(r["ty0"] <= 10 for r in rows)  # bands past orow+md dropped
    from pycuda_raster_spark.functions import codecs
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for

    fmt = FMT_CYCLE[0]
    g = codecs.decode(
        codecs.encode(grid_for(0, SPEC), fmt), fmt, SPEC.w, SPEC.h)
    want = viewshed_grid(g, 4, 16, max_dist=6.0)
    for r in [x for x in rows if x["image_id"] == "img000000"]:
        v = np.asarray(r["visible"], np.int64).reshape(r["th"], r["w"])
        assert np.array_equal(v, want[r["ty0"]:r["ty0"] + r["th"]])
