"""Nearest-valid fill (gdal_fillnodata nearest variant): tiled ==
whole-grid twin == O(n * valid) brute force EXACTLY — the composite key
(dist2, src_r, src_c) is pure-integer and every filled value is a bit
copy of a source cell, so equality is strict on all four outputs.
Covers hole grids, predicate-restricted sources, deterministic tie
grids, all-NODATA / all-valid images, and multiple tile heights."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, build_images
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.fillnodata import (
    NODATA,
    fill_nearest_grid,
    fill_nearest_tiles,
)
from pycuda_raster_spark.operators.proximity import target_class_mod

SPEC = CorpusSpec(n_images=4, w=32, h=32, nodata_every=3)
PRED = target_class_mod(16.0, 7)


def brute_fill(px: np.ndarray, valid=None):
    """Independent oracle: per cell, argmin over ALL valid cells of the
    composite key (d2, tr, tc)."""
    p = np.asarray(px, dtype=np.float32)
    v = (p != np.float32(NODATA))
    if valid is not None:
        v &= valid(p)
    h, w = p.shape
    trs, tcs = np.nonzero(v)
    if trs.size == 0:
        return (np.full((h, w), NODATA, np.float32),
                np.full((h, w), -1, np.int64),
                np.full((h, w), -1, np.int64),
                np.full((h, w), -1, np.int64))
    rr, cc = np.mgrid[0:h, 0:w]
    d2 = ((rr[:, :, None] - trs[None, None, :]) ** 2
          + (cc[:, :, None] - tcs[None, None, :]) ** 2).astype(np.int64)
    key = (d2 << 42) + (trs[None, None, :].astype(np.int64) << 21) \
        + tcs[None, None, :].astype(np.int64)
    win = key.min(axis=2)
    bd2 = win >> 42
    br = (win >> 21) & ((1 << 21) - 1)
    bc = win & ((1 << 21) - 1)
    return p[br, bc], bd2, br, bc


def _rand_grid(seed: int, h: int = 24, w: int = 17,
               hole_frac: float = 0.4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    g = rng.uniform(90.0, 200.0, size=(h, w)).astype(np.float32)
    g[rng.random((h, w)) < hole_frac] = NODATA
    return g


@pytest.mark.parametrize("seed,frac", [(0, 0.4), (1, 0.85), (2, 0.0),
                                       (3, 0.6)])
def test_grid_twin_vs_brute(seed, frac):
    g = _rand_grid(seed, hole_frac=frac)
    got = fill_nearest_grid(g)
    want = brute_fill(g)
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("seed", [0, 1])
def test_grid_predicate_sources(seed):
    """valid= predicate: only class-mod cells are sources; every other
    cell (including real data) is refilled from them."""
    g = _rand_grid(seed, hole_frac=0.2)
    got = fill_nearest_grid(g, valid=PRED)
    want = brute_fill(g, valid=PRED)
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_grid_tiebreak_deterministic():
    """A cell equidistant from several sources picks min (d2, r, c):
    center of a cross of 4 sources -> the TOP one wins (smallest r)."""
    g = np.full((5, 5), NODATA, dtype=np.float32)
    g[0, 2] = 1.0   # up
    g[4, 2] = 2.0   # down
    g[2, 0] = 3.0   # left
    g[2, 4] = 4.0   # right
    filled, d2, sr, sc = fill_nearest_grid(g)
    assert d2[2, 2] == 4
    assert (sr[2, 2], sc[2, 2]) == (0, 2)
    assert filled[2, 2] == np.float32(1.0)
    # left cell of center: ties between (2,0) d2=1... actually distance 1
    bf = brute_fill(g)
    for a, b in zip((filled, d2, sr, sc), bf):
        assert np.array_equal(a, b)


def test_grid_row_tiebreak():
    """Two sources in the same row, cell midway: smaller column wins."""
    g = np.full((1, 7), NODATA, dtype=np.float32)
    g[0, 0] = 10.0
    g[0, 6] = 20.0
    filled, d2, sr, sc = fill_nearest_grid(g)
    assert d2[0, 3] == 9 and sc[0, 3] == 0 and filled[0, 3] == 10.0


def test_grid_all_nodata():
    g = np.full((6, 9), NODATA, dtype=np.float32)
    filled, d2, sr, sc = fill_nearest_grid(g)
    assert (filled == np.float32(NODATA)).all()
    assert (d2 == -1).all() and (sr == -1).all() and (sc == -1).all()


def test_grid_all_valid_identity():
    g = _rand_grid(7, hole_frac=0.0)
    filled, d2, sr, sc = fill_nearest_grid(g)
    assert np.array_equal(filled, g)
    assert (d2 == 0).all()
    rr, cc = np.mgrid[0:g.shape[0], 0:g.shape[1]]
    assert np.array_equal(sr, rr) and np.array_equal(sc, cc)


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


@pytest.mark.parametrize("tile_rows", [4, 8, 32])
def test_tiled_equals_twin(spark, images_df, tile_rows):
    from pycuda_raster_spark.functions import codecs
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for

    out = fill_nearest_tiles(
        decode_tiles(images_df, tile_rows=tile_rows), valid=PRED)
    rows = out.select("image_id", "ty0", "th", "w", "filled",
                      "dist2", "src_r", "src_c").collect()
    got: dict[str, dict[int, tuple]] = {}
    for r in rows:
        got.setdefault(r["image_id"], {})[r["ty0"]] = r

    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        fmt = FMT_CYCLE[i % len(FMT_CYCLE)]
        g = codecs.decode(
            codecs.encode(grid_for(i, SPEC), fmt), fmt, SPEC.w, SPEC.h)
        wf, wd2, wsr, wsc = fill_nearest_grid(g, valid=PRED)
        bands = got[iid]
        assert sum(b["th"] for b in bands.values()) == SPEC.h
        for ty0, b in bands.items():
            sl = slice(ty0, ty0 + b["th"])
            assert np.array_equal(
                np.asarray(b["filled"], np.float32).reshape(b["th"], b["w"]),
                wf[sl]), (iid, ty0)
            assert np.array_equal(
                np.asarray(b["dist2"], np.int64).reshape(b["th"], b["w"]),
                wd2[sl]), (iid, ty0)
            assert np.array_equal(
                np.asarray(b["src_r"], np.int64).reshape(b["th"], b["w"]),
                wsr[sl]), (iid, ty0)
            assert np.array_equal(
                np.asarray(b["src_c"], np.int64).reshape(b["th"], b["w"]),
                wsc[sl]), (iid, ty0)


def test_cli_fillnodata(spark, images_df, tmp_path):
    """--fillnodata CLI mode == grid twin on image 0 (default holes =
    NODATA cells)."""
    from pycuda_raster_spark.functions import codecs
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out = str(tmp_path / "fill")
    assert main([inp, out, "fillnodata", "--fillnodata=default",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = (spark.read.parquet(out)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.filled, np.float32).reshape(r.th, r.w)
                     for r in rows])
    fmt = FMT_CYCLE[0]
    g = codecs.decode(
        codecs.encode(grid_for(0, SPEC), fmt), fmt, SPEC.w, SPEC.h)
    np.testing.assert_array_equal(got, fill_nearest_grid(g)[0])
