"""Raster algebra + windowed crop (gdal_calc / gdal_translate parity).

Engine tiled output must equal the whole-grid NumPy twin BIT-FOR-BIT
across tilings (golden methodology of the focal/resample suites), NODATA
must propagate, and the crop plan must stay narrow (zero Exchange).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, build_images
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.operators.calc import (
    NODATA,
    crop_tiles,
    raster_calc,
)
from pycuda_raster_spark.operators.decode import decode_tiles

TILE_COLS = ["image_id", "tile_y", "ty0", "th", "w", "h", "cellsize",
             "x0", "y0", "crs", "px"]
# nodata_every=3 -> img000005 (src 5, 5 % 3 == 2) carries the NODATA patch
A_ID, B_ID = "img000000", "img000005"


@pytest.fixture(scope="module")
def images_df(spark):
    # nodata_every=3 so the B raster has a NODATA patch to propagate
    return spark.createDataFrame(
        build_images(CorpusSpec(n_images=6, w=48, h=40, nodata_every=3))
    ).cache()


def _decoded(i: int, spec) -> np.ndarray:
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for

    src = i
    if spec.dup_every and i % spec.dup_every == spec.dup_every - 1 and i >= spec.dup_every:
        src = i - spec.dup_every
    fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
    g = grid_for(i, spec)
    return codecs.decode(codecs.encode(g, fmt), fmt, spec.w, spec.h)


def _grid(out_df, px_col="px"):
    rows = out_df.select("image_id", "ty0", "th", "w",
                         F.col(px_col).alias("px")).collect()
    rows.sort(key=lambda r: r.ty0)
    return np.vstack([
        np.asarray(r.px, dtype=np.float32).reshape(r.th, r.w) for r in rows
    ])


def _np_ndiff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ad, bd = a.astype(np.float64), b.astype(np.float64)
    bad = (ad == NODATA) | (bd == NODATA) | (ad + bd == 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = ((ad - bd) / (ad + bd)).astype(np.float32)
    out[bad] = np.float32(NODATA)
    return out


@pytest.mark.parametrize("tile_rows", [8, 13, 40])
def test_raster_calc_matches_numpy_bitwise(spark, images_df, tile_rows):
    spec = CorpusSpec(n_images=6, w=48, h=40, nodata_every=3)
    tiles = decode_tiles(images_df, tile_rows=tile_rows)
    out = raster_calc(tiles, A_ID, B_ID, ops=("ndiff", "add"))
    a, b = _decoded(0, spec), _decoded(5, spec)

    got = _grid(out, "px_ndiff")
    want = _np_ndiff(a, b)
    assert got.shape == want.shape
    assert np.array_equal(got, want), "ndiff must be bit-identical"

    got_add = _grid(out, "px_add")
    ad, bd = a.astype(np.float64), b.astype(np.float64)
    want_add = (ad + bd).astype(np.float32)
    want_add[(ad == NODATA) | (bd == NODATA)] = np.float32(NODATA)
    assert np.array_equal(got_add, want_add)
    # the corpus B image really carries NODATA -> propagation exercised
    assert (want == np.float32(NODATA)).any()


def test_raster_calc_rejects_shape_mismatch(spark, images_df):
    tiles = decode_tiles(images_df, tile_rows=8)
    b_half = crop_tiles(tiles.filter(F.col("image_id") == B_ID),
                        0, 0, 40, 24)  # w=24 vs A's 48
    mixed = (tiles.filter(F.col("image_id") == A_ID).select(*TILE_COLS)
             .unionByName(b_half.select(*TILE_COLS)))
    bad = raster_calc(mixed, A_ID, B_ID, ops=("add",))
    with pytest.raises(Exception, match="band shapes differ|ASSERT"):
        bad.collect()


def test_raster_calc_unknown_op_raises(spark, images_df):
    with pytest.raises(ValueError, match="unsupported op"):
        raster_calc(decode_tiles(images_df), A_ID, B_ID, ops=("pow",))


@pytest.mark.parametrize("tile_rows,win", [
    (8, (5, 7, 20, 9)),     # window split across 3 bands
    (13, (5, 7, 20, 9)),    # odd tiling, same answer
    (40, (0, 0, 40, 48)),   # identity crop, single band
    (8, (39, 47, 1, 1)),    # 1x1 bottom-right corner
])
def test_crop_matches_numpy_bitwise(spark, images_df, tile_rows, win):
    spec = CorpusSpec(n_images=6, w=48, h=40, nodata_every=3)
    r0, c0, ch, cw = win
    out = crop_tiles(decode_tiles(images_df, tile_rows=tile_rows),
                     r0, c0, ch, cw)
    got = _grid(out.filter(F.col("image_id") == A_ID))
    want = _decoded(0, spec)[r0:r0 + ch, c0:c0 + cw]
    assert got.shape == want.shape and np.array_equal(got, want)


def test_crop_geo_headers_rebased(spark, images_df):
    tiles = decode_tiles(images_df, tile_rows=8)
    src = tiles.filter(F.col("image_id") == A_ID).first()
    out = crop_tiles(tiles, 5, 7, 20, 9).filter(
        F.col("image_id") == A_ID).first()
    assert out.w == 9 and out.h == 20
    assert out.x0 == src.x0 + 7 * src.cellsize
    assert out.y0 == src.y0 + 5 * src.cellsize  # south-up: row 0 at y0
    assert out.cellsize == src.cellsize


def test_crop_plan_is_narrow_and_pruned(spark, images_df):
    out = crop_tiles(decode_tiles(images_df, tile_rows=8), 5, 7, 20, 9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"crop must be shuffle-free:\n{plan}"


def test_crop_out_of_extent_raises(spark, images_df):
    out = crop_tiles(decode_tiles(images_df, tile_rows=8), 30, 0, 20, 9)
    with pytest.raises(Exception, match="exceeds the raster extent|ASSERT"):
        out.collect()


def test_crop_rejects_bad_window_args(spark, images_df):
    with pytest.raises(ValueError):
        crop_tiles(decode_tiles(images_df), -1, 0, 5, 5)
    with pytest.raises(ValueError):
        crop_tiles(decode_tiles(images_df), 0, 0, 0, 5)


def test_scale_stretch_levels_and_edges(spark, images_df):
    from pycuda_raster_spark.operators.calc import scale_tiles

    spec = CorpusSpec(n_images=6, w=48, h=40, nodata_every=3)
    out = scale_tiles(decode_tiles(images_df, tile_rows=13))
    got = _grid(out.filter(F.col("px").isNotNull() &
                           (F.col("image_id") == B_ID)))
    src = _decoded(5, spec)
    valid = src != NODATA
    lo, hi = src[valid].min(), src[valid].max()
    # integer levels spanning the full range; NODATA passes through
    assert got[src == NODATA].tolist() == [np.float32(NODATA)] * int(
        (~valid).sum())
    gv = got[valid]
    assert gv.min() == 0.0 and gv.max() == 255.0
    assert np.array_equal(gv, np.float32(np.round(gv)))
    # the engine's exact formula on the extrema maps to the endpoints
    assert got[src == lo].min() == 0.0 and got[src == hi].max() == 255.0


def test_scale_stretch_flat_image(spark):
    import pandas as pd

    flat = np.full(12, 7.5, dtype=np.float32)
    tiles = spark.createDataFrame(pd.DataFrame({
        "image_id": ["flat"], "tile_y": [0], "ty0": [0], "th": [3],
        "w": [4], "h": [3], "cellsize": [1.0], "x0": [0.0], "y0": [0.0],
        "crs": ["EPSG:4326"], "px": [flat.tolist()],
    }))
    from pycuda_raster_spark.operators.calc import scale_tiles

    r = scale_tiles(tiles).collect()[0]
    assert r.px == [0.0] * 12  # degenerate range maps valid cells to lo_out


def test_cli_crop_then_products(spark, images_df, tmp_path):
    """--crop composes the srcwin cut with the product pipeline (same
    runner as --resample/--warp): slope on the cropped grid equals slope
    of the NumPy-cropped source."""
    from pycuda_raster_spark.__main__ import main
    from pycuda_raster_spark.functions.focal_kernels import horn_products

    spec = CorpusSpec(n_images=6, w=48, h=40, nodata_every=3)
    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out_s = str(tmp_path / "slope")
    out_d = str(tmp_path / "dem")
    assert main([inp, out_s, "slope", out_d, "dem",
                 "--crop=5,7,20x9", "--tile-rows=16", "--cores=4"]) == 0

    dem = _grid(spark.read.parquet(out_d)
                .withColumnRenamed("dem", "px")
                .filter(F.col("image_id") == A_ID))
    src = _decoded(0, spec)[5:25, 7:16]
    assert np.array_equal(dem, src)

    got = _grid(spark.read.parquet(out_s)
                .withColumnRenamed("slope", "px")
                .filter(F.col("image_id") == A_ID))
    cs = float(spark.read.parquet(out_d)
               .filter(F.col("image_id") == A_ID).first().cellsize)
    want, _, _ = horn_products(src, cs)
    assert np.array_equal(got, want)


def test_raster_calc_rejects_band_count_mismatch(spark, images_df):
    """B shorter than A with the SAME tiling: matched bands agree on
    th/w, so only the h-equality assert catches the mispair (previously
    A's tail bands were silently dropped)."""
    tiles = decode_tiles(images_df, tile_rows=8)
    b_short = crop_tiles(tiles.filter(F.col("image_id") == B_ID),
                         0, 0, 24, 48)  # h=24 vs A's 40, same w + tiling
    mixed = (tiles.filter(F.col("image_id") == A_ID).select(*TILE_COLS)
             .unionByName(b_short.select(*TILE_COLS)))
    bad = raster_calc(mixed, A_ID, B_ID, ops=("add",))
    with pytest.raises(Exception, match="band shapes differ|ASSERT"):
        bad.collect()


def test_crop_fully_off_grid_raises(spark, images_df):
    """A window entirely beyond the row extent must fail fast (the
    assert lives in the band filter, so it evaluates before every band
    is discarded), not silently return an empty DataFrame."""
    out = crop_tiles(decode_tiles(images_df, tile_rows=8), 100, 0, 5, 5)
    with pytest.raises(Exception, match="exceeds the raster extent|ASSERT"):
        out.collect()


# ------------------------------------------------- gdalinfo -hist / -stats


@pytest.mark.parametrize("tile_rows", [8, 13, 40])
def test_raster_histogram_vs_brute(spark, images_df, tile_rows):
    from pycuda_raster_spark.operators.calc import raster_histogram

    spec = CorpusSpec(n_images=6, w=48, h=40, nodata_every=3)
    bins, lo, hi = 16, 0.0, 256.0
    width = (hi - lo) / bins
    out = raster_histogram(decode_tiles(images_df, tile_rows=tile_rows),
                           bins=bins, lo=lo, hi=hi)
    got = {(r.image_id, r.bin): r.n for r in out.collect()}
    want = {}
    for i in range(spec.n_images):
        g = _decoded(i, spec)
        v = g[g != np.float32(NODATA)].astype(np.float64)
        b = np.clip(np.floor((v - lo) / width).astype(np.int64), 0,
                    bins - 1)
        for bb, n in zip(*np.unique(b, return_counts=True)):
            want[(f"img{i:06d}", int(bb))] = int(n)
    assert got == want and len(got) > 0


@pytest.mark.parametrize("tile_rows", [8, 40])
def test_raster_stats_vs_brute(spark, images_df, tile_rows):
    """Exact equality including mean/stddev: the engine folds in (r, c)
    order, which for a whole image is plain row-major order — the brute
    replays the identical sequential double chain."""
    import math

    from pycuda_raster_spark.operators.calc import raster_stats

    spec = CorpusSpec(n_images=6, w=48, h=40, nodata_every=3)
    out = raster_stats(decode_tiles(images_df, tile_rows=tile_rows))
    got = {r.image_id: (r.n_valid, r.vmin, r.vmax, r.mean, r.stddev)
           for r in out.collect()}
    for i in range(spec.n_images):
        g = _decoded(i, spec)
        vals = g[g != np.float32(NODATA)].astype(np.float64)
        s = 0.0
        sq = 0.0
        for v in vals:
            s += float(v)
            sq += float(v) * float(v)
        n = float(len(vals))
        mean = s / n
        var = max(0.0, sq / n - mean * mean)
        want = (len(vals), float(vals.min()), float(vals.max()),
                mean, math.sqrt(var))
        assert got[f"img{i:06d}"] == want, f"img{i} tr={tile_rows}"


def test_raster_stats_constant_grid_zero_stddev(spark):
    """A constant grid's variance rounds to exactly 0 through the clamp."""
    from pycuda_raster_spark.operators.calc import raster_stats
    from pycuda_raster_spark.fixtures import IMAGES_DDL
    from pycuda_raster_spark.functions import codecs

    g = np.full((16, 16), 7.25, dtype=np.float32)
    row = {"image_id": "const", "bytes": bytearray(codecs.encode(g, "raw")),
           "w": 16, "h": 16, "fmt": "raw", "caption": "", "phash": 0}
    df = spark.createDataFrame([row])
    out = raster_stats(decode_tiles(df, tile_rows=8)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_valid, r.vmin, r.vmax, r.mean, r.stddev) == (
        256, 7.25, 7.25, 7.25, 0.0)
