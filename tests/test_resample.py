"""Distributed resample vs whole-grid oracle (SURVEY.md §2 warp gap).

The tiled engine output must equal ``resample_grid`` (the untiled NumPy
oracle) BIT-FOR-BIT across tilings — same golden methodology as the focal
suite. Bilinear's fixed fold order + float32 cast makes equality exact,
not allclose.
"""

import numpy as np
import pytest

from pycuda_raster_spark.fixtures import FMT_CYCLE, CorpusSpec, build_images, grid_for
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.resample import (
    NODATA,
    resample_grid,
    resample_tiles,
)

SPEC = CorpusSpec(n_images=8, w=48, h=40)


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


def _decoded(i: int) -> np.ndarray:
    """What the engine's decode produces (codec roundtrip, as the corpus
    ground truth does) — the oracle input."""
    src = i
    if SPEC.dup_every and i % SPEC.dup_every == SPEC.dup_every - 1 and i >= SPEC.dup_every:
        src = i - SPEC.dup_every
    fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
    g = grid_for(i, SPEC)
    return codecs.decode(codecs.encode(g, fmt), fmt, SPEC.w, SPEC.h)


def _collect_grids(out_df):
    rows = out_df.select("image_id", "ty0", "th", "w", "h", "px").collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r)
    grids = {}
    for iid, tiles in per.items():
        tiles.sort(key=lambda r: r.ty0)
        assert sum(t.th for t in tiles) == tiles[0].h
        grids[iid] = np.vstack(
            [np.asarray(t.px, dtype=np.float32).reshape(t.th, t.w) for t in tiles]
        )
    return grids


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
@pytest.mark.parametrize("out_dims,tile_rows,out_tile_rows", [
    ((24, 20), 8, 8),    # downsample both axes
    ((24, 20), 13, 5),   # odd tilings, same answer
    ((97, 63), 8, 8),    # upsample both axes (non-integer ratios)
    ((40, 48), 40, 8),   # transpose-shaped, single input tile
])
def test_tiled_resample_matches_oracle(spark, images_df, method,
                                       out_dims, tile_rows, out_tile_rows):
    out_h, out_w = out_dims
    tiles = decode_tiles(images_df, tile_rows=tile_rows)
    got = _collect_grids(resample_tiles(
        tiles, out_h, out_w, method=method, out_tile_rows=out_tile_rows))
    assert set(got) == {f"img{i:06d}" for i in range(SPEC.n_images)}
    for i in range(SPEC.n_images):
        want = resample_grid(_decoded(i), out_h, out_w, method=method)
        np.testing.assert_array_equal(
            got[f"img{i:06d}"], want,
            err_msg=f"img{i} {method} {out_dims} tr={tile_rows}")


def test_identity_resample_is_exact_copy(spark, images_df):
    tiles = decode_tiles(images_df, tile_rows=8)
    for method in ("nearest", "bilinear"):
        got = _collect_grids(resample_tiles(tiles, SPEC.h, SPEC.w, method=method))
        for i in range(SPEC.n_images):
            np.testing.assert_array_equal(got[f"img{i:06d}"], _decoded(i), method)


def test_bilinear_nodata_poison_semantics():
    """A sentinel corner poisons only output pixels it touches with
    NONZERO weight: exact-integer sample positions never read the
    neighboring row/col, so identity bilinear of a grid with NODATA is
    still the identity."""
    g = np.arange(16, dtype=np.float32).reshape(4, 4) + 1
    g[1, 1] = NODATA
    np.testing.assert_array_equal(resample_grid(g, 4, 4, "bilinear"), g)
    up = resample_grid(g, 8, 8, "bilinear")
    # every 2x upsampled pixel whose 4-corner stencil touches (1,1) with
    # weight > 0 is NODATA; brute-force the expectation
    for R in range(8):
        for C in range(8):
            num_r = np.clip((2 * R + 1) * 4 - 8, 0, 16 * 3)
            num_c = np.clip((2 * C + 1) * 4 - 8, 0, 16 * 3)
            r0, fr = num_r // 16, (num_r % 16) / 16.0
            c0, fc = num_c // 16, (num_c % 16) / 16.0
            corners = [(r0, c0, (1 - fr) * (1 - fc)),
                       (r0, min(c0 + 1, 3), (1 - fr) * fc),
                       (min(r0 + 1, 3), c0, fr * (1 - fc)),
                       (min(r0 + 1, 3), min(c0 + 1, 3), fr * fc)]
            touches = any(rr == 1 and cc == 1 and wgt > 0 for rr, cc, wgt in corners)
            assert (up[R, C] == np.float32(NODATA)) == touches, (R, C)


def test_geo_metadata_rescaled(spark, images_df):
    """Proportional 2x downsample: cellsize doubles, x0/y0 (and hence the
    extent) are preserved; crs rides through."""
    tiles = decode_tiles(images_df, tile_rows=8)
    row = (resample_tiles(tiles, SPEC.h // 2, SPEC.w // 2)
           .filter("image_id = 'img000000' and tile_y = 0").first())
    src = tiles.filter("image_id = 'img000000'").first()
    assert row.cellsize == src.cellsize * 2
    assert (row.x0, row.y0) == (src.x0, src.y0)
    assert row.crs == src.crs
    assert (row.h, row.w) == (SPEC.h // 2, SPEC.w // 2)


def test_resample_plan_is_jvm_routed(spark, images_df):
    """Routing (explode + band intersection + slice) must be pure Column
    expressions: exactly one Python stage (the grouped assemble), no
    row-at-a-time BatchEvalPython anywhere."""
    tiles = decode_tiles(images_df, tile_rows=8)
    plan = resample_tiles(tiles, 24, 20, method="bilinear")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan
