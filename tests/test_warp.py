"""Axis-aligned affine warp vs whole-grid oracle (VERDICT r3 #6).

Same golden methodology as the resample suite: the tiled engine output
must equal ``warp_affine_grid`` (the untiled NumPy twin) BIT-FOR-BIT
across tilings — the fixed op order + float32 cast makes equality exact.
Out-of-extent destination pixels are NODATA (the warp never clamps into
the source), and bilinear NODATA poison follows the resample rule.
"""

import numpy as np
import pytest

from pycuda_raster_spark.fixtures import FMT_CYCLE, CorpusSpec, build_images, grid_for
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.warp import (
    NODATA,
    warp_affine_grid,
    warp_affine_tiles,
)

SPEC = CorpusSpec(n_images=6, w=48, h=40)


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


WARPS = {
    # (out_h, out_w, dcell, dx_off, dy_off, affine)
    "shift_downscale": (20, 24, 1.7, 3.2, 1.6, (1.0, 0.0, 1.0, 0.0)),
    "beyond_extent": (30, 30, 2.0, -8.0, -8.0, (1.0, 0.0, 1.0, 0.0)),
    "unit_affine": (24, 24, 0.9, 0.0, 0.0, (2.0, -3.0, 2.0, -5.0)),
}


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
@pytest.mark.parametrize("warp", list(WARPS))
@pytest.mark.parametrize("tile_rows,out_tile_rows", [(8, 8), (13, 5)])
def test_tiled_warp_matches_oracle(spark, images_df, method, warp,
                                   tile_rows, out_tile_rows):
    out_h, out_w, dcell, dx, dy, aff = WARPS[warp]
    tiles = decode_tiles(images_df, tile_rows=tile_rows)
    got = _collect_grids(warp_affine_tiles(
        tiles, out_h, out_w, dcell, dx_off=dx, dy_off=dy, affine=aff,
        method=method, out_tile_rows=out_tile_rows))
    assert set(got) == {f"img{i:06d}" for i in range(SPEC.n_images)}
    src = {r.image_id: r for r in
           decode_tiles(images_df, tile_rows=SPEC.h).collect()}
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        s = src[iid]
        want = warp_affine_grid(
            _decoded(i), out_h, out_w, dcell, x0=s.x0, y0=s.y0,
            cellsize=s.cellsize, dx_off=dx, dy_off=dy, affine=aff,
            method=method)
        np.testing.assert_array_equal(
            got[iid], want, err_msg=f"{iid} {method} {warp} tr={tile_rows}")


def test_identity_warp_is_exact_copy(spark, images_df):
    """dcell == cellsize, zero offsets, identity affine: the warp is the
    identity for both methods (integer sample positions, zero fracs)."""
    tiles = decode_tiles(images_df, tile_rows=8)
    first = tiles.filter("image_id = 'img000000'").first()
    cs = float(first.cellsize)
    for method in ("nearest", "bilinear"):
        got = _collect_grids(
            warp_affine_tiles(tiles, SPEC.h, SPEC.w, cs, method=method))
        for i in range(SPEC.n_images):
            np.testing.assert_array_equal(got[f"img{i:06d}"], _decoded(i), method)


def test_out_of_extent_is_nodata():
    g = np.arange(12, dtype=np.float32).reshape(3, 4) + 1.0
    # dest grid twice the source extent, centered on it
    out = warp_affine_grid(g, 6, 8, 1.0, dx_off=-2.0, dy_off=-2.0,
                           cellsize=1.0, method="nearest")
    inside = out != np.float32(NODATA)
    # the interior block must be the source values, the halo NODATA
    assert inside.sum() == 12
    np.testing.assert_array_equal(out[inside].reshape(3, 4), g)


def test_warp_dest_crs_and_geo_metadata(spark, images_df):
    tiles = decode_tiles(images_df, tile_rows=8)
    row = (warp_affine_tiles(tiles, 10, 12, 2.5, dx_off=1.0, dy_off=-2.0,
                             dest_crs="EPSG:3857")
           .filter("image_id = 'img000000' and tile_y = 0").first())
    src = tiles.filter("image_id = 'img000000'").first()
    assert row.cellsize == 2.5
    assert row.x0 == src.x0 + 1.0 and row.y0 == src.y0 - 2.0
    assert row.crs == "EPSG:3857"
    assert (row.h, row.w) == (10, 12)


def test_warp_plan_is_jvm_routed(spark, images_df):
    tiles = decode_tiles(images_df, tile_rows=8)
    plan = warp_affine_tiles(tiles, 24, 20, 1.3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan
