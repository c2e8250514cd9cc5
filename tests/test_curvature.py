"""Zevenbergen-Thorne profile/plan curvature: tiled == whole-grid
kernel bit-for-bit at every tile height, analytic values on quadratic
surfaces (where the 9-point fit is exact), flat-window zeros, and the
one-ring NODATA policy."""

import numpy as np
import pytest

from pycuda_raster_spark.fixtures import CorpusSpec, build_images
from pycuda_raster_spark.functions.focal_kernels import (
    NODATA,
    curvature_products,
)
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.focal import curvature_tiles

SPEC = CorpusSpec(n_images=6, w=40, h=32)


def test_parabola_profile_exact():
    """z = x^2, cellsize 1: D=1, E=F=H=0, G=2x -> profile = -2 exactly,
    plan = 0, wherever x != 0 (binary-exact arithmetic throughout)."""
    xs = np.arange(-8, 9, dtype=np.float64)
    g = np.tile(xs * xs, (7, 1)).astype(np.float32)
    prof, plan = curvature_products(g, 1.0)
    interior = prof[1:-1, 1:-1]
    xcols = xs[1:-1]
    nz = xcols != 0
    assert (interior[:, nz] == np.float32(-2.0)).all()
    assert (plan[1:-1, 1:-1][:, nz] == 0.0).all()
    # at x == 0: G = H = 0 -> flat rule -> 0 by definition
    assert (interior[:, ~nz] == 0.0).all()


def test_flat_plane_zero():
    g = np.full((9, 9), 123.25, dtype=np.float32)
    prof, plan = curvature_products(g, 2.0)
    assert (prof[1:-1, 1:-1] == 0.0).all()
    assert (plan[1:-1, 1:-1] == 0.0).all()


def test_tilted_plane_zero():
    """A plane has zero curvature but nonzero gradient — exercises the
    den > 0 path with D = E = F = 0."""
    rr, cc = np.mgrid[0:9, 0:9]
    g = (rr * 2.0 + cc * 0.5).astype(np.float32)
    prof, plan = curvature_products(g, 1.0)
    assert (prof[1:-1, 1:-1] == 0.0).all()
    assert (plan[1:-1, 1:-1] == 0.0).all()


def test_nodata_one_ring():
    g = np.full((9, 9), 50.0, dtype=np.float32)
    g[4, 4] = NODATA
    prof, _ = curvature_products(g, 1.0)
    nd = prof == np.float32(NODATA)
    rr, cc = np.mgrid[0:9, 0:9]
    ring = (np.abs(rr - 4) <= 1) & (np.abs(cc - 4) <= 1)
    edge = (rr == 0) | (rr == 8) | (cc == 0) | (cc == 8)
    assert (nd == (ring | edge)).all()


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


@pytest.mark.parametrize("tile_rows", [4, 8, 32])
def test_tiled_equals_whole_grid(spark, images_df, tile_rows):
    from pycuda_raster_spark.functions.codecs import decode

    out = curvature_tiles(decode_tiles(images_df, tile_rows=tile_rows))
    rows = out.select("image_id", "ty0", "th", "w", "cellsize",
                      "curv_profile", "curv_plan").collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r)
    for row in images_df.select("image_id", "bytes", "fmt", "w",
                                "h").collect():
        g = decode(bytes(row.bytes), row.fmt, row.w, row.h)
        ts = sorted(per[row.image_id], key=lambda r: r.ty0)
        wp, wl = curvature_products(g, float(ts[0].cellsize))
        gp = np.vstack([np.asarray(t["curv_profile"], np.float32)
                        .reshape(t.th, t.w) for t in ts])
        gl = np.vstack([np.asarray(t["curv_plan"], np.float32)
                        .reshape(t.th, t.w) for t in ts])
        np.testing.assert_array_equal(gp, wp, err_msg=row.image_id)
        np.testing.assert_array_equal(gl, wl, err_msg=row.image_id)
