"""Analytic property tests for the Horn kernels (SURVEY.md §5.3)."""

import numpy as np

from pycuda_raster_spark.functions.focal_kernels import (
    FLAT_ASPECT,
    NODATA,
    horn_products,
    oracle_whole_grid,
)


def test_constant_plane_slope_zero():
    g = np.full((16, 20), 42.0, dtype=np.float32)
    s, a, h = horn_products(g, cellsize=1.0)
    inner = (slice(1, -1), slice(1, -1))
    assert (s[inner] == 0.0).all()
    assert (a[inner] == FLAT_ASPECT).all()
    # edges are NODATA (one-ring policy)
    assert (s[0] == NODATA).all() and (s[-1] == NODATA).all()
    assert (s[:, 0] == NODATA).all() and (s[:, -1] == NODATA).all()


def test_inclined_plane_analytic():
    ax, ay = 0.3, 0.4
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
    cs = 2.0
    g = (ax * xx * cs + ay * yy * cs).astype(np.float32)
    s, a, h = horn_products(g, cellsize=cs)
    inner = (slice(1, -1), slice(1, -1))
    expect = np.degrees(np.arctan(np.hypot(ax, ay)))
    assert np.allclose(s[inner], expect, atol=1e-4)
    # aspect constant on a plane; dzdy uses south-up rows so downslope
    # direction is atan2-derived — just require constancy + range
    vals = np.unique(np.round(a[inner], 3))
    assert len(vals) == 1 and 0.0 <= vals[0] < 360.0


def test_nodata_dilates_one_cell():
    g = np.full((20, 20), 10.0, dtype=np.float32)
    g[10, 10] = NODATA
    s, _, _ = horn_products(g, cellsize=1.0)
    assert (s[9:12, 9:12] == NODATA).all()
    assert s[8, 8] != NODATA and s[12, 12] != NODATA


def test_halo_rows_equal_whole_grid():
    """Splitting a grid into two row-chunks with 1-row halos must equal the
    whole-grid result — the reference's core invariant (B:6)."""
    rng = np.random.default_rng(7)
    g = rng.uniform(0, 100, size=(30, 17)).astype(np.float32)
    whole = oracle_whole_grid(g, 1.5)
    top, bot = g[:14], g[14:]
    s1, a1, h1 = horn_products(top, 1.5, halo_top=None, halo_bot=g[14])
    s2, a2, h2 = horn_products(bot, 1.5, halo_top=g[13], halo_bot=None)
    assert np.array_equal(np.vstack([s1, s2]), whole["slope"])
    assert np.array_equal(np.vstack([a1, a2]), whole["aspect"])
    assert np.array_equal(np.vstack([h1, h2]), whole["hillshade"])


def test_hillshade_range():
    rng = np.random.default_rng(8)
    g = np.cumsum(rng.uniform(-3, 3, size=(25, 25)), axis=0).astype(np.float32)
    _, _, h = horn_products(g, cellsize=1.0)
    valid = h[h != NODATA]
    assert valid.min() >= 0.0 and valid.max() <= 255.0
    assert np.array_equal(valid, np.rint(valid))
