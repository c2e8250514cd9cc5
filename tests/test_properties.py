"""Property-based tests (hypothesis) — pure-NumPy invariants, no Spark.

Beyond the reference's golden-comparison methodology (SURVEY.md §5 notes
it had no property tests): codec roundtrips on arbitrary grids, cell-index
containment/hierarchy laws, and halo-split invariance at arbitrary split
points.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pycuda_raster_spark.fixtures import point_in_ring
from pycuda_raster_spark.functions import cellindex as ci
from pycuda_raster_spark.functions.codecs import NODATA, decode, encode, psnr
from pycuda_raster_spark.functions.focal_kernels import horn_products, oracle_whole_grid


@st.composite
def grids(draw, max_h=24, max_w=24):
    h = draw(st.integers(3, max_h))
    w = draw(st.integers(3, max_w))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    g = rng.uniform(-1000, 1000, size=(h, w)).astype(np.float32)
    if draw(st.booleans()):
        y, x = draw(st.integers(0, h - 1)), draw(st.integers(0, w - 1))
        g[y, x] = NODATA
    return g


@given(grids())
@settings(max_examples=40, deadline=None)
def test_raw_roundtrip_any_grid(g):
    assert np.array_equal(decode(encode(g, "raw"), "raw", g.shape[1], g.shape[0]), g)


@given(grids())
@settings(max_examples=25, deadline=None)
def test_q8_psnr_and_nodata_any_grid(g):
    out = decode(encode(g, "q8"), "q8", g.shape[1], g.shape[0])
    assert np.array_equal(out == NODATA, g == NODATA)
    valid = g != NODATA
    if valid.sum() >= 2 and g[valid].ptp() > 1e-3:
        assert psnr(g, out) >= 40.0


@given(grids(max_h=40, max_w=16), st.integers(1, 38))
@settings(max_examples=40, deadline=None)
def test_halo_split_invariance_any_split(g, cut):
    """Splitting at ANY row with 1-row halos == whole-grid result."""
    h = g.shape[0]
    cut = min(max(cut, 1), h - 1)
    whole = oracle_whole_grid(g, 2.0)
    s1, a1, h1 = horn_products(g[:cut], 2.0, halo_top=None, halo_bot=g[cut])
    s2, a2, h2 = horn_products(g[cut:], 2.0, halo_top=g[cut - 1], halo_bot=None)
    assert np.array_equal(np.vstack([s1, s2]), whole["slope"])
    assert np.array_equal(np.vstack([a1, a2]), whole["aspect"])
    assert np.array_equal(np.vstack([h1, h2]), whole["hillshade"])


@given(st.floats(0, ci.WORLD - 1e-6), st.floats(0, ci.WORLD - 1e-6),
       st.integers(0, 26))
@settings(max_examples=200, deadline=None)
def test_cell_contains_point_and_parent_contains_cell(x, y, res):
    c = ci.cell(x, y, res)
    x0, y0, x1, y1 = ci.cell_bounds(np.int64(c))
    assert x0 <= x < x1 and y0 <= y < y1
    if res > 0:
        p = ci.parent(np.int64(c))
        px0, py0, px1, py1 = ci.cell_bounds(np.int64(p))
        assert px0 <= x0 and py0 <= y0 and px1 >= x1 and py1 >= y1
        assert int(c) in {int(v) for v in ci.children(np.int64(p))}


@given(st.integers(0, 2**31 - 1), st.integers(3, 10))
@settings(max_examples=50, deadline=None)
def test_pip_matches_matplotlib_free_winding_on_convex(seed, nv):
    """On convex polygons, even-odd ray cast == sign-of-cross-product test."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    cx, cy, r = 50.0, 50.0, 20.0
    ring = [{"x": cx + r * np.cos(a), "y": cy + r * np.sin(a)} for a in ang]
    if len({(v["x"], v["y"]) for v in ring}) < 3:
        return
    px = rng.uniform(20, 80, 100)
    py = rng.uniform(20, 80, 100)
    got = point_in_ring(px, py, ring)
    xs = np.array([v["x"] for v in ring])
    ys = np.array([v["y"] for v in ring])
    # convex winding: inside iff all cross products positive (CCW ring)
    inside = np.ones(len(px), dtype=bool)
    for i in range(len(xs)):
        j = (i + 1) % len(xs)
        cr = (xs[j] - xs[i]) * (py - ys[i]) - (ys[j] - ys[i]) * (px - xs[i])
        inside &= cr > 0
    # boundary-adjacent points may disagree; compare away from edges
    d = np.abs(np.hypot(px - cx, py - cy) - r)
    far = d > 1e-6
    assert np.array_equal(got[far], inside[far])
