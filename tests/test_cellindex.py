"""Cell-index invariants: encode/decode roundtrip, parent/child, k-ring."""

import numpy as np

from pycuda_raster_spark.functions.cellindex import (
    WORLD,
    cell,
    cell_bounds,
    cell_res,
    cell_to_ij,
    cells_covering_bbox,
    children,
    kring,
    parent,
)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    x, y = rng.uniform(0, WORLD, 1000), rng.uniform(0, WORLD, 1000)
    for res in (0, 3, 9, 15, 26):
        c = cell(x, y, res)
        assert (cell_res(c) == res).all()
        ix, iy = cell_to_ij(c)
        n = 1 << res
        assert (ix == np.clip((x / WORLD * n).astype(np.int64), 0, n - 1)).all()
        assert (iy == np.clip((y / WORLD * n).astype(np.int64), 0, n - 1)).all()


def test_point_in_own_cell_bounds():
    rng = np.random.default_rng(2)
    x, y = rng.uniform(0, WORLD, 500), rng.uniform(0, WORLD, 500)
    c = cell(x, y, 10)
    x0, y0, x1, y1 = cell_bounds(c)
    assert ((x >= x0) & (x < x1) & (y >= y0) & (y < y1)).all()


def test_parent_child():
    c = cell(123.456, 789.012, 8)
    p = parent(c)
    assert int(cell_res(p)) == 7
    kids = children(p)
    assert int(c) in set(int(k) for k in kids)
    assert len(set(int(k) for k in kids)) == 4
    # grandparent via steps=2
    assert int(parent(c, 2)) == int(parent(p))


def test_kring_contains_self_and_neighbors():
    c = cell(500.0, 500.0, 6)
    ring = set(int(v) for v in kring(c, 1))
    assert int(c) in ring
    assert len(ring) == 9  # interior cell
    # corner cell is clipped
    corner = cell(0.0, 0.0, 6)
    assert len(set(int(v) for v in kring(corner, 1))) == 4


def test_kring_vectorized_matches_scalar():
    rng = np.random.default_rng(3)
    x, y = rng.uniform(1, WORLD - 1, 50), rng.uniform(1, WORLD - 1, 50)
    c = cell(x, y, 7)
    mat = kring(c, 2)
    for i in range(len(c)):
        assert set(int(v) for v in mat[i]) == set(int(v) for v in kring(np.int64(c[i]), 2))


def test_bbox_cover_is_superset():
    cover = set(int(v) for v in cells_covering_bbox(10.0, 20.0, 55.0, 44.0, 7))
    rng = np.random.default_rng(4)
    px = rng.uniform(10.0, 55.0, 300)
    py = rng.uniform(20.0, 44.0, 300)
    assert set(int(v) for v in cell(px, py, 7)) <= cover
