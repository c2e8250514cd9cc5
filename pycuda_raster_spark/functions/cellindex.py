"""Hierarchical grid cell index with an H3/S2-style API (SURVEY.md §2.6 op 32).

The north rule mandates H3/S2 cell indexing (BASELINE.json:14); the sandbox
has no ``h3`` library, so this is a deterministic hand-rolled quadtree index
over the engine's world plane [0, WORLD)² — Morton (Z-order) interleaved
bits, resolution-tagged 64-bit ids:

    id = (1 << 62) | (res << 56) | morton(ix, iy)      res in [0, 26]

API mirrors H3: ``cell(x, y, res)``, ``kring(cell, k)``, ``parent(cell)``,
``children(cell)``, ``cell_bounds(cell)``. Every function is vectorized
NumPy (batched encode per BASELINE.json:6 "assigned H3/S2 cells via batched
cell encode") — called only from pandas-UDF batches, never per row.
"""

from __future__ import annotations

import numpy as np

WORLD = 1024.0  # world plane is [0, WORLD) x [0, WORLD)
MAX_RES = 26
_FLAG = np.uint64(1) << np.uint64(62)

_U = np.uint64


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i lands at bit 2i."""
    v = v.astype(np.uint64)
    v = (v | (v << _U(16))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v << _U(8))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _U(2))) & _U(0x3333333333333333)
    v = (v | (v << _U(1))) & _U(0x5555555555555555)
    return v


def _squash_bits(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & _U(0x5555555555555555)
    v = (v | (v >> _U(1))) & _U(0x3333333333333333)
    v = (v | (v >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> _U(4))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v >> _U(8))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v >> _U(16))) & _U(0x00000000FFFFFFFF)
    return v


def cell_from_ij(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """(integer cell coords, res) -> int64 cell ids."""
    m = _spread_bits(np.asarray(ix, dtype=np.uint64)) | (
        _spread_bits(np.asarray(iy, dtype=np.uint64)) << _U(1)
    )
    cid = _FLAG | (_U(res) << _U(56)) | m
    return cid.view(np.int64) if isinstance(cid, np.ndarray) else np.int64(cid)


def cell(x, y, res: int):
    """Batched encode: world coords -> cell id at resolution ``res``.
    Scalars or arrays; clips to the world plane."""
    n = 1 << res
    ix = np.clip((np.asarray(x, dtype=np.float64) / WORLD * n).astype(np.int64), 0, n - 1)
    iy = np.clip((np.asarray(y, dtype=np.float64) / WORLD * n).astype(np.int64), 0, n - 1)
    out = cell_from_ij(ix, iy, res)
    return out if out.ndim else np.int64(out)


def cell_res(cid) -> np.ndarray:
    return ((np.asarray(cid).view(np.uint64) >> _U(56)) & _U(0x3F)).astype(np.int64)


def cell_to_ij(cid):
    """cell ids -> (ix, iy) integer coords at the cell's own resolution."""
    u = np.asarray(cid).view(np.uint64)
    m = u & _U((1 << 56) - 1)
    return _squash_bits(m).astype(np.int64), _squash_bits(m >> _U(1)).astype(np.int64)


def parent(cid, steps: int = 1):
    """Parent cell ``steps`` resolutions up (H3 cellToParent analogue)."""
    u = np.asarray(cid).view(np.uint64)
    res = cell_res(cid)
    new_res = np.maximum(res - steps, 0)
    ix, iy = cell_to_ij(cid)
    shift = (res - new_res).astype(np.int64)
    out = np.empty_like(np.asarray(cid, dtype=np.int64))
    flat_out = cell_from_ij(ix >> shift, iy >> shift, 0).view(np.uint64)
    # re-tag with per-element res (cell_from_ij tagged res=0)
    flat_out = (flat_out & ~(_U(0x3F) << _U(56))) | (new_res.astype(np.uint64) << _U(56))
    out = flat_out.view(np.int64)
    return out if np.asarray(cid).ndim else np.int64(out)


def children(cid) -> np.ndarray:
    """The 4 child cells one resolution down (scalar input)."""
    res = int(cell_res(cid))
    ix, iy = cell_to_ij(cid)
    ix, iy = int(ix) << 1, int(iy) << 1
    dx, dy = np.meshgrid([0, 1], [0, 1])
    return cell_from_ij(ix + dx.ravel(), iy + dy.ravel(), res + 1)


def kring(cid, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (includes the cell itself) —
    H3 gridDisk analogue. Scalar input -> flat array; array input ->
    (n, (2k+1)^2) matrix with out-of-world entries dropped only for
    scalar input (matrix form keeps duplicates of clipped edges)."""
    ix, iy = cell_to_ij(cid)
    res = cell_res(cid)
    n = (np.int64(1) << res.astype(np.int64))
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs)
    dx, dy = dx.ravel(), dy.ravel()
    if np.asarray(cid).ndim == 0:
        nx, ny = int(ix) + dx, int(iy) + dy
        ok = (nx >= 0) & (ny >= 0) & (nx < int(n)) & (ny < int(n))
        return cell_from_ij(nx[ok], ny[ok], int(res))
    nx = np.clip(ix[:, None] + dx[None, :], 0, (n - 1)[:, None])
    ny = np.clip(iy[:, None] + dy[None, :], 0, (n - 1)[:, None])
    r = np.broadcast_to(res[:, None], nx.shape)
    m = _spread_bits(nx.astype(np.uint64)) | (_spread_bits(ny.astype(np.uint64)) << _U(1))
    return (_FLAG | (r.astype(np.uint64) << _U(56)) | m).view(np.int64)


def cell_size(res: int) -> float:
    return WORLD / (1 << res)


def cell_bounds(cid):
    """cell -> (x0, y0, x1, y1) world-coordinate square."""
    ix, iy = cell_to_ij(cid)
    res = cell_res(cid)
    s = WORLD / (np.int64(1) << res.astype(np.int64)).astype(np.float64)
    return ix * s, iy * s, (ix + 1) * s, (iy + 1) * s


def cells_covering_bbox(x0: float, y0: float, x1: float, y1: float, res: int) -> np.ndarray:
    """All cells at ``res`` whose squares intersect the bbox — the
    filter-half cover set for filter-and-refine PIP joins (superset
    guarantee: any point inside the bbox maps to one of these cells)."""
    n = 1 << res
    s = WORLD / n
    ix0 = max(0, min(n - 1, int(np.floor(x0 / s))))
    iy0 = max(0, min(n - 1, int(np.floor(y0 / s))))
    ix1 = max(0, min(n - 1, int(np.floor(x1 / s))))
    iy1 = max(0, min(n - 1, int(np.floor(y1 / s))))
    gx, gy = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
    return cell_from_ij(gx.ravel(), gy.ravel(), res)
