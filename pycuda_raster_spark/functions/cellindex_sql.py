"""JVM-side (Column-expression) cell index — zero-Python spatial encode.

The same quadtree/Morton index as functions/cellindex.py, expressed as
pure Spark Column arithmetic (shifts + masks + bitwise ops), so cell
assignment and k-ring expansion run inside whole-stage codegen with NO
Python worker in the plan. tests/test_cellindex_sql.py proves bit-equality
with the NumPy implementation across the whole world plane.

This matters twice at scale: (a) the encode is on the hot path of every
spatial join — per-row Python there is banned (B:15); (b) each removed
pandas-UDF stage removes an Arrow serialization boundary and a Python
worker pool from the plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cellindex import MAX_RES, WORLD

_FLAG = 1 << 62


def _spread_bits_expr(v: Column) -> Column:
    """Bit-spread: bit i of the low 32 bits -> bit 2i. Same magic-number
    ladder as the NumPy version, on a LongType column."""
    v = (v.bitwiseOR(F.shiftleft(v, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x3333333333333333))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x5555555555555555))
    return v


def _clip(i: Column, n: int) -> Column:
    return F.least(F.greatest(i, F.lit(0)), F.lit(n - 1))


def cell_ij_expr(x: Column, y: Column, res: int) -> tuple[Column, Column]:
    n = 1 << res
    ix = _clip(F.floor(x / F.lit(WORLD) * n).cast("long"), n)
    iy = _clip(F.floor(y / F.lit(WORLD) * n).cast("long"), n)
    return ix, iy


def cell_from_ij_expr(ix: Column, iy: Column, res: int) -> Column:
    m = _spread_bits_expr(ix).bitwiseOR(F.shiftleft(_spread_bits_expr(iy), 1))
    return F.lit(_FLAG).bitwiseOR(F.lit(res << 56)).bitwiseOR(m).cast("long")


def cell_expr(x: Column, y: Column, res: int) -> Column:
    """(x, y) world coords -> int64 cell id at ``res`` — pure Column math,
    bit-identical to functions.cellindex.cell."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    ix, iy = cell_ij_expr(x, y, res)
    return cell_from_ij_expr(ix, iy, res)


def point_in_ring_expr(px: Column, py: Column, ring: Column) -> Column:
    """Even-odd ray-cast containment test as a pure Column expression:
    edge list = zip(ring, ring rotated by one) -> per-edge crossing flags ->
    parity. Bit-compatible with fixtures.point_in_ring (same formula,
    including its +1e-300 denominator guard), so the JVM refine and the
    NumPy golden agree exactly. Whole-stage codegen; no Python.

    The crossing test's division only evaluates inside the CASE branch
    where (a.y > py) != (b.y > py) guarantees b.y != a.y.
    """
    n = F.size(ring)
    prev = F.concat(F.slice(ring, n, 1), F.slice(ring, 1, n - 1))
    crossings = F.zip_with(
        ring,
        prev,
        lambda a, b: F.when(
            (a["y"] > py) != (b["y"] > py),
            F.when(
                px < (b["x"] - a["x"]) * (py - a["y"]) / (b["y"] - a["y"] + F.lit(1e-300))
                + a["x"],
                F.lit(1),
            ).otherwise(F.lit(0)),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(crossings, F.lit(0), lambda acc, v: acc + v) % 2 == 1


def kring_from_xy_expr(x: Column, y: Column, res: int, k: int) -> Column:
    """array<long> of the (2k+1)^2 k-ring cells around (x, y)'s cell,
    clipped to the world plane, distinct — JVM-side candidate expansion
    for kNN/range joins (higher-order transform over a sequence literal,
    no Python)."""
    n = 1 << res
    ix, iy = cell_ij_expr(x, y, res)
    offs = F.sequence(F.lit(-k), F.lit(k))
    pairs = F.flatten(
        F.transform(
            offs,
            lambda dx: F.transform(
                offs,
                lambda dy: cell_from_ij_expr(_clip(ix + dx, n), _clip(iy + dy, n), res),
            ),
        )
    )
    return F.array_distinct(pairs)
