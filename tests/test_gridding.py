"""gdal_grid invdist parity: the JVM bucket-join + sorted-fold operator
== a sequential Python reference EXACTLY (plain + and / are correctly
rounded, and both fold in point_id order). Covers random point sets,
exact cell-center hits (min point_id wins), empty cells -> NODATA,
power=1 (sqrt path), rejected powers, and bucket-boundary points."""

import math

import numpy as np
import pytest

from pycuda_raster_spark.operators.gridding import NODATA, grid_idw


def idw_ref(pts, x0, y0, cs, h, w, R, power=2):
    """Sequential reference: candidates ordered by point_id, one fold."""
    out = np.full((h, w), NODATA, dtype=np.float64)
    for r in range(h):
        for c in range(w):
            cx = x0 + (float(c) + 0.5) * cs
            cy = y0 + (float(r) + 0.5) * cs
            num = 0.0
            den = 0.0
            hit = None
            for pid, x, y, z in pts:  # pts sorted by pid
                d2 = (cx - x) * (cx - x) + (cy - y) * (cy - y)
                if d2 > R * R:
                    continue
                if d2 == 0.0:
                    if hit is None:
                        hit = z
                    continue
                dd = d2 if power == 2 else math.sqrt(d2)
                num = num + z / dd
                den = den + 1.0 / dd
            if hit is not None:
                out[r, c] = hit
            elif den > 0.0:
                out[r, c] = num / den
    return out


def _pts(seed, n=60, ext=20.0):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, ext, n)
    ys = rng.uniform(0, ext, n)
    zs = xs * 0.5 + ys * 0.25
    return [(i, float(xs[i]), float(ys[i]), float(zs[i]))
            for i in range(n)]


def _run(spark, pts, **kw):
    df = spark.createDataFrame(
        [(p[0], p[1], p[2], p[3]) for p in pts],
        "point_id long, x double, y double, z double")
    rows = grid_idw(spark, df, **kw).collect()
    h, w = kw["out_h"], kw["out_w"]
    out = np.full((h, w), np.nan)
    for r in rows:
        out[r["r"], r["c"]] = r["z"]
    assert not np.isnan(out).any()
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_points_exact(spark, seed):
    pts = _pts(seed)
    kw = dict(x0=0.0, y0=0.0, cellsize=2.0, out_h=12, out_w=12, radius=3.0)
    got = _run(spark, pts, **kw)
    want = idw_ref(pts, 0.0, 0.0, 2.0, 12, 12, 3.0)
    assert np.array_equal(got, want)  # bit-exact, NODATA included


def test_power_one_sqrt_path(spark):
    pts = _pts(3, n=40)
    kw = dict(x0=0.0, y0=0.0, cellsize=2.0, out_h=10, out_w=10,
              radius=4.0, power=1)
    got = _run(spark, pts, **kw)
    want = idw_ref(pts, 0.0, 0.0, 2.0, 10, 10, 4.0, power=1)
    assert np.array_equal(got, want)


def test_exact_hit_smallest_pid_wins(spark):
    # two points exactly on the cell (1,1) center (3.0, 3.0)
    pts = [(5, 3.0, 3.0, 111.0), (2, 3.0, 3.0, 222.0),
           (9, 4.0, 4.0, 7.0)]
    pts_sorted = sorted(pts)
    got = _run(spark, pts, x0=0.0, y0=0.0, cellsize=2.0, out_h=3,
               out_w=3, radius=2.0)
    want = idw_ref(pts_sorted, 0.0, 0.0, 2.0, 3, 3, 2.0)
    assert got[1, 1] == 222.0  # pid 2 beats pid 5
    assert np.array_equal(got, want)


def test_empty_cells_nodata(spark):
    pts = [(0, 1.0, 1.0, 5.0)]
    got = _run(spark, pts, x0=0.0, y0=0.0, cellsize=2.0, out_h=4,
               out_w=4, radius=1.5)
    assert got[0, 0] == 5.0  # center (1,1), d=0 -> exact hit
    assert got[3, 3] == NODATA


def test_bucket_boundary_inclusion(spark):
    """A point exactly radius away in x sits one bucket over; the 3x3
    expansion must still find it (d2 == R^2 is included)."""
    pts = [(0, 4.0, 1.0, 10.0)]
    got = _run(spark, pts, x0=0.0, y0=0.0, cellsize=2.0, out_h=1,
               out_w=1, radius=3.0)
    # cell center (1.0, 1.0), d = 3.0 == R -> included; value is the
    # single-point IDW fold (z/d2)/(1/d2), NOT exactly z in floats
    want = idw_ref(pts, 0.0, 0.0, 2.0, 1, 1, 3.0)
    assert want[0, 0] != NODATA
    assert np.array_equal(got, want)


def test_plan_bucket_equi_join_not_cartesian(spark):
    """The cells-to-points join must be an equi (hash/SMJ) join on the
    bucket id — never a cartesian / nested-loop product."""
    pts = _pts(0, n=30)
    df = spark.createDataFrame(
        [(p[0], p[1], p[2], p[3]) for p in pts],
        "point_id long, x double, y double, z double")
    plan = grid_idw(spark, df, 0.0, 0.0, 2.0, 8, 8, 3.0)._jdf \
        .queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE double-count guard
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_rejected_power(spark):
    df = spark.createDataFrame([(0, 1.0, 1.0, 5.0)],
                               "point_id long, x double, y double, z double")
    with pytest.raises(ValueError, match="powers 1 and 2"):
        grid_idw(spark, df, 0.0, 0.0, 1.0, 2, 2, 1.0, power=3)
