"""Spatial join correctness vs brute-force NumPy goldens (SURVEY.md §5.5).

Bit-for-bit on join rows (B:6): the engine's PIP/kNN output row sets must
equal the O(N*M) golden sets exactly.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import (
    build_points,
    build_zones,
    golden_knn,
    golden_pip,
)
from pycuda_raster_spark.operators.spatial import (
    knn_join,
    pip_join,
    range_join,
    with_cell,
)

RES = 6


@pytest.fixture(scope="module")
def zones(spark):
    return spark.createDataFrame(build_zones(10, res=RES)).cache()


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(build_points(800, res=RES)).cache()


def test_pip_join_bit_for_bit(spark, zones, points):
    got = {(r.point_id, r.zone_id) for r in pip_join(points, zones).collect()}
    want = golden_pip(build_points(800, res=RES), build_zones(10, res=RES))
    assert got == want


def test_pip_join_without_precomputed_cell(spark, zones, points):
    got = {
        (r.point_id, r.zone_id)
        for r in pip_join(points.drop("cell"), zones, res=RES).collect()
    }
    want = golden_pip(build_points(800, res=RES), build_zones(10, res=RES))
    assert got == want


def test_knn_join_exact_vs_golden(spark, points):
    """kNN with a deliberately tiny ring: the exact-fallback path must
    still produce the brute-force answer (rank ties broken by site id)."""
    pts = build_points(120, res=RES)
    sites = [
        {"site_id": f"s{i:03d}", "x": float(3 + i * 7.3) % 350.0, "y": float(11 + i * 13.7) % 350.0}
        for i in range(60)
    ]
    q = spark.createDataFrame(pts).limit(120)
    s = spark.createDataFrame(sites)
    got = knn_join(q, s, k=3, res=RES, ring=1).collect()
    want = golden_knn(pts, [{"id": r["site_id"], **r} for r in sites], k=3)
    got_set = {(r.point_id, r.site_id, r.rank) for r in got}
    want_set = {(p, s_, r) for p, s_, r, _ in want}
    assert got_set == want_set
    # distances match to float tolerance
    gd = {(r.point_id, r.site_id): r.dist for r in got}
    for p, s_, _, d in want:
        assert abs(gd[(p, s_)] - d) < 1e-9


def test_range_join_exact(spark, points):
    pts = build_points(200, res=RES)
    radius = 5.0
    df = spark.createDataFrame(pts)
    got = {
        (r.point_id, r.site_id)
        for r in range_join(
            df, df.withColumnRenamed("point_id", "site_id"), radius, res=RES
        ).collect()
    }
    xs = np.array([p["x"] for p in pts])
    ys = np.array([p["y"] for p in pts])
    ids = [p["point_id"] for p in pts]
    want = set()
    for i in range(len(pts)):
        d = np.hypot(xs - xs[i], ys - ys[i])
        for j in np.nonzero(d <= radius)[0]:
            want.add((ids[i], ids[int(j)]))
    assert got == want


def test_knn_broadcast_and_skew_plan(spark, points):
    """Plan sanity: candidate join must not degenerate to cartesian, and
    the pip broadcast hint must produce a BroadcastHashJoin."""
    zones_df = spark.createDataFrame(build_zones(10, res=RES))
    plan = pip_join(points, zones_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
