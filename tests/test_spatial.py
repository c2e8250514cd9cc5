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


def test_knn_hot_cell_splits_under_aqe_and_stays_exact(spark):
    """Deliberately skewed corpus — 80% of queries AND sites in ONE cell —
    must (a) have its candidate join split by AQE (SortMergeJoin gains
    skew=true: the hot cell's shuffle partition is divided across tasks,
    no single-task straggler) and (b) still produce the brute-force kNN
    answer exactly. This is the 100 TB posture for spatially clumped data
    (cities, coastlines): the equi-join key is splittable BECAUSE the
    site side can be replicated per split, which AQE does for free."""
    from pycuda_raster_spark.functions import cellindex

    cs = cellindex.cell_size(RES)
    rng = np.random.default_rng(9)

    def pts(n):
        hot = rng.uniform(0.1 * cs, 0.9 * cs, size=(int(n * 0.8), 2))
        cold = rng.uniform(0.0, 100.0 * cs, size=(n - len(hot), 2))
        return np.vstack([hot, cold])

    qxy, sxy = pts(6000), pts(600)
    q = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(qxy)],
        "point_id long, x double, y double")
    s = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(sxy)],
        "site_id long, x double, y double")

    conf = spark.conf
    saved = {k: conf.get(k, None) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled")}
    try:
        # scale AQE's skew thresholds down to test-corpus size (the
        # defaults are 256MB-class; the mechanism is identical)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        out = knn_join(q, s, k=3, res=RES, ring=1)
        got = {(r.point_id, r.site_id, r.rank) for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            conf.unset(k) if v is None else conf.set(k, v)
    # the invariant is the MECHANISM — AQE split the hot cell's partition
    # (skew=true) — not the join flavor: since r6 the session allows
    # shuffled-hash joins (preferSortMergeJoin=false), and AQE skew
    # handling covers both SMJ and SHJ
    assert ("SortMergeJoin(skew=true)" in plan
            or "ShuffledHashJoin(skew=true" in plan), plan[:2000]

    # brute-force golden (dist asc, site_id asc tie-break)
    d = np.hypot(qxy[:, None, 0] - sxy[None, :, 0],
                 qxy[:, None, 1] - sxy[None, :, 1])
    order = np.lexsort((np.broadcast_to(np.arange(len(sxy)), d.shape), d), axis=1)
    want = {(qi, int(order[qi, r]), r + 1)
            for qi in range(len(qxy)) for r in range(3)}
    assert got == want


def test_pip_hot_cell_broadcast_is_skew_proof(spark):
    """PIP with the same 80%-one-cell corpus: the zones side broadcasts,
    so there is NO shuffle partition to skew — the hot rows stay spread
    across the scan's input partitions. Assert the plan shape holds on a
    skewed corpus and the result is still the exact ray-cast answer."""
    from pycuda_raster_spark.fixtures import point_in_ring
    from pycuda_raster_spark.functions import cellindex

    zones = build_zones(8, res=RES)
    zdf = spark.createDataFrame(zones)
    # 80% of points jittered inside the first zone's first cover cell
    hot_cell = np.int64(zones[0]["cover_cells"][0])
    cs = cellindex.cell_size(RES)
    bx0, by0, bx1, by1 = cellindex.cell_bounds(hot_cell)
    hx, hy = (float(bx0) + float(bx1)) / 2, (float(by0) + float(by1)) / 2
    rng = np.random.default_rng(13)
    hot = np.column_stack([hx + rng.uniform(-0.5, 0.5, 2400) * cs,
                           hy + rng.uniform(-0.5, 0.5, 2400) * cs])
    cold = rng.uniform(0.0, 100.0 * cs, size=(600, 2))
    xy = np.vstack([hot, cold])
    pdf = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(xy)],
        "point_id long, x double, y double")
    out = pip_join(pdf, zdf, res=RES)
    got = {(r.point_id, r.zone_id) for r in out.collect()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    want = set()
    for z in zones:
        inside = point_in_ring(xy[:, 0], xy[:, 1], z["ring"])
        want |= {(int(i), z["zone_id"]) for i in np.nonzero(inside)[0]}
    assert got == want


def test_knn_sparse_fallback_ring_doubling(spark):
    """Pathologically sparse corpus (ring=1 certifies almost nothing): the
    doubled-ring fallback rounds must certify the bulk of the queries with
    equi-joins, leaving only a small tail for the cross-join last resort
    (VERDICT r3 #4) — and the result must still be the exact brute-force
    answer. Plan check: exactly ONE nested-loop join in the whole plan
    (the bounded last resort), not one per round."""
    from pycuda_raster_spark.functions import cellindex
    from pycuda_raster_spark.operators.spatial import _knn_ring_attempt

    cs = cellindex.cell_size(RES)
    rng = np.random.default_rng(21)
    qxy = rng.uniform(0.0, 20.0 * cs, size=(400, 2))
    sxy = rng.uniform(0.0, 20.0 * cs, size=(120, 2))
    q = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(qxy)],
        "point_id long, x double, y double")
    s = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(sxy)],
        "site_id long, x double, y double")

    out = knn_join(q, s, k=3, res=RES, ring=1)
    got = {(r.point_id, r.site_id, r.rank) for r in out.collect()}
    d = np.hypot(qxy[:, None, 0] - sxy[None, :, 0],
                 qxy[:, None, 1] - sxy[None, :, 1])
    order = np.lexsort((np.broadcast_to(np.arange(len(sxy)), d.shape), d), axis=1)
    want = {(qi, int(order[qi, r]), r + 1)
            for qi in range(len(qxy)) for r in range(3)}
    assert got == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert final_plan.count("BroadcastNestedLoopJoin") == 1, final_plan[:3000]

    # the doubling rounds must shrink the uncertified set sharply: replay
    # the internal certification cascade and count survivors per round
    qq = with_cell(q, RES).select(
        F.col("point_id").alias("__qid"), F.col("x").alias("__qx"),
        F.col("y").alias("__qy"), "cell")
    ss = with_cell(s, RES).select(
        F.col("site_id").alias("__sid"), F.col("x").alias("__sx"),
        F.col("y").alias("__sy"), F.col("cell").alias("__scell"))
    remaining, counts = qq, []
    for r in (1, 2, 4):
        _, ok = _knn_ring_attempt(remaining, ss, 3, RES, r)
        remaining = remaining.join(ok, "__qid", "left_anti")
        counts.append(remaining.count())
    assert counts[0] > len(qxy) * 0.3, counts   # ring 1 really is starved
    assert counts[-1] <= len(qxy) * 0.2, counts  # doubling certified the bulk


def test_knn_broadcast_and_skew_plan(spark, points):
    """Plan sanity: candidate join must not degenerate to cartesian, and
    the pip broadcast hint must produce a BroadcastHashJoin."""
    zones_df = spark.createDataFrame(build_zones(10, res=RES))
    plan = pip_join(points, zones_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
