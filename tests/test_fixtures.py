"""Fixture-generator invariants: determinism, dup positives, golden shapes."""

import numpy as np

from pycuda_raster_spark.fixtures import (
    CorpusSpec,
    build_images,
    build_points,
    build_zones,
    golden_knn,
    golden_pip,
    grid_for,
    point_in_ring,
)


def test_images_deterministic_and_schema():
    spec = CorpusSpec(n_images=16)
    a, b = build_images(spec), build_images(spec)
    assert len(a) == 16
    for r1, r2 in zip(a, b):
        assert r1["image_id"] == r2["image_id"]
        assert bytes(r1["bytes"]) == bytes(r2["bytes"])
        assert r1["phash"] == r2["phash"]
    assert set(a[0].keys()) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}


def test_duplicates_exist_for_dedup():
    spec = CorpusSpec(n_images=32, dup_every=10)
    rows = build_images(spec)
    by_bytes = {}
    for r in rows:
        by_bytes.setdefault(bytes(r["bytes"]), []).append(r["image_id"])
    dup_groups = [v for v in by_bytes.values() if len(v) > 1]
    assert dup_groups, "corpus must contain byte-identical duplicates"
    # duplicates share phash and caption
    ph = {r["image_id"]: r["phash"] for r in rows}
    for grp in dup_groups:
        assert len({ph[i] for i in grp}) == 1


def test_pip_golden_nonempty_and_consistent():
    zones = build_zones(8)
    points = build_points(400)
    truth = golden_pip(points, zones)
    assert truth, "some points must fall inside some zones"
    # every (p, z) in truth re-verifies with the ray cast
    pts = {p["point_id"]: p for p in points}
    zs = {z["zone_id"]: z for z in zones}
    for pid, zid in list(truth)[:50]:
        p = pts[pid]
        assert point_in_ring(np.array([p["x"]]), np.array([p["y"]]), zs[zid]["ring"])[0]


def test_knn_golden_ranks():
    points = build_points(50)
    sites = [{"id": f"s{i}", "x": float(i * 3.0), "y": float(i * 2.0)} for i in range(20)]
    out = golden_knn(points, sites, k=3)
    assert len(out) == 50 * 3
    by_p = {}
    for pid, nid, rank, dist in out:
        by_p.setdefault(pid, []).append((rank, dist))
    for v in by_p.values():
        ranks = sorted(v)
        assert [r for r, _ in ranks] == [1, 2, 3]
        assert ranks[0][1] <= ranks[1][1] <= ranks[2][1]


def test_distributed_generation_equals_driver_side(spark):
    from pycuda_raster_spark.fixtures import images_df, images_df_distributed

    spec = CorpusSpec(n_images=24, w=16, h=16)
    a = {r.image_id: r for r in images_df(spark, spec).collect()}
    b = {r.image_id: r for r in images_df_distributed(spark, spec).collect()}
    assert set(a) == set(b)
    for iid in a:
        assert bytes(a[iid].bytes) == bytes(b[iid].bytes)
        assert a[iid].phash == b[iid].phash
        assert (a[iid].x0, a[iid].y0, a[iid].cellsize) == (b[iid].x0, b[iid].y0, b[iid].cellsize)


def test_grid_for_matches_duplicate_source():
    spec = CorpusSpec(n_images=32, dup_every=10)
    assert np.array_equal(grid_for(19, spec), grid_for(9, spec))
