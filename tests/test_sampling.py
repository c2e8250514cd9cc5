"""Point sampling (gdallocationinfo parity) + categorical zonal stats
(ArcGIS MAJORITY/VARIETY parity) vs brute-force references.

Both operators are pure-JVM compositions; outputs are exact (sampled
values are bit-copies of input cells, categorical stats are integers),
so every comparison is strict equality.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import (
    CorpusSpec,
    build_points,
    build_zones,
    image_cellsize,
    images_with_geo,
    point_in_ring,
)
from pycuda_raster_spark.functions.codecs import NODATA, decode
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.gridding import sample_points
from pycuda_raster_spark.operators.zonal import zonal_categorical

SPEC = CorpusSpec(n_images=8, w=32, h=32, nodata_every=3)
RES = 6
TILE_ROWS = 8


def _corpus(spark):
    rows = images_with_geo(SPEC)
    grids = {
        r["image_id"]: decode(bytes(r["bytes"]), r["fmt"], SPEC.w, SPEC.h)
        for r in rows
    }
    return spark.createDataFrame(rows), rows, grids, image_cellsize(SPEC)


def _brute_sample(rows, grids, cs, pts):
    want = {}
    for row in rows:
        g = grids[row["image_id"]]
        h, w = g.shape
        for pid, x, y in pts:
            r = math.floor((y - row["y0"]) / cs)
            c = math.floor((x - row["x0"]) / cs)
            if 0 <= r < h and 0 <= c < w:
                want[(pid, row["image_id"])] = (r, c, g[r, c])
    return want


def test_sample_points_vs_brute(spark):
    images, rows, grids, cs = _corpus(spark)
    pts = [(p["point_id"], p["x"], p["y"]) for p in build_points(300, res=RES)]
    pts_df = spark.createDataFrame(
        [(int(p), float(x), float(y)) for p, x, y in pts],
        "point_id long, x double, y double")
    out = sample_points(decode_tiles(images, tile_rows=TILE_ROWS), pts_df)
    got = {(r.point_id, r.image_id): (r.r, r.c, np.float32(r.val))
           for r in out.collect()}
    want = _brute_sample(rows, grids, cs, pts)
    assert got.keys() == want.keys() and len(got) > 0
    for k, (r, c, v) in want.items():
        assert got[k] == (r, c, np.float32(v)), k
    # NODATA passes through (the spec plants NODATA cells)
    assert any(np.float32(v) == np.float32(NODATA)
               for _, _, v in want.values())


def test_sample_points_boundaries(spark):
    """Cell-edge and extent-edge points: x == x0 lands in col 0; x on an
    interior cell boundary lands in the RIGHT cell (floor semantics);
    x == x0 + w*cs is outside; negative offsets are outside."""
    images, rows, grids, cs = _corpus(spark)
    row = rows[0]
    x0, y0 = row["x0"], row["y0"]
    pts = [
        (0, x0, y0),                          # exact corner -> (0, 0)
        (1, x0 + cs, y0),                     # col boundary -> col 1
        (2, x0 + SPEC.w * cs, y0),            # right edge -> outside
        (3, x0 - 1e-9, y0),                   # just left -> outside
        (4, x0 + 0.5 * cs, y0 + (SPEC.h - 0.5) * cs),  # last row center
    ]
    pts_df = spark.createDataFrame(
        [(p, float(x), float(y)) for p, x, y in pts],
        "point_id long, x double, y double")
    tiles = decode_tiles(images.filter(F.col("image_id") == row["image_id"]),
                         tile_rows=TILE_ROWS)
    got = {r.point_id: (r.r, r.c) for r in sample_points(tiles, pts_df).collect()}
    assert got[0] == (0, 0)
    assert got[1] == (0, 1)
    assert 2 not in got and 3 not in got
    assert got[4] == (SPEC.h - 1, 0)


def test_sample_points_plan_jvm_only(spark):
    """Beyond the decode stage itself, sampling adds ZERO Python: no
    BatchEvalPython anywhere, exactly the decode's one MapInPandas, and
    the point targets arrive by broadcast."""
    images, rows, grids, cs = _corpus(spark)
    pts_df = spark.createDataFrame([(0, 10.0, 10.0)],
                                   "point_id long, x double, y double")
    out = sample_points(decode_tiles(images, tile_rows=TILE_ROWS), pts_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1, plan
    assert "Broadcast" in plan


def _cls(v):
    return int(math.floor(v / 16.0)) % 7


def test_zonal_categorical_vs_brute(spark):
    images, rows, grids, cs = _corpus(spark)
    zones = build_zones(10, res=RES)
    zones_df = spark.createDataFrame(zones)
    tiles = decode_tiles(images, tile_rows=TILE_ROWS)
    out = zonal_categorical(
        tiles, zones_df,
        lambda v: F.floor(v.cast("double") / F.lit(16.0)).cast("long")
        % F.lit(7).cast("long"))
    got = {r.zone_id: (r.majority, r.majority_n, r.variety, r.n_px)
           for r in out.collect()}

    acc: dict[int, dict[int, int]] = {}
    for row in rows:
        g = grids[row["image_id"]]
        for t in range((SPEC.h + TILE_ROWS - 1) // TILE_ROWS):
            ty0 = t * TILE_ROWS
            th = min(TILE_ROWS, SPEC.h - ty0)
            cx = row["x0"] + SPEC.w / 2.0 * cs
            cy = row["y0"] + (ty0 + th / 2.0) * cs
            px = g[ty0:ty0 + th].ravel()
            px = px[px != NODATA]
            for z in zones:
                if point_in_ring(np.array([cx]), np.array([cy]),
                                 z["ring"])[0]:
                    d = acc.setdefault(z["zone_id"], {})
                    for v in px:
                        k = _cls(float(v))
                        d[k] = d.get(k, 0) + 1
    want = {}
    for z, d in acc.items():
        if not d:
            continue
        mx = max(d.values())
        want[z] = (min(k for k, n in d.items() if n == mx), mx,
                   len(d), sum(d.values()))
    assert got == want and len(got) > 0


def test_zonal_categorical_tie_breaks_to_min_class(spark):
    """A hand-built raster with exactly equal class counts: the majority
    must be the SMALLEST tying class."""
    h = w = 8
    g = np.zeros((h, w), dtype=np.float32)
    g[:, 4:] = 80.0  # class floor(80/16)%7 = 5; left half class 0: tie
    df = spark.createDataFrame(
        [("t", bytearray(g.astype("<f4").tobytes()), w, h, "raw", "t", 0,
          0.0, 0.0, 1.0)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, x0 double, y0 double, cellsize double")
    ring = [{"x": -1.0, "y": -1.0}, {"x": 9.0, "y": -1.0},
            {"x": 9.0, "y": 9.0}, {"x": -1.0, "y": 9.0},
            {"x": -1.0, "y": -1.0}]
    from pycuda_raster_spark.functions.cellindex import cells_covering_bbox
    zones_df = spark.createDataFrame(
        [{"zone_id": 1, "ring": ring,
          "cover_cells": [int(c) for c in
                          cells_covering_bbox(-1.0, -1.0, 9.0, 9.0, RES)]}])
    out = zonal_categorical(
        decode_tiles(df, tile_rows=4), zones_df,
        lambda v: F.floor(v.cast("double") / F.lit(16.0)).cast("long")
        % F.lit(7).cast("long"),
        res=RES)
    r = out.collect()
    assert len(r) == 1
    assert (r[0].majority, r[0].majority_n, r[0].variety, r[0].n_px) == (
        0, 32, 2, 64)


# -------------------------------------------------------------- r.profile


def _brute_profile(rows, grids, cs, a, b):
    """Independent reference: exact rational positions snapped half-up,
    sequential dist chain sqrt(d2)*cs*k/S."""
    r0, c0 = a
    r1, c1 = b
    S = max(abs(r1 - r0), abs(c1 - c0), 1)
    d2 = (r1 - r0) ** 2 + (c1 - c0) ** 2
    want = {}
    for row in rows:
        g = grids[row["image_id"]]
        h, w = g.shape
        for k in range(S + 1):
            rk = (2 * (r0 * (S - k) + r1 * k) + S) // (2 * S)
            ck = (2 * (c0 * (S - k) + c1 * k) + S) // (2 * S)
            if 0 <= rk < h and 0 <= ck < w:
                dist = math.sqrt(float(d2)) * cs * float(k) / float(S)
                want[(row["image_id"], k)] = (rk, ck, dist,
                                              np.float32(g[rk, ck]))
    return want


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_profile_vs_brute(spark, tile_rows):
    from pycuda_raster_spark.operators.gridding import profile_tiles

    images, rows, grids, cs = _corpus(spark)
    a, b = (2, 1), (29, 30)
    out = profile_tiles(decode_tiles(images, tile_rows=tile_rows), a, b)
    got = {(r.image_id, r.step): (r.r, r.c, r.dist, np.float32(r.val))
           for r in out.collect()}
    want = _brute_profile(rows, grids, cs, a, b)
    assert got == want and len(got) > 0


def test_profile_degenerate_and_offgrid(spark):
    from pycuda_raster_spark.operators.gridding import profile_tiles

    images, rows, grids, cs = _corpus(spark)
    # single-cell line: S clamps to 1, both samples snap to the seed cell
    out = profile_tiles(decode_tiles(images, tile_rows=8), (5, 5), (5, 5))
    got = {(r.image_id, r.step): (r.r, r.c, r.dist) for r in out.collect()}
    for iid in grids:
        assert got[(iid, 0)] == (5, 5, 0.0)
        assert got[(iid, 1)] == (5, 5, 0.0)
    # line running off the grid: out-of-grid samples are dropped
    out2 = profile_tiles(decode_tiles(images, tile_rows=8), (30, 30),
                         (40, 40))
    rows2 = out2.collect()
    assert all(r.r < 32 and r.c < 32 for r in rows2)
    steps_per_img = {}
    for r in rows2:
        steps_per_img.setdefault(r.image_id, set()).add(r.step)
    for iid, st in steps_per_img.items():
        assert st == {0, 1}  # only (30,30) and (31,31) are in-grid
    # negative endpoints are rejected
    with pytest.raises(ValueError):
        profile_tiles(decode_tiles(images, tile_rows=8), (-1, 0), (5, 5))


def test_cli_profile(spark, tmp_path):
    from pycuda_raster_spark.__main__ import main

    images, rows, grids, cs = _corpus(spark)
    inp = str(tmp_path / "in.parquet")
    images.write.parquet(inp)
    out = str(tmp_path / "prof")
    assert main([inp, out, "profile", "--profile=2,1,29,30",
                 "--tile-rows=8", "--cores=4"]) == 0
    got = {(r.image_id, r.step): (r.r, r.c, r.dist, np.float32(r.val))
           for r in spark.read.parquet(out).collect()}
    assert got == _brute_profile(rows, grids, cs, (2, 1), (29, 30))
