"""Sieve filter (gdal_sieve parity, deterministic one-shot variant):
tiled == whole-grid twin == slow BFS reference exactly. Covers random
class grids across thresholds, NODATA isolation, tie determinism
(equal-size neighbors -> smallest label), the documented no-cascade
semantics, and seam invariance at 3 tile heights."""

from collections import deque

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, build_images
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.sieve import (
    NODATA,
    sieve_grid,
    sieve_regions,
    sieve_tiles,
)


def slow_sieve(vals: np.ndarray, threshold: int):
    """Independent reference: BFS flood fill + explicit neighbor scan +
    one-shot merge with (max size, min label) target choice."""
    v = np.asarray(vals, dtype=np.float32)
    h, w = v.shape
    lab = np.full((h, w), -1, dtype=np.int64)
    regions = {}
    for r in range(h):
        for c in range(w):
            if v[r, c] == np.float32(NODATA) or lab[r, c] >= 0:
                continue
            members = []
            q = deque([(r, c)])
            lab[r, c] = 0  # placeholder marks visited
            while q:
                rr, cc = q.popleft()
                members.append((rr, cc))
                for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                    nr, nc = rr + dr, cc + dc
                    if 0 <= nr < h and 0 <= nc < w and lab[nr, nc] < 0 \
                            and v[nr, nc] != np.float32(NODATA) \
                            and v[nr, nc] == v[rr, cc]:
                        lab[nr, nc] = 0
                        q.append((nr, nc))
            root = min(rr * w + cc for rr, cc in members)
            for rr, cc in members:
                lab[rr, cc] = root
            regions[root] = members
    lab[v == np.float32(NODATA)] = -1
    size = {rt: len(m) for rt, m in regions.items()}
    vals_of = {rt: float(v[m[0][0], m[0][1]]) for rt, m in regions.items()}
    nbrs = {rt: set() for rt in regions}
    for r in range(h):
        for c in range(w):
            if lab[r, c] < 0:
                continue
            for dr, dc in ((0, 1), (1, 0)):
                nr, nc = r + dr, c + dc
                if nr < h and nc < w and lab[nr, nc] >= 0 \
                        and lab[nr, nc] != lab[r, c]:
                    nbrs[lab[r, c]].add(lab[nr, nc])
                    nbrs[lab[nr, nc]].add(lab[r, c])
    out = v.copy()
    rows = []
    for rt in sorted(regions):
        new_label, sieved = rt, vals_of[rt]
        if size[rt] < threshold and nbrs[rt]:
            new_label = min(nbrs[rt], key=lambda l: (-size[l], l))
            sieved = vals_of[new_label]
            for rr, cc in regions[rt]:
                out[rr, cc] = np.float32(sieved)
        rows.append((rt, vals_of[rt], size[rt], new_label, sieved))
    return out, rows


def _class_grid(seed: int, h: int = 20, w: int = 15, k: int = 4,
                nodata_frac: float = 0.1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    g = rng.integers(0, k, size=(h, w)).astype(np.float32) * 10.0
    g[rng.random((h, w)) < nodata_frac] = NODATA
    return g


@pytest.mark.parametrize("seed,thr", [(0, 3), (1, 5), (2, 2), (3, 8)])
def test_grid_twin_vs_slow(seed, thr):
    g = _class_grid(seed)
    got_grid, got_rows = sieve_grid(g, thr)
    want_grid, want_rows = slow_sieve(g, thr)
    assert np.array_equal(got_grid, want_grid)
    assert got_rows == want_rows


def test_grid_tie_smallest_label():
    """Small center region flanked by two equal-size neighbors: the
    smaller label (upper/left region) wins."""
    g = np.full((3, 5), NODATA, dtype=np.float32)
    g[1, 0] = g[1, 1] = 10.0   # left region, label 5
    g[1, 2] = 20.0             # small center, label 7
    g[1, 3] = g[1, 4] = 30.0   # right region, label 8
    out, rows = sieve_grid(g, 2)
    assert out[1, 2] == np.float32(10.0)
    center = [r for r in rows if r[0] == 7][0]
    assert center[3] == 5 and center[4] == 10.0
    sg, sr = slow_sieve(g, 2)
    assert np.array_equal(out, sg) and rows == sr


def test_grid_no_cascade():
    """One-shot semantics: a small region merged INTO another small
    region uses pre-merge sizes, and the result region is not
    re-examined (documented deviation from gdal_sieve's ordering)."""
    g = np.full((1, 6), NODATA, dtype=np.float32)
    g[0, 0] = 1.0              # label 0, size 1 (small)
    g[0, 1] = 2.0              # label 1, size 1 (small)
    # both are small at threshold 3 with only each other as neighbors:
    # 0 -> takes 1's value; 1 -> takes 0's value (pre-merge map!)
    out, rows = sieve_grid(g, 3)
    assert out[0, 0] == np.float32(2.0) and out[0, 1] == np.float32(1.0)
    sg, sr = slow_sieve(g, 3)
    assert np.array_equal(out, sg) and rows == sr


def test_grid_isolated_small_region_kept():
    g = np.full((4, 4), NODATA, dtype=np.float32)
    g[1, 1] = 42.0
    out, rows = sieve_grid(g, 5)
    assert out[1, 1] == np.float32(42.0)
    assert rows == [(5, 42.0, 1, 5, 42.0)]


SPEC = CorpusSpec(n_images=4, w=32, h=32, nodata_every=3)


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


def _classified(images_df, tile_rows):
    return decode_tiles(images_df, tile_rows=tile_rows).withColumn(
        "px", F.transform(
            "px", lambda v: F.when(v == F.lit(-9999.0), v)
            .otherwise(F.floor(v / F.lit(16.0)).cast("float"))))


def _grid_twin(i):
    from pycuda_raster_spark.functions import codecs
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for

    fmt = FMT_CYCLE[i % len(FMT_CYCLE)]
    g = codecs.decode(
        codecs.encode(grid_for(i, SPEC), fmt), fmt, SPEC.w, SPEC.h)
    cls = np.where(g == np.float32(NODATA), g,
                   np.floor(g / np.float32(16.0)).astype(np.float32))
    return cls


@pytest.mark.parametrize("tile_rows", [4, 8, 32])
def test_tiled_regions_equal_twin(spark, images_df, tile_rows):
    rows = sieve_regions(_classified(images_df, tile_rows), 5).collect()
    got = {}
    for r in rows:
        got.setdefault(r["image_id"], []).append(
            (r["label"], r["val"], r["n_cells"], r["new_label"],
             r["sieved_val"]))
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        _, want = sieve_grid(_grid_twin(i), 5)
        assert sorted(got[iid]) == want, (iid, tile_rows)


@pytest.mark.parametrize("tile_rows", [4, 8])
def test_tiled_apply_equals_twin(spark, images_df, tile_rows):
    out = sieve_tiles(_classified(images_df, tile_rows), 5)
    rows = out.select("image_id", "ty0", "th", "w", "px").collect()
    got = {}
    for r in rows:
        got.setdefault(r["image_id"], {})[r["ty0"]] = r
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want, _ = sieve_grid(_grid_twin(i), 5)
        bands = got[iid]
        assert sum(b["th"] for b in bands.values()) == SPEC.h
        for ty0, b in bands.items():
            px = np.asarray(b["px"], np.float32).reshape(b["th"], b["w"])
            assert np.array_equal(px, want[ty0:ty0 + b["th"]]), (iid, ty0)


def test_cli_sieve(spark, images_df, tmp_path):
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out = str(tmp_path / "sieve")
    assert main([inp, out, "sieve", "--sieve=5", "--sieve-class=16",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = (spark.read.parquet(out)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.px, np.float32).reshape(r.th, r.w)
                     for r in rows])
    want, _ = sieve_grid(_grid_twin(0), 5)
    np.testing.assert_array_equal(got, want)
