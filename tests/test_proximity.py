"""Exact EDT (gdal_proximity parity): tiled == whole-grid twin ==
O(n * targets) brute force, exactly — integer squared distances, so
equality is strict. Covers NODATA images, no-target images, all-target
images, single-column grids, and multiple tile heights."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, build_images
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.proximity import (
    NODATA,
    proximity_grid,
    proximity_tiles,
    target_class_mod,
    target_values,
)

SPEC = CorpusSpec(n_images=4, w=32, h=32, nodata_every=3)
TARGET = target_class_mod(16.0, 7)


def brute_prox(px: np.ndarray, target) -> np.ndarray:
    """Independent oracle: min squared distance over ALL target cells."""
    p = np.asarray(px, dtype=np.float32)
    tgt = target(p) & (p != np.float32(NODATA))
    h, w = p.shape
    trs, tcs = np.nonzero(tgt)
    if trs.size == 0:
        return np.full((h, w), -1, dtype=np.int64)
    rr, cc = np.mgrid[0:h, 0:w]
    d2 = ((rr[:, :, None] - trs[None, None, :]) ** 2
          + (cc[:, :, None] - tcs[None, None, :]) ** 2)
    return d2.min(axis=2).astype(np.int64)


def _rand_grid(seed: int, h: int = 24, w: int = 17) -> np.ndarray:
    rng = np.random.default_rng(seed)
    g = rng.uniform(90.0, 200.0, size=(h, w)).astype(np.float32)
    if seed % 2:
        g[3:7, 5:9] = NODATA
    return g


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_grid_twin_vs_brute(seed):
    g = _rand_grid(seed)
    assert np.array_equal(proximity_grid(g, TARGET), brute_prox(g, TARGET))


def test_grid_no_target():
    g = np.full((8, 8), 100.0, dtype=np.float32)
    pred = target_values([555.0])
    assert (proximity_grid(g, pred) == -1).all()


def test_grid_all_target():
    g = np.full((8, 8), 112.0, dtype=np.float32)  # floor(112/16)=7 -> mod 7 == 0
    assert (proximity_grid(g, TARGET) == 0).all()


def test_grid_single_column():
    g = _rand_grid(5, h=30, w=1)
    assert np.array_equal(proximity_grid(g, TARGET), brute_prox(g, TARGET))


def test_grid_all_nodata():
    g = np.full((6, 9), NODATA, dtype=np.float32)
    assert (proximity_grid(g, TARGET) == -1).all()


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


@pytest.mark.parametrize("tile_rows", [4, 8, 32])
def test_tiled_equals_twin(spark, images_df, tile_rows):
    from pycuda_raster_spark.functions import codecs
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for

    out = proximity_tiles(
        decode_tiles(images_df, tile_rows=tile_rows), TARGET)
    rows = out.select("image_id", "ty0", "th", "w", "dist2", "dist").collect()
    got: dict[str, dict[int, tuple]] = {}
    for r in rows:
        got.setdefault(r["image_id"], {})[r["ty0"]] = r

    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        src = i
        fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
        g = codecs.decode(
            codecs.encode(grid_for(i, SPEC), fmt), fmt, SPEC.w, SPEC.h)
        want = proximity_grid(g, TARGET)
        bands = got[iid]
        assert sum(b["th"] for b in bands.values()) == SPEC.h
        for ty0, b in bands.items():
            d2 = np.asarray(b["dist2"], dtype=np.int64).reshape(
                b["th"], b["w"])
            assert np.array_equal(d2, want[ty0:ty0 + b["th"]]), (iid, ty0)
            # georeferenced dist: sqrt(d2) * cellsize, NODATA at -1
            d = np.asarray(b["dist"], dtype=np.float64).reshape(
                b["th"], b["w"])
            w2 = want[ty0:ty0 + b["th"]]
            exp = np.where(w2 >= 0, np.sqrt(w2.astype(np.float64)), 0.0)
            cs = out.select("cellsize").first()["cellsize"]
            exp = np.where(w2 >= 0, exp * cs, float(NODATA))
            assert np.array_equal(d, exp), (iid, ty0)


def test_cli_proximity(spark, images_df, tmp_path):
    """--proximity CLI mode == grid twin on image 0."""
    from pycuda_raster_spark.functions import codecs
    from pycuda_raster_spark.fixtures import FMT_CYCLE, grid_for
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out = str(tmp_path / "prox")
    assert main([inp, out, "proximity", "--proximity=16,7",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = (spark.read.parquet(out)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.dist2, np.int64).reshape(r.th, r.w)
                     for r in rows])
    fmt = FMT_CYCLE[0]
    g = codecs.decode(
        codecs.encode(grid_for(0, SPEC), fmt), fmt, SPEC.w, SPEC.h)
    np.testing.assert_array_equal(got, proximity_grid(g, TARGET))


def test_tiled_no_target_image(spark):
    """An image whose predicate never fires emits -1 everywhere even
    when OTHER images in the frame have targets."""
    df = spark.createDataFrame(build_images(SPEC))
    pred = target_values([112.0])

    out = proximity_tiles(decode_tiles(df, tile_rows=8), pred)
    per_img = (out.select("image_id", F.explode("dist2").alias("d"))
               .groupBy("image_id")
               .agg(F.max("d").alias("mx"), F.min("d").alias("mn"))
               .collect())
    assert len(per_img) == SPEC.n_images
    for r in per_img:
        # every image either has targets (all distances >= 0) or none (-1)
        assert (r["mn"] == -1 and r["mx"] == -1) or r["mn"] >= 0
