"""Overview pyramids (gdaladdo parity): each level must be bit-for-bit
the standalone resample at that factor, and the CLI layout must land
level=k/ directories with correct products."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import FMT_CYCLE, CorpusSpec, build_images, grid_for
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.overviews import build_overviews
from pycuda_raster_spark.operators.resample import resample_grid, resample_tiles

SPEC = CorpusSpec(n_images=4, w=48, h=40, nodata_every=3)


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


def _decoded(i: int) -> np.ndarray:
    src = i
    if SPEC.dup_every and i % SPEC.dup_every == SPEC.dup_every - 1 and i >= SPEC.dup_every:
        src = i - SPEC.dup_every
    fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
    g = grid_for(i, SPEC)
    return codecs.decode(codecs.encode(g, fmt), fmt, SPEC.w, SPEC.h)


def _grids(df, px="px"):
    rows = df.select("image_id", "ty0", "th", "w", F.col(px).alias("px")
                     ).collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r)
    return {
        iid: np.vstack([
            np.asarray(t.px, np.float32).reshape(t.th, t.w)
            for t in sorted(ts, key=lambda r: r.ty0)])
        for iid, ts in per.items()
    }


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
def test_levels_equal_direct_resample(spark, images_df, method):
    tiles = decode_tiles(images_df, tile_rows=8)
    pyr = build_overviews(tiles, levels=(2, 4, 8), method=method).cache()
    for k in (2, 4, 8):
        oh, ow = -(-SPEC.h // k), -(-SPEC.w // k)
        got = _grids(pyr.filter(F.col("level") == k))
        direct = _grids(resample_tiles(tiles, oh, ow, method=method))
        for iid in direct:
            np.testing.assert_array_equal(got[iid], direct[iid],
                                          err_msg=f"{iid} /{k} {method}")
            # and against the whole-grid twin
            i = int(iid[3:])
            np.testing.assert_array_equal(
                got[iid], resample_grid(_decoded(i), oh, ow, method=method))
    pyr.unpersist()


def test_bad_levels_raise(spark, images_df):
    tiles = decode_tiles(images_df, tile_rows=8)
    with pytest.raises(ValueError):
        build_overviews(tiles, levels=())
    with pytest.raises(ValueError):
        build_overviews(tiles, levels=(1, 2))
    with pytest.raises(ValueError):
        build_overviews(tiles, levels=(2, 2))


def test_partitioned_write_layout(spark, images_df, tmp_path):
    tiles = decode_tiles(images_df, tile_rows=8)
    out = str(tmp_path / "pyr")
    build_overviews(tiles, levels=(2, 4)).write.partitionBy(
        "level").parquet(out)
    back = spark.read.parquet(out)
    assert sorted(r.level for r in back.select("level").distinct()
                  .collect()) == [2, 4]


def test_cli_overviews(spark, images_df, tmp_path):
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out_s = str(tmp_path / "slope")
    assert main([inp, out_s, "slope", "--overviews=2,4",
                 "--tile-rows=8", "--cores=4"]) == 0
    for k in (2, 4):
        df = spark.read.parquet(f"{out_s}/level={k}")
        assert df.count() > 0
        first = df.first()
        assert first.h == -(-SPEC.h // k)
