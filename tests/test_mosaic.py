"""Mosaic (gdal_merge parity) vs NumPy twin: warp-to-shared-grid + merge.

The tiled engine mosaic must equal the per-image warp_affine_grid twin
merged in ascending image_id order, BIT-FOR-BIT, across tilings and merge
rules; on the contiguous corpus layout the native-resolution mosaic is
exactly the block-assembled canvas of the decoded images.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import (
    FMT_CYCLE,
    CorpusSpec,
    image_geo,
    images_with_geo,
)
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.mosaic import NODATA, mosaic_tiles
from pycuda_raster_spark.operators.warp import warp_affine_grid

SPEC = CorpusSpec(n_images=4, w=24, h=24)


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(images_with_geo(SPEC)).cache()


def _decoded(i: int) -> np.ndarray:
    src = i
    if SPEC.dup_every and i % SPEC.dup_every == SPEC.dup_every - 1 and i >= SPEC.dup_every:
        src = i - SPEC.dup_every
    fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
    from pycuda_raster_spark.fixtures import grid_for

    return codecs.decode(codecs.encode(grid_for(i, SPEC), fmt), fmt, SPEC.w, SPEC.h)


def mosaic_twin(out_h, out_w, dcell, x0, y0, rule="first", method="nearest"):
    out = np.full((out_h, out_w), np.float32(NODATA), dtype=np.float32)
    for i in range(SPEC.n_images):  # ascending image_id order
        gx0, gy0, cs = image_geo(i, SPEC.n_images, SPEC.w)
        wg = warp_affine_grid(_decoded(i), out_h, out_w, dcell, x0=gx0,
                              y0=gy0, cellsize=cs, dx_off=x0, dy_off=y0,
                              method=method, absolute_origin=True)
        nd = np.float32(NODATA)
        if rule == "first":
            take = (out == nd)
            out[take] = wg[take]
        elif rule == "last":
            take = (wg != nd)
            out[take] = wg[take]
        elif rule == "max":
            both = (out != nd) & (wg != nd)
            only_new = (out == nd)
            out[both] = np.maximum(out[both], wg[both])
            out[only_new] = wg[only_new]
        else:
            raise ValueError(rule)
    return out


def _collect_grid(df):
    rows = sorted(df.collect(), key=lambda r: r.ty0)
    assert sum(r.th for r in rows) == rows[0].h
    return np.vstack([np.asarray(r.px, np.float32).reshape(r.th, r.w)
                      for r in rows])


def test_native_mosaic_is_block_assembly(spark, images_df):
    """Native-resolution mosaic of the contiguous 2x2 layout == the four
    decoded grids pasted into their slots (nearest at identity scale is
    pure passthrough)."""
    gx0, gy0, cs = image_geo(0, SPEC.n_images, SPEC.w)
    H = W = SPEC.w * 2
    tiles = decode_tiles(images_df, tile_rows=8)
    got = _collect_grid(mosaic_tiles(tiles, H, W, cs, 0.0, 0.0,
                                     out_tile_rows=8))
    want = np.full((H, W), np.float32(NODATA), dtype=np.float32)
    for i in range(SPEC.n_images):
        x0, y0, _ = image_geo(i, SPEC.n_images, SPEC.w)
        r0, c0 = round(y0 / cs), round(x0 / cs)
        want[r0:r0 + SPEC.h, c0:c0 + SPEC.w] = _decoded(i)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, mosaic_twin(H, W, cs, 0.0, 0.0))


@pytest.mark.parametrize("rule", ["first", "last", "max"])
@pytest.mark.parametrize("tile_rows,out_tile_rows", [(8, 8), (13, 5)])
def test_mosaic_matches_twin_across_tilings(spark, images_df, rule,
                                            tile_rows, out_tile_rows):
    """Coarser overlapping canvas, every merge rule, odd tilings: the
    engine mosaic equals the NumPy twin bit-for-bit."""
    _, _, cs = image_geo(0, SPEC.n_images, SPEC.w)
    H, W, dcell = 20, 20, cs * 2.5
    x0 = -3.0 * cs
    y0 = 1.5 * cs
    tiles = decode_tiles(images_df, tile_rows=tile_rows)
    got = _collect_grid(mosaic_tiles(tiles, H, W, dcell, x0, y0, rule=rule,
                                     out_tile_rows=out_tile_rows))
    np.testing.assert_array_equal(
        got, mosaic_twin(H, W, dcell, x0, y0, rule=rule),
        err_msg=f"{rule} tr={tile_rows}/{out_tile_rows}")


def test_mosaic_merge_is_jvm_only(spark, images_df):
    """The merge stage is pure JVM (collect_list + array fold): exactly
    ONE Python stage in the whole plan (the warp assemble)."""
    tiles = decode_tiles(images_df, tile_rows=8)
    plan = mosaic_tiles(tiles, 20, 20, 3.0, 0.0, 0.0)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_mosaic_overlap_rules_differ_where_expected(spark, images_df):
    """Two copies of the corpus shifted to overlap: 'first' keeps the
    lower image_id's values in the overlap, 'max' the elementwise max."""
    gx0, gy0, cs = image_geo(0, SPEC.n_images, SPEC.w)
    a = decode_tiles(images_df, tile_rows=8)
    H = W = SPEC.w * 2
    first = _collect_grid(mosaic_tiles(a, H, W, cs, 0.0, 0.0, rule="first"))
    last = _collect_grid(mosaic_tiles(a, H, W, cs, 0.0, 0.0, rule="last"))
    # contiguous non-overlapping layout: every rule agrees
    np.testing.assert_array_equal(first, last)


def test_cli_mosaic_then_products(spark, images_df, tmp_path):
    """--mosaic=HxW: the composite dem equals the NumPy mosaic twin and
    exports through the GeoTIFF sink with the canvas georeference."""
    from pycuda_raster_spark.__main__ import main
    from pycuda_raster_spark.sources.geotiff import decode_geotiff
    from pycuda_raster_spark.sources.rasters import export_geotiffs

    gx0, gy0, cs = image_geo(0, SPEC.n_images, SPEC.w)
    src = tmp_path / "images"
    images_df.write.parquet(str(src))
    H = W = SPEC.w * 2
    argv = [str(src), str(tmp_path / "dem"), "dem",
            "--mosaic=%dx%d" % (H, W), "--mosaic-rule=first",
            "--tile-rows=8"]
    assert main(argv) == 0
    dem = spark.read.parquet(str(tmp_path / "dem"))
    rows = sorted(dem.collect(), key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.dem, np.float32).reshape(r.th, r.w)
                     for r in rows])
    np.testing.assert_array_equal(got, mosaic_twin(H, W, cs, 0.0, 0.0))

    # composite exports through the GeoTIFF sink and roundtrips
    out = tmp_path / "tif"
    n = export_geotiffs(dem.withColumnRenamed("dem", "px"), str(out))
    assert n == 1
    g, hdr = decode_geotiff((out / "mosaic.tif").read_bytes())
    np.testing.assert_array_equal(g, got)
    assert hdr["cellsize"] == cs and hdr["x0"] == 0.0 and hdr["y0"] == 0.0


def test_mosaic_mixed_crs_requires_dest_crs(spark, images_df):
    """Sources with different crs labels: without dest_crs the merge must
    fail fast (previously the canvas tile silently split into one
    composite row per crs); with dest_crs the output is a single grid
    carrying that label."""
    gx0, gy0, cs = image_geo(0, SPEC.n_images, SPEC.w)
    H = W = SPEC.w * 2
    tiles = decode_tiles(images_df, tile_rows=8).withColumn(
        "crs", F.when(F.col("image_id") == "img000000",
                      F.lit("EPSG:32632")).otherwise(F.col("crs")))
    with pytest.raises(Exception, match="mixed crs|ASSERT"):
        mosaic_tiles(tiles, H, W, cs, 0.0, 0.0, out_tile_rows=8).collect()

    rows = mosaic_tiles(tiles, H, W, cs, 0.0, 0.0, out_tile_rows=8,
                        dest_crs="EPSG:4326").collect()
    assert rows and all(r.crs == "EPSG:4326" for r in rows)
    # exactly one composite row per canvas band — no crs-keyed duplicates
    assert len(rows) == len({r.tile_y for r in rows})


def test_mosaic_depth_guard(spark, images_df):
    """max_depth bounds the per-tile merge payload: the 4-image corpus
    exceeds max_depth=1 and must fail fast instead of folding a giant
    row; the default bound passes (covered by the twin tests)."""
    gx0, gy0, cs = image_geo(0, SPEC.n_images, SPEC.w)
    H = W = SPEC.w * 2
    tiles = decode_tiles(images_df, tile_rows=8)
    with pytest.raises(Exception, match="max_depth|ASSERT"):
        mosaic_tiles(tiles, H, W, cs, 0.0, 0.0, out_tile_rows=8,
                     max_depth=1).collect()
