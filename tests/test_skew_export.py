"""Salted join correctness + ASCII export sink roundtrip."""

import numpy as np
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, images_df
from pycuda_raster_spark.functions.codecs import decode
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.skew import salted_join
from pycuda_raster_spark.sources.rasters import export_ascii_grids, parse_ascii_grid

SF_DIR = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value")
    dim = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    plain = {(r.event_id, r.c_mktsegment)
             for r in ev.join(dim, "user_id").collect()}
    salted = {(r.event_id, r.c_mktsegment)
              for r in salted_join(ev, dim, on="user_id", salt=8).collect()}
    assert salted == plain and len(plain) > 0
    # left join preserves unmatched skewed rows exactly once
    plain_l = ev.join(dim, "user_id", "left").count()
    assert salted_join(ev, dim, on="user_id", salt=4, how="left").count() == plain_l


def test_export_ascii_roundtrip(spark, tmp_path):
    spec = CorpusSpec(n_images=5, w=20, h=16)
    images = images_df(spark, spec)
    tiles = decode_tiles(images, tile_rows=7)
    n = export_ascii_grids(tiles, str(tmp_path), value_col="px")
    assert n == 5
    rows = {r.image_id: r for r in images.collect()}
    for iid, r in rows.items():
        grid, hdr = parse_ascii_grid((tmp_path / f"{iid}.asc").read_text())
        want = decode(bytes(r.bytes), r.fmt, r.w, r.h)
        np.testing.assert_array_equal(grid, want)
        assert hdr["xllcorner"] == r.x0 and hdr["cellsize"] == r.cellsize
