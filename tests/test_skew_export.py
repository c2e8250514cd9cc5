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


def test_salted_join_spreads_duplicate_hot_rows(spark):
    """Byte-identical duplicate rows on one hot key must still spread
    across salt buckets (a columns-only hash would send them all to one
    bucket — degrading exactly on dedup-input-like data), and the join
    result must keep exact row multiplicity."""
    from pycuda_raster_spark.operators.skew import salt_column

    n, salt = 256, 8
    hot = spark.createDataFrame([(1, "dup")] * n, "user_id int, payload string")
    spread = hot.withColumn("s", salt_column(hot, salt)).groupBy("s").count()
    buckets = {r.s: r["count"] for r in spread.collect()}
    assert len(buckets) >= salt // 2, f"duplicates collapsed: {buckets}"
    assert max(buckets.values()) <= n * 0.6, f"one bucket dominates: {buckets}"
    dim = spark.createDataFrame([(1, "SEG"), (2, "OTHER")], "user_id int, seg string")
    out = salted_join(hot, dim, on="user_id", salt=salt).collect()
    assert len(out) == n and all(r.seg == "SEG" for r in out)


def test_export_max_files_boundary(spark, tmp_path):
    """Exporting exactly max_files images succeeds; one more fails BEFORE
    any extra file is written (round 2 wrote max_files+1 then died)."""
    import os

    import pytest

    from pycuda_raster_spark.sources.rasters import export_geotiffs

    spec = CorpusSpec(n_images=5, w=12, h=10)
    tiles = decode_tiles(images_df(spark, spec), tile_rows=5)

    ok_dir = tmp_path / "ok"
    assert export_ascii_grids(tiles, str(ok_dir), max_files=5) == 5
    assert len(os.listdir(ok_dir)) == 5

    cap_dir = tmp_path / "cap"
    with pytest.raises(RuntimeError, match="max_files=4"):
        export_ascii_grids(tiles, str(cap_dir), max_files=4)
    assert len(os.listdir(cap_dir)) == 4, "must stop at exactly max_files"

    tif_dir = tmp_path / "tif"
    with pytest.raises(RuntimeError, match="max_files=4"):
        export_geotiffs(tiles, str(tif_dir), max_files=4)
    assert len(os.listdir(tif_dir)) == 4


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
