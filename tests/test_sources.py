"""Source/sink tests: ASCII Grid parser, catalog overwrite semantics."""

import numpy as np
import pytest

from pycuda_raster_spark.functions.codecs import NODATA, decode
from pycuda_raster_spark.sources import catalog
from pycuda_raster_spark.sources.rasters import (
    parse_ascii_grid,
    read_ascii_grid,
    read_raster_files,
    write_ascii_grid,
)


def test_ascii_grid_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    g = rng.uniform(-10, 100, size=(12, 9)).astype(np.float32)
    g[2:4, 3:5] = -1.0  # custom nodata in file
    text = write_ascii_grid(g, 10.0, 20.0, 2.5, nodata=-1.0)
    out, hdr = parse_ascii_grid(text)
    assert hdr["ncols"] == 9 and hdr["nrows"] == 12
    assert hdr["xllcorner"] == 10.0 and hdr["cellsize"] == 2.5
    want = np.where(g == -1.0, np.float32(NODATA), g)
    np.testing.assert_array_equal(out, want)


def test_read_ascii_grid_distributed(spark, tmp_path):
    rng = np.random.default_rng(6)
    grids = {}
    for i in range(3):
        g = rng.uniform(0, 50, size=(8, 6)).astype(np.float32)
        grids[f"g{i}.asc"] = g
        (tmp_path / f"g{i}.asc").write_text(write_ascii_grid(g, i * 10.0, 0.0, 1.0))
    df = read_ascii_grid(spark, str(tmp_path))
    rows = {r.image_id: r for r in df.collect()}
    assert set(rows) == set(grids)
    for name, g in grids.items():
        r = rows[name]
        assert (r.w, r.h) == (6, 8)
        np.testing.assert_array_equal(decode(bytes(r.bytes), "raw", r.w, r.h), g)
        assert r.x0 == float(name[1]) * 10.0


def test_geotiff_stub_raises(spark):
    with pytest.raises(NotImplementedError, match="GDAL"):
        read_raster_files(spark, "/nonexistent/x.tif")


def test_catalog_dynamic_partition_overwrite(spark, tmp_path):
    p = str(tmp_path / "t")
    df1 = spark.createDataFrame([(0, "a"), (1, "b")], ["bucket", "v"])
    catalog.write(df1, p, partition_by=["bucket"])
    # overwriting bucket 0 only must keep bucket 1 intact
    df2 = spark.createDataFrame([(0, "a2")], ["bucket", "v"])
    catalog.write(df2, p, partition_by=["bucket"])
    got = {(r.bucket, r.v) for r in catalog.read(spark, p).collect()}
    assert got == {(0, "a2"), (1, "b")}
