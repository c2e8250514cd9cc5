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


def test_ascii_grid_is_north_up_on_disk():
    """Spec fixture: the FIRST data row of a .asc is the northernmost
    (y = yll + (nrows-1)*cellsize). Regression for the round-1 bug where
    writer and parser were self-consistently south-up."""
    g = np.zeros((3, 2), dtype=np.float32)
    g[2] = 7.0  # engine row 2 = north
    text = write_ascii_grid(g, 0.0, 0.0, 1.0)
    first_row = text.splitlines()[6].split()
    assert first_row == ["7.0", "7.0"]
    # and a hand-written spec file parses to the right orientation
    spec = ("ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\n"
            "NODATA_value -9999\n5 5\n1 1\n")
    out, _ = parse_ascii_grid(spec)
    assert out[0, 0] == 1.0 and out[1, 0] == 5.0  # row 0 = south = last file row


def test_geotiff_roundtrip_and_read(spark, tmp_path):
    from pycuda_raster_spark.sources.geotiff import decode_geotiff, encode_geotiff

    rng = np.random.default_rng(11)
    grids = {}
    for i in range(3):
        g = rng.uniform(-100, 4000, size=(40, 25)).astype(np.float32)
        g[5:9, 3:6] = NODATA
        grids[f"dem{i}.tif"] = g
        blob = encode_geotiff(g, x0=i * 100.0, y0=50.0, cellsize=30.0,
                              crs="EPSG:32633",
                              compression="deflate" if i % 2 else "none",
                              rows_per_strip=16)
        (tmp_path / f"dem{i}.tif").write_bytes(blob)
        out, hdr = decode_geotiff(blob)
        np.testing.assert_array_equal(out, g)
        assert (hdr["x0"], hdr["y0"], hdr["cellsize"]) == (i * 100.0, 50.0, 30.0)
        assert hdr["crs"] == "EPSG:32633"
    df = read_raster_files(spark, str(tmp_path) + "/dem0.tif")
    assert df.count() == 1
    rows = {r.image_id: r for r in read_raster_files(spark, str(tmp_path)).collect()}
    assert set(rows) == set(grids)
    for name, g in grids.items():
        r = rows[name]
        np.testing.assert_array_equal(decode(bytes(r.bytes), "raw", r.w, r.h), g)
        assert r.cellsize == 30.0 and r.y0 == 50.0


def test_geotiff_uint16_and_bigendian_read():
    """The reader claims uint16 and big-endian support — pin both with a
    hand-built minimal TIFF (external files won't come from our writer)."""
    import struct

    from pycuda_raster_spark.sources.geotiff import decode_geotiff

    w, h = 3, 2
    vals = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint16)
    for bo, order in (("<", b"II"), (">", b"MM")):
        data = vals[::-1].astype(bo + "u2").tobytes()  # disk is north-up
        entries = [
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
            (262, 3, 1, 1), (277, 3, 1, 1), (278, 4, 1, h), (339, 3, 1, 1),
        ]
        # strip offset/count point past the IFD
        ifd_off = 8
        n = len(entries) + 2
        data_off = ifd_off + 2 + 12 * n + 4
        entries += [(273, 4, 1, data_off), (279, 4, 1, len(data))]
        entries.sort()
        buf = struct.pack(bo + "2sHI", order, 42, ifd_off)
        buf += struct.pack(bo + "H", n)
        for tag, typ, cnt, val in entries:
            size = {3: 2, 4: 4}[typ]
            packed = struct.pack(bo + {3: "H", 4: "I"}[typ], val).ljust(4, b"\x00")
            buf += struct.pack(bo + "HHI", tag, typ, cnt) + packed
        buf += struct.pack(bo + "I", 0) + data
        grid, hdr = decode_geotiff(buf)
        np.testing.assert_array_equal(grid, vals.astype(np.float32))
        assert (hdr["w"], hdr["h"]) == (w, h)


def test_geotiff_e2e_slope_and_export(spark, tmp_path):
    """.tif in -> engine slope -> .tif out; engine result == whole-grid
    NumPy oracle bit-for-bit, and the exported product re-reads exactly."""
    from pycuda_raster_spark.functions.focal_kernels import oracle_whole_grid
    from pycuda_raster_spark.operators.focal import decode_focal, px_f32
    from pycuda_raster_spark.sources.geotiff import decode_geotiff, encode_geotiff
    from pycuda_raster_spark.sources.rasters import export_geotiffs

    rng = np.random.default_rng(12)
    g = (100 + 20 * rng.standard_normal((48, 32))).astype(np.float32)
    (tmp_path / "in").mkdir()
    (tmp_path / "in/d.tif").write_bytes(
        encode_geotiff(g, x0=5.0, y0=7.0, cellsize=2.0, crs="EPSG:4326"))
    images = read_raster_files(spark, str(tmp_path / "in"))
    tiles = decode_focal(images, tile_rows=16).cache()
    got = np.vstack([
        px_f32(r.slope).reshape(r.th, r.w)
        for r in sorted(tiles.collect(), key=lambda r: r.ty0)
    ])
    np.testing.assert_array_equal(got, oracle_whole_grid(g, 2.0)["slope"])
    n = export_geotiffs(tiles, str(tmp_path / "out"), value_col="slope")
    assert n == 1
    out, hdr = decode_geotiff((tmp_path / "out/d.tif").read_bytes())
    np.testing.assert_array_equal(out, got)
    assert (hdr["x0"], hdr["y0"], hdr["cellsize"]) == (5.0, 7.0, 2.0)
    # the INPUT file's CRS survived reader -> tiles -> product sink
    assert hdr["crs"] == "EPSG:4326"
    tiles.unpersist()


def test_catalog_dynamic_partition_overwrite(spark, tmp_path):
    p = str(tmp_path / "t")
    df1 = spark.createDataFrame([(0, "a"), (1, "b")], ["bucket", "v"])
    catalog.write(df1, p, partition_by=["bucket"])
    # overwriting bucket 0 only must keep bucket 1 intact
    df2 = spark.createDataFrame([(0, "a2")], ["bucket", "v"])
    catalog.write(df2, p, partition_by=["bucket"])
    got = {(r.bucket, r.v) for r in catalog.read(spark, p).collect()}
    assert got == {(0, "a2"), (1, "b")}
