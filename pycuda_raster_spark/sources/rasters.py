"""Raster file sources — the reference's two input formats re-expressed.

The reference reads GeoTIFF via GDAL and ESRI ASCII Grid via a hand
parser, streaming row blocks ([ref?: dataLoader.py]; formats per B:6 /
public repo description). Spark-native equivalents:

* ``read_images_parquet``  — the primary path: the driver-mandated images
  table (B:15) straight from Parquet (predicate pushdown + column pruning
  come free).
* ``read_raster_files``    — loose raster files via ``binaryFile``:
  (path, bytes) rows decoded by extension/magic. GeoTIFF is REAL since
  round 2 via the pure-NumPy strip codec in sources/geotiff.py (GDAL is
  absent in the sandbox); ``read_geotiff``/``export_geotiffs`` cover both
  directions with georeference + NODATA + CRS carried end-to-end.
* ``read_ascii_grid``      — a REAL ESRI ASCII Grid (.asc) parser: 6-line
  header (ncols nrows xllcorner yllcorner cellsize NODATA_value) +
  whitespace rows, parsed batch-wise in mapInPandas, emitting the engine's
  images-with-geo shape (bytes re-encoded as fmt='raw').
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions import codecs

IMAGES_GEO_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, x0 double, y0 double, cellsize double, nodata double, "
    "crs string"
)


def read_images_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_ascii_grid(grid: np.ndarray, x0: float, y0: float, cellsize: float,
                     nodata: float = codecs.NODATA) -> str:
    """Serialize one grid to ESRI ASCII Grid text (test/export helper)."""
    h, w = grid.shape
    header = (
        f"ncols {w}\nnrows {h}\nxllcorner {x0}\nyllcorner {y0}\n"
        f"cellsize {cellsize}\nNODATA_value {nodata}\n"
    )
    # ESRI ASCII Grid rows run north->south (first data row is the
    # northernmost, y = yll + (nrows-1)*cellsize); engine grids are
    # south-up (row 0 at y0), so serialize vertically flipped. The parser
    # below applies the inverse flip — round 1 had both sides in engine
    # order, which external consumers (GDAL/QGIS) would read upside down.
    body = "\n".join(" ".join(repr(float(v)) for v in row) for row in grid[::-1])
    return header + body + "\n"


def parse_ascii_grid(text: str) -> tuple[np.ndarray, dict]:
    """One .asc document -> (float32 grid, header dict). The reference's
    6-line header parse ([ref?: dataLoader.py])."""
    lines = text.strip().splitlines()
    hdr: dict[str, float] = {}
    i = 0
    while i < len(lines) and len(hdr) < 6:
        k, v = lines[i].split(None, 1)
        hdr[k.lower()] = float(v)
        i += 1
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    vals = np.array(" ".join(lines[i:]).split(), dtype=np.float64)
    # file rows are north->south per the ESRI spec; flip to the engine's
    # south-up layout (row 0 = y0)
    grid = vals.reshape(h, w)[::-1].astype(np.float32)
    nd = hdr.get("nodata_value")
    if nd is not None and nd != codecs.NODATA:
        grid = np.where(grid == np.float32(nd), np.float32(codecs.NODATA), grid)
    return grid, hdr


def read_ascii_grid(spark: SparkSession, path_glob: str) -> DataFrame:
    """Directory/glob of .asc files -> images-with-geo DataFrame.
    binaryFile scan (distributed, splits by file) + batched parse."""
    from ..functions.phash import phash64

    files = spark.read.format("binaryFile").load(path_glob)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                    "caption", "phash", "x0", "y0",
                                    "cellsize", "nodata", "crs")}
            for r in pdf.itertuples(index=False):
                grid, hdr = parse_ascii_grid(bytes(r.content).decode("ascii"))
                name = r.path.rsplit("/", 1)[-1]
                rows["image_id"].append(name)
                rows["bytes"].append(codecs.encode(grid, "raw"))
                rows["w"].append(grid.shape[1])
                rows["h"].append(grid.shape[0])
                rows["fmt"].append("raw")
                rows["caption"].append(f"ascii grid {name}")
                rows["phash"].append(phash64(grid))
                rows["x0"].append(hdr.get("xllcorner", 0.0))
                rows["y0"].append(hdr.get("yllcorner", 0.0))
                rows["cellsize"].append(hdr.get("cellsize", 1.0))
                rows["nodata"].append(codecs.NODATA)
                rows["crs"].append("ENGINE:PLANE")  # .asc carries no CRS
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(gen, schema=IMAGES_GEO_SCHEMA)


def export_ascii_grids(
    tiles: DataFrame,
    out_dir: str,
    value_col: str = "px",
    nodata: float = codecs.NODATA,
    max_files: int | None = 10_000,
) -> int:
    """Sink: reassemble per-image grids from tiles and write one ``.asc``
    file per image — the saver role of the reference ([ref?: dataSaver.py]
    writes the output raster with the input's georeference + NODATA).
    Value column may be array<float> or packed f32 binary. Per-image
    small-file output is inherent to the format; the parquet tile table
    remains the scale sink. Returns the number of files written."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    is_binary = dict(tiles.dtypes)[value_col] == "binary"
    cols = ["image_id", "ty0", "th", "w", "h", "x0", "y0", "cellsize", value_col]
    it = tiles.select(*cols).orderBy("image_id", "ty0").toLocalIterator()
    n = 0
    cur, parts = None, []

    def flush():
        nonlocal n
        if cur is None:
            return
        # fail BEFORE writing file max_files+1: exporting exactly
        # max_files images succeeds, one more dies with zero extra bytes
        if max_files is not None and n >= max_files:
            raise RuntimeError(
                f"export_ascii_grids exceeded max_files={max_files}; "
                "use the parquet tile sink for corpus-scale output"
            )
        iid, w, h, x0, y0, cs = cur
        grid = np.vstack(parts)
        assert grid.shape == (h, w), (grid.shape, h, w)
        with open(f"{out_dir}/{iid}.asc", "w") as f:
            f.write(write_ascii_grid(grid, x0, y0, cs, nodata=nodata))
        n += 1

    for r in it:
        key = (r.image_id, r.w, r.h, r.x0, r.y0, r.cellsize)
        if cur is not None and key[0] != cur[0]:
            flush()
            parts = []
        cur = key
        v = r[value_col]
        block = (
            np.frombuffer(bytes(v), dtype="<f4")
            if is_binary
            else np.asarray(v, dtype=np.float32)
        )
        parts.append(block.reshape(r.th, r.w))
    flush()
    return n


def read_geotiff(spark: SparkSession, path_glob: str) -> DataFrame:
    """Directory/glob of GeoTIFF files -> images-with-geo DataFrame
    (same shape as read_ascii_grid). Pure-NumPy codec
    (sources/geotiff.py) stands in for GDAL — single-band float32/uint16,
    strip AND tiled (COG-style) layouts, none/deflate, predictor 1/2/3,
    ModelPixelScale/Tiepoint + GDAL_NODATA + EPSG GeoKeys/CRS citation
    honored. binaryFile scan -> batched parse (no per-row Python)."""
    from ..functions.phash import phash64
    from .geotiff import decode_geotiff

    files = spark.read.format("binaryFile").load(path_glob)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                    "caption", "phash", "x0", "y0",
                                    "cellsize", "nodata", "crs")}
            for r in pdf.itertuples(index=False):
                grid, hdr = decode_geotiff(bytes(r.content))
                name = r.path.rsplit("/", 1)[-1]
                rows["image_id"].append(name)
                rows["bytes"].append(codecs.encode(grid, "raw"))
                rows["w"].append(grid.shape[1])
                rows["h"].append(grid.shape[0])
                rows["fmt"].append("raw")
                rows["caption"].append(f"geotiff {name} crs={hdr.get('crs')}")
                rows["phash"].append(phash64(grid))
                rows["x0"].append(hdr["x0"])
                rows["y0"].append(hdr["y0"])
                rows["cellsize"].append(hdr["cellsize"])
                rows["nodata"].append(codecs.NODATA)
                rows["crs"].append(hdr.get("crs") or "ENGINE:PLANE")
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(gen, schema=IMAGES_GEO_SCHEMA)


def export_geotiffs(
    tiles: DataFrame,
    out_dir: str,
    value_col: str = "px",
    nodata: float = codecs.NODATA,
    crs: str = "ENGINE:PLANE",
    compression: str = "deflate",
    max_files: int | None = 10_000,
    predictor: int = 1,
    tile_size: tuple[int, int] | None = None,
) -> int:
    """Sink: reassemble per-image grids from tiles and write one GeoTIFF
    per image — the reference's dataSaver role with the input's
    georeference + NODATA + CRS. One-file-per-image text/tiff output is
    inherently a driver-side small-file sink (the parquet tile table is
    the scale sink); ``max_files`` guards against accidentally funnelling
    a corpus through the driver. ``compression`` (none/lzw/deflate),
    ``predictor`` (1/2/3) and ``tile_size`` (COG-style tiled layout,
    multiples of 16) pass through to the codec."""
    import os

    from .geotiff import encode_geotiff

    os.makedirs(out_dir, exist_ok=True)
    is_binary = dict(tiles.dtypes)[value_col] == "binary"
    has_crs = "crs" in tiles.columns  # per-image CRS overrides the default
    cols = ["image_id", "ty0", "th", "w", "h", "x0", "y0", "cellsize", value_col]
    if has_crs:
        cols.append("crs")
    it = tiles.select(*cols).orderBy("image_id", "ty0").toLocalIterator()
    n = 0
    cur, parts = None, []

    def flush():
        nonlocal n
        if cur is None:
            return
        # fail BEFORE writing file max_files+1: exporting exactly
        # max_files images succeeds, one more dies with zero extra bytes
        if max_files is not None and n >= max_files:
            raise RuntimeError(
                f"export_geotiffs exceeded max_files={max_files}; "
                "use the parquet tile sink for corpus-scale output"
            )
        iid, w, h, x0, y0, cs, img_crs = cur
        grid = np.vstack(parts)
        assert grid.shape == (h, w), (grid.shape, h, w)
        name = iid if str(iid).endswith((".tif", ".tiff")) else f"{iid}.tif"
        with open(f"{out_dir}/{name}", "wb") as f:
            f.write(encode_geotiff(grid, x0=x0, y0=y0, cellsize=cs,
                                   nodata=nodata, crs=img_crs,
                                   compression=compression,
                                   predictor=predictor, tile_size=tile_size))
        n += 1

    for r in it:
        key = (r.image_id, r.w, r.h, r.x0, r.y0, r.cellsize,
               r.crs if has_crs else crs)
        if cur is not None and key[0] != cur[0]:
            flush()
            parts = []
        cur = key
        v = r[value_col]
        block = (
            np.frombuffer(bytes(v), dtype="<f4")
            if is_binary
            else np.asarray(v, dtype=np.float32)
        )
        parts.append(block.reshape(r.th, r.w))
    flush()
    return n


def read_raster_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Loose raster files: .asc -> ESRI ASCII Grid parser; .tif/.tiff ->
    pure-NumPy GeoTIFF codec (real since round 2). A directory/glob with
    mixed content dispatches per file by magic bytes, one binaryFile scan."""
    if path_glob.endswith(".asc"):
        return read_ascii_grid(spark, path_glob)
    if path_glob.endswith((".tif", ".tiff")):
        return read_geotiff(spark, path_glob)

    from ..functions.phash import phash64
    from .geotiff import decode_geotiff

    files = spark.read.format("binaryFile").load(path_glob)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                    "caption", "phash", "x0", "y0",
                                    "cellsize", "nodata", "crs")}
            for r in pdf.itertuples(index=False):
                blob = bytes(r.content)
                name = r.path.rsplit("/", 1)[-1]
                if blob[:2] in (b"II", b"MM"):
                    grid, hdr = decode_geotiff(blob)
                    caption = f"geotiff {name} crs={hdr.get('crs')}"
                    file_crs = hdr.get("crs") or "ENGINE:PLANE"
                else:
                    grid, hdr = parse_ascii_grid(blob.decode("ascii"))
                    hdr = {"x0": hdr.get("xllcorner", 0.0),
                           "y0": hdr.get("yllcorner", 0.0),
                           "cellsize": hdr.get("cellsize", 1.0)}
                    caption = f"ascii grid {name}"
                    file_crs = "ENGINE:PLANE"
                rows["image_id"].append(name)
                rows["bytes"].append(codecs.encode(grid, "raw"))
                rows["w"].append(grid.shape[1])
                rows["h"].append(grid.shape[0])
                rows["fmt"].append("raw")
                rows["caption"].append(caption)
                rows["phash"].append(phash64(grid))
                rows["x0"].append(hdr["x0"])
                rows["y0"].append(hdr["y0"])
                rows["cellsize"].append(hdr["cellsize"])
                rows["nodata"].append(codecs.NODATA)
                rows["crs"].append(file_crs)
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(gen, schema=IMAGES_GEO_SCHEMA)
