"""CLI entry point mirroring the reference's scheduler surface.

The reference is driven as ``python scheduler.py <in> <out1> <func1>
[<out2> <func2> ...]`` ([ref?: scheduler.py]; EP1 in SURVEY.md §3.1). The
engine keeps that exact shape:

    python -m pycuda_raster_spark INPUT OUT1 FUNC1 [OUT2 FUNC2 ...]
           [--tile-rows N] [--cores N]

INPUT: an images-table parquet path, or a directory/glob of raster files
(ESRI ASCII Grid .asc and/or GeoTIFF .tif). FUNC in {slope, aspect,
hillshade, tri, tpi, roughness} (the gdaldem product set). Each OUT
receives a parquet tile table for its product (one input pass computes
all requested products — the reference's multi-output fan-out).
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) for a in argv if a.startswith("--") and "=" in a)
    if len(args) < 3 or len(args) % 2 == 0:
        print(__doc__)
        return 2
    inp, pairs = args[0], list(zip(args[1::2], args[2::2]))
    products = tuple(func for _, func in pairs)
    from .operators.focal import ALL_PRODUCTS, decode_focal_arrow as decode_focal

    bad = set(products) - set(ALL_PRODUCTS)
    if bad:
        print(f"unknown products: {sorted(bad)}; available: {ALL_PRODUCTS}")
        return 2

    from .session import get_spark

    spark = get_spark("pycuda_raster_spark.cli", cores=opts.get("cores"))
    if inp.endswith(".asc") or inp.endswith("/") or not inp.endswith(".parquet"):
        try:
            images = spark.read.parquet(inp)
        except Exception:
            from .sources.rasters import read_raster_files

            images = read_raster_files(spark, inp)
    else:
        images = spark.read.parquet(inp)

    tile_rows = int(opts.get("tile-rows", 64))
    fused = decode_focal(images, tile_rows=tile_rows, products=products,
                         partitions=spark.sparkContext.defaultParallelism * 2)
    keep = ["image_id", "tile_y", "ty0", "th", "w", "h", "cellsize", "x0",
            "y0", "crs", "caption"]
    fused = fused.cache()
    for out, func in pairs:
        fused.select(*keep, func).write.mode("overwrite").parquet(out)
        print(f"wrote {func} tiles -> {out}")
    fused.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
