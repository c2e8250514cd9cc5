"""True CRS reprojection (EPSG:4326 <-> EPSG:3857) vs whole-grid twin.

Golden methodology of the warp/resample suites: the tiled engine output
must equal ``reproject_grid`` (untiled NumPy twin) BIT-FOR-BIT across
tilings and both directions — the scalar-libm position chains + fixed op
order + float32 cast make equality exact. Out-of-extent destination
pixels are NODATA; bilinear NODATA poison follows the resample rule.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import (
    FMT_CYCLE,
    CorpusSpec,
    build_images,
    grid_for,
)
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.functions import mercator as mc
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.reproject import (
    NODATA,
    reproject_grid,
    reproject_tiles,
)

SPEC = CorpusSpec(n_images=6, w=48, h=40, nodata_every=3)

# re-headering factors are exact binary fractions: corpus world coords
# (x0 0..239, y0 0..119, cs 2.489) land at lat -40..-36 / lon 0..7.5 in
# the 4326 frame and plausible southern-hemisphere meters in 3857
GEO = {
    "EPSG:4326": (0.03125, 0.0, 0.03125, -40.0),
    "EPSG:3857": (1024.0, 0.0, 1024.0, -4500000.0),
}
# (out_h, out_w, dcell): dest grids deliberately overhang the source so
# NODATA framing is exercised alongside valid interior
DEST = {
    "EPSG:3857": (50, 40, 12000.0),
    "EPSG:4326": (40, 40, 0.03125),
}


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


def _reheadered(tiles, src_crs):
    xs, xo, ys, yo = GEO[src_crs]
    return (tiles
            .withColumn("x0", F.col("x0") * F.lit(xs) + F.lit(xo))
            .withColumn("y0", F.col("y0") * F.lit(ys) + F.lit(yo))
            .withColumn("cellsize", F.col("cellsize") * F.lit(xs))
            .withColumn("crs", F.lit(src_crs)))


def _src_geo(tiles, src_crs):
    xs, xo, ys, yo = GEO[src_crs]
    rows = (tiles.filter(F.col("ty0") == 0)
            .select("image_id", "x0", "y0", "cellsize").collect())
    return {r.image_id: (r.x0 * xs + xo, r.y0 * ys + yo, r.cellsize * xs)
            for r in rows}


def _collect_grids(out_df):
    rows = out_df.select("image_id", "ty0", "th", "w", "h", "px").collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r)
    grids = {}
    for iid, tiles in per.items():
        tiles.sort(key=lambda r: r.ty0)
        assert sum(t.th for t in tiles) == tiles[0].h
        grids[iid] = np.vstack(
            [np.asarray(t.px, dtype=np.float32).reshape(t.th, t.w)
             for t in tiles])
    return grids


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
@pytest.mark.parametrize("src_crs,dst_crs", [
    ("EPSG:4326", "EPSG:3857"),
    ("EPSG:3857", "EPSG:4326"),
])
@pytest.mark.parametrize("tile_rows,out_tile_rows", [(8, 8), (13, 5)])
def test_tiled_reproject_matches_twin(spark, images_df, method, src_crs,
                                      dst_crs, tile_rows, out_tile_rows):
    out_h, out_w, dcell = DEST[dst_crs]
    raw = decode_tiles(images_df, tile_rows=tile_rows)
    tiles = _reheadered(raw, src_crs)
    got = _collect_grids(reproject_tiles(
        tiles, out_h, out_w, dcell, src_crs=src_crs, dst_crs=dst_crs,
        method=method, out_tile_rows=out_tile_rows))
    assert set(got) == {f"img{i:06d}" for i in range(SPEC.n_images)}
    geo = _src_geo(decode_tiles(images_df, tile_rows=SPEC.h), src_crs)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        x0, y0, cs = geo[iid]
        want = reproject_grid(
            _decoded(i), out_h, out_w, dcell, x0=x0, y0=y0, cellsize=cs,
            src_crs=src_crs, dst_crs=dst_crs, method=method)
        np.testing.assert_array_equal(
            got[iid], want,
            err_msg=f"{iid} {method} {src_crs}->{dst_crs} tr={tile_rows}")
        # the dest grid must contain real values AND a NODATA fringe
        assert (want != np.float32(NODATA)).any(), iid
        assert (want == np.float32(NODATA)).any(), iid


def test_roundtrip_recovers_interior_nearest():
    """4326 -> 3857 -> 4326 with nearest at generous resolution is the
    identity on the interior (positions land back inside the same source
    cells)."""
    g = (np.arange(40 * 48, dtype=np.float32).reshape(40, 48) + 1.0)
    x0, y0, cs = 2.0, -40.0, 0.0625
    fwd = reproject_grid(g, 100, 96, 4000.0, x0=x0, y0=y0, cellsize=cs,
                         src_crs="EPSG:4326", dst_crs="EPSG:3857",
                         method="nearest")
    fx0, fy0 = mc.lon_to_merc(x0), mc.lat_to_merc(y0)
    back = reproject_grid(fwd, 40, 48, cs, x0=fx0, y0=fy0, cellsize=4000.0,
                          src_crs="EPSG:3857", dst_crs="EPSG:4326",
                          method="nearest",
                          dx_off=x0, dy_off=y0, absolute_origin=True)
    valid = back != np.float32(NODATA)
    # interior recovery: everything the dense intermediate grid covered
    assert valid.mean() > 0.9
    np.testing.assert_array_equal(back[valid], g[valid])


def test_reproject_geo_metadata(spark, images_df):
    tiles = _reheadered(decode_tiles(images_df, tile_rows=8), "EPSG:4326")
    row = (reproject_tiles(tiles, 10, 12, 8000.0)
           .filter("image_id = 'img000000' and tile_y = 0").first())
    src = tiles.filter("image_id = 'img000000'").first()
    assert row.cellsize == 8000.0
    assert row.x0 == mc.lon_to_merc(src.x0)
    assert row.y0 == mc.lat_to_merc(src.y0)
    assert row.crs == "EPSG:3857"
    assert (row.h, row.w) == (10, 12)


def test_reproject_absolute_origin_shared_canvas(spark, images_df):
    """absolute_origin=True projects every image onto ONE dest grid —
    the mosaic-composition framing; origins are the given world coords."""
    tiles = _reheadered(decode_tiles(images_df, tile_rows=8), "EPSG:4326")
    dy0 = mc.lat_to_merc(-40.0)
    out = reproject_tiles(tiles, 16, 16, 20000.0, dx_off=0.0, dy_off=dy0,
                          absolute_origin=True)
    rows = out.select("x0", "y0", "h", "w").distinct().collect()
    assert len(rows) == 1
    assert rows[0].x0 == 0.0 and rows[0].y0 == dy0


def test_reproject_rejects_bad_args(spark, images_df):
    tiles = decode_tiles(images_df, tile_rows=8)
    with pytest.raises(ValueError, match="unsupported CRS pair"):
        reproject_tiles(tiles, 8, 8, 1.0, src_crs="EPSG:4326",
                        dst_crs="EPSG:32632")
    with pytest.raises(ValueError, match="unsupported method"):
        reproject_tiles(tiles, 8, 8, 1.0, method="cubic")
    with pytest.raises(ValueError, match="non-empty"):
        reproject_tiles(tiles, 0, 8, 1.0)


def test_reproject_plan_is_jvm_routed(spark, images_df):
    tiles = _reheadered(decode_tiles(images_df, tile_rows=8), "EPSG:4326")
    plan = reproject_tiles(tiles, 24, 20, 9000.0)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_cli_reproject_then_products(spark, tmp_path):
    """--reproject composes the CRS transform with the product pipeline
    (same runner as --warp): the reprojected dem equals the NumPy twin
    on .asc input whose headers are real lat/lon degrees."""
    from pycuda_raster_spark.__main__ import main
    from pycuda_raster_spark.sources.rasters import write_ascii_grid

    rng = np.random.default_rng(11)
    g = (rng.random((40, 48)) * 100).astype(np.float32)
    x0, y0, cs = 2.0, -40.0, 0.0625
    dems = tmp_path / "dems"
    dems.mkdir()
    (dems / "d0.asc").write_text(write_ascii_grid(g, x0, y0, cs))

    out_d = str(tmp_path / "dem")
    assert main([str(dems), out_d, "dem",
                 "--reproject=44x52", "--tile-rows=16", "--cores=4"]) == 0

    rows = sorted(spark.read.parquet(out_d).collect(), key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.dem, np.float32).reshape(r.th, r.w)
                     for r in rows])
    dc = (cs * mc.RAD) * mc.RM  # CLI default: equator-scale cellsize
    want = reproject_grid(g, 44, 52, dc, x0=x0, y0=y0, cellsize=cs,
                          src_crs="EPSG:4326", dst_crs="EPSG:3857",
                          method="bilinear")
    np.testing.assert_array_equal(got, want)
    assert rows[0].crs == "EPSG:3857"
    assert rows[0].y0 == mc.lat_to_merc(y0)
