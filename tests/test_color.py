"""color-relief (gdaldem-style) — JVM-only ramp vs NumPy twin."""

import numpy as np

from pycuda_raster_spark.operators.color import (
    DEFAULT_RAMP,
    color_relief,
    ramp_numpy,
)

NODATA = -9999.0


def _tiles_df(spark, grids):
    rows = [
        (f"img{i}", 0, 0, g.shape[0], g.shape[1], g.shape[0],
         [float(x) for x in g.ravel()])
        for i, g in enumerate(grids)
    ]
    return spark.createDataFrame(
        rows, "image_id string, tile_y int, ty0 int, th int, w int, h int, "
              "px array<float>")


def test_color_relief_matches_numpy_twin(spark):
    rng = np.random.default_rng(11)
    g1 = rng.uniform(-50, 60000, size=(9, 7)).astype(np.float32)
    g1[2, 3] = NODATA
    # hit every breakpoint exactly + the clamps + interval interiors
    g2 = np.array([[e for e, *_ in DEFAULT_RAMP]
                   + [-1e9, 1e9, 250.0, 4999.5]], dtype=np.float32)
    out = {r.image_id: np.asarray(r.rgb, np.int64)
           for r in color_relief(_tiles_df(spark, [g1, g2])).collect()}
    for i, g in enumerate([g1, g2]):
        # engine input is float32; the twin must see the same values
        want = ramp_numpy(g.astype(np.float64))
        np.testing.assert_array_equal(out[f"img{i}"], want.ravel(), f"img{i}")
    # NODATA -> packed 0
    assert out["img0"][2 * 7 + 3] == 0


def test_color_relief_plan_is_python_free(spark):
    g = np.ones((4, 4), dtype=np.float32)
    plan = color_relief(_tiles_df(spark, [g]))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "FlatMapGroupsInPandas" not in plan
