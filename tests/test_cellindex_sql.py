"""JVM cell index must be bit-identical to the NumPy reference impl."""

import numpy as np
from pyspark.sql import functions as F

from pycuda_raster_spark.functions import cellindex as ci
from pycuda_raster_spark.functions.cellindex_sql import cell_expr, kring_from_xy_expr


def _pts(spark, n=2000, seed=11):
    rng = np.random.default_rng(seed)
    x, y = rng.uniform(0, ci.WORLD, n), rng.uniform(0, ci.WORLD, n)
    df = spark.createDataFrame(
        [(i, float(x[i]), float(y[i])) for i in range(n)], "id long, x double, y double"
    )
    return df, x, y


def test_cell_expr_bit_identical(spark):
    df, x, y = _pts(spark)
    for res in (0, 4, 6, 11, 20, 26):
        got = {
            r.id: r.c
            for r in df.withColumn("c", cell_expr(F.col("x"), F.col("y"), res)).collect()
        }
        want = ci.cell(x, y, res)
        for i in range(len(x)):
            assert got[i] == int(want[i]), (res, i)


def test_kring_expr_matches_numpy(spark):
    df, x, y = _pts(spark, n=300, seed=12)
    res, k = 6, 2
    got = {
        r.id: set(r.kr)
        for r in df.withColumn(
            "kr", kring_from_xy_expr(F.col("x"), F.col("y"), res, k)
        ).collect()
    }
    cells = ci.cell(x, y, res)
    for i in range(len(x)):
        want = set(int(v) for v in ci.kring(np.int64(cells[i]), k))
        assert got[i] == want, i
