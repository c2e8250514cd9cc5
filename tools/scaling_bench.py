"""Two-parallelism scaling evidence (BASELINE.md protocol; north rule B:14).

The rule requires >= 0.8 throughput-scaling efficiency from N to 4N
executors; no real cluster exists in the sandbox, so the sanctioned
evidence is the same job at local[8] vs local[32] on identical input
(driver instruction; SURVEY.md §6). Each measurement runs in a FRESH
subprocess (one JVM per parallelism level — getOrCreate would otherwise
reuse the first master).

Writes BENCH/BASELINE.md. Usage: python tools/scaling_bench.py [n_images] [edge]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1]); n_images = int(sys.argv[2]); edge = int(sys.argv[3])
from pycuda_raster_spark.session import get_spark
from pycuda_raster_spark.fixtures import CorpusSpec, build_zones, images_df
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.focal import focal_products
from pycuda_raster_spark.operators.zonal import zonal_stats
from pyspark.sql import functions as F

spark = get_spark(f"scale{cores}", cores=cores, shuffle_partitions=cores)
spec = CorpusSpec(n_images=n_images, w=edge, h=edge)
path = f"/tmp/scale_images_{n_images}_{edge}"
if not os.path.isdir(path):
    images_df(spark, spec).write.mode("overwrite").parquet(path)
images = spark.read.parquet(path)
zones = spark.createDataFrame(build_zones(16, res=6))
images.count()  # warm: JVM + file listing out of the timed section
# warm the python worker pool + codegen (both parallelism levels pay the
# same zero, so the efficiency ratio measures actual scaling)
@F.pandas_udf("double")
def _warm(s):
    return s * 1.0
spark.range(10000).withColumn("w", _warm(F.col("id").cast("double"))) \
    .groupBy((F.col("id") % 7)).count().write.format("noop").mode("overwrite").save()

t0 = time.time()
focal = focal_products(decode_tiles(images, tile_rows=64))
n_tiles = focal.count()
zs = zonal_stats(decode_tiles(images, tile_rows=64), zones)
n_zonal = zs.count()
dt = time.time() - t0
print(json.dumps({"cores": cores, "sec": dt, "tiles": n_tiles,
                  "zonal_rows": n_zonal,
                  "rows_per_sec": (n_tiles + n_zonal) / dt,
                  "pixels_per_sec": n_images * edge * edge / dt}))
"""


def run(cores: int, n_images: int, edge: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(n_images), str(edge)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    edge = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    lo = run(8, n_images, edge)
    hi = run(32, n_images, edge)
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4.0
    md = f"""# BENCH/BASELINE — measured numbers (round 1)

Protocol (BASELINE.md): same flagship job (decode -> tile+halo -> Horn
slope/aspect/hillshade -> PIP zonal stats), identical input
({n_images} images x {edge}x{edge} px synthetic corpus, seed 42), measured
at two parallelism levels on the 32-core host. Scaling efficiency
(N -> 4N) = (throughput@local[32] / throughput@local[8]) / 4.

| parallelism | wall sec | tiles | zonal rows | rows/sec | pixels/sec |
| --- | --- | --- | --- | --- | --- |
| local[8]  | {lo['sec']:.2f} | {lo['tiles']} | {lo['zonal_rows']} | {lo['rows_per_sec']:.1f} | {lo['pixels_per_sec']:.3e} |
| local[32] | {hi['sec']:.2f} | {hi['tiles']} | {hi['zonal_rows']} | {hi['rows_per_sec']:.1f} | {hi['pixels_per_sec']:.3e} |

**Scaling efficiency (8 -> 32 cores): {eff:.3f}** (target >= 0.8, north rule
BASELINE.json:14).

Raw JSON:
```json
{json.dumps(lo)}
{json.dumps(hi)}
```
"""
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
