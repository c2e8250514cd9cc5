"""Extra benchmarks for the optimization rounds (guide §1: measure first).

NOT part of the driver contract — ``bench.py`` is frozen for measurement.
This harness isolates individual declared queries with the noop sink,
captures ``.explain("formatted")`` into ``plans/<tag>/<query>_<suffix>.txt``
and prints per-query best-of-N seconds with host-capacity probes so a
reader can tell a regression from a throttled window (CLAUDE.md noise
notes).

Usage:
  python bench_extra.py [--sf-dir DIR] [--n N] [--tag r06] [--suffix before]
                        [--plans-only] [--raster] [query ...]

Defaults to the bench.py headline query set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary", "q03_shipping_priority", "q05_region_revenue",
    "q_window_topk", "q_salted_agg", "q_sessionize",
    "q_text_stats", "q_minhash_pairs_lsh", "q_ann_topk",
]


def probe_1t() -> int:
    import numpy as np
    a = np.random.rand(600, 600)
    t0, k = time.time(), 0
    while time.time() - t0 < 2:
        a @ a
        k += 1
    return k


def probe_mt(n_threads: int = 16) -> int:
    import threading

    import numpy as np
    counts = [0] * n_threads
    stop = time.time() + 2

    def work(i: int) -> None:
        a = np.random.rand(600, 600)
        while time.time() < stop:
            a @ a
            counts[i] += 1

    ts = [threading.Thread(target=work, args=(i,)) for i in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return sum(counts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3, help="timed runs per query")
    ap.add_argument("--tag", default="r06")
    ap.add_argument("--suffix", default=None,
                    help="write plans/<tag>/<q>_<suffix>.txt when set")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--raster", action="store_true",
                    help="also time the raster pipeline stages in isolation")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pycuda_raster_spark.session import get_spark
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)

    import __spark_entry__ as ent
    qs = ent.queries()
    names = args.queries or HEADLINE

    plan_dir = None
    if args.suffix:
        plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "plans", args.tag)
        os.makedirs(plan_dir, exist_ok=True)

    out: dict = {"sf_dir": args.sf_dir, "probe_before_1t": probe_1t(),
                 "probe_before_mt16": probe_mt(), "queries": {},
                 "samples": {}}

    for name in names:
        fn = qs[name]
        df = fn(spark, args.sf_dir)
        if plan_dir:
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.suffix}.txt"),
                      "w") as f:
                f.write(plan)
        if args.plans_only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for i in range(args.n + 1):  # +1 untimed warmup
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            dt = round(time.time() - t0, 3)
            if i:
                samples.append(dt)
        out["queries"][name] = min(samples)
        out["samples"][name] = samples
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: best={min(samples)} samples={samples}",
              file=sys.stderr)

    if args.raster and not args.plans_only:
        from pycuda_raster_spark.fixtures import (
            CorpusSpec, build_zones, images_df_distributed)
        from pycuda_raster_spark.operators.focal import decode_focal_arrow
        from pycuda_raster_spark.operators.zonal import zonal_stats_from_partials
        n_images = int(os.environ.get("BENCH_IMAGES", "1024"))
        img_edge = int(os.environ.get("BENCH_IMG", "256"))
        spec = CorpusSpec(n_images=n_images, w=img_edge, h=img_edge)
        src = f"/dev/shm/bench_images_{n_images}_{img_edge}"
        if not os.path.isdir(src):
            images_df_distributed(spark, spec, partitions=64).write.mode(
                "overwrite").parquet(src)
        spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "64")
        images = spark.read.parquet(src)
        zones = spark.createDataFrame(build_zones(16, res=6))
        images.count()
        SLIM = ["image_id", "tile_y", "ty0", "th", "w", "x0", "y0",
                "cellsize", "pn", "ps", "pss", "pmin", "pmax"]
        decode_focal_arrow(images.limit(32), tile_rows=64).write.format(
            "noop").mode("overwrite").save()
        stages = {
            "raster_products": lambda: decode_focal_arrow(
                images, tile_rows=64).write.format("noop").mode(
                "overwrite").save(),
            "raster_partials_zonal": lambda: zonal_stats_from_partials(
                decode_focal_arrow(images, tile_rows=64, products=())
                .select(*SLIM), zones).collect(),
        }
        for sname, run in stages.items():
            spark.sparkContext.setJobDescription(f"bench_extra:{sname}")
            samples = []
            for i in range(args.n + 1):
                t0 = time.time()
                run()
                dt = round(time.time() - t0, 3)
                if i:
                    samples.append(dt)
            out["queries"][sname] = min(samples)
            out["samples"][sname] = samples
            print(f"  {sname}: best={min(samples)} samples={samples}",
                  file=sys.stderr)

    out["probe_after_1t"] = probe_1t()
    out["probe_after_mt16"] = probe_mt()
    out["total_best"] = round(sum(out["queries"].values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
