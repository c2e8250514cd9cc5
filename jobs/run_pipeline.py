"""spark-submit entry point for the flagship pipeline (north rule B:14:
"launches via spark-submit --py-files").

Package + launch:

    cd /root/repo && zip -r /tmp/engine.zip pycuda_raster_spark
    spark-submit --master local[32] \
        --py-files /tmp/engine.zip \
        jobs/run_pipeline.py \
        --images /data/images_parquet --out /data/run1 \
        --zones /data/zones_parquet --buckets 64 --tile-rows 64 --resume

On a real cluster the same command takes ``--master yarn``/``k8s://...``;
nothing in the engine assumes local mode (partitioning is explicit,
shuffle/broadcast decisions are data-size driven, resume state lives in
the output table's manifest).

``--synthetic N`` generates the deterministic fixture corpus instead of
reading ``--images`` (for smoke runs in environments without data).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="parquet path of the images table")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic images instead of --images")
    ap.add_argument("--edge", type=int, default=128,
                    help="synthetic image edge length")
    ap.add_argument("--zones", help="parquet path of the zones table (optional)")
    ap.add_argument("--out", required=True, help="output table root")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--tile-rows", type=int, default=64)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--no-psnr", dest="psnr", action="store_false", default=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pycuda_raster_spark.plans.pipeline import run_pipeline

    spark = SparkSession.builder.appName("pycuda_raster_spark.pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from pycuda_raster_spark.fixtures import CorpusSpec, images_df

        images = images_df(
            spark, CorpusSpec(n_images=args.synthetic, w=args.edge, h=args.edge)
        )
    else:
        if not args.images:
            ap.error("--images or --synthetic required")
        images = spark.read.parquet(args.images)

    zones = spark.read.parquet(args.zones) if args.zones else None
    summary = run_pipeline(
        spark, images, args.out, zones=zones, tile_rows=args.tile_rows,
        n_buckets=args.buckets, run_id=args.run_id, resume=args.resume,
        compute_psnr=args.psnr,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
