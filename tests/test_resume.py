"""Resume/lineage tests (SURVEY.md §5.6; north rule B:14).

Partial run (subset of buckets marked done) + resumed run must converge to
the identical final table a fresh full run produces, with no duplicate
bucket rows; the streaming runner must be exactly-once across restarts.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, images_df as make_images
from pycuda_raster_spark.plans.pipeline import run_pipeline, with_bucket
from pycuda_raster_spark.streaming import manifest as mf

SPEC = CorpusSpec(n_images=20, w=32, h=32)
N_BUCKETS = 8


@pytest.fixture(scope="module")
def images_df(spark):
    return make_images(spark, SPEC).cache()


def _table_signature(spark, path):
    df = spark.read.parquet(path)
    rows = df.select("image_id", "tile_y", "slope", "aspect", "hillshade").collect()
    return {
        (r.image_id, r.tile_y): (bytes(r.slope), bytes(r.aspect), bytes(r.hillshade))
        for r in rows
    }


def test_resume_converges_to_full_run(spark, images_df, tmp_path):
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "partial")

    s_full = run_pipeline(spark, images_df, full_dir, n_buckets=N_BUCKETS,
                          run_id="full", compute_psnr=False)
    assert s_full["tile_rows_written"] > 0

    # partial: only images in buckets {0,1,2} processed first
    subset = with_bucket(images_df, N_BUCKETS).filter(F.col("bucket") <= 2).drop("bucket")
    s1 = run_pipeline(spark, subset, part_dir, n_buckets=N_BUCKETS,
                      run_id="r1", compute_psnr=False)
    assert set(s1["buckets_processed"]) <= {0, 1, 2}

    # resumed run over the FULL corpus must process exactly the complement
    s2 = run_pipeline(spark, images_df, part_dir, n_buckets=N_BUCKETS,
                      run_id="r2", compute_psnr=False)
    assert set(s1["buckets_processed"]).isdisjoint(s2["buckets_processed"])
    assert set(s1["buckets_processed"]) | set(s2["buckets_processed"]) == set(
        s_full["buckets_processed"]
    )

    # byte-identical final tables
    assert _table_signature(spark, f"{part_dir}/tiles") == _table_signature(
        spark, f"{full_dir}/tiles"
    )

    # idempotent third run: nothing left to do, no duplicate manifest work
    s3 = run_pipeline(spark, images_df, part_dir, n_buckets=N_BUCKETS,
                      run_id="r3", compute_psnr=False)
    assert s3["buckets_processed"] == []
    m = mf.read_manifest(spark, f"{part_dir}/manifest")
    per_bucket = (
        m.filter(F.col("stage") == "focal").groupBy("partition_id").count().collect()
    )
    assert all(r["count"] == 1 for r in per_bucket), "no duplicate done-rows"


def test_manifest_metrics_recorded(spark, images_df, tmp_path):
    out = str(tmp_path / "m")
    run_pipeline(spark, images_df, out, n_buckets=4, run_id="mm", compute_psnr=True)
    m = mf.read_manifest(spark, f"{out}/manifest").collect()
    assert len(m) == 4
    for r in m:
        assert r.status == "done" and r.rows > 0 and r.bytes > 0
        assert r.started_at is not None and r.finished_at >= r.started_at
        # q8 images exist in every bucket-size-4 split of 20 images; the
        # lossy roundtrip PSNR must clear the 40 dB invariant (B:15)
        if r.psnr_min is not None:
            assert r.psnr_min >= 40.0


def test_streaming_incremental_exactly_once(spark, images_df, tmp_path):
    from pycuda_raster_spark.streaming.stream import run_incremental

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = images_df.limit(8)
    first.write.mode("append").parquet(src)

    def n_jobs():
        # total jobs ever submitted (streaming jobs run outside the
        # default job group, so statusTracker.getJobIdsForGroup misses them)
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

    jobs_before = n_jobs()
    n1 = run_incremental(spark, src, out, ckpt, tile_rows=16)
    assert n1 == 8
    # one Spark job per epoch (the sink write; the image count rides it
    # as an observe() metric — round 2 ran a second count() job per epoch)
    assert n_jobs() - jobs_before == 1
    tiles1 = spark.read.parquet(f"{out}/tiles").count()
    assert tiles1 == 8 * 2  # 32 rows / 16 per tile

    # restart with no new data -> nothing reprocessed
    n2 = run_incremental(spark, src, out, ckpt, tile_rows=16)
    assert n2 == 0
    assert spark.read.parquet(f"{out}/tiles").count() == tiles1

    # land more files -> only the delta processed
    images_df.subtract(first).write.mode("append").parquet(src)
    n3 = run_incremental(spark, src, out, ckpt, tile_rows=16)
    assert n3 == SPEC.n_images - 8
    total = spark.read.parquet(f"{out}/tiles").count()
    assert total == SPEC.n_images * 2
    ids = spark.read.parquet(f"{out}/tiles").select("image_id").distinct().count()
    assert ids == SPEC.n_images