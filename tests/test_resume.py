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

def test_read_as_of_time_travel(spark, images_df, tmp_path):
    """Snapshot reads over the incremental sink: AS OF epoch 0 sees only
    the first batch's tiles forever (epoch dirs are immutable), AS OF the
    latest epoch sees everything; the epoch filter prunes partitions."""
    from pycuda_raster_spark.streaming.stream import (
        latest_epoch,
        read_as_of,
        run_incremental,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = images_df.limit(8)
    first.write.mode("append").parquet(src)
    assert run_incremental(spark, src, out, ckpt, tile_rows=16) == 8
    snap0 = {r.image_id for r in read_as_of(spark, out, 0).collect()}
    assert snap0 == {r.image_id for r in first.collect()}

    images_df.subtract(first).write.mode("append").parquet(src)
    run_incremental(spark, src, out, ckpt, tile_rows=16)
    cur = latest_epoch(spark, out)
    assert cur >= 1
    # history is immutable; the current snapshot sees the full corpus
    assert {r.image_id for r in read_as_of(spark, out, 0).collect()} == snap0
    assert ({r.image_id for r in read_as_of(spark, out, cur).collect()}
            == {r.image_id for r in images_df.collect()})
    # partition pruning: epoch filter reaches the scan
    plan = read_as_of(spark, out, 0)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters: [isnotnull(epoch" in plan.replace("#", "") or \
           "epoch" in plan.split("PartitionFilters")[1][:120]


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicate event_ids arriving within the
    watermark horizon are dropped (state bounded by the watermark);
    the batch fallback shares the definition."""
    import datetime as dt

    from pycuda_raster_spark.streaming.stream import dedup_stream

    src = str(tmp_path / "events")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(i % 6, t0 + dt.timedelta(seconds=i)) for i in range(18)]
    spark.createDataFrame(rows, "event_id long, ts timestamp").write.mode(
        "append").parquet(src)

    stream = (spark.readStream
              .schema("event_id long, ts timestamp").parquet(src))
    q = (dedup_stream(stream, ["event_id"], "ts", "1 hour")
         .writeStream.format("memory").queryName("dedup_sink")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM dedup_sink").collect()
    assert sorted(r.event_id for r in got) == [0, 1, 2, 3, 4, 5]

    batch = spark.read.parquet(src)
    assert dedup_stream(batch, ["event_id"]).count() == 6


def test_catalog_adapter_dispatch_and_snapshot(spark, tmp_path):
    """The backend-dispatching Catalog runs the same scenarios on either
    backend; in this sandbox (no Iceberg jars) it must select the parquet
    emulation and honor overwrite-partitions + append + epoch snapshot
    semantics through the one API (VERDICT r3 #9)."""
    from pycuda_raster_spark.sources.catalog import Catalog, iceberg_available

    assert not iceberg_available(spark)  # sandbox has no jars
    cat = Catalog(spark, str(tmp_path / "tables"))
    assert cat.backend == "parquet"

    df = spark.createDataFrame(
        [(0, 0, "a"), (0, 1, "b"), (1, 0, "c")], "epoch int, k int, v string")
    cat.write(df, "t", partition_by=["epoch"])
    assert cat.read("t").count() == 3

    # partition overwrite replaces only epoch=0
    df2 = spark.createDataFrame([(0, 9, "z")], "epoch int, k int, v string")
    cat.overwrite_partitions(df2, "t", partition_by=["epoch"])
    got = {(r.epoch, r.k, r.v) for r in cat.read("t").collect()}
    assert got == {(0, 9, "z"), (1, 0, "c")}

    # append + snapshot read as-of epoch
    cat.append(spark.createDataFrame([(2, 5, "w")], "epoch int, k int, v string"),
               "t", partition_by=["epoch"])
    asof1 = {(r.epoch, r.k, r.v) for r in cat.read_version("t", 1).collect()}
    assert asof1 == {(0, 9, "z"), (1, 0, "c")}
    asof2 = {(r.epoch, r.k, r.v) for r in cat.read_version("t", 2).collect()}
    assert asof2 == {(0, 9, "z"), (1, 0, "c"), (2, 5, "w")}
