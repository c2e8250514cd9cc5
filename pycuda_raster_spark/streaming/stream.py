"""Structured Streaming incremental runner (SURVEY.md §2.8 op 43).

The reference's pipeline is a bounded stream with backpressure via process
pipes ([ref?: scheduler.py 3-process design]). The Spark-native incremental
mode: ``readStream`` over the images table directory with
``Trigger.AvailableNow`` + checkpoint — newly landed image files are
delivered in exactly one epoch, each epoch's sink write is idempotent
(per-epoch overwrite), and a restart resumes from the checkpoint offsets
— effectively-once end to end. The per-batch body is the SAME batch pipeline
(decode -> stencil), so batch and streaming share one code path via
``foreachBatch``.

This complements (not replaces) the manifest resume: the manifest tracks
logical buckets for mid-stage re-runs and lineage queries; the stream
checkpoint tracks source files for incremental ingest.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.decode import decode_tiles
from ..operators.focal import focal_products

IMAGES_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def run_incremental(
    spark: SparkSession,
    images_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    tile_rows: int = 32,
    extra_image_cols: str = "",
) -> int:
    """Process all not-yet-seen image files under ``images_dir`` through the
    focal pipeline into ``out_dir``. Effectively-once sink: the source
    checkpoint guarantees each file is delivered in exactly one epoch, and
    each epoch OVERWRITES its own partition directory
    (``tiles/epoch=<id>``), so a foreachBatch replay after a mid-write
    failure rewrites the same directory instead of appending duplicates —
    the standard idempotent-foreachBatch pattern (a blind append would be
    at-least-once). Returns the number of IMAGES processed this invocation
    (0 on a no-new-data restart)."""
    ddl = IMAGES_DDL + (", " + extra_image_cols if extra_image_cols else "")
    src = (
        spark.readStream.schema(T._parse_datatype_string(ddl))
        .option("maxFilesPerTrigger", 64)
        .parquet(images_dir)
    )
    from pyspark.sql import Observation

    n_written = {"n": 0}

    def process(batch_df, epoch_id: int) -> None:
        # image count rides the epoch's one write action as an observe()
        # metric — round 2 ran a separate count() job per epoch purely
        # for the return value, doubling the scan on the streaming hot path
        obs = Observation()
        batch_df = batch_df.observe(obs, F.count(F.lit(1)).alias("n_images"))
        tiles = decode_tiles(batch_df, tile_rows=tile_rows)
        focal_products(tiles).write.mode("overwrite").parquet(
            f"{out_dir}/tiles/epoch={epoch_id}"
        )
        n_written["n"] += obs.get["n_images"]

    q = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_written["n"]


def read_as_of(spark: SparkSession, out_dir: str, epoch: int):
    """Snapshot (time-travel) read of the incremental sink: the tile table
    AS OF epoch N = the union of epoch directories <= N. Epochs are
    append-only by construction (each epoch overwrites only ITS OWN
    partition directory), so historical epochs are immutable and this is
    a true Iceberg-style ``VERSION AS OF`` over the emulated layout —
    partition pruning keeps the scan to the selected epochs."""
    return (
        spark.read.option("basePath", f"{out_dir}/tiles")
        .parquet(f"{out_dir}/tiles")
        .filter(F.col("epoch") <= epoch)
    )


def latest_epoch(spark: SparkSession, out_dir: str) -> int:
    """Highest committed epoch id (the current snapshot), from the
    partition directory listing — no data scan."""
    row = (spark.read.parquet(f"{out_dir}/tiles")
           .select(F.max("epoch").alias("e")).first())
    return -1 if row.e is None else int(row.e)


def dedup_stream(events, id_cols, event_time_col: str = "ts",
                 delay: str = "10 minutes"):
    """Streaming EXACT dedup: drop duplicate ``id_cols`` arrivals within
    the watermark horizon (``dropDuplicatesWithinWatermark`` — state for
    an id is held only until the watermark passes it, so state is bounded
    at 100 TB/day stream rates, unlike an unbounded dropDuplicates).
    Batch DataFrames fall back to plain dropDuplicates (one definition,
    both execution modes — same contract as streaming/windows.py)."""
    if not events.isStreaming:
        return events.dropDuplicates(id_cols)
    return (events.withWatermark(event_time_col, delay)
            .dropDuplicatesWithinWatermark(id_cols))
