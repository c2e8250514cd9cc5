"""Per-partition lineage + metrics manifest (north rule B:14).

The manifest is the engine's durable state — the role the reference's
in-flight pipe buffers played, made queryable: one row per (run, stage,
partition bucket) with row/byte/psnr metrics and timestamps
(FIXTURES.md §5 shape). Resume = anti-join against completed buckets
(SURVEY.md §2.3 op 19); the data write uses dynamic partition overwrite
(sources/catalog.py) so a re-run of a crashed bucket is idempotent.

Timestamps: ``started_at``/``finished_at`` are real wall-clock audit
columns (they never participate in correctness or bucketing — determinism
applies to data, not lineage audit fields).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import catalog

MANIFEST_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType()),
    T.StructField("stage", T.StringType()),
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("rows", T.LongType()),
    T.StructField("bytes", T.LongType()),
    T.StructField("psnr_min", T.DoubleType()),
    T.StructField("started_at", T.TimestampType()),
    T.StructField("finished_at", T.TimestampType()),
    T.StructField("status", T.StringType()),
])


def append_entries(spark: SparkSession, manifest_path: str, entries: list[dict]) -> None:
    rows = []
    for e in entries:
        e = dict(e)
        e.setdefault("psnr_min", None)
        e.setdefault("status", "done")
        rows.append((
            e["run_id"], e["stage"], int(e["partition_id"]), int(e["rows"]),
            int(e["bytes"]), e["psnr_min"], e["started_at"], e["finished_at"],
            e["status"],
        ))
    catalog.append(spark.createDataFrame(rows, MANIFEST_SCHEMA), manifest_path)


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    if not catalog.exists(manifest_path):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.parquet(manifest_path)


def completed(spark: SparkSession, manifest_path: str, stage: str) -> DataFrame:
    """Distinct bucket ids with status='done' for ``stage`` — the anti-join
    right side for resume. Duplicate manifest rows (e.g. two racing
    retries) collapse here, so re-appends are harmless."""
    m = read_manifest(spark, manifest_path)
    return (
        m.filter((F.col("stage") == stage) & (F.col("status") == "done"))
        .select(F.col("partition_id").alias("bucket"))
        .distinct()
    )


def now() -> _dt.datetime:
    return _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
