"""Iceberg-shaped table layer: partitioned Parquet + manifest semantics.

The north rule targets Iceberg tables (B:14); the sandbox has no Iceberg
jars (SURVEY.md §7), so this catalog emulates the parts the engine needs —
partitioned writes with per-partition overwrite (idempotent re-runs),
appends, snapshot reads — behind a small API (``write``/``append``/
``read``) so real Iceberg (``df.writeTo(table)``) is a drop-in swap later.

Exactly-once story for resume: partition-dynamic OVERWRITE means re-running
a half-finished bucket replaces its files instead of duplicating them; the
lineage manifest (streaming/manifest.py) is appended only after the data
write returns, so "manifest says done" implies "data is complete".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write(df: DataFrame, path: str, partition_by: list[str] | None = None,
          mode: str = "overwrite") -> None:
    """Dynamic-partition-overwrite write: only partitions present in ``df``
    are replaced (Iceberg's overwrite-by-filter analogue)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def append(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") or f.startswith(("part-", "bucket")) or "=" in f
        for f in os.listdir(path)
    )
