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


# ---------------------------------------------------------------------------
# Real-Iceberg adapter, gated on jar presence (VERDICT r3 #9). The sandbox
# ships no Iceberg jars, so there the adapter transparently falls back to
# the parquet emulation above — but the DataFrameWriterV2 code path is
# real, so on a cluster with iceberg-spark-runtime on the classpath the
# same calls produce genuine Iceberg tables (ACID commits, snapshot ids,
# VERSION AS OF) with no engine-code change.
# ---------------------------------------------------------------------------

def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath AND a
    catalog is configured (both are required for ``writeTo`` to commit)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    except Exception:
        return False
    # some catalog must be declared Iceberg-backed
    for k in ("spark.sql.catalog.spark_catalog", "spark.sql.catalog.iceberg"):
        if "Iceberg" in (spark.conf.get(k, "") or ""):
            return True
    return False


class Catalog:
    """Backend-dispatching table catalog: the engine addresses tables by
    NAME; Iceberg handles them natively when available, otherwise each
    table is a partitioned-parquet directory under ``base_path`` with the
    emulated overwrite/append semantics. One API, two backends — the
    tests run the same scenarios against whichever is present."""

    def __init__(self, spark: SparkSession, base_path: str,
                 namespace: str = "spark_catalog.default"):
        self.spark = spark
        self.base_path = base_path
        self.namespace = namespace
        self.backend = "iceberg" if iceberg_available(spark) else "parquet"

    def _ident(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    def _path(self, table: str) -> str:
        return os.path.join(self.base_path, table)

    def write(self, df: DataFrame, table: str,
              partition_by: list[str] | None = None) -> None:
        """Create-or-replace the table contents (full snapshot replace on
        Iceberg; dynamic-partition overwrite on the emulation — the two
        agree when ``df`` covers every live partition, which is the
        engine's usage)."""
        if self.backend == "iceberg":
            w = df.writeTo(self._ident(table))
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            write(df, self._path(table), partition_by)

    def overwrite_partitions(self, df: DataFrame, table: str,
                             partition_by: list[str]) -> None:
        """Replace only the partitions present in ``df`` (Iceberg
        ``overwritePartitions``; emulated via dynamic partitionOverwriteMode)
        — the idempotent-resume primitive."""
        if self.backend == "iceberg":
            df.writeTo(self._ident(table)).overwritePartitions()
        else:
            write(df, self._path(table), partition_by)

    def append(self, df: DataFrame, table: str,
               partition_by: list[str] | None = None) -> None:
        if self.backend == "iceberg":
            df.writeTo(self._ident(table)).append()
        else:
            append(df, self._path(table), partition_by)

    def read(self, table: str) -> DataFrame:
        if self.backend == "iceberg":
            return self.spark.table(self._ident(table))
        return read(self.spark, self._path(table))

    def read_version(self, table: str, version: int) -> DataFrame:
        """Snapshot read. Iceberg: ``VERSION AS OF`` by snapshot id.
        Emulation: tables written with an ``epoch`` partition column are
        read as-of that epoch (the append-only per-epoch layout the
        streaming sink produces — see streaming/stream.read_as_of)."""
        if self.backend == "iceberg":
            return self.spark.read.option("versionAsOf", version).table(
                self._ident(table))
        from pyspark.sql import functions as F

        df = read(self.spark, self._path(table))
        if "epoch" not in df.columns:
            raise ValueError(
                f"emulated table {table} has no epoch column; snapshot "
                "reads need the per-epoch append-only layout")
        return df.filter(F.col("epoch") <= version)
