"""Halo-row exchange + tile reassembly over a materialized tiles table.

``halo_exchange`` is the engine's standalone version of the reference's
carry-rows-between-chunks buffer ([ref?: gpuCalc.py rolling halo buffer];
behavior per B:6 "halo-row exchange between tile partitions"): when tiles
were persisted WITHOUT halos (e.g. read back from the tile store), a
lag/lead window over ``tile_y`` within each image replicates each tile's
boundary rows to its neighbors. Pure built-in expressions — the boundary
rows are carved out with ``slice`` (JVM-side, no Python), and the only cost
is one hash-partition shuffle on ``image_id``, which the subsequent
grouped/stencil stages reuse.

At 100 TB scale this matters: the alternative (self-join tiles on
``tile_y±1``) would shuffle the full pixel payload twice; lag/lead moves
each boundary row exactly once and keeps whole-stage codegen for the
slicing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def strip_halos(tiles: DataFrame) -> DataFrame:
    return tiles.withColumn("halo_top", F.lit(None).cast("array<float>")).withColumn(
        "halo_bot", F.lit(None).cast("array<float>")
    )


def halo_exchange(tiles: DataFrame) -> DataFrame:
    """Attach halo_top/halo_bot to a halo-less tiles DataFrame.

    halo_top(tile t) = last pixel row of tile t-1; halo_bot = first pixel
    row of tile t+1; null at true image edges (NODATA policy applies there,
    SURVEY.md §2.2 op 9).
    """
    w = Window.partitionBy("image_id").orderBy("tile_y")
    first_row = F.expr("slice(px, 1, w)")
    last_row = F.expr("slice(px, (th - 1) * w + 1, w)")
    return (
        tiles.drop("halo_top", "halo_bot")
        .withColumn("halo_top", F.lag(last_row).over(w))
        .withColumn("halo_bot", F.lead(first_row).over(w))
    )


def reassemble(tiles: DataFrame, value_col: str = "px") -> DataFrame:
    """tiles -> one row per image with the full grid flattened row-major —
    the saver's write-rows-in-order guarantee ([ref?: dataSaver.py]) as an
    order-aware aggregate: sort_array over (ty0, block) structs, then
    flatten. Deterministic regardless of partitioning."""
    return (
        tiles.groupBy("image_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("ty0", F.col(value_col).alias("v")))),
                    lambda s: s["v"],
                )
            ).alias(value_col),
            F.first("w").alias("w"),
            F.first("h").alias("h"),
        )
    )
