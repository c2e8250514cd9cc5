"""Halo-row exchange + tile reassembly over a materialized tiles table.

``halo_exchange`` is the engine's standalone version of the reference's
carry-rows-between-chunks buffer ([ref?: gpuCalc.py rolling halo buffer];
behavior per B:6 "halo-row exchange between tile partitions"): when tiles
were persisted WITHOUT halos (e.g. read back from the tile store), each
tile's boundary rows are replicated to its tile_y neighbors.

Shape (r4): a SLIM edge-row join, not a per-image window. The original
lag/lead window partitioned by ``image_id`` — which funnels EVERY tile of
an image through one task, serializing exactly the case that matters most
at scale: one huge raster (a mosaic canvas, a continent-sized DEM). The
join form projects each tile's first/last pixel row (w floats, not the
payload) into an edges table keyed by the NEIGHBOR's (image_id, tile_y);
two left equi-joins attach halo_top/halo_bot. The edge sides are tiny, so
AQE broadcasts them and the pixel payload is never shuffled at all; past
the broadcast threshold it degrades to a shuffle on the fine-grained
(image_id, tile_y) key — parallel regardless of per-image tile counts.
Pure built-in expressions throughout (slice carves the rows JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    first_row = F.expr("slice(px, 1, w)")
    last_row = F.expr("slice(px, (th - 1) * w + 1, w)")
    base = tiles.drop("halo_top", "halo_bot")
    up = base.select(
        "image_id", (F.col("tile_y") + 1).alias("tile_y"),
        last_row.alias("halo_top"))
    down = base.select(
        "image_id", (F.col("tile_y") - 1).alias("tile_y"),
        first_row.alias("halo_bot"))
    return (
        base.join(up, ["image_id", "tile_y"], "left")
        .join(down, ["image_id", "tile_y"], "left")
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
