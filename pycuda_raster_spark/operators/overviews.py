"""Overview / pyramid builder (gdaladdo parity; VERDICT r4 next #8):
reduced-resolution levels of every raster as ONE tiles-shaped table with
a ``level`` column — the pre-aggregation step tile servers and quick-look
consumers run on every dataset.

Each level k is computed DIRECTLY from the base grid via
``resample_tiles`` (center-aligned rational sampling), so level k is
bit-for-bit the standalone /k resample — the pyramid adds no new
numerics to trust (gdaladdo's from-base mode; the from-previous cascade
is cheaper at extreme level counts but changes values for bilinear and
is deliberately not the default here). All levels share one scan of the
base tiles when the source is pinned; each level's band routing reads
only the rows it needs.

Writes partition cleanly: ``df.write.partitionBy("level")`` gives the
standard ``level=k/`` overview directory layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .resample import NODATA, resample_tiles


def build_overviews(
    tiles: DataFrame,
    levels: tuple[int, ...] = (2, 4, 8),
    method: str = "nearest",
    base_h: int | None = None,
    base_w: int | None = None,
    out_tile_rows: int = 8,
    nodata: float = NODATA,
    pinned: bool = True,
) -> DataFrame:
    """Overview levels for every image in ``tiles`` (uniform grid —
    resample's contract): a tiles-shaped DataFrame with an int ``level``
    column (one row set per factor in ``levels``). Level k is
    ``ceil(h/k) x ceil(w/k)``, bit-identical to ``resample_tiles`` at
    that size. ``base_h``/``base_w`` skip the one-row grid-size lookup
    when the caller knows them."""
    if not levels or any(int(k) < 2 for k in levels):
        raise ValueError("levels must be factors >= 2")
    if len(set(levels)) != len(levels):
        raise ValueError("levels must be distinct")
    if pinned:
        tiles = tiles.localCheckpoint(eager=True)
    if base_h is None or base_w is None:
        first = tiles.select("h", "w").first()
        base_h, base_w = int(first["h"]), int(first["w"])

    out = None
    for k in levels:
        k = int(k)
        lv = resample_tiles(
            tiles, -(-base_h // k), -(-base_w // k), method=method,
            out_tile_rows=out_tile_rows, nodata=nodata,
        ).withColumn("level", F.lit(k))
        out = lv if out is None else out.unionByName(lv)
    return out
