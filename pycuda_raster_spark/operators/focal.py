"""Focal stencil operator: tiles (+halos) -> slope/aspect/hillshade tiles.

The Spark-native replacement for the reference's per-chunk CUDA kernel
launch ([ref?: gpuCalc.py]; kernels per B:6). Each tile row is
self-contained once halos are attached, so the stencil is a ``mapInPandas``
— embarrassingly parallel, no grouping shuffle needed (the reference needed
a serial rolling buffer; we pre-attached the halos as data instead).

All three products are computed in ONE pass sharing dzdx/dzdy (the
reference's one-input-pass -> many-outputs fan-out, [ref?: scheduler.py
(output, func) pairs]) — at 10^12-image scale re-reading the corpus per
product would triple the dominant I/O cost.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.focal_kernels import horn_products

PRODUCTS = ("slope", "aspect", "hillshade")

FOCAL_SCHEMA = (
    "image_id string, tile_y int, ty0 int, th int, w int, h int, "
    "cellsize double, x0 double, y0 double, caption string, psnr double, "
    "slope array<float>, aspect array<float>, hillshade array<float>"
)


def focal_products(tiles: DataFrame, products: tuple[str, ...] = PRODUCTS) -> DataFrame:
    """tiles with halo_top/halo_bot -> per-tile product arrays (flattened
    row-major, same shape as px). Unrequested products come back null —
    Catalyst prunes them when the caller never selects them."""
    want = set(products)
    unknown = want - set(PRODUCTS)
    if unknown:
        raise ValueError(f"unknown products: {sorted(unknown)}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"], "tile_y": pdf["tile_y"],
                "ty0": pdf["ty0"], "th": pdf["th"], "w": pdf["w"],
                "h": pdf["h"], "cellsize": pdf["cellsize"], "x0": pdf["x0"],
                "y0": pdf["y0"], "caption": pdf["caption"],
                "psnr": pdf["psnr"],
                "slope": [None] * n, "aspect": [None] * n,
                "hillshade": [None] * n,
            }
            for i in range(n):
                th, w = int(pdf["th"].iat[i]), int(pdf["w"].iat[i])
                grid = np.asarray(pdf["px"].iat[i], dtype=np.float32).reshape(th, w)
                ht = pdf["halo_top"].iat[i]
                hb = pdf["halo_bot"].iat[i]
                s, a, hs = horn_products(
                    grid,
                    float(pdf["cellsize"].iat[i]),
                    halo_top=None if ht is None else np.asarray(ht, dtype=np.float32),
                    halo_bot=None if hb is None else np.asarray(hb, dtype=np.float32),
                )
                if "slope" in want:
                    out["slope"][i] = s.ravel()
                if "aspect" in want:
                    out["aspect"][i] = a.ravel()
                if "hillshade" in want:
                    out["hillshade"][i] = hs.ravel()
            yield pd.DataFrame(out)

    cols = ["image_id", "tile_y", "ty0", "th", "w", "h", "cellsize", "x0",
            "y0", "caption", "psnr", "px", "halo_top", "halo_bot"]
    return tiles.select(*cols).mapInPandas(gen, schema=FOCAL_SCHEMA)
