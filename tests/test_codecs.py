"""Decode invariants (SURVEY.md §5.4): lossless exact, lossy PSNR >= 40 dB."""

import numpy as np

from pycuda_raster_spark.fixtures import CorpusSpec, grid_for
from pycuda_raster_spark.functions.codecs import NODATA, decode, encode, psnr

SPEC = CorpusSpec(n_images=8)


def test_raw_roundtrip_exact():
    g = grid_for(0, SPEC)
    assert np.array_equal(decode(encode(g, "raw"), "raw", g.shape[1], g.shape[0]), g)


def test_png_roundtrip_exact():
    g = grid_for(1, SPEC)  # fmt cycle: index 1 is png -> integer-valued grid
    out = decode(encode(g, "png"), "png", g.shape[1], g.shape[0])
    assert np.array_equal(out, g)


def test_png_nodata_roundtrip():
    g = grid_for(1, SPEC).copy()
    g[3:7, 3:7] = NODATA
    out = decode(encode(g, "png"), "png", g.shape[1], g.shape[0])
    assert np.array_equal(out, g)


def test_q8_lossy_psnr_over_40db():
    g = grid_for(2, SPEC)
    out = decode(encode(g, "q8"), "q8", g.shape[1], g.shape[0])
    assert psnr(g, out) >= 40.0
    # NODATA survives quantization exactly
    g2 = g.copy()
    g2[0:4, 0:4] = NODATA
    out2 = decode(encode(g2, "q8"), "q8", g.shape[1], g.shape[0])
    assert (out2[0:4, 0:4] == NODATA).all()
    assert (out2 != NODATA)[10:, 10:].all()
