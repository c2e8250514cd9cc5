"""Image codecs: (bytes, fmt) <-> float32 pixel grid.

The reference decodes rasters via GDAL (GeoTIFF / ESRI ASCII Grid,
[ref?: dataLoader.py]; behavior per BASELINE.json:6). The sandbox has no
GDAL/PIL, so the engine ships three deterministic hand-rolled codecs
(FIXTURES.md §1). All functions are pure NumPy and are only ever called
from inside Arrow-vectorized UDF batches — never per row from Spark.

Formats
-------
``raw``  float32 little-endian row-major dump. Lossless, exact decode.
``png``  real PNG container: 16-bit grayscale, zlib, filter 0. Pixel
         values for png-format images are integer-valued floats in
         [0, 60000] by construction (see fixtures), NODATA -> 65535, so
         the roundtrip is exact (lossless).
``q8``   8-byte header (<ff vmin vmax) + uint8 min-max quantization;
         255 reserved for NODATA. Deliberately lossy -> exercises the
         PSNR >= 40 dB invariant (BASELINE.json:15).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

NODATA = -9999.0
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_NODATA_U16 = 65535


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_raw(px: np.ndarray) -> bytes:
    return np.ascontiguousarray(px, dtype="<f4").tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<f4").reshape(h, w).astype(np.float32)


def encode_png(px: np.ndarray) -> bytes:
    """16-bit grayscale PNG. Caller guarantees integer values in [0, 60000]
    (fixtures do); NODATA sentinel maps to u16 65535."""
    h, w = px.shape
    u16 = np.where(px == NODATA, _PNG_NODATA_U16, np.rint(px)).astype(">u2")
    # filter byte 0 (None) per scanline
    raw = b"".join(b"\x00" + u16[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)  # bitdepth 16, gray
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes, w: int, h: int) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, idat = 8, []
    pw = ph = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            pw, ph, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 16 and ctype == 0, "engine PNGs are 16-bit gray"
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    assert pw == w and ph == h, f"PNG dims {pw}x{ph} != metadata {w}x{h}"
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + 2 * w
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    assert (rows[:, 0] == 0).all(), "only filter 0 supported (we write 0)"
    u16 = rows[:, 1:].copy().view(">u2").reshape(h, w).astype(np.float32)
    return np.where(u16 == _PNG_NODATA_U16, NODATA, u16).astype(np.float32)


def encode_q8(px: np.ndarray) -> bytes:
    valid = px[px != NODATA]
    vmin = float(valid.min()) if valid.size else 0.0
    vmax = float(valid.max()) if valid.size else 1.0
    if vmax <= vmin:
        vmax = vmin + 1.0
    q = np.clip(np.rint((px - vmin) / (vmax - vmin) * 254.0), 0, 254).astype(np.uint8)
    q = np.where(px == NODATA, np.uint8(255), q)
    return struct.pack("<ff", vmin, vmax) + q.tobytes()


def decode_q8(data: bytes, w: int, h: int) -> np.ndarray:
    vmin, vmax = struct.unpack("<ff", data[:8])
    q = np.frombuffer(data[8:], dtype=np.uint8).reshape(h, w)
    px = (q.astype(np.float32) / 254.0) * (vmax - vmin) + vmin
    return np.where(q == 255, np.float32(NODATA), px.astype(np.float32))


_ENCODERS = {"raw": encode_raw, "png": encode_png, "q8": encode_q8}
_DECODERS = {"raw": decode_raw, "png": decode_png, "q8": decode_q8}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](px)


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """(bytes, fmt, w, h) -> float32 (h, w) grid. The per-image decode the
    reference does via GDAL ReadAsArray ([ref?: dataLoader.py])."""
    return _DECODERS[fmt](bytes(data), w, h)


def psnr(ref: np.ndarray, out: np.ndarray, nodata: float = NODATA) -> float:
    """Peak signal-to-noise ratio over valid (non-NODATA) cells, dB.
    Drives the decode invariant: lossless exact, lossy >= 40 dB
    (BASELINE.json:15)."""
    mask = (ref != nodata) & (out != nodata)
    if not mask.any():
        return float("inf")
    r, o = ref[mask].astype(np.float64), out[mask].astype(np.float64)
    rng = r.max() - r.min()
    mse = float(np.mean((r - o) ** 2))
    if mse == 0.0:
        return float("inf")
    if rng == 0.0:
        rng = 1.0
    return 20.0 * np.log10(rng) - 10.0 * np.log10(mse)
