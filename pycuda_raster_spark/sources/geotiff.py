"""Pure-NumPy baseline GeoTIFF codec — unstubs the reference's primary
raster format (SURVEY.md §2.1 ops 1 & 5; the reference reads/writes GeoTIFF
via GDAL [ref?: dataLoader.py/dataSaver.py] — GDAL is absent here, so this
is a from-scratch strip-based classic-TIFF implementation of the subset a
single-band DEM needs).

Scope (deliberate, documented):
* classic TIFF (not BigTIFF), little- or big-endian on read, LE on write;
* single band (SamplesPerPixel=1), grayscale;
* float32 (SampleFormat=3/BitsPerSample=32) and uint16 (1/16) cells;
* strip layout (RowsPerStrip), Compression 1 (none) or 8 (zlib/deflate);
* GeoTIFF georeferencing via ModelPixelScaleTag + ModelTiepointTag,
  GDAL_NODATA, and the CRS string carried in GeoKeyDirectory/GTCitation
  (GeoAsciiParams) — enough to round-trip (x0, y0, cellsize, nodata, crs).

Raster orientation: TIFF rows run top->bottom = north->south; the engine's
grids are south-up (row 0 at y0). encode flips on write and sets the
tiepoint to the TOP-LEFT corner (y0 + h*cellsize); decode flips back.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

NODATA = -9999.0

# TIFF tag ids
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_SAMPLE_FMT = 339
_MODEL_PIXEL_SCALE, _MODEL_TIEPOINT = 33550, 33922
_GEO_KEYS, _GEO_ASCII = 34735, 34737
_GDAL_NODATA = 42113

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}  # BYTE..DOUBLE


def encode_geotiff(
    grid: np.ndarray,
    x0: float = 0.0,
    y0: float = 0.0,
    cellsize: float = 1.0,
    nodata: float = NODATA,
    crs: str = "ENGINE:PLANE",
    compression: str = "deflate",
    rows_per_strip: int = 64,
) -> bytes:
    """Engine (south-up) float32 grid -> single-band GeoTIFF bytes."""
    h, w = grid.shape
    data = np.ascontiguousarray(grid[::-1], dtype="<f4")  # north-up on disk
    comp_id = {"none": 1, "deflate": 8}[compression]

    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = data[r0 : r0 + rows_per_strip].tobytes()
        strips.append(zlib.compress(raw, 6) if comp_id == 8 else raw)

    # GeoTIFF keys: version 1.1.0; ModelTypeGeoKey(1024)=32767 (user),
    # RasterTypeGeoKey(1025)=1 (PixelIsArea), GTCitationGeoKey(1026) ->
    # ascii params (the engine's CRS string rides here)
    citation = (crs + "|").encode("ascii")
    geo_keys = struct.pack(
        "<16H",
        1, 1, 0, 3,              # key directory header, 3 keys
        1024, 0, 1, 32767,
        1025, 0, 1, 1,
        1026, _GEO_ASCII, len(citation), 0,
    )
    scale = struct.pack("<3d", cellsize, cellsize, 0.0)
    # raster (0, 0) = top-left corner -> model (x0, y_top)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0 + h * cellsize, 0.0)
    nodata_ascii = (repr(float(nodata)) + "\x00").encode("ascii")

    # layout: header(8) | IFD | inline tag payloads | strip data
    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def add(tag: int, typ: int, count: int, payload: bytes) -> None:
        entries.append((tag, typ, count, payload))

    n_strips = len(strips)
    add(_W, 4, 1, struct.pack("<I", w))
    add(_H, 4, 1, struct.pack("<I", h))
    add(_BITS, 3, 1, struct.pack("<H", 32))
    add(_COMP, 3, 1, struct.pack("<H", comp_id))
    add(_PHOTO, 3, 1, struct.pack("<H", 1))  # BlackIsZero
    add(_STRIP_OFF, 4, n_strips, b"")        # patched below
    add(_SPP, 3, 1, struct.pack("<H", 1))
    add(_ROWS_PER_STRIP, 4, 1, struct.pack("<I", rows_per_strip))
    add(_STRIP_CNT, 4, n_strips, struct.pack(f"<{n_strips}I", *map(len, strips)))
    add(_SAMPLE_FMT, 3, 1, struct.pack("<H", 3))  # IEEE float
    add(_MODEL_PIXEL_SCALE, 12, 3, scale)
    add(_MODEL_TIEPOINT, 12, 6, tiepoint)
    add(_GEO_KEYS, 3, len(geo_keys) // 2, geo_keys)
    add(_GEO_ASCII, 2, len(citation), citation)
    add(_GDAL_NODATA, 2, len(nodata_ascii), nodata_ascii)

    entries.sort(key=lambda e: e[0])
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = ifd_off + ifd_size
    # first pass: place external payloads (word-aligned)
    ext: list[bytes] = []
    placed: dict[int, int] = {}
    cur = ext_off
    for tag, typ, count, payload in entries:
        size = _TYPE_SIZES[typ] * count
        if size > 4 and tag != _STRIP_OFF:
            if cur % 2:
                ext.append(b"\x00")
                cur += 1
            placed[tag] = cur
            ext.append(payload)
            cur += len(payload)
    # strip offsets table (if external) + strip data
    if cur % 2:
        ext.append(b"\x00")
        cur += 1
    offsets_table_off = cur
    if n_strips * 4 > 4:
        placed[_STRIP_OFF] = offsets_table_off
        cur += n_strips * 4
    data_off = cur
    strip_offsets = []
    for s in strips:
        strip_offsets.append(cur)
        cur += len(s)
    offsets_payload = struct.pack(f"<{n_strips}I", *strip_offsets)
    if n_strips * 4 > 4:
        ext.append(offsets_payload)

    out = [struct.pack("<2sHI", b"II", 42, ifd_off)]
    out.append(struct.pack("<H", len(entries)))
    for tag, typ, count, payload in entries:
        if tag == _STRIP_OFF:
            payload = offsets_payload
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            val = payload.ljust(4, b"\x00")
        else:
            val = struct.pack("<I", placed[tag])
        out.append(struct.pack("<HHI", tag, typ, count) + val)
    out.append(struct.pack("<I", 0))  # next IFD
    out.extend(ext)
    out.extend(strips)
    blob = b"".join(out)
    assert len(blob) == data_off + sum(map(len, strips))
    return blob


def _read_ifd(buf: bytes, bo: str) -> dict[int, tuple[int, int, bytes]]:
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    (n,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    for k in range(n):
        e = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack(bo + "HHI", buf[e : e + 8])
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            payload = buf[e + 8 : e + 8 + size]
        else:
            (off,) = struct.unpack(bo + "I", buf[e + 8 : e + 12])
            payload = buf[off : off + size]
        tags[tag] = (typ, count, payload)
    return tags


def _ints(tags, tag, bo, default=None):
    if tag not in tags:
        return default
    typ, count, payload = tags[tag]
    fmt = {3: "H", 4: "I", 1: "B"}[typ]
    return list(struct.unpack(bo + fmt * count, payload))


def decode_geotiff(data: bytes) -> tuple[np.ndarray, dict]:
    """GeoTIFF bytes -> (south-up float32 grid, header dict with
    x0/y0/cellsize/nodata/crs). External NODATA values are mapped to the
    engine sentinel."""
    bo = {b"II": "<", b"MM": ">"}[bytes(data[:2])]
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise ValueError("not a classic TIFF (BigTIFF unsupported)")
    tags = _read_ifd(data, bo)

    w = _ints(tags, _W, bo)[0]
    h = _ints(tags, _H, bo)[0]
    bits = _ints(tags, _BITS, bo, [32])[0]
    comp = _ints(tags, _COMP, bo, [1])[0]
    spp = _ints(tags, _SPP, bo, [1])[0]
    fmt = _ints(tags, _SAMPLE_FMT, bo, [1])[0]
    rps = _ints(tags, _ROWS_PER_STRIP, bo, [h])[0]
    offs = _ints(tags, _STRIP_OFF, bo)
    cnts = _ints(tags, _STRIP_CNT, bo)
    if spp != 1:
        raise ValueError(f"only single-band rasters supported (SPP={spp})")
    if (fmt, bits) == (3, 32):
        dtype = np.dtype(bo + "f4")
    elif (fmt, bits) == (1, 16):
        dtype = np.dtype(bo + "u2")
    else:
        raise ValueError(f"unsupported sample format/bits: {fmt}/{bits}")
    if comp not in (1, 8):
        raise ValueError(f"unsupported compression {comp} (none/deflate only)")

    rows = []
    for i, (off, cnt) in enumerate(zip(offs, cnts)):
        raw = bytes(data[off : off + cnt])
        if comp == 8:
            raw = zlib.decompress(raw)
        n_rows = min(rps, h - i * rps)
        rows.append(np.frombuffer(raw, dtype=dtype).reshape(n_rows, w))
    grid = np.vstack(rows)[::-1].astype(np.float32)  # disk north-up -> engine

    hdr: dict = {"w": w, "h": h, "x0": 0.0, "y0": 0.0, "cellsize": 1.0,
                 "nodata": None, "crs": None}
    if _MODEL_PIXEL_SCALE in tags:
        sx, sy, _ = struct.unpack(bo + "3d", tags[_MODEL_PIXEL_SCALE][2])
        hdr["cellsize"] = sx
    if _MODEL_TIEPOINT in tags:
        _, _, _, mx, my, _ = struct.unpack(bo + "6d", tags[_MODEL_TIEPOINT][2][:48])
        hdr["x0"] = mx
        hdr["y0"] = my - h * hdr["cellsize"]  # tiepoint is the TOP edge
    if _GDAL_NODATA in tags:
        hdr["nodata"] = float(tags[_GDAL_NODATA][2].split(b"\x00")[0])
    if _GEO_ASCII in tags:
        hdr["crs"] = tags[_GEO_ASCII][2].split(b"|")[0].decode("ascii", "replace")
    nd = hdr["nodata"]
    if nd is not None and nd != NODATA:
        grid = np.where(grid == np.float32(nd), np.float32(NODATA), grid)
    return grid, hdr
