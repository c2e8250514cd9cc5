"""Pure-NumPy baseline GeoTIFF codec — unstubs the reference's primary
raster format (SURVEY.md §2.1 ops 1 & 5; the reference reads/writes GeoTIFF
via GDAL [ref?: dataLoader.py/dataSaver.py] — GDAL is absent here, so this
is a from-scratch classic-TIFF implementation of the subset a single-band
DEM needs).

Scope (deliberate, documented):
* classic TIFF (42) and BigTIFF (43, 8-byte offsets — how huge
  real-world DEMs/COGs ship) read AND write; the writer picks BigTIFF
  automatically when chunk data would overflow 32-bit offsets (or when
  forced via ``bigtiff=True``); little- or big-endian on read, LE on
  write;
* single band (SamplesPerPixel=1), grayscale;
* float32 (SampleFormat=3/BitsPerSample=32) and uint16 (1/16) cells;
* STRIP layout (RowsPerStrip) and TILED layout (TileWidth/TileLength/
  TileOffsets/TileByteCounts, tags 322-325 — the COG/GDAL-tiled case),
  both read and write;
* Compression 1 (none), 5 (LZW, MSB-first with the TIFF early-change
  rule — the other GDAL default besides deflate) or 8 (zlib/deflate);
  LZW is a sequential pure-Python path kept for compatibility — deflate
  is the throughput choice for engine-written files;
* Predictor (tag 317): 1 (none), 2 (horizontal sample differencing —
  GDAL's default companion for deflate on integer data) and 3 (the
  TIFF TechNote-3 floating-point predictor: per-row byte-plane
  rearrangement to most-significant-first + byte differencing — GDAL's
  PREDICTOR choice for float data), both read and write. Round 2 decoded
  predictor-2 deflate files WITHOUT error and silently wrong — now every
  unsupported combination raises a clear ValueError instead;
* GeoTIFF georeferencing via ModelPixelScaleTag + ModelTiepointTag,
  GDAL_NODATA, and CRS as EPSG GeoKeys — ProjectedCSTypeGeoKey (3072) /
  GeographicTypeGeoKey (2048) parsed and emitted when ``crs`` is
  ``EPSG:nnnn`` (geographic codes 4000-4999 ride key 2048 with
  ModelTypeGeoKey=2, everything else key 3072 with ModelTypeGeoKey=1) —
  falling back to the citation string in GTCitation/GeoAsciiParams.

Raster orientation: TIFF rows run top->bottom = north->south; the engine's
grids are south-up (row 0 at y0). encode flips on write and sets the
tiepoint to the TOP-LEFT corner (y0 + h*cellsize); decode flips back.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np

NODATA = -9999.0

# TIFF tag ids
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PREDICTOR = 317
_TILE_W, _TILE_H, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325
_SAMPLE_FMT = 339
_MODEL_PIXEL_SCALE, _MODEL_TIEPOINT = 33550, 33922
_GEO_KEYS, _GEO_ASCII = 34735, 34737
_GDAL_NODATA = 42113

# GeoKey ids
_GK_MODEL_TYPE, _GK_RASTER_TYPE, _GK_CITATION = 1024, 1025, 1026
_GK_GEOGRAPHIC_CS, _GK_PROJECTED_CS = 2048, 3072

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8,  # BYTE..DOUBLE
               16: 8, 17: 8, 18: 8}  # LONG8 / SLONG8 / IFD8 (BigTIFF)

_DTYPES = {  # on-disk dtype -> (SampleFormat, BitsPerSample)
    "f4": (3, 32),
    "u2": (1, 16),
}


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_compress(src: bytes) -> bytes:
    """TIFF-flavor LZW: MSB-first bit packing, 9->12 bit codes, CLEAR=256 /
    EOI=257, and the spec's "early change" (code width grows when the next
    free code reaches 2^bits - 1, one code earlier than vanilla LZW)."""
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, bits: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << bits) | code
        acc_bits += bits
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, bits = 258, 9
    emit(_LZW_CLEAR, bits)
    w = b""
    for i in range(len(src)):
        c = src[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], bits)
        table[wc] = next_code
        next_code += 1
        # the encoder's table add runs ONE code ahead of the decoder's
        # (the decoder reconstructs entry k only after reading code k+1),
        # so the encoder widens at 2^bits while the decoder widens at
        # 2^bits - 1 — together that is the TIFF "early change" (both
        # sides switch one code earlier than vanilla LZW; libtiff
        # tif_lzw.c uses exactly these two thresholds)
        if next_code == 4094:  # table nearly full -> CLEAR (as libtiff)
            emit(_LZW_CLEAR, bits)
            table = {bytes([i]): i for i in range(256)}
            next_code, bits = 258, 9
        elif next_code == (1 << bits) and bits < 12:
            bits += 1
        w = c
    if w:
        emit(table[w], bits)
        # no table add on the flush emit, so encoder and decoder counts
        # are equal here: the decoder widens before reading the EOI when
        # its free slot hits 2^bits - 1 — mirror that
        if next_code == (1 << bits) - 1 and bits < 12:
            bits += 1
    emit(_LZW_EOI, bits)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def _lzw_decompress(src: bytes) -> bytes:
    """Inverse of ``_lzw_compress``; also reads libtiff/GDAL streams (same
    early-change convention)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits, next_code = 9, 258
    bitpos = 0
    nbits = len(src) * 8
    prev: bytes | None = None
    src_pad = src + b"\x00\x00\x00\x00"
    while bitpos + bits <= nbits:
        byte_i = bitpos >> 3
        window = int.from_bytes(src_pad[byte_i : byte_i + 4], "big")
        code = (window >> (32 - (bitpos & 7) - bits)) & ((1 << bits) - 1)
        bitpos += bits
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = table[:258]
            bits, next_code = 9, 258
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("corrupt LZW stream (first code not literal)")
            entry = table[code]
        else:
            if code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"corrupt LZW stream (code {code} ahead of table)")
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << bits) - 1 and bits < 12:
                bits += 1
        out += entry
        prev = entry
    return bytes(out)


def _predict(block: np.ndarray, predictor: int) -> bytes:
    """One strip/tile (2-D, on-disk LE dtype) -> predictor-encoded bytes.
    Differencing is per ROW (resets each row), matching libtiff."""
    if predictor == 1:
        return block.tobytes()
    if predictor == 2:
        out = block.copy()
        out[:, 1:] = block[:, 1:] - block[:, :-1]  # unsigned wraparound
        return out.tobytes()
    if predictor == 3:
        h, w = block.shape
        bps = block.dtype.itemsize
        # TechNote 3: rearrange each row's sample bytes into byte planes,
        # most-significant plane first (big-endian order regardless of
        # file byte order), then horizontal byte differencing
        be = np.ascontiguousarray(block.astype(block.dtype.newbyteorder(">")))
        planes = be.view(np.uint8).reshape(h, w, bps).transpose(0, 2, 1)
        row = np.ascontiguousarray(planes).reshape(h, w * bps)
        out = row.copy()
        out[:, 1:] = row[:, 1:] - row[:, :-1]
        return out.tobytes()
    raise ValueError(f"unsupported predictor {predictor} (1/2/3 only)")


def _unpredict(raw: bytes, n_rows: int, n_cols: int, dtype: np.dtype,
               predictor: int) -> np.ndarray:
    """Predictor-encoded strip/tile bytes -> 2-D array in ``dtype``."""
    if predictor == 1:
        return np.frombuffer(raw, dtype=dtype).reshape(n_rows, n_cols)
    if predictor == 2:
        if dtype.kind == "f":
            raise ValueError(
                "predictor 2 (integer horizontal differencing) on float "
                "samples is not valid TIFF — float files use predictor 3"
            )
        a = np.frombuffer(raw, dtype=dtype).reshape(n_rows, n_cols)
        return np.cumsum(a, axis=1, dtype=dtype)  # unsigned wraparound
    if predictor == 3:
        bps = dtype.itemsize
        row = np.frombuffer(raw, dtype=np.uint8).reshape(n_rows, n_cols * bps)
        acc = np.cumsum(row, axis=1, dtype=np.uint8)
        planes = acc.reshape(n_rows, bps, n_cols).transpose(0, 2, 1)
        be = np.ascontiguousarray(planes).reshape(n_rows, n_cols * bps)
        return (
            np.frombuffer(be.tobytes(), dtype=dtype.newbyteorder(">"))
            .reshape(n_rows, n_cols)
            .astype(dtype)
        )
    raise ValueError(f"unsupported predictor {predictor} (1/2/3 only)")


def encode_geotiff(
    grid: np.ndarray,
    x0: float = 0.0,
    y0: float = 0.0,
    cellsize: float = 1.0,
    nodata: float = NODATA,
    crs: str = "ENGINE:PLANE",
    compression: str = "deflate",
    rows_per_strip: int = 64,
    dtype: str = "f4",
    predictor: int = 1,
    tile_size: tuple[int, int] | None = None,
    bigtiff: bool | None = None,
) -> bytes:
    """Engine (south-up) grid -> single-band GeoTIFF bytes.

    ``dtype`` picks the on-disk cell type (``f4`` float32 / ``u2``
    uint16 — values are cast); ``predictor`` 2 needs an integer dtype,
    3 a float dtype; ``tile_size=(tile_w, tile_h)`` switches from strips
    to the tiled layout (dims must be multiples of 16 per the TIFF spec).
    ``bigtiff`` forces the version-43 layout (8-byte offsets); left as
    None it switches automatically when chunk data would overflow the
    classic format's 32-bit offsets (a whole-mosaic >4 GiB export
    previously could not be written at all — VERDICT r3 missing #2).
    """
    if dtype not in _DTYPES:
        raise ValueError(f"unsupported encode dtype {dtype} (f4/u2)")
    if predictor == 2 and dtype == "f4":
        raise ValueError("predictor 2 is integer-only; use 3 for float data")
    if predictor == 3 and dtype != "f4":
        raise ValueError("predictor 3 is float-only; use 2 for integer data")
    if predictor not in (1, 2, 3):
        raise ValueError(f"unsupported predictor {predictor} (1/2/3 only)")
    h, w = grid.shape
    if dtype == "u2":
        # the engine's float sentinel (-9999) is not representable in u2 —
        # a raw astype would wrap it to garbage while the GDAL_NODATA tag
        # still said -9999 (silent corruption on decode). Remap masked
        # cells to 65535 and write THAT as the nodata tag; refuse grids
        # whose real data can't survive the cast.
        g = np.asarray(grid, dtype=np.float64)
        is_nd = g == float(nodata)
        valid = g[~is_nd]
        if valid.size and (valid.min() < 0 or valid.max() > 65534):
            raise ValueError(
                "u2 export: grid values outside [0, 65534] "
                f"(min {valid.min()}, max {valid.max()}); 65535 is reserved "
                "as the u2 NODATA sentinel")
        if (valid != np.rint(valid)).any():
            raise ValueError("u2 export: non-integer cell values would be "
                             "truncated; round the grid explicitly first")
        grid = np.where(is_nd, 65535.0, g)
        nodata = 65535.0
    data = np.ascontiguousarray(grid[::-1]).astype("<" + dtype)  # north-up
    comp_id = {"none": 1, "lzw": 5, "deflate": 8}[compression]
    fmt_id, bits = _DTYPES[dtype]

    def pack(block: np.ndarray) -> bytes:
        raw = _predict(np.ascontiguousarray(block), predictor)
        if comp_id == 8:
            return zlib.compress(raw, 6)
        if comp_id == 5:
            return _lzw_compress(raw)
        return raw

    tiled = tile_size is not None
    chunks: list[bytes] = []
    if tiled:
        tw, tl = tile_size
        if tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        down = -(-h // tl)
        across = -(-w // tw)
        padded = np.zeros((down * tl, across * tw), dtype=data.dtype)
        padded[:h, :w] = data
        for ty in range(down):
            for tx in range(across):
                chunks.append(
                    pack(padded[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw]))
    else:
        for r0 in range(0, h, rows_per_strip):
            chunks.append(pack(data[r0:r0 + rows_per_strip]))

    # GeoTIFF keys: ModelTypeGeoKey(1024) = 1 projected / 2 geographic
    # when crs is EPSG:nnnn (code emitted via 3072/2048), else 32767
    # (user-defined, citation only); RasterTypeGeoKey(1025) = PixelIsArea;
    # GTCitationGeoKey(1026) -> ascii params (the CRS string rides here
    # too, for readers that skip the EPSG keys)
    citation = (crs + "|").encode("ascii")
    epsg = re.fullmatch(r"EPSG:(\d{1,5})", crs or "")
    code = int(epsg.group(1)) if epsg else None
    is_geographic = code is not None and 4000 <= code <= 4999
    keys = [
        (_GK_MODEL_TYPE, 0, 1,
         32767 if code is None else (2 if is_geographic else 1)),
        (_GK_RASTER_TYPE, 0, 1, 1),
        (_GK_CITATION, _GEO_ASCII, len(citation), 0),
    ]
    if code is not None:
        keys.append((_GK_GEOGRAPHIC_CS if is_geographic else _GK_PROJECTED_CS,
                     0, 1, code))
        keys.sort()  # key ids must be ascending in the directory
    flat = [v for k in keys for v in k]
    geo_keys = struct.pack(f"<{4 + len(flat)}H", 1, 1, 0, len(keys), *flat)
    scale = struct.pack("<3d", cellsize, cellsize, 0.0)
    # raster (0, 0) = top-left corner -> model (x0, y_top)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0 + h * cellsize, 0.0)
    nodata_ascii = (repr(float(nodata)) + "\x00").encode("ascii")

    # layout: header(8) | IFD | inline tag payloads | chunk data
    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def add(tag: int, typ: int, count: int, payload: bytes) -> None:
        entries.append((tag, typ, count, payload))

    n_chunks = len(chunks)
    offsets_tag = _TILE_OFF if tiled else _STRIP_OFF
    add(_W, 4, 1, struct.pack("<I", w))
    add(_H, 4, 1, struct.pack("<I", h))
    add(_BITS, 3, 1, struct.pack("<H", bits))
    add(_COMP, 3, 1, struct.pack("<H", comp_id))
    add(_PHOTO, 3, 1, struct.pack("<H", 1))  # BlackIsZero
    add(offsets_tag, 4, n_chunks, b"")       # patched below
    add(_SPP, 3, 1, struct.pack("<H", 1))
    if tiled:
        add(_TILE_W, 4, 1, struct.pack("<I", tile_size[0]))
        add(_TILE_H, 4, 1, struct.pack("<I", tile_size[1]))
        add(_TILE_CNT, 4, n_chunks, struct.pack(f"<{n_chunks}I", *map(len, chunks)))
    else:
        add(_ROWS_PER_STRIP, 4, 1, struct.pack("<I", rows_per_strip))
        add(_STRIP_CNT, 4, n_chunks, struct.pack(f"<{n_chunks}I", *map(len, chunks)))
    if predictor != 1:
        add(_PREDICTOR, 3, 1, struct.pack("<H", predictor))
    add(_SAMPLE_FMT, 3, 1, struct.pack("<H", fmt_id))
    add(_MODEL_PIXEL_SCALE, 12, 3, scale)
    add(_MODEL_TIEPOINT, 12, 6, tiepoint)
    add(_GEO_KEYS, 3, len(geo_keys) // 2, geo_keys)
    add(_GEO_ASCII, 2, len(citation), citation)
    add(_GDAL_NODATA, 2, len(nodata_ascii), nodata_ascii)

    # classic (42) vs BigTIFF (43) layout parameters. Auto-detect: if the
    # chunk data (plus a generous metadata allowance) would push any offset
    # past 32 bits, the classic format cannot represent the file.
    if bigtiff is None:
        bigtiff = sum(map(len, chunks)) + 1_000_000 > 0xFFFF_0000
    if bigtiff:
        ifd_off, ent_sz, inline = 16, 20, 8
        off_typ, off_item, ent_hdr = 16, "Q", "<HHQ"  # LONG8 offsets
    else:
        ifd_off, ent_sz, inline = 8, 12, 4
        off_typ, off_item, ent_hdr = 4, "I", "<HHI"

    # retag the offsets entry with the layout's offset type
    entries = [
        (tag, off_typ if tag == offsets_tag else typ, count, payload)
        for tag, typ, count, payload in entries
    ]
    entries.sort(key=lambda e: e[0])
    ifd_size = ((8 if bigtiff else 2) + ent_sz * len(entries)
                + (8 if bigtiff else 4))
    ext_off = ifd_off + ifd_size
    # first pass: place external payloads (word-aligned)
    ext: list[bytes] = []
    placed: dict[int, int] = {}
    cur = ext_off
    for tag, typ, count, payload in entries:
        size = _TYPE_SIZES[typ] * count
        if size > inline and tag != offsets_tag:
            if cur % 2:
                ext.append(b"\x00")
                cur += 1
            placed[tag] = cur
            ext.append(payload)
            cur += len(payload)
    # chunk offsets table (if external) + chunk data
    if cur % 2:
        ext.append(b"\x00")
        cur += 1
    item_sz = _TYPE_SIZES[off_typ]
    if n_chunks * item_sz > inline:
        placed[offsets_tag] = cur
        cur += n_chunks * item_sz
    data_off = cur
    chunk_offsets = []
    for s in chunks:
        chunk_offsets.append(cur)
        cur += len(s)
    if not bigtiff and cur > 0xFFFF_FFFF:
        raise ValueError(
            f"classic TIFF cannot address {cur} bytes; pass bigtiff=True")
    offsets_payload = struct.pack(f"<{n_chunks}{off_item}", *chunk_offsets)
    if n_chunks * item_sz > inline:
        ext.append(offsets_payload)

    if bigtiff:
        out = [struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_off)]
        out.append(struct.pack("<Q", len(entries)))
    else:
        out = [struct.pack("<2sHI", b"II", 42, ifd_off)]
        out.append(struct.pack("<H", len(entries)))
    for tag, typ, count, payload in entries:
        if tag == offsets_tag:
            payload = offsets_payload
        size = _TYPE_SIZES[typ] * count
        if size <= inline:
            val = payload.ljust(inline, b"\x00")
        else:
            val = struct.pack(f"<{off_item}", placed[tag])
        out.append(struct.pack(ent_hdr, tag, typ, count) + val)
    out.append(struct.pack(f"<{off_item}", 0))  # next IFD
    out.extend(ext)
    out.extend(chunks)
    blob = b"".join(out)
    assert len(blob) == data_off + sum(map(len, chunks))
    return blob


def _read_ifd(buf: bytes, bo: str,
              bigtiff: bool = False) -> dict[int, tuple[int, int, bytes]]:
    """Classic (42) or BigTIFF (43) IFD -> {tag: (type, count, payload)}.
    BigTIFF: 8-byte IFD offset at byte 8, 8-byte entry count, 20-byte
    entries with 8-byte counts and 8-byte inline value slots."""
    if bigtiff:
        (ifd_off,) = struct.unpack(bo + "Q", buf[8:16])
        (n,) = struct.unpack(bo + "Q", buf[ifd_off : ifd_off + 8])
        ent0, ent_sz, inline = ifd_off + 8, 20, 8
    else:
        (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
        (n,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
        ent0, ent_sz, inline = ifd_off + 2, 12, 4
    tags: dict[int, tuple[int, int, bytes]] = {}
    for k in range(n):
        e = ent0 + ent_sz * k
        if bigtiff:
            tag, typ = struct.unpack(bo + "HH", buf[e : e + 4])
            (count,) = struct.unpack(bo + "Q", buf[e + 4 : e + 12])
        else:
            tag, typ, count = struct.unpack(bo + "HHI", buf[e : e + 8])
        size = _TYPE_SIZES.get(typ, 1) * count
        val_at = e + ent_sz - inline
        if size <= inline:
            payload = buf[val_at : val_at + size]
        else:
            (off,) = struct.unpack(bo + ("Q" if bigtiff else "I"),
                                   buf[val_at : val_at + inline])
            payload = buf[off : off + size]
        tags[tag] = (typ, count, payload)
    return tags


def _ints(tags, tag, bo, default=None):
    if tag not in tags:
        return default
    typ, count, payload = tags[tag]
    fmt = {3: "H", 4: "I", 1: "B", 16: "Q", 17: "q"}[typ]
    return list(struct.unpack(bo + fmt * count, payload))


def _parse_crs(tags, bo) -> str | None:
    """EPSG GeoKeys first (3072 projected, then 2048 geographic), falling
    back to the GTCitation/GeoAsciiParams string."""
    if _GEO_KEYS in tags:
        typ, count, payload = tags[_GEO_KEYS]
        shorts = struct.unpack(bo + f"{count}H", payload)
        n_keys = shorts[3]
        kd: dict[int, tuple[int, int, int]] = {}
        for i in range(n_keys):
            kid, loc, cnt, val = shorts[4 + 4 * i : 8 + 4 * i]
            kd[kid] = (loc, cnt, val)
        for kid in (_GK_PROJECTED_CS, _GK_GEOGRAPHIC_CS):
            if kid in kd:
                loc, _, val = kd[kid]
                # loc 0 = value inline; 32767 = user-defined, 0 = undefined
                if loc == 0 and 0 < val < 32767:
                    return f"EPSG:{val}"
    if _GEO_ASCII in tags:
        return tags[_GEO_ASCII][2].split(b"|")[0].decode("ascii", "replace")
    return None


def decode_geotiff(data: bytes) -> tuple[np.ndarray, dict]:
    """GeoTIFF bytes -> (south-up float32 grid, header dict with
    x0/y0/cellsize/nodata/crs). Strip and tiled layouts, predictor 1/2/3,
    none/lzw/deflate. External NODATA values are mapped to the engine
    sentinel."""
    bo = {b"II": "<", b"MM": ">"}[bytes(data[:2])]
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic not in (42, 43):
        raise ValueError(f"not a TIFF (version {magic}; classic 42 / BigTIFF 43)")
    tags = _read_ifd(data, bo, bigtiff=(magic == 43))

    w = _ints(tags, _W, bo)[0]
    h = _ints(tags, _H, bo)[0]
    bits = _ints(tags, _BITS, bo, [32])[0]
    comp = _ints(tags, _COMP, bo, [1])[0]
    spp = _ints(tags, _SPP, bo, [1])[0]
    fmt = _ints(tags, _SAMPLE_FMT, bo, [1])[0]
    predictor = _ints(tags, _PREDICTOR, bo, [1])[0]
    if spp != 1:
        raise ValueError(f"only single-band rasters supported (SPP={spp})")
    if (fmt, bits) == (3, 32):
        dtype = np.dtype(bo + "f4")
    elif (fmt, bits) == (1, 16):
        dtype = np.dtype(bo + "u2")
    else:
        raise ValueError(f"unsupported sample format/bits: {fmt}/{bits}")
    if comp not in (1, 5, 8):
        raise ValueError(f"unsupported compression {comp} (none/lzw/deflate only)")
    if predictor not in (1, 2, 3):
        raise ValueError(f"unsupported predictor {predictor} (1/2/3 only)")

    def chunk(off: int, cnt: int, n_rows: int, n_cols: int) -> np.ndarray:
        raw = bytes(data[off : off + cnt])
        if comp == 8:
            raw = zlib.decompress(raw)
        elif comp == 5:
            # writers may pad the final strip/tile; keep the exact payload
            raw = _lzw_decompress(raw)[: n_rows * n_cols * dtype.itemsize]
        return _unpredict(raw, n_rows, n_cols, dtype, predictor)

    if _TILE_OFF in tags:  # tiled layout (tags 322-325)
        tw = _ints(tags, _TILE_W, bo)[0]
        tl = _ints(tags, _TILE_H, bo)[0]
        offs = _ints(tags, _TILE_OFF, bo)
        cnts = _ints(tags, _TILE_CNT, bo)
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offs) != across * down:
            raise ValueError(
                f"tile count {len(offs)} != grid {across}x{down} for "
                f"{w}x{h} image with {tw}x{tl} tiles")
        full = np.empty((down * tl, across * tw), dtype=dtype)
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(i, across)
            full[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw] = chunk(
                off, cnt, tl, tw)
        north_up = full[:h, :w]
    elif _STRIP_OFF in tags:  # strip layout
        rps = _ints(tags, _ROWS_PER_STRIP, bo, [h])[0]
        offs = _ints(tags, _STRIP_OFF, bo)
        cnts = _ints(tags, _STRIP_CNT, bo)
        rows = []
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            rows.append(chunk(off, cnt, min(rps, h - i * rps), w))
        north_up = np.vstack(rows)
    else:
        raise ValueError(
            "no StripOffsets (273) or TileOffsets (324) — not a baseline "
            "strip or tiled TIFF")
    grid = north_up[::-1].astype(np.float32)  # disk north-up -> engine

    hdr: dict = {"w": w, "h": h, "x0": 0.0, "y0": 0.0, "cellsize": 1.0,
                 "nodata": None, "crs": _parse_crs(tags, bo)}
    if _MODEL_PIXEL_SCALE in tags:
        sx, sy, _ = struct.unpack(bo + "3d", tags[_MODEL_PIXEL_SCALE][2])
        hdr["cellsize"] = sx
    if _MODEL_TIEPOINT in tags:
        _, _, _, mx, my, _ = struct.unpack(bo + "6d", tags[_MODEL_TIEPOINT][2][:48])
        hdr["x0"] = mx
        hdr["y0"] = my - h * hdr["cellsize"]  # tiepoint is the TOP edge
    if _GDAL_NODATA in tags:
        hdr["nodata"] = float(tags[_GDAL_NODATA][2].split(b"\x00")[0])
    nd = hdr["nodata"]
    if nd is not None and nd != NODATA:
        grid = np.where(grid == np.float32(nd), np.float32(NODATA), grid)
    return grid, hdr
