"""Deterministic synthetic corpus generator (FIXTURES.md; seed 42, no clock).

Produces the driver-mandated images table shape
``(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash bigint)`` (BASELINE.json:15) plus ``zones`` / ``points`` tables and
NumPy brute-force goldens for PIP and kNN. Images are DEM-like grids
(inclined plane + seeded Gaussians + sine ripple, ~10% get a NODATA
island) laid out on the engine world plane so tiles/points/zones share a
coordinate system.

Everything here is test/bench INPUT generation — pure NumPy, driver-side,
small scale. The engine itself never calls this at run time.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .functions.cellindex import WORLD, cell
from .functions.codecs import NODATA, encode
from .functions.phash import phash64

SEED = 42
FMT_CYCLE = ["raw", "png", "q8", "raw"]  # raw-heavy: the lossless fast path
REGION = 0.35 * WORLD  # images/zones/points all live in [0, REGION)^2


@dataclass
class CorpusSpec:
    n_images: int = 32
    w: int = 64
    h: int = 64
    dup_every: int = 10  # every k-th image duplicates image (k - dup_every)
    nodata_every: int = 9


def image_origin(i: int, n_images: int) -> tuple[float, float]:
    """Deterministic placement: images tile REGION^2 contiguously (so tiles,
    zones and points genuinely overlap)."""
    g = int(np.ceil(np.sqrt(n_images)))
    step = REGION / g
    return (i % g) * step, (i // g) * step


def image_geo(i: int, n_images: int, w: int) -> tuple[float, float, float]:
    """(x0, y0, cellsize) so image i spans its full grid slot edge-to-edge."""
    g = int(np.ceil(np.sqrt(n_images)))
    x0, y0 = image_origin(i, n_images)
    return x0, y0, (REGION / g) / w


def make_grid(i: int, w: int, h: int, fmt: str, with_nodata: bool) -> np.ndarray:
    """DEM-like float32 grid for image i (FIXTURES.md §1)."""
    rng = np.random.default_rng(SEED + i)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ax, ay = rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5)
    g = 100.0 + ax * xx + ay * yy
    for _ in range(rng.integers(2, 4)):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        amp, sig = rng.uniform(5, 40), rng.uniform(w / 10, w / 3)
        g += amp * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig**2))
    g += rng.uniform(0.5, 3.0) * np.sin(xx / rng.uniform(3, 9)) * np.cos(yy / rng.uniform(3, 9))
    if fmt == "png":
        # png images carry integer-valued floats in [0, 60000] -> lossless
        gmin, gmax = g.min(), g.max()
        g = np.rint((g - gmin) / max(gmax - gmin, 1e-9) * 50000.0 + 1000.0)
    if with_nodata:
        cy, cx = int(h * 0.3), int(w * 0.6)
        r = max(2, h // 10)
        g[cy - r : cy + r, cx - r : cx + r] = NODATA
    return g.astype(np.float32)


def build_images(spec: CorpusSpec = CorpusSpec()) -> list[dict]:
    """Rows for the images table (list of dicts -> spark.createDataFrame)."""
    rows = []
    grids: dict[int, np.ndarray] = {}
    for i in range(spec.n_images):
        fmt = FMT_CYCLE[i % len(FMT_CYCLE)]
        src = i
        if spec.dup_every and i % spec.dup_every == spec.dup_every - 1 and i >= spec.dup_every:
            src = i - spec.dup_every  # byte-identical duplicate for dedup tests
            fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
        if src not in grids:
            with_nd = spec.nodata_every and (src % spec.nodata_every == spec.nodata_every - 1)
            grids[src] = make_grid(src, spec.w, spec.h, fmt, bool(with_nd))
        g = grids[src]
        rows.append(
            {
                "image_id": f"img{i:06d}",
                "bytes": bytearray(encode(g, fmt)),
                "w": spec.w,
                "h": spec.h,
                "fmt": fmt,
                "caption": f"tile {src} of synthetic terrain, seed {SEED}",
                "phash": phash64(g),
            }
        )
    return rows


def grid_for(i: int, spec: CorpusSpec = CorpusSpec()) -> np.ndarray:
    """Decode-free golden grid for image index i (resolves duplicates)."""
    src = i
    if spec.dup_every and i % spec.dup_every == spec.dup_every - 1 and i >= spec.dup_every:
        src = i - spec.dup_every
    fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
    with_nd = spec.nodata_every and (src % spec.nodata_every == spec.nodata_every - 1)
    return make_grid(src, spec.w, spec.h, fmt, bool(with_nd))


def image_cellsize(spec: CorpusSpec = CorpusSpec()) -> float:
    g = int(np.ceil(np.sqrt(spec.n_images)))
    return (REGION / g) / spec.w


IMAGES_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)
IMAGES_GEO_DDL = IMAGES_DDL + ", x0 double, y0 double, cellsize double"


def images_df(spark, spec: CorpusSpec = CorpusSpec(), geo: bool = True):
    """Spark DataFrame with the EXACT driver-mandated images schema
    (B:15: w/h are int32, phash int64)."""
    rows = images_with_geo(spec) if geo else build_images(spec)
    return spark.createDataFrame(rows, schema=IMAGES_GEO_DDL if geo else IMAGES_DDL)


def images_df_distributed(spark, spec: CorpusSpec = CorpusSpec(), geo: bool = True,
                          partitions: int | None = None):
    """Generate the SAME corpus as images_df, but in parallel on the
    executors (each image is independently derivable from its index, so a
    range -> mapInPandas generator is exact). Use for bench-scale corpora
    where driver-side generation would serialize."""
    import pandas as pd

    n, w, h = spec.n_images, spec.w, spec.h
    de, ne = spec.dup_every, spec.nodata_every
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                    "caption", "phash", "x0", "y0", "cellsize")}
            for i in pdf["id"]:
                i = int(i)
                src = i
                if de and i % de == de - 1 and i >= de:
                    src = i - de
                fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
                with_nd = ne and (src % ne == ne - 1)
                g = make_grid(src, w, h, fmt, bool(with_nd))
                x0, y0, cs = image_geo(i, n, w)
                rows["image_id"].append(f"img{i:06d}")
                rows["bytes"].append(encode(g, fmt))
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append(fmt)
                rows["caption"].append(f"tile {src} of synthetic terrain, seed {SEED}")
                rows["phash"].append(phash64(g))
                rows["x0"].append(x0)
                rows["y0"].append(y0)
                rows["cellsize"].append(cs)
            yield pd.DataFrame(rows)

    ddl = IMAGES_GEO_DDL if geo else IMAGES_DDL
    cols = [c.split()[0] for c in ddl.split(",")]
    return (
        spark.range(n).repartition(parts)
        .mapInPandas(gen, schema=IMAGES_GEO_DDL)
        .select(*cols)
    )


def images_with_geo(spec: CorpusSpec = CorpusSpec()) -> list[dict]:
    """build_images + the (x0, y0, cellsize) layout columns attached —
    the standard geo-referenced corpus for spatial tests & bench."""
    rows = build_images(spec)
    for i, r in enumerate(rows):
        x0, y0, cs = image_geo(i, spec.n_images, spec.w)
        r.update({"x0": x0, "y0": y0, "cellsize": cs})
    return rows


# ---------------------------------------------------------------- zones ----


def build_zones(n_zones: int = 12, res: int = 6) -> list[dict]:
    """Seeded simple polygons over the world plane with precomputed
    bbox cover_cells at ``res`` (FIXTURES.md §2)."""
    from .functions.cellindex import cells_covering_bbox

    rng = np.random.default_rng(SEED * 7)
    rows = []
    for z in range(n_zones):
        cx, cy = rng.uniform(WORLD * 0.05, WORLD * 0.3, size=2)
        n_v = int(rng.integers(5, 12))
        base_r = rng.uniform(WORLD * 0.01, WORLD * 0.08)
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=n_v))
        rad = base_r * (1.0 + rng.uniform(-0.4, 0.6, size=n_v))  # some concave
        xs = np.clip(cx + rad * np.cos(ang), 0, WORLD - 1e-9)
        ys = np.clip(cy + rad * np.sin(ang), 0, WORLD - 1e-9)
        cover = cells_covering_bbox(xs.min(), ys.min(), xs.max(), ys.max(), res)
        rows.append(
            {
                "zone_id": z,
                "name": f"zone_{z}",
                "ring": [{"x": float(x), "y": float(y)} for x, y in zip(xs, ys)],
                "cover_cells": [int(c) for c in cover],
            }
        )
    return rows


def build_points(n_points: int = 2000, res: int = 6) -> list[dict]:
    """Uniform + clustered points; clusters create deliberate cell skew
    (FIXTURES.md §3). ``cell`` precomputed at ``res``."""
    rng = np.random.default_rng(SEED * 13)
    n_u = n_points // 2
    xs = list(rng.uniform(0, WORLD * 0.35, size=n_u))
    ys = list(rng.uniform(0, WORLD * 0.35, size=n_u))
    # 3 hot clusters -> skewed cells
    for c in range(3):
        ccx, ccy = rng.uniform(WORLD * 0.05, WORLD * 0.3, size=2)
        m = (n_points - n_u) // 3 + (n_points - n_u) % 3 * (c == 2)
        xs += list(np.clip(rng.normal(ccx, WORLD * 0.004, size=m), 0, WORLD - 1e-9))
        ys += list(np.clip(rng.normal(ccy, WORLD * 0.004, size=m), 0, WORLD - 1e-9))
    xs, ys = np.asarray(xs), np.asarray(ys)
    cells = cell(xs, ys, res)
    return [
        {"point_id": i, "x": float(xs[i]), "y": float(ys[i]), "cell": int(cells[i])}
        for i in range(len(xs))
    ]


# ------------------------------------------------------------- goldens ----


def point_in_ring(px: np.ndarray, py: np.ndarray, ring: list[dict]) -> np.ndarray:
    """Vectorized even-odd ray cast: points vs one polygon ring.
    Single source of truth for PIP — used by both the golden generator and
    the engine's refine UDF (import, don't duplicate)."""
    xs = np.array([v["x"] for v in ring])
    ys = np.array([v["y"] for v in ring])
    n = len(xs)
    inside = np.zeros(len(px), dtype=bool)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        crosses = ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi) / (yj - yi + 1e-300) + xi
        )
        inside ^= crosses
        j = i
    return inside


def golden_pip(points: list[dict], zones: list[dict]) -> set[tuple[int, int]]:
    """Brute-force O(N*M) point-in-polygon truth (FIXTURES.md §3)."""
    px = np.array([p["x"] for p in points])
    py = np.array([p["y"] for p in points])
    pid = np.array([p["point_id"] for p in points])
    out = set()
    for z in zones:
        hit = point_in_ring(px, py, z["ring"])
        out.update((int(i), int(z["zone_id"])) for i in pid[hit])
    return out


def golden_knn(points: list[dict], sites: list[dict], k: int) -> list[tuple]:
    """Brute-force kNN truth: (point_id, neighbor_id, rank, dist).
    ``sites`` rows need (id, x, y). Ties broken by (dist, id) with the
    id's NATIVE type — the engine's window orders by the site_id column
    as-is, and str() would rank integer ids lexically ('10' < '9')."""
    sx = np.array([s["x"] for s in sites])
    sy = np.array([s["y"] for s in sites])
    sid = [s["id"] for s in sites]
    out = []
    for p in points:
        d = np.hypot(sx - p["x"], sy - p["y"])
        order = sorted(range(len(sid)), key=lambda j: (float(d[j]), sid[j]))[:k]
        out.extend(
            (p["point_id"], sid[j], r + 1, float(d[j])) for r, j in enumerate(order)
        )
    return out
