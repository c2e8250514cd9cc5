"""Weighted flow accumulation + Shreve magnitude + Strahler order.

Twins are pinned against independent brute-force formulations (path
walking for weighted accumulation and Shreve; the classic per-confluence
Kahn rule for Strahler — the tiled operator uses the level-set identity,
so tiled == twin also proves the identity). Tiled operators must equal
the twins EXACTLY across tile heights — all-integer outputs.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import FMT_CYCLE, IMAGES_DDL, CorpusSpec, build_images, grid_for
from pycuda_raster_spark.functions import codecs
from pycuda_raster_spark.functions.focal_kernels import flow_dir
from pycuda_raster_spark.operators.decode import decode_tiles
from pycuda_raster_spark.operators.focal import flow_dir_tiles
from pycuda_raster_spark.operators.hydro import (
    D8_DC,
    D8_DR,
    NODATA,
    flow_accum_grid,
    flow_accum_tiles,
    shreve_grid,
    shreve_tiles,
    strahler_grid,
    strahler_tiles,
)

SPEC = CorpusSpec(n_images=4, w=32, h=32, nodata_every=3)


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(build_images(SPEC)).cache()


def _decoded(i: int) -> np.ndarray:
    src = i
    if SPEC.dup_every and i % SPEC.dup_every == SPEC.dup_every - 1 and i >= SPEC.dup_every:
        src = i - SPEC.dup_every
    fmt = FMT_CYCLE[src % len(FMT_CYCLE)]
    g = grid_for(i, SPEC)
    return codecs.decode(codecs.encode(g, fmt), fmt, SPEC.w, SPEC.h)


def _edges(dirs):
    """(succ flat map, valid mask) of the global D8 graph."""
    th, w = dirs.shape
    valid = dirs != np.float32(NODATA)
    code = np.where(valid, dirs, 0.0).astype(np.int64)
    succ = {}
    for r in range(th):
        for c in range(w):
            k = code[r, c]
            if not valid[r, c] or k == 0:
                continue
            nr, nc = r + D8_DR[k], c + D8_DC[k]
            if 0 <= nr < th and 0 <= nc < w and valid[nr, nc]:
                succ[(r, c)] = (nr, nc)
    return succ, valid


def brute_weighted_accum(dirs, wgt):
    """Walk every cell's path, adding its WEIGHT to each strictly-
    downstream cell."""
    th, w = dirs.shape
    succ, valid = _edges(dirs)
    acc = np.zeros((th, w), dtype=np.int64)
    for r in range(th):
        for c in range(w):
            if not valid[r, c]:
                continue
            cur = (r, c)
            for _ in range(th * w + 1):
                cur = succ.get(cur)
                if cur is None:
                    break
                acc[cur] += wgt[r, c]
            else:
                raise AssertionError("cycle")
    out = acc.astype(np.float32)
    out[~valid] = np.float32(NODATA)
    return out


def brute_shreve(dirs):
    """Magnitude = weakly-upstream headwater count; headwaters from a
    brute in-degree scan."""
    th, w = dirs.shape
    succ, valid = _edges(dirs)
    indeg = np.zeros((th, w), dtype=np.int64)
    for _, v in succ.items():
        indeg[v] += 1
    mag = np.zeros((th, w), dtype=np.int64)
    for r in range(th):
        for c in range(w):
            if not valid[r, c] or indeg[r, c] != 0:
                continue
            mag[r, c] += 1
            cur = (r, c)
            for _ in range(th * w + 1):
                cur = succ.get(cur)
                if cur is None:
                    break
                mag[cur] += 1
            else:
                raise AssertionError("cycle")
    out = mag.astype(np.float32)
    out[~valid] = np.float32(NODATA)
    return out


def _wgt_for(g):
    """The contract-query weight rule: floor(val/16) % 5 + 1 (exact
    integers in both engines)."""
    return (np.floor(g.astype(np.float64) / 16.0).astype(np.int64) % 5) + 1


# ---------------------------------------------------------------- twins


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_weighted_twin_matches_brute(seed):
    rng = np.random.default_rng(seed)
    g = (rng.random((20, 17)) * 50).astype(np.float32)
    if seed == 1:
        g[6:9, 4:7] = np.float32(NODATA)
    dirs = flow_dir(g)
    wgt = _wgt_for(np.where(g == np.float32(NODATA), 0, g))
    got = flow_accum_grid(dirs, wgt=wgt)
    np.testing.assert_array_equal(got, brute_weighted_accum(dirs, wgt))
    # ones-weight == plain counting
    np.testing.assert_array_equal(
        flow_accum_grid(dirs, wgt=np.ones_like(wgt)), flow_accum_grid(dirs))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_shreve_twin_matches_brute(seed):
    rng = np.random.default_rng(seed)
    g = (rng.random((20, 17)) * 50).astype(np.float32)
    if seed == 1:
        g[6:9, 4:7] = np.float32(NODATA)
    dirs = flow_dir(g)
    np.testing.assert_array_equal(shreve_grid(dirs), brute_shreve(dirs))


def test_strahler_hand_example():
    """A hand-built D8 code grid (unambiguous topology): two order-1
    streams merge at a junction -> order 2; a later order-1 tributary
    joins the order-2 trunk and the trunk STAYS order 2."""
    nd = np.float32(NODATA)
    dirs = np.full((5, 7), nd, dtype=np.float32)
    # chain A: (1,0) -E-> (1,1) -E-> (1,2) -SE-> junction (2,3)
    dirs[1, 0] = dirs[1, 1] = 1.0
    dirs[1, 2] = 128.0            # dr=+1, dc=+1
    # chain B: (3,0) -E-> (3,1) -E-> (3,2) -NE-> junction (2,3)
    dirs[3, 0] = dirs[3, 1] = 1.0
    dirs[3, 2] = 2.0              # dr=-1, dc=+1
    # trunk: (2,3) -E-> (2,4) -E-> (2,5) -E-> (2,6) pit
    dirs[2, 3] = dirs[2, 4] = dirs[2, 5] = 1.0
    dirs[2, 6] = 0.0
    # tributary: (0,5) -S-> (1,5) -SE-> (2,6)
    dirs[0, 5] = 64.0             # dr=+1, dc=0
    dirs[1, 5] = 128.0
    ordr = strahler_grid(dirs)
    assert ordr[1, 0] == 1 and ordr[3, 0] == 1 and ordr[0, 5] == 1
    assert ordr[1, 2] == 1 and ordr[3, 2] == 1 and ordr[1, 5] == 1
    assert ordr[2, 3] == 2 and ordr[2, 5] == 2    # junction bumps to 2
    assert ordr[2, 6] == 2                        # 2 vs 1 inflow: stays 2
    assert ordr[ordr >= 0].max() == 2
    assert (ordr[dirs == nd] == -1).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_strahler_shreve_inequality(seed):
    """2^(strahler-1) <= shreve everywhere (classic identity) and both
    are 1 exactly on the same headwater-only cells."""
    rng = np.random.default_rng(seed)
    g = (rng.random((24, 19)) * 80).astype(np.float32)
    if seed == 2:
        g[10:13, 5:9] = np.float32(NODATA)
    dirs = flow_dir(g)
    st = strahler_grid(dirs)
    sh = shreve_grid(dirs)
    valid = st >= 0
    assert (st[valid] >= 1).all()
    assert ((2.0 ** (st[valid] - 1)) <= sh[valid]).all()


def _collect(out_df, col, dtype):
    rows = out_df.select("image_id", "ty0", "th", "w", "h", col).collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r)
    grids = {}
    for iid, tiles in per.items():
        tiles.sort(key=lambda r: r.ty0)
        assert sum(t.th for t in tiles) == tiles[0].h
        grids[iid] = np.vstack(
            [np.asarray(r[col], dtype=dtype).reshape(r.th, r.w)
             for r in tiles])
    return grids


# ---------------------------------------------------------------- tiled


def _weight_col(df):
    """JVM-side weight build (the same rule both engines compute
    exactly): floor(px/16) % 5 + 1 as array<bigint>."""
    def one(v):
        return (F.floor(v.cast("double") / F.lit(16.0)).cast("long")
                % F.lit(5).cast("long") + F.lit(1).cast("long"))
    return df.withColumn("wgt", F.transform("px", one))


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_weighted_tiled_matches_twin(spark, images_df, tile_rows):
    dirs_df = _weight_col(flow_dir_tiles(
        decode_tiles(images_df, tile_rows=tile_rows), keep_px=True))
    got = _collect(flow_accum_tiles(dirs_df, weight_col="wgt"),
                   "flow_accum", np.float32)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        g = _decoded(i)
        dirs = flow_dir(g)
        wgt = _wgt_for(np.where(g == np.float32(NODATA), 0, g))
        want = flow_accum_grid(dirs, wgt=wgt)
        np.testing.assert_array_equal(got[iid], want,
                                      err_msg=f"{iid} tr={tile_rows}")


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_shreve_tiled_matches_twin(spark, images_df, tile_rows):
    dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=tile_rows))
    got = _collect(shreve_tiles(dirs_df), "shreve", np.float32)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = shreve_grid(flow_dir(_decoded(i)))
        np.testing.assert_array_equal(got[iid], want,
                                      err_msg=f"{iid} tr={tile_rows}")


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_strahler_tiled_matches_twin(spark, images_df, tile_rows):
    dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=tile_rows))
    got = _collect(strahler_tiles(dirs_df), "strahler", np.int64)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = strahler_grid(flow_dir(_decoded(i)))
        np.testing.assert_array_equal(got[iid], want,
                                      err_msg=f"{iid} tr={tile_rows}")


def _serpentine_elevation(h, w):
    from tests.test_hydro import _serpentine_elevation as mk
    return mk(h, w)


def test_streams_serpentine_reentry(spark):
    """The band-re-entry stress case at tile_rows=2 for all three new
    operators (the valley path crosses every band boundary repeatedly)."""
    g = _serpentine_elevation(16, 9)
    df = spark.createDataFrame(
        [("serp", bytearray(g.astype("<f4").tobytes()), 9, 16, "raw",
          "serp", 0)], schema=IMAGES_DDL)
    dirs_np = flow_dir(g)
    dirs_df = flow_dir_tiles(decode_tiles(df, tile_rows=2), keep_px=True)
    wdf = _weight_col(dirs_df)

    got_w = _collect(flow_accum_tiles(wdf, weight_col="wgt"),
                     "flow_accum", np.float32)["serp"]
    wgt = _wgt_for(np.where(g == np.float32(NODATA), 0, g))
    np.testing.assert_array_equal(got_w, flow_accum_grid(dirs_np, wgt=wgt))

    got_sh = _collect(shreve_tiles(dirs_df), "shreve", np.float32)["serp"]
    np.testing.assert_array_equal(got_sh, shreve_grid(dirs_np))

    got_st = _collect(strahler_tiles(dirs_df), "strahler",
                      np.int64)["serp"]
    np.testing.assert_array_equal(got_st, strahler_grid(dirs_np))


def test_shreve_plan_shape(spark, images_df):
    """Final plan: exactly one MapInPandas (the seeded pass 2) — the
    in-degree pre-pass and pass 1 ran at build time against the pinned
    tiles; the coarse routing never touches pixel payloads."""
    dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=8))
    out = shreve_tiles(dirs_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1, plan


def test_cli_hydro_products(spark, images_df, tmp_path):
    """shreve / strahler / basins as CLI products (one shared
    decode+flow_dir pass), plus curv_profile through the same entry."""
    from pycuda_raster_spark.__main__ import main
    from pycuda_raster_spark.functions.focal_kernels import curvature_products
    from pycuda_raster_spark.operators.hydro import basins_grid

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out_sh = str(tmp_path / "shreve")
    out_st = str(tmp_path / "strahler")
    out_b = str(tmp_path / "basins")
    out_cp = str(tmp_path / "curvp")
    assert main([inp, out_sh, "shreve", out_st, "strahler", out_b, "basins",
                 "--tile-rows=8", "--cores=4"]) == 0
    assert main([inp, out_cp, "curv_profile",
                 "--tile-rows=8", "--cores=4"]) == 0

    def grid_of(path, col, dtype):
        rows = (spark.read.parquet(path)
                .filter(F.col("image_id") == "img000000").collect())
        rows.sort(key=lambda r: r.ty0)
        return np.vstack([np.asarray(r[col], dtype).reshape(r.th, r.w)
                          for r in rows])

    dirs = flow_dir(_decoded(0))
    np.testing.assert_array_equal(grid_of(out_sh, "shreve", np.float32),
                                  shreve_grid(dirs))
    np.testing.assert_array_equal(grid_of(out_st, "strahler", np.int64),
                                  strahler_grid(dirs))
    np.testing.assert_array_equal(grid_of(out_b, "basins", np.int64),
                                  basins_grid(dirs))
    want_p, _ = curvature_products(_decoded(0), 1.0)
    np.testing.assert_array_equal(
        grid_of(out_cp, "curv_profile", np.float32), want_p)


# ------------------------------------------------------------------ twi


def test_twi_grid_flat_plane():
    """Flat plane: slope 0 (tan clamped to the floor), no flow edges ->
    acc 0 everywhere -> twi = ln(cellsize / 0.001) on every valid cell."""
    from pycuda_raster_spark.operators.hydro import twi_grid

    g = np.full((12, 10), 5.0, dtype=np.float32)
    out = twi_grid(g, 2.0)
    valid = out != np.float32(NODATA)
    # one-ring edge policy: interior only
    assert valid[1:-1, 1:-1].all() and not valid[0].any()
    expect = np.float32(np.log((0.0 + 1.0) * 2.0 / 0.001))
    assert (out[valid] == expect).all()


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_twi_tiled_matches_twin(spark, images_df, tile_rows):
    from pycuda_raster_spark.operators.hydro import twi_grid, twi_tiles

    got = _collect(twi_tiles(decode_tiles(images_df, tile_rows=tile_rows)),
                   "twi", np.float32)
    cs = 1.0  # decode's GEO_DEFAULTS for the geo-less fixture table
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = twi_grid(_decoded(i), cs)
        np.testing.assert_array_equal(got[iid], want,
                                      err_msg=f"{iid} tr={tile_rows}")


def test_cli_twi(spark, images_df, tmp_path):
    from pycuda_raster_spark.__main__ import main
    from pycuda_raster_spark.operators.hydro import twi_grid

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out = str(tmp_path / "twi")
    assert main([inp, out, "twi", "--tile-rows=8", "--cores=4"]) == 0
    rows = (spark.read.parquet(out)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.twi, np.float32).reshape(r.th, r.w)
                     for r in rows])
    np.testing.assert_array_equal(got, twi_grid(_decoded(0), 1.0))


# ---------------------------------------------------------- stream links


def brute_stream_links(dirs, threshold):
    """Independent reference: channel set from the brute path-walk
    accumulation, junction cuts, BFS connected components, min-key
    labels. Returns {(r, c): (acc, link_key, link_cells)}."""
    th, w = dirs.shape
    acc = brute_weighted_accum(dirs, np.ones((th, w), dtype=np.int64))
    succ, valid = _edges(dirs)
    chan = {(r, c) for r in range(th) for c in range(w)
            if valid[r, c] and acc[r, c] != np.float32(NODATA)
            and int(acc[r, c]) + 1 >= threshold}
    edges = [(u, v) for u, v in succ.items() if u in chan and v in chan]
    indeg = {}
    for _, v in edges:
        indeg[v] = indeg.get(v, 0) + 1
    kept = [(u, v) for u, v in edges if indeg[v] < 2]
    adj = {}
    for u, v in kept:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    out = {}
    seen = set()
    for start in sorted(chan):
        if start in seen:
            continue
        comp = [start]
        seen.add(start)
        queue = [start]
        while queue:
            u = queue.pop()
            for v in adj.get(u, []):
                if v not in seen:
                    seen.add(v)
                    comp.append(v)
                    queue.append(v)
        mk = min(comp)
        for r, c in comp:
            out[(r, c)] = (int(acc[r, c]), mk, len(comp))
    return out


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_stream_links_vs_brute(spark, images_df, tile_rows):
    from pycuda_raster_spark.operators.hydro import stream_links_tiles

    T = 12
    dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=tile_rows))
    rows = stream_links_tiles(dirs_df, T).collect()
    got = {}
    for r in rows:
        got.setdefault(r.image_id, {})[(r.r, r.c)] = (
            r.acc, r.link_id, r.link_cells)
    total = 0
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = brute_stream_links(flow_dir(_decoded(i)), T)
        wantk = {
            rc: (a, f"{iid}:{mk[0]:09d}:{mk[1]:09d}", n)
            for rc, (a, mk, n) in want.items()}
        assert got.get(iid, {}) == wantk, f"{iid} tr={tile_rows}"
        total += len(wantk)
    assert total > 0  # threshold actually selects channels


def test_stream_links_hand_junction():
    """The Y grid from the Strahler hand example: the junction target
    starts a NEW link; both upstream chains are separate links."""
    from pycuda_raster_spark.operators.hydro import flow_accum_grid

    nd = np.float32(NODATA)
    dirs = np.full((5, 7), nd, dtype=np.float32)
    dirs[1, 0] = dirs[1, 1] = 1.0
    dirs[1, 2] = 128.0
    dirs[3, 0] = dirs[3, 1] = 1.0
    dirs[3, 2] = 2.0
    dirs[2, 3] = dirs[2, 4] = dirs[2, 5] = 1.0
    dirs[2, 6] = 0.0
    dirs[0, 5] = 64.0
    dirs[1, 5] = 128.0
    links = brute_stream_links(dirs, 1)  # every valid cell is channel
    # chain A cells share a link rooted at (1,0)
    assert links[(1, 0)][1] == (1, 0) and links[(1, 2)][1] == (1, 0)
    # chain B rooted at (3,0)
    assert links[(3, 2)][1] == (3, 0)
    # junction target (2,3) starts the trunk link
    assert links[(2, 3)][1] == (2, 3) and links[(2, 5)][1] == (2, 3)
    # (2,6) has 2 channel inflows ((2,5) and (1,5)) -> starts its own
    assert links[(2, 6)][1] == (2, 6)
    # tributary is its own link ending before the junction cell
    assert links[(0, 5)][1] == (0, 5) and links[(1, 5)][1] == (0, 5)


# ------------------------------------------------------------ basin stats


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_basin_stats_fold_vs_brute(spark, images_df, tile_rows):
    """sum_mode="fold" == brute exactly: basins twin labels + per-basin
    count/min/max and a sequential (r, c)-order double fold (boolean
    indexing returns row-major == (r, c) order); the mean is one float
    division of the identical operands."""
    from pycuda_raster_spark.operators.hydro import basin_stats, basins_grid

    dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=tile_rows),
                             keep_px=True)
    rows = basin_stats(dirs_df, sum_mode="fold").collect()
    got = {}
    for r in rows:
        got.setdefault(r.image_id, {})[r.basin] = (
            r.n_cells, r.min_elev, r.max_elev, r.sum_elev, r.mean_elev)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        g = _decoded(i)
        lab = basins_grid(flow_dir(g))
        want = {}
        for b in np.unique(lab[lab >= 0]):
            vals = g[lab == b].astype(np.float64)
            s = 0.0
            for v in vals:
                s += float(v)
            want[int(b)] = (len(vals), float(vals.min()), float(vals.max()),
                            s, s / float(len(vals)))
        assert got.get(iid, {}) == want, f"{iid} tr={tile_rows}"


def test_basin_stats_decimal_partition_invariant(spark, images_df):
    """The decimal scale path is bit-identical across tile heights
    (decimal addition is exact and order-independent) and within 1e-6
    of the fold sum."""
    from pycuda_raster_spark.operators.hydro import basin_stats

    def run(tr, mode):
        dirs_df = flow_dir_tiles(decode_tiles(images_df, tile_rows=tr),
                                 keep_px=True)
        return {(r.image_id, r.basin): (r.n_cells, r.sum_elev, r.mean_elev)
                for r in basin_stats(dirs_df, sum_mode=mode).collect()}

    a, b = run(8, "decimal"), run(32, "decimal")
    assert a == b
    f = run(8, "fold")
    assert a.keys() == f.keys()
    for k, (n, s, m) in a.items():
        fn, fs, fm = f[k]
        assert n == fn and abs(s - fs) < 1e-6 and abs(m - fm) < 1e-6


def test_cli_streams(spark, images_df, tmp_path):
    from pycuda_raster_spark.__main__ import main

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out = str(tmp_path / "links")
    assert main([inp, out, "streams", "--streams=12",
                 "--tile-rows=8", "--cores=4"]) == 0
    rows = spark.read.parquet(out).collect()
    got = {}
    for r in rows:
        got.setdefault(r.image_id, {})[(r.r, r.c)] = (
            r.acc, r.link_id, r.link_cells)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = brute_stream_links(flow_dir(_decoded(i)), 12)
        wantk = {rc: (a, f"{iid}:{mk[0]:09d}:{mk[1]:09d}", n)
                 for rc, (a, mk, n) in want.items()}
        assert got.get(iid, {}) == wantk, iid


# ----------------------------------------------------- depression filling


def brute_fill(g, nd=NODATA):
    """Independent reference: Dijkstra-style minimax (spill elevation =
    min over 8-connected paths to a drain of the path's max elevation);
    drains = valid cells at the image edge or with an invalid/off-grid
    8-neighbor."""
    import heapq

    nd32 = np.float32(nd)
    th, w = g.shape
    valid = g != nd32
    dist = np.full((th, w), float("inf"))
    pq = []
    for r in range(th):
        for c in range(w):
            if not valid[r, c]:
                continue
            nbrs = [(r + dr, c + dc) for dr in (-1, 0, 1)
                    for dc in (-1, 0, 1) if (dr, dc) != (0, 0)]
            if (r in (0, th - 1) or c in (0, w - 1)
                    or any(not (0 <= a < th and 0 <= b < w)
                           or not valid[a, b] for a, b in nbrs)):
                dist[r, c] = float(g[r, c])
                heapq.heappush(pq, (dist[r, c], r, c))
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == dc == 0:
                    continue
                a, b = r + dr, c + dc
                if 0 <= a < th and 0 <= b < w and valid[a, b]:
                    nd_ = max(float(g[a, b]), d)
                    if nd_ < dist[a, b]:
                        dist[a, b] = nd_
                        heapq.heappush(pq, (nd_, a, b))
    return np.where(valid, dist, nd32).astype(np.float32)


def test_fill_grid_vs_dijkstra_minimax():
    from pycuda_raster_spark.operators.hydro import fill_sinks_grid

    rng = np.random.default_rng(3)
    for trial in range(6):
        g = (rng.random((12, 10)) * 100).astype(np.float32)
        if trial % 2:
            g[3:5, 2:4] = NODATA  # interior hole -> local drains
        np.testing.assert_array_equal(fill_sinks_grid(g), brute_fill(g))


def test_fill_grid_boundary_breach_and_hole_drain():
    from pycuda_raster_spark.operators.hydro import fill_sinks_grid

    g = np.full((5, 5), 10.0, dtype=np.float32)
    g[2, 2] = 1.0
    g[2, 3] = 5.0
    g[2, 4] = 5.0  # breach reaches the edge -> pit fills to 5
    out = fill_sinks_grid(g)
    assert out[2, 2] == np.float32(5.0) and out[2, 3] == np.float32(5.0)
    g2 = np.full((5, 5), 10.0, dtype=np.float32)
    g2[2, 2] = 1.0
    g2[2, 1] = NODATA  # hole next to the pit -> drains at its own elev
    out2 = fill_sinks_grid(g2)
    assert out2[2, 2] == np.float32(1.0)
    assert out2[2, 1] == np.float32(NODATA)


@pytest.mark.parametrize("tile_rows", [2, 8, 13, 32])
def test_fill_tiled_matches_twin(spark, images_df, tile_rows):
    """Iterated band fixpoints + halo exchange converge to the same
    greatest fixpoint as the whole-grid sweep — bit-for-bit, including
    tile_rows=2 (many cross-band spill alternations)."""
    from pycuda_raster_spark.operators.hydro import (
        fill_sinks_grid,
        fill_sinks_tiles,
    )

    out = fill_sinks_tiles(decode_tiles(images_df, tile_rows=tile_rows))
    got = _collect(out, "filled", np.float32)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        np.testing.assert_array_equal(
            got[iid], fill_sinks_grid(_decoded(i)),
            err_msg=f"{iid} tr={tile_rows}")


def test_cli_fill(spark, images_df, tmp_path):
    from pycuda_raster_spark.__main__ import main
    from pycuda_raster_spark.operators.hydro import fill_sinks_grid

    inp = str(tmp_path / "in.parquet")
    images_df.write.parquet(inp)
    out = str(tmp_path / "fill")
    assert main([inp, out, "fill", "--fill", "--tile-rows=8",
                 "--cores=4"]) == 0
    rows = (spark.read.parquet(out)
            .filter(F.col("image_id") == "img000000").collect())
    rows.sort(key=lambda r: r.ty0)
    got = np.vstack([np.asarray(r.filled, np.float32).reshape(r.th, r.w)
                     for r in rows])
    np.testing.assert_array_equal(got, fill_sinks_grid(_decoded(0)))


@pytest.mark.parametrize("tile_rows", [8, 13, 32])
def test_fill_flow_accum_composition(spark, images_df, tile_rows):
    """fill -> flow_dir -> accumulation tiled == the same composition of
    whole-grid twins, bit-for-bit (the real watershed pipeline)."""
    from pycuda_raster_spark.operators.hydro import (
        fill_flow_accum_tiles,
        fill_sinks_grid,
        flow_accum_grid,
    )

    out = fill_flow_accum_tiles(decode_tiles(images_df,
                                             tile_rows=tile_rows))
    got = _collect(out, "flow_accum", np.float32)
    for i in range(SPEC.n_images):
        iid = f"img{i:06d}"
        want = flow_accum_grid(flow_dir(fill_sinks_grid(_decoded(i))))
        np.testing.assert_array_equal(got[iid], want,
                                      err_msg=f"{iid} tr={tile_rows}")
