"""Similarity search: exact top-k vs NumPy; IVF recall; cosine pairs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_assign,
    ivf_topk,
    seeded_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _brute_topk(pdf, qids, k):
    mat = np.vstack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    pos = {v: i for i, v in enumerate(ids)}
    out = {}
    for q in qids:
        scores = mat @ mat[pos[q]]
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
        out[q] = [(int(ids[i]), float(scores[i])) for i in order]
    return out


def test_cosine_topk_exact(spark, emb):
    qids = [0, 1, 2, 3, 4]
    queries = emb.filter(F.col("vec_id").isin(qids))
    got = cosine_topk(emb, queries, k=5).collect()
    want = _brute_topk(emb.toPandas(), qids, 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.score))
    assert set(by_q) == set(qids)
    for q in qids:
        rows = sorted(by_q[q])
        assert [v for _, v, _ in rows] == [v for v, _ in want[q]]
        for (_, _, s), (_, ws) in zip(rows, want[q]):
            assert abs(s - ws) < 1e-9


def test_ivf_recall_against_bruteforce(spark, emb):
    dim = len(emb.select("embedding").first()[0])
    cents = seeded_centroids(dim, 8)
    bucketed = ivf_assign(emb, cents).cache()
    # every corpus vector gets exactly one bucket
    assert bucketed.count() == emb.count()
    qids = list(range(10))
    queries = emb.filter(F.col("vec_id").isin(qids))
    got = ivf_topk(bucketed, queries, cents, k=5, nprobe=4).collect()
    want = _brute_topk(emb.toPandas(), qids, 5)
    hits = total = 0
    for q in qids:
        w = {v for v, _ in want[q]}
        g = {r.vec_id for r in got if r.query_id == q}
        hits += len(w & g)
        total += len(w)
    assert hits / total >= 0.6, f"IVF recall too low: {hits}/{total}"
    # full probe (nprobe = all buckets) must equal brute force exactly
    got_full = ivf_topk(bucketed, queries, cents, k=5, nprobe=8).collect()
    for q in qids:
        g = sorted((r.rank, r.vec_id) for r in got_full if r.query_id == q)
        assert [v for _, v in g] == [v for v, _ in want[q]]


def test_trained_centroids_improve_recall(spark, emb):
    """Two Lloyd iterations must (a) be deterministic across partitionings
    (the DECIMAL-exact sum recipe) and (b) not lose recall vs the seeded
    random codebook — on this corpus they should gain (VERDICT r3 #7)."""
    from pycuda_raster_spark.operators.similarity import train_centroids

    dim = len(emb.select("embedding").first()[0])
    init = seeded_centroids(dim, 8)
    trained = train_centroids(emb, init, iterations=2)
    trained_b = train_centroids(emb.repartition(13), init, iterations=2)
    np.testing.assert_array_equal(trained, trained_b,
                                  "training must be partition-invariant")
    assert not np.array_equal(trained, init), "training changed nothing"

    qids = list(range(16))
    queries = emb.filter(F.col("vec_id").isin(qids))
    want = _brute_topk(emb.toPandas(), qids, 5)

    def recall(cents):
        got = ivf_topk(ivf_assign(emb, cents), queries, cents,
                       k=5, nprobe=2).collect()
        hits = total = 0
        for q in qids:
            w = {v for v, _ in want[q]}
            g = {r.vec_id for r in got if r.query_id == q}
            hits += len(w & g)
            total += len(w)
        return hits / total

    r_seed, r_train = recall(init), recall(trained)
    assert r_train >= r_seed, (r_seed, r_train)
    # absolute floor is modest: uniform random embeddings have little
    # cluster structure, so nprobe=2/8 caps recall well below 1 even for a
    # perfect codebook — the signal is the trained-vs-seeded ordering above
    assert r_train >= 0.5, f"trained recall {r_train:.2f}"


def test_ivf_topk_join_equals_collect_based(spark, emb):
    """The distributed-queries IVF join path must produce EXACTLY the
    collect-based ivf_topk results (same codebook, same nprobe) — it is
    the same algorithm with the query side kept as a DataFrame."""
    from pycuda_raster_spark.operators.similarity import ivf_topk_join

    dim = len(emb.select("embedding").first()[0])
    cents = seeded_centroids(dim, 8)
    bucketed = ivf_assign(emb, cents).cache()
    queries = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = {(r.query_id, r.rank): r.vec_id
           for r in ivf_topk_join(bucketed, queries, cents, k=5, nprobe=4).collect()}
    want = {(r.query_id, r.rank): r.vec_id
            for r in ivf_topk(bucketed, emb.filter(F.col("vec_id") < 12),
                              cents, k=5, nprobe=4).collect()}
    assert got == want


def test_cosine_topk_join_equals_broadcast_path(spark, emb):
    """cosine_topk_join (block cogroup, queries stay a DataFrame) is the
    same exact search as cosine_topk (collect+broadcast) — rank-identical
    on the full query set, including the tie-break order."""
    from pycuda_raster_spark.operators.similarity import cosine_topk_join

    queries = emb.filter(F.col("vec_id") < 16)
    want = {(r.query_id, r.rank): r.vec_id
            for r in cosine_topk(emb, queries, k=5).collect()}
    qdf = queries.select(F.col("vec_id").alias("query_id"), "embedding")
    got = {(r.query_id, r.rank): r.vec_id
           for r in cosine_topk_join(emb, qdf, k=5, n_blocks=7).collect()}
    assert got == want and len(got) == 16 * 5
    # block count must not affect results (exact for any partitioning)
    got1 = {(r.query_id, r.rank): r.vec_id
            for r in cosine_topk_join(emb, qdf, k=5, n_blocks=1).collect()}
    assert got1 == want


def test_cosine_pairs_precision(spark, emb):
    got = cosine_pairs(emb.limit(200), threshold=0.8).collect()
    pdf = emb.limit(200).toPandas()
    mat = np.vstack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    pos = {v: i for i, v in enumerate(pdf["vec_id"])}
    for r in got:
        c = float(mat[pos[r.id_a]] @ mat[pos[r.id_b]])
        assert abs(c - r.cosine) < 1e-6 and c >= 0.8 and r.id_a < r.id_b


def _neardup_corpus(spark, n_base=60, dim=32, seed=7):
    """Deterministic corpus where (2i, 2i+1) are planted near-dup pairs
    with cosine >= 0.8 (small perturbation of a shared base vector)."""
    rng = np.random.default_rng(seed)
    rows = []
    expected = set()
    for i in range(n_base):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        w = v + 0.25 * rng.standard_normal(dim) / np.sqrt(dim)
        w /= np.linalg.norm(w)
        if float(v @ w) >= 0.82:  # margin above the 0.8 threshold
            expected.add((2 * i, 2 * i + 1))
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, expected


def test_cosine_pairs_banded_recall(spark):
    """The banded hyperplane LSH must recall >= 95% of planted pairs with
    cosine >= 0.8 (the round-1 single-band design sat around 16% here)."""
    df, expected = _neardup_corpus(spark)
    assert len(expected) >= 30  # the construction really plants pairs
    got = {(r.id_a, r.id_b) for r in cosine_pairs(df, threshold=0.8).collect()}
    recall = len(expected & got) / len(expected)
    assert recall >= 0.95, f"banded LSH recall {recall:.2f} < 0.95"


def test_cosine_pairs_exhaustive_equals_bruteforce(spark, emb):
    """mode='exhaustive' is all-pairs: exactly the brute-force pair set."""
    small = emb.limit(120)
    got = {(r.id_a, r.id_b): r.cosine
           for r in cosine_pairs(small, threshold=0.5, mode="exhaustive").collect()}
    pdf = small.toPandas()
    mat = np.vstack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))
            c = float(mat[i] @ mat[j])
            if c >= 0.5 - 1e-9:
                want[(a, b)] = c
    # boundary values can differ by float fold order; compare with margin
    sure_want = {p for p, c in want.items() if c >= 0.5 + 1e-9}
    assert sure_want <= set(got)
    for p, c in got.items():
        assert p in want and abs(want[p] - c) < 1e-9
