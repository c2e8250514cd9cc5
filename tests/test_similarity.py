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


def test_cosine_pairs_precision(spark, emb):
    got = cosine_pairs(emb.limit(200), threshold=0.8, n_planes=8).collect()
    pdf = emb.limit(200).toPandas()
    mat = np.vstack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    pos = {v: i for i, v in enumerate(pdf["vec_id"])}
    for r in got:
        c = float(mat[pos[r.id_a]] @ mat[pos[r.id_b]])
        assert abs(c - r.cosine) < 1e-6 and c >= 0.8 and r.id_a < r.id_b
