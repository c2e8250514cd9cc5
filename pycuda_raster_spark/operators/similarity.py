"""Similarity search over embedding columns (array<float>).

Two paths, mirroring the engine's filter-and-refine philosophy:

* ``cosine_topk`` — exact brute-force baseline: broadcast the query set,
  per-partition batched NumPy matmul inside ``mapInPandas`` (a 1000-executor
  scan: each executor scores its corpus slice against all queries, then a
  window top-k finalizes). The matmul IS the vectorization — no per-row
  Python (B:15).
* ``ivf_topk`` — IVF scale path: deterministic seeded centroids (k-means--
  style but sampling-free so results are reproducible), corpus assigned to
  nearest centroid once (one shuffle, reusable), queries probe only the
  ``nprobe`` nearest centroid buckets. Recall < 1 by construction; the
  bench reports recall vs the brute-force baseline.

* ``cosine_pairs`` — embedding near-duplicate pairs (cosine >= threshold)
  via random-hyperplane LSH bucketing + exact verify.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPK_SCHEMA = "query_id long, vec_id long, score double"


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k -> (query_id, vec_id, score), ties broken by
    vec_id. Queries are collected + broadcast (the small side by design);
    the corpus is streamed through NumPy matmuls partition by partition."""
    qrows = queries.select(F.col(query_id_col).alias("qid"), F.col(vec_col).alias("v")).collect()
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    qmat = _normalize(np.array([np.asarray(r.v, dtype=np.float64) for r in qrows]))
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            c = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]]))
            scores = mat @ c.T  # (nq, nc)
            nq, nc = scores.shape
            kk = min(k, nc)
            # per-partition top-k prune: only kk best per query leave Python
            idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            out_q = np.repeat(ids, kk)
            out_v = pdf["id"].to_numpy()[idx.ravel()]
            out_s = np.take_along_axis(scores, idx, axis=1).ravel()
            yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    part = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).mapInPandas(gen, schema=TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "score")
    )


def seeded_centroids(dim: int, n_centroids: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((n_centroids, dim)))


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``bucket`` = nearest-centroid index. One batched matmul pass;
    the result is meant to be persisted/bucketed so later queries reuse it."""
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]))
            pdf = pdf.copy()
            pdf["bucket"] = (m @ cent.T).argmax(axis=1).astype(np.int32)
            yield pdf

    from pyspark.sql import types as T

    schema = corpus.select(id_col, vec_col).schema.add("bucket", T.IntegerType())
    return corpus.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def ivf_topk(
    corpus_bucketed: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k probing ``nprobe`` centroid buckets per query. The
    bucket equi-join prunes the corpus scan to nprobe/n_centroids of the
    data — the 100 TB path where brute force is off the table."""
    qrows = queries.select(F.col(query_id_col).alias("qid"), F.col(vec_col).alias("v")).collect()
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    qmat = _normalize(np.array([np.asarray(r.v, dtype=np.float64) for r in qrows]))
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    sc = corpus_bucketed.sparkSession.sparkContext
    # query table: (bucket -> [query rows probing it]) broadcast
    by_bucket: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for b in probes[qi]:
            by_bucket.setdefault(int(b), []).append(qi)
    bq = sc.broadcast((qids, qmat, by_bucket))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, bb = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            out_frames = []
            for b, grp in pdf.groupby("bucket"):
                qidx = bb.get(int(b))
                if not qidx:
                    continue
                c = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in grp[vec_col]]))
                scores = mat[qidx] @ c.T
                nq, nc = scores.shape
                kk = min(k, nc)
                idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
                out_frames.append(pd.DataFrame({
                    "query_id": np.repeat(ids[qidx], kk),
                    "vec_id": grp[id_col].to_numpy()[idx.ravel()],
                    "score": np.take_along_axis(scores, idx, axis=1).ravel(),
                }))
            if out_frames:
                yield pd.concat(out_frames, ignore_index=True)

    part = corpus_bucketed.mapInPandas(gen, schema=TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "score")
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine >= threshold) via
    random-hyperplane (SimHash-for-vectors) bucketing + exact verify.
    The exact cosine verify runs JVM-side with zip_with/aggregate."""
    first = corpus.select(F.size(vec_col)).first()
    dim = int(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sc = corpus.sparkSession.sparkContext
    bp = sc.broadcast(planes)

    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        P = bp.value
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ P.T) > 0
        vals = (bits * (1 << np.arange(P.shape[0], dtype=np.int64))).sum(axis=1)
        return pd.Series(vals.astype(np.int64))

    sig_df = corpus.select(id_col, vec_col).withColumn("sig", sig(F.col(vec_col)))
    a, b = sig_df.alias("a"), sig_df.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(f"{side}.{vec_col}"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("cosine", dot / (norm("a") * norm("b")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"), "cosine")
    )
