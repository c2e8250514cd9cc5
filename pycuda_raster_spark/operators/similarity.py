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
            # sort the batch by vec_id so the stable argsort below breaks
            # exact score ties by ascending vec_id — the same total order
            # as the final (score DESC, vec_id ASC) window; an unordered
            # argpartition prune could drop the tie the window would keep
            pdf = pdf.sort_values("id", kind="mergesort")
            c = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]]))
            scores = mat @ c.T  # (nq, nc)
            nq, nc = scores.shape
            kk = min(k, nc)
            # per-partition top-k prune: only kk best per query leave Python
            idx = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
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


def train_centroids(
    corpus: DataFrame,
    init: np.ndarray,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd refinement of an IVF codebook (VERDICT r3 #7):
    seeded random hyperplanes are parity-fine but recall-suboptimal — one
    or two k-means iterations adapt the buckets to the data.

    Per iteration: (a) assign every vector to its argmax-dot centroid
    (``ivf_assign`` — batched NumPy matmul, one pass); (b) the new
    centroid is the per-dimension MEAN of its members' unit vectors.
    Determinism recipe (CLAUDE.md): unit components are built with JVM
    fold arithmetic, quantized to DECIMAL(30,15) and summed exactly —
    partition-invariant AND replayable in SQL by the DuckDB oracle, so the
    trained codebook is reproducible bit-for-bit across engines/retries
    (centroids are NOT re-normalized: the assignment rule IS argmax dot
    against the mean vector, one less cross-engine float hazard; bucket
    geometry is what matters, not centroid norm). Empty clusters keep
    their previous centroid. The driver sees n_centroids x dim tiny rows
    per iteration — safe at any corpus scale."""
    cents = np.asarray(init, dtype=np.float64).copy()
    n_cent, dim = cents.shape
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    unit = F.transform(
        F.col(vec_col),
        lambda x: x.cast("double") / F.when(norm > 0.0, norm).otherwise(F.lit(1.0)))
    for _ in range(iterations):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        sums = (
            assigned.withColumn("__u", unit)
            .select("bucket", F.posexplode("__u").alias("pos", "v"))
            .groupBy("bucket", "pos")
            .agg(F.sum(F.col("v").cast("decimal(30,15)")).alias("s"),
                 F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            b = int(r["bucket"])
            if b not in acc:
                acc[b] = np.zeros(dim)
                cnt[b] = int(r["n"])
            acc[b][int(r["pos"])] = float(r["s"]) / float(r["n"])
        for b, vec in acc.items():
            new[b] = vec
        cents = new
    return cents


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
            if m.shape[1] != cent.shape[1]:
                raise ValueError(
                    f"embedding dim {m.shape[1]} != codebook dim "
                    f"{cent.shape[1]} — rebuild centroids for this table"
                )
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
    if qmat.shape[1] != centroids.shape[1]:
        raise ValueError(
            f"embedding dim {qmat.shape[1]} != codebook dim "
            f"{centroids.shape[1]} — rebuild centroids for this table"
        )
    # stable: exact dot-product ties between centroids resolve to the
    # lowest cid, matching the oracle's ORDER BY dot DESC, cid (and the
    # join path's probes UDF — both paths must pick identical probe sets)
    probes = np.argsort(-(qmat @ centroids.T), axis=1, kind="stable")[:, :nprobe]
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
                # id-sorted batch + stable argsort: exact-score ties at the
                # prune boundary keep the smallest vec_id, matching the
                # final (score DESC, vec_id ASC) window order
                grp = grp.sort_values(id_col, kind="mergesort")
                c = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in grp[vec_col]]))
                scores = mat[qidx] @ c.T
                nq, nc = scores.shape
                kk = min(k, nc)
                idx = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
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


def _cosine_expr(vec_col: str):
    """Exact cosine between a.vec and b.vec as JVM Column expressions.
    Sequential left-to-right double folds (zip_with products + aggregate)
    so the value is bit-reproducible by any engine that folds the same
    order — the DuckDB oracle replicates it exactly."""
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(f"{side}.{vec_col}"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))
    return dot / (norm("a") * norm("b"))


def ivf_topk_join(
    corpus_bucketed: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Join-based IVF ANN for LARGE query sets — queries stay a DataFrame
    end to end (``ivf_topk`` collects them to the driver, which is right
    for dozens of probes but not for a query TABLE at corpus scale).

    Plan: queries explode to their ``nprobe`` probe buckets (batched
    pandas UDF over the broadcast codebook) -> cogroup with the bucketed
    corpus on ``bucket`` (one shuffle per side, AQE-splittable keys) ->
    per-bucket NumPy matmul emits each query's bucket-local top-k ->
    global window finalizes. Shuffle volume is corpus-once +
    queries-times-nprobe; candidate pairs never materialize as rows.
    Results are identical to ivf_topk for the same codebook/nprobe
    (tests assert equality)."""
    from pyspark.sql import types as T

    sc = corpus_bucketed.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        cent = bc.value
        m = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in vecs]))
        if m.shape[1] != cent.shape[1]:
            raise ValueError(
                f"embedding dim {m.shape[1]} != codebook dim "
                f"{cent.shape[1]} — rebuild centroids for this table"
            )
        # stable: centroid-dot ties resolve to lowest cid (matches
        # ivf_topk's probe selection and the oracle's ORDER BY dot DESC, cid)
        order = np.argsort(-(m @ cent.T), axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    q = queries.withColumn("bucket", F.explode(probes(F.col(vec_col)))).select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qvec"), "bucket"
    )
    c = corpus_bucketed.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"), "bucket"
    )

    def score(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        cpdf = cpdf.sort_values("cid", kind="mergesort")
        qm = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in qpdf["qvec"]]))
        cm = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in cpdf["cvec"]]))
        scores = qm @ cm.T
        kk = min(k, scores.shape[1])
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
        return pd.DataFrame({
            "query_id": np.repeat(qpdf["qid"].to_numpy(), kk),
            "vec_id": cpdf["cid"].to_numpy()[idx.ravel()],
            "score": np.take_along_axis(scores, idx, axis=1).ravel(),
        })

    part = q.groupby("bucket").cogroup(c.groupby("bucket")).applyInPandas(
        score, schema=TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "score")
    )


def cosine_topk_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_blocks: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """EXACT cosine top-k where the queries are a large TABLE — neither
    side ever touches the driver (``cosine_topk`` collects + broadcasts
    the queries, which is right for dozens of probes but not a query
    table at corpus scale).

    Plan: the corpus is block-partitioned by a deterministic id hash
    (``pmod(xxhash64(id), n_blocks)``); every query replicates to all
    ``n_blocks`` blocks (exact — every (query, corpus-vector) pair is
    scored exactly once) -> cogroup on ``block`` (one shuffle per side)
    -> per-block NumPy matmul emits each query's block-local top-k ->
    global window finalizes. Shuffle volume is corpus-once +
    queries-times-n_blocks; candidate pairs never materialize as rows.
    Same cogroup shape as ``ivf_topk_join`` with an all-blocks probe, so
    recall is exactly 1 by construction. Results are identical to
    ``cosine_topk`` (rank-exact; tests assert equality).

    At 1000 executors, size ``n_blocks`` ~= the corpus partition count so
    each cogroup task holds one corpus block in memory; replicating the
    query table n_blocks ways is the exact-search price (IVF's nprobe
    explode is the sub-linear alternative when recall < 1 is acceptable)."""
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("block"),
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("block"),
    )

    def score(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        # id-sorted batch + stable argsort: exact-score ties at the block
        # prune keep the smallest vec_id, matching the final
        # (score DESC, vec_id ASC) window order
        cpdf = cpdf.sort_values("cid", kind="mergesort")
        qm = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in qpdf["qvec"]]))
        cm = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in cpdf["cvec"]]))
        scores = qm @ cm.T
        kk = min(k, scores.shape[1])
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
        return pd.DataFrame({
            "query_id": np.repeat(qpdf["qid"].to_numpy(), kk),
            "vec_id": cpdf["cid"].to_numpy()[idx.ravel()],
            "score": np.take_along_axis(scores, idx, axis=1).ravel(),
        })

    part = q.groupby("block").cogroup(c.groupby("block")).applyInPandas(
        score, schema=TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "score")
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 16,
    band_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    mode: str = "lsh",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine >= threshold) via
    BANDED random-hyperplane LSH + exact JVM cosine verify.

    OR-amplified signature: ``n_bands`` independent bands of
    ``band_planes`` hyperplane sign bits each; a pair is a candidate when
    ANY band matches (same join shape as minhash_lsh_pairs: slim
    (id, band, key) explode -> equi-join on (band, key) -> id<id ->
    dropDuplicates -> join vectors back once per side for the exact
    verify). Candidate recall at angle theta is
    1 - (1 - p^band_planes)^n_bands with p = 1 - theta/pi: the defaults
    give ~0.99 at cosine 0.8 (the round-1 single-band design had ~16%
    there and only 2^n_planes buckets — quadratic intra-bucket blowup at
    corpus scale; (band, key) keys are AQE-skew-splittable instead).

    ``mode="exhaustive"`` = all-pairs candidates (recall exactly 1) — the
    small-SF oracle configuration."""
    slim = corpus.select(id_col, vec_col)
    if mode == "exhaustive":
        a, b = slim.alias("a"), slim.alias("b")
        cand = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        return (
            cand.withColumn("cosine", _cosine_expr(vec_col))
            .filter(F.col("cosine") >= threshold)
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"), "cosine")
        )

    if dim is None:
        # fallback only — pass ``dim`` on hot paths so building the plan
        # triggers no driver-side Spark job
        dim = int(corpus.select(F.size(vec_col)).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * band_planes, dim))
    sc = corpus.sparkSession.sparkContext
    bp = sc.broadcast((planes, n_bands, band_planes))

    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        P, nb, rpb = bp.value
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = ((m @ P.T) > 0).reshape(len(m), nb, rpb)
        keys = (bits * (1 << np.arange(rpb, dtype=np.int64))).sum(axis=2)
        return pd.Series(list(keys.astype(np.int64)))

    # SLIM band join: only (id, band, key) is exploded/shuffled; vectors
    # join back exactly once per side for the verify (same rationale as
    # minhash_lsh_pairs — shuffle O(candidates), not O(bands * vec_size)).
    # The (id, band keys) table is materialized ONCE (eager localCheckpoint,
    # the leak-free persist): the self-join references it twice, and without
    # the checkpoint the band_keys pandas-UDF stage (scan -> Python matmul)
    # runs once per side (guide §2.4 — don't recompute a shared subtree).
    keyed = slim.select(
        F.col(id_col).alias("id"), band_keys(F.col(vec_col)).alias("__bands")
    ).localCheckpoint(eager=True)
    e = keyed.select(
        "id", F.posexplode("__bands").alias("band", "key")
    )
    ea, eb = e.alias("ea"), e.alias("eb")
    cand = (
        ea.join(
            eb,
            (F.col("ea.band") == F.col("eb.band"))
            & (F.col("ea.key") == F.col("eb.key"))
            & (F.col("ea.id") < F.col("eb.id")),
        )
        .select(F.col("ea.id").alias("id_a"), F.col("eb.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    a = slim.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = slim.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    dot = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("cosine", dot / (nrm("__va") * nrm("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
