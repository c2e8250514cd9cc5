"""Dedup operators vs pandas/NumPy brute force (SURVEY.md §5.5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, build_images
from pycuda_raster_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    phash_dedup,
    simhash64,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_exact_dedup_keeps_min_id(spark, docs):
    out = exact_dedup(docs, ["text"], "doc_id").collect()
    pdf = docs.toPandas()
    want = pdf.sort_values("doc_id").groupby("text", as_index=False).first()
    assert len(out) == len(want)
    got_ids = sorted(r.doc_id for r in out)
    assert got_ids == sorted(want["doc_id"])


def test_phash_dedup_finds_byte_identical_dups(spark):
    spec = CorpusSpec(n_images=32, dup_every=10)
    images = spark.createDataFrame(build_images(spec))
    pairs = {(r.image_id_a, r.image_id_b) for r in phash_dedup(images, max_hamming=0).collect()}
    # byte-identical duplicates (i, i-10) must be found
    rows = build_images(spec)
    by_bytes = {}
    for r in rows:
        by_bytes.setdefault(bytes(r["bytes"]), []).append(r["image_id"])
    want = set()
    for grp in by_bytes.values():
        grp = sorted(grp)
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                want.add((grp[i], grp[j]))
    assert want <= pairs
    # and every reported pair really is within the hamming bound
    ph = {r["image_id"]: r["phash"] for r in rows}
    for a, b in pairs:
        assert bin((ph[a] ^ ph[b]) & (2**64 - 1)).count("1") == 0


def test_phash_dedup_pigeonhole_exact_at_default(spark):
    """Adversarial: hamming-4 pairs whose differing bits land ONE PER BAND
    of the round-1 4x16 banding (bits 8/24/40/56) — that design shared no
    band and silently dropped them; the 8x8 banding must find them."""
    base = 0x1234_5678_9ABC_DEF0
    mut = base ^ (1 << 8) ^ (1 << 24) ^ (1 << 40) ^ (1 << 56)

    def to_i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [
        ("a", to_i64(base)), ("b", to_i64(mut)),
        ("c", to_i64(0x0F0F_0F0F_0F0F_0F0F)),  # far from both
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = {(r.image_id_a, r.image_id_b): r.hamming
             for r in phash_dedup(df, max_hamming=4).collect()}
    assert pairs == {("a", "b"): 4}
    # the banded filter must refuse configurations it cannot serve exactly
    with pytest.raises(ValueError):
        phash_dedup(df, max_hamming=8, n_bands=8)


def _brute_jaccard_pairs(pdf, n, threshold, char_ngram=False):
    def shingles(t):
        toks = t.lower().split()
        if char_ngram:
            s = " ".join(t.lower().split())
            return {s[i : i + n] for i in range(max(len(s) - n + 1, 1))}
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sh = {r.doc_id: shingles(r.text) for r in pdf.itertuples(index=False)}
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if j >= threshold:
                out[(a, b)] = j
    return out


def test_minhash_lsh_vs_brute_force(spark, docs):
    """LSH candidate recall is probabilistic, precision is exact: every
    reported pair must match brute-force Jaccard, and high-similarity
    pairs (well above threshold) must be recalled."""
    small = docs.limit(300)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in minhash_lsh_pairs(small, jaccard_threshold=0.5).collect()}
    want = _brute_jaccard_pairs(small.toPandas(), 3, 0.5)
    for pair, j in got.items():
        assert pair in want and abs(want[pair] - j) < 1e-9
    strong = {p for p, j in want.items() if j >= 0.8}
    assert strong <= set(got), "pairs with jaccard >= 0.8 must be recalled"


def test_exhaustive_mode_equals_bruteforce(spark, docs):
    """mode='exhaustive' (the oracle configuration) = recall exactly 1:
    the pair set IS the brute-force set, values exact."""
    small = docs.limit(150)
    pdf = small.toPandas()
    for fn, n, char in ((minhash_lsh_pairs, 3, False), (ngram_jaccard_pairs, 5, True)):
        kwargs = {"jaccard_threshold": 0.5} if not char else {"n": 5, "threshold": 0.5}
        got = {(r.id_a, r.id_b): r.jaccard
               for r in fn(small, mode="exhaustive", **kwargs).collect()}
        want = _brute_jaccard_pairs(pdf, n, 0.5, char_ngram=char)
        assert set(got) == set(want)
        for p, j in got.items():
            assert abs(want[p] - j) < 1e-9


def test_ngram_jaccard_precision(spark, docs):
    small = docs.limit(200)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(small, n=5, threshold=0.5).collect()}
    want = _brute_jaccard_pairs(small.toPandas(), 5, 0.5, char_ngram=True)
    for pair, j in got.items():
        assert pair in want and abs(want[pair] - j) < 1e-9


def test_simhash_deterministic_and_similarity_ordered(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different words entirely unrelated content here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    out2 = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    assert out == out2, "simhash must be deterministic"

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(out[0], out[1]) < ham(out[0], out[2])


def test_dedup_clusters_matches_union_find(spark):
    """Connected components (chain, triangle-with-tail, singletons) must
    match a brute-force union-find; pointer jumping keeps rounds low even
    for the 8-node chain."""
    from pycuda_raster_spark.operators.dedup import dedup_clusters

    ids = list(range(20))
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),  # chain
             (10, 11), (11, 12), (10, 12), (12, 13),                  # tri+tail
             (15, 16)]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    want_label = {i: min(j for j in ids if find(j) == find(i)) for i in ids}
    want_size = {i: sum(1 for j in ids if find(j) == find(i)) for i in ids}

    corpus = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.doc_id: (r.cluster_id, r.cluster_size)
           for r in dedup_clusters(pairs, corpus).collect()}
    assert got == {i: (want_label[i], want_size[i]) for i in ids}


def test_dedup_clusters_long_chain_no_plan_explosion(spark):
    """Regression: a 1500-node path graph needs ~11 pointer-jumping
    rounds. Before the per-round localCheckpoint, each round's self-join
    DOUBLED the logical plan (cache() never truncates lineage), freezing
    the driver in analyzer/generateTreeString work around round ~10 —
    this test hung for minutes and blew the heap. With the fix it
    converges in seconds; correctness: every node labeled 0, one cluster
    of 1500."""
    import time

    from pycuda_raster_spark.operators.dedup import dedup_clusters

    n = 1500
    corpus = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = (spark.range(n - 1)
             .select(F.col("id").alias("id_a"),
                     (F.col("id") + 1).alias("id_b")))
    t0 = time.time()
    got = dedup_clusters(pairs, corpus, max_iterations=25).collect()
    elapsed = time.time() - t0
    assert len(got) == n
    assert all(r.cluster_id == 0 and r.cluster_size == n for r in got)
    # generous even for a throttled host; the pre-fix behavior was
    # minutes-to-hang, so this bound still catches a reintroduction
    assert elapsed < 300, f"CC loop took {elapsed:.0f}s — plan explosion?"


def test_contamination_check_brute_force(spark):
    """13-gram train/eval overlap vs a Python brute force, incl. the
    short-document whole-text fallback and the broadcast plan."""
    from pycuda_raster_spark.operators.dedup import contamination_check

    docs = [
        (0, "alpha beta gamma"),                          # eval, short
        (1, "alpha beta gamma"),                          # train dup of 0
        (2, " ".join(f"w{i}" for i in range(30))),        # train
        (3, " ".join(f"w{i}" for i in range(30))),        # train dup of 2
        (4, " ".join(f"w{i}" for i in range(5, 40))),     # eval, overlaps 2/3
        (5, "totally different text entirely"),           # train, clean
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    train = df.filter("doc_id % 2 = 1 or doc_id = 2")
    ev = df.filter("doc_id in (0, 4)")

    def grams(t, n=13):
        toks = t.lower().strip().split()
        if len(toks) >= n:
            return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        return {" ".join(toks)}

    ev_g = set().union(*(grams(t) for i, t in docs if i in (0, 4)))
    want = {}
    for i, t in docs:
        if not (i % 2 == 1 or i == 2):
            continue
        k = len(grams(t) & ev_g)
        if k:
            want[i] = k
    got = {r.doc_id: r.n_shared for r in contamination_check(train, ev).collect()}
    assert got == want and 1 in got and 2 in got and 5 not in got

    plan = contamination_check(train, ev)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan
