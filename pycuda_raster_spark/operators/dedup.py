"""Deduplication suite over document/image corpora.

Training-data-pipeline operators a 100 TB corpus needs (driver mandate),
generalizing the reference's single-corpus duplicate handling (the images
table ships a ``phash`` column for exactly this, B:15):

* ``exact_dedup``        — hash-groupBy exact duplicate removal.
* ``phash_dedup``        — near-dup images by hamming(phash) buckets.
* ``minhash_lsh_pairs``  — MinHash + banded LSH candidate pairs with exact
                           Jaccard verification. ENTIRELY JVM-side: shingles
                           via higher-order functions, minhash via
                           ``array_min(transform(shingles, xxhash64(s, j)))``,
                           bands via ``slice``+``hash``. No Python at all.
* ``simhash64``          — 64-bit SimHash (batched NumPy pandas UDF).
* ``ngram_jaccard_pairs``— character-n-gram Jaccard within LSH buckets.

The LSH shapes are the standard band-bucket-join: shuffle keys are
(band_id, band_hash) so hot buckets split under AQE; pair generation uses
an id < id self-join to avoid the symmetric blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct key — the exact-dedup
    pattern whose shuffle is one hash partition on the key hash."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def phash_dedup(images: DataFrame, max_hamming: int = 4, n_bands: int = 8) -> DataFrame:
    """Near-duplicate image pairs: (image_id_a, image_id_b, hamming).

    Pigeonhole-EXACT candidate filter: the 64-bit phash is split into
    ``n_bands`` equal bit-bands; two hashes within hamming h can differ in
    at most h bands, so they share an identical band whenever
    h < n_bands. The default 8x8-bit banding is therefore lossless for
    max_hamming <= 7 (the round-1 4x16 banding silently dropped pairs with
    one differing bit per band at h = 4). hamming itself is
    ``bit_count(a ^ b)`` — pure JVM."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"banded filter is only exact for max_hamming < n_bands "
            f"(got max_hamming={max_hamming}, n_bands={n_bands})"
        )
    if 64 % n_bands:
        raise ValueError(f"n_bands must divide 64 (got {n_bands})")
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(*[
        F.shiftrightunsigned(F.col("phash"), width * i).bitwiseAND(F.lit(mask)).alias(f"b{i}")
        for i in range(n_bands)
    ])
    e = images.select(
        F.col("image_id"), F.col("phash"), F.posexplode(bands).alias("band", "key")
    )
    a = e.alias("a")
    b = e.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("image_id_a"),
            F.col("b.image_id").alias("image_id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["image_id_a", "image_id_b"])
    )
    return pairs


def _shingles(text_col, n: int = 3):
    """word-n-gram shingle array (distinct), via higher-order functions —
    JVM-side, codegen'd."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def with_minhash(df: DataFrame, text_col: str = "text", num_hashes: int = 64,
                 shingle_n: int = 3, family_seed: int = 0) -> DataFrame:
    """Attach ``shingles`` + ``minhash array<bigint>`` columns. minhash_j =
    min over shingles of xxhash64(shingle, family_seed + j) — the
    (shingle, seed) pair hash gives num_hashes independent families
    without Python. Disjoint ``family_seed`` ranges (e.g. 0 and 1000)
    give fully independent bandings — the second-banding self-check."""
    sh = _shingles(F.col(text_col), shingle_n)
    # hash each shingle STRING once; derive the num_hashes families by
    # re-hashing the resulting int64 with the family index — ~10x cheaper
    # than hashing the string per family, same LSH guarantees
    base = F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    mh = F.array(*[
        F.array_min(F.transform(
            F.col("__shash"), lambda h, j=j: F.xxhash64(h, F.lit(family_seed + j))))
        for j in range(num_hashes)
    ])
    return (
        df.withColumn("shingles", sh)
        .withColumn("__shash", base)
        .withColumn("minhash", mh)
        .drop("__shash")
    )


def _exhaustive_jaccard_pairs(sh_df: DataFrame, threshold: float) -> DataFrame:
    """All-pairs exact Jaccard over (id, shingles) rows — the small-SF
    oracle mode shared by the minhash/ngram operators. O(n^2) candidates by
    construction (recall exactly 1), so only for corpora where the LSH
    band filter is not needed; the verify expression is the SAME as the
    LSH path's, so the two modes differ only in candidate recall."""
    a = sh_df.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh_df.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    mode: str = "lsh",
    family_seed: int = 0,
) -> DataFrame:
    """Near-dup document pairs (id_a, id_b, jaccard >= threshold).

    Plan shape: minhash -> explode band keys -> self-equi-join on
    (band, band_hash) with id< id -> dedup candidates -> EXACT Jaccard
    verify on the distinct-shingle sets (array_intersect/array_union sizes,
    JVM-side). Probabilistic candidate recall (as published MinHash-LSH),
    exact precision.

    ``mode="exhaustive"`` swaps the banded candidate filter for an
    all-pairs join (recall exactly 1): the oracle-checkable configuration
    for small SF; the banded path remains the scale/bench default."""
    if mode == "exhaustive":
        sh = df.select(
            F.col(id_col).alias("id"),
            _shingles(F.col(text_col), shingle_n).alias("shingles"),
        )
        return _exhaustive_jaccard_pairs(sh, jaccard_threshold)
    rows = num_hashes // bands
    m = with_minhash(df.select(id_col, text_col), text_col, num_hashes,
                     shingle_n, family_seed)
    band_arr = F.array(*[
        F.hash(F.slice(F.col("minhash"), b * rows + 1, rows)) for b in range(bands)
    ])
    # Materialize (id, band keys, shingles) ONCE (guide §1.2/§2.4): the
    # band self-join references the corpus twice and the verify attaches
    # shingles twice more, so without this the full shingle + num_hashes-
    # family minhash pipeline runs 2x and the shingle build 4x (measured
    # r6: 4 parquet scans of documents in the physical plan). One eager
    # localCheckpoint (the repo's leak-free persist — blocks are
    # ContextCleaner-freed when the DF goes unreachable) computes the
    # fingerprint pass once; everything downstream reads slim columns from
    # the materialized rows. Same output bit-for-bit — only the number of
    # times the fingerprints are computed changes.
    base = m.select(
        F.col(id_col).alias("id"), band_arr.alias("__bands"), "shingles"
    ).localCheckpoint(eager=True)
    # SLIM band join: only (id, band, key) is exploded/shuffled — the heavy
    # shingle arrays stay out of the candidate join entirely and are joined
    # back exactly once per side for the verify. At corpus scale this is
    # the difference between shuffling bytes ~ O(bands * doc_size) and
    # O(candidate_pairs). (A second checkpoint of the exploded key table
    # was measured a wash — the extra eager job cancels the slimmer
    # self-join scans — so both join sides read `base` directly.)
    e = base.select(
        "id", F.posexplode("__bands").alias("band", "key")
    )
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify attach: shuffled-hash on id, NEVER broadcast — the planner's
    # checkpoint-size estimate otherwise broadcasts the ENTIRE corpus
    # shingle table twice (measured: the whole-corpus HashedRelation build
    # per join lost ~10% vs the hash shuffle locally, and at corpus scale
    # broadcasting all shingles is simply wrong). The hinted build side is
    # the shingle table, whose per-partition share is bounded by the
    # uniform doc-id hash; AQE skew handling still applies.
    sh = base.select(F.col("id").alias("__sid"), F.col("shingles"))
    cand = (
        cand.join(sh.withColumnsRenamed({"__sid": "id_a", "shingles": "sh_a"})
                  .hint("shuffle_hash"), "id_a")
        .join(sh.withColumnsRenamed({"__sid": "id_b", "shingles": "sh_b"})
              .hint("shuffle_hash"), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 32,
    mode: str = "lsh",
    family_seed: int = 0,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs, LSH-bucketed. Character
    shingles catch small edits word shingles miss. ``mode="exhaustive"``
    = all-pairs exact candidates (oracle configuration, small SF only)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    chars = F.split(norm, "")
    # dynamic-start substring isn't a thing in F.substring; slice the
    # char array instead (stays JVM-side)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - n + 1, F.lit(1))),
            lambda i: F.concat_ws("", F.slice(chars, i, n)),
        )
    )
    if mode == "exhaustive":
        return _exhaustive_jaccard_pairs(
            df.select(F.col(id_col).alias("id"), sh.alias("shingles")), threshold
        )
    base = df.select(F.col(id_col).alias("id"), sh.alias("shingles")).withColumn(
        "__shash", F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    )
    rows = num_hashes // bands
    mh = F.array(*[
        F.array_min(F.transform(
            F.col("__shash"), lambda h, j=j: F.xxhash64(h, F.lit(family_seed + j))))
        for j in range(num_hashes)
    ])
    band_arr = F.array(*[
        F.hash(F.slice(F.col("minhash"), b * rows + 1, rows)) for b in range(bands)
    ])
    # one materialized fingerprint pass, same rationale as minhash_lsh_pairs
    # (the char-shingle build + num_hashes-family minhash otherwise runs
    # once per plan reference: 2x for the band join + 2x shingle builds
    # for the verify)
    base = base.withColumn("minhash", mh).select(
        "id", band_arr.alias("__bands"), "shingles"
    ).localCheckpoint(eager=True)
    e = base.select(
        "id", F.posexplode("__bands").alias("band", "key")
    )
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh2 = base.select(F.col("id").alias("__sid"), "shingles")
    # (base is the checkpointed fingerprint table — both attach joins and
    # the band join above read the materialized rows, not the raw corpus;
    # shuffle_hash keeps the corpus shingle table out of broadcasts, same
    # rationale as minhash_lsh_pairs)
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sh2.withColumnsRenamed({"__sid": "id_a", "shingles": "sh_a"})
                  .hint("shuffle_hash"), "id_a")
        .join(sh2.withColumnsRenamed({"__sid": "id_b", "shingles": "sh_b"})
              .hint("shuffle_hash"), "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over word tokens. Token hashing happens JVM-side
    (``transform(tokens, xxhash64)`` → array<bigint>, deterministic); the
    pandas UDF only does the per-bit +/- accumulation in batched NumPy
    (that reduction doesn't decompose into array built-ins)."""

    @F.pandas_udf(T.LongType())
    def _fold(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        pow2 = (np.uint64(1) << bit_idx).astype(np.uint64)
        # fully vectorized across the batch: concatenate every document's
        # token hashes, expand to a (total_tokens, 64) sign matrix once,
        # and segment-sum per document with add.reduceat (integer math —
        # identical results to a per-document loop, no per-row Python)
        arrs = [None if h is None else np.asarray(h, dtype=np.int64)
                for h in hashes]
        keep = [i for i, a in enumerate(arrs) if a is not None and a.size]
        if not keep:
            return pd.Series(out)
        lens = np.array([arrs[i].size for i in keep], dtype=np.int64)
        flat = np.concatenate([arrs[i] for i in keep]).view(np.uint64)
        signs = (((flat[:, None] >> bit_idx[None, :]) & np.uint64(1))
                 .astype(np.int64) * 2 - 1)
        offsets = np.zeros(len(keep), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        acc = np.add.reduceat(signs, offsets, axis=0)  # (n_docs, 64)
        vals = ((acc > 0) * pow2[None, :]).sum(axis=1).view(np.int64)
        out[keep] = vals
        return pd.Series(out)

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return df.withColumn(out_col, _fold(tok_hashes))


def dedup_clusters(
    pairs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over the near-dup pair graph -> per-document
    cluster assignment ``(id_col, cluster_id, cluster_size)`` with
    ``cluster_id`` = min member id (the survivor a dedup pipeline keeps;
    singletons are their own cluster of size 1).

    Min-label propagation with POINTER JUMPING: each round (a) every node
    takes the min label among itself and its neighbors (one shuffle join +
    partial-agg groupBy), then (b) every label chases its own label's
    label (path halving) — so convergence is O(log diameter) rounds, not
    O(diameter); a long chain of near-dups cannot stall the loop at
    corpus scale. One cheap driver-side action per round checks
    convergence (the standard CC-on-Spark shape — the iteration COUNT
    lives on the driver, the data never does). Compose with the banded
    LSH pair generators for the production path; the exhaustive pair mode
    is the oracle configuration.

    Each round's labels are pinned with ``localCheckpoint(eager=True)``,
    NOT ``cache()``: the round maps ``stepped`` through a self-join
    (``stepped`` appears twice in ``nxt``'s lineage), so without plan
    truncation the logical plan DOUBLES per round — exponential analyzer
    and plan-toString cost that freezes the driver around round ~10 on
    long-diameter graphs (observed: stream-link chains; cache()
    materializes data but never truncates the plan). The checkpoint
    bounds every round's plan at constant size; blocks are
    ContextCleaner-freed when the previous round's DataFrame goes
    unreachable.
    """
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).cache()
    labels = (corpus.select(F.col(id_col).alias("id")).distinct()
              .withColumn("label", F.col("id")).cache())
    labels.count()
    for _ in range(max_iterations):
        nbr = (
            edges.join(labels.select(F.col("id").alias("dst"),
                                     F.col("label").alias("dl")), "dst")
            .groupBy("src").agg(F.min("dl").alias("nl"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id", F.least("label", F.coalesce("nl", "label")).alias("label"))
        # pointer jumping: label <- label(label); label ids are node ids,
        # so the self-join always resolves. localCheckpoint, NOT cache:
        # stepped appears twice below -> plan doubles per round without
        # truncation (see docstring).
        parent = stepped.select(F.col("id").alias("label"),
                                F.col("label").alias("plabel"))
        nxt = stepped.join(parent, "label").select(
            "id", F.col("plabel").alias("label")).localCheckpoint(eager=True)
        changed = (nxt.join(labels.withColumnRenamed("label", "old"), "id")
                   .filter(F.col("label") != F.col("old")).count())
        labels.unpersist()
        labels = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iterations} rounds")
    # the converged labels are already a GC-cleaned localCheckpoint (a
    # plain .cache() left the final labels and edges resident forever
    # across repeated calls — ADVICE r3)
    final = labels
    edges.unpersist()
    sizes = final.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return final.join(sizes, "label").select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id"),
        "cluster_size")


def contamination_check(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Train/eval n-gram contamination (the GPT-3-style 13-gram rule):
    flag training documents sharing ANY word-n-gram with the eval set ->
    (doc_id, n_shared) with n_shared = count of DISTINCT shared grams
    (documents shorter than n tokens contribute their whole text as one
    gram). Gram construction is JVM-side higher-order functions; the eval
    side is the small one by design -> distinct + broadcast equi-join, so
    the train corpus is scanned once with no shuffle of train grams. At
    production scale, pre-hash grams to 64-bit keys to slim the broadcast
    (string equality kept here so the DuckDB oracle replays the join
    verbatim)."""
    tg = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_shingles(F.col(text_col), n)).alias("g"),
    )
    eg = eval_df.select(
        F.explode(_shingles(F.col(text_col), n)).alias("g")).distinct()
    return (
        tg.join(F.broadcast(eg), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
    )
