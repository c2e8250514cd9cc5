"""Shard packing: two-phase distributed prefix sum == global window."""

import numpy as np
import pytest

from pycuda_raster_spark.operators.pack import pack_shards


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    rows = [(int(i), int(w)) for i, w in
            enumerate(rng.integers(1, 900, size=3000))]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long").cache()


def _expected(docs_df, budget):
    rows = sorted(docs_df.collect(), key=lambda r: r.doc_id)
    out, run = {}, 0
    for r in rows:
        out[r.doc_id] = run // budget
        run += r.n_tokens
    return out


@pytest.mark.parametrize("partitions", [1, 7, 32])
def test_pack_shards_matches_sequential_definition(spark, docs, partitions):
    want = _expected(docs, 2048)
    got = {r.doc_id: r.shard_id
           for r in pack_shards(docs, 2048, partitions=partitions).collect()}
    assert got == want  # identical for ANY partition count


def test_pack_shards_properties(spark, docs):
    out = pack_shards(docs, 2048, partitions=8).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r)
    shards = sorted(by_shard)
    assert shards == list(range(len(shards)))  # dense shard ids
    for s in shards[:-1]:
        # each full shard starts within budget of its nominal boundary:
        # total tokens before the first doc of shard s+1 exceed (s+1)*budget
        ids_next = min(r.doc_id for r in by_shard[s + 1])
        before = sum(r.n_tokens for r in out if r.doc_id < ids_next)
        assert before >= (s + 1) * 2048
