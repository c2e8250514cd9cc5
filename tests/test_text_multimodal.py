"""Text analysis + multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pycuda_raster_spark.fixtures import CorpusSpec, build_images, grid_for
from pycuda_raster_spark.functions.codecs import NODATA, decode
from pycuda_raster_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    resize_grid,
)
from pycuda_raster_spark.operators.text import (
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_token_count,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_token_count_matches_python(spark, docs):
    out = with_token_count(docs.limit(100)).collect()
    for r in out:
        assert r.n_tokens == len(r.text.strip().lower().split())
        assert r.n_bpe_ish >= 1


def test_quality_columns_in_range(spark, docs):
    out = with_quality(docs.limit(200)).collect()
    for r in out:
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.quality_score <= 1.0


def test_lang_id_and_fingerprint(spark, docs):
    out = with_lang_id(with_fingerprint(docs.limit(100))).collect()
    import hashlib
    import re

    for r in out:
        assert r.lang_pred in ("en", "unk")
        norm = re.sub(r"[^a-z0-9]", "", r.text.lower())
        assert r.fingerprint == hashlib.md5(norm.encode()).hexdigest()
    # fingerprint equality for whitespace variants
    df = spark.createDataFrame(
        [(0, "Hello,   World!"), (1, "hello world"), (2, "different")],
        ["doc_id", "text"],
    )
    fps = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
    assert fps[0] == fps[1] != fps[2]


SPEC = CorpusSpec(n_images=8, w=32, h=24)


def test_decode_features_real_codecs(spark):
    images = spark.createDataFrame(build_images(SPEC))
    out = {r.image_id: np.asarray(r.features) for r in decode_features(images).collect()}
    assert len(out) == SPEC.n_images
    rows = build_images(SPEC)
    for r in rows[:4]:
        g = decode(bytes(r["bytes"]), r["fmt"], SPEC.w, SPEC.h)
        v = g[g != NODATA].astype(np.float64)
        f = out[r["image_id"]]
        assert abs(f[0] - v.mean()) < 1e-6 and abs(f[2] - v.min()) < 1e-6
        assert abs(f[4:].sum() - 1.0) < 1e-9  # histogram normalized


def test_decode_features_stub_raises_and_fake_works(spark):
    bad = spark.createDataFrame(
        [("x0", bytearray(b"\x01\x02\x03\x04"), 4, 4, "jpeg")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        decode_features(bad).collect()
    out = decode_features(bad, deterministic_fake=True).collect()
    out2 = decode_features(bad, deterministic_fake=True).collect()
    assert np.allclose(out[0].features, out2[0].features)  # deterministic fake


def test_resize_grid_box_mean(spark):
    images = spark.createDataFrame(build_images(SPEC)).limit(2)
    out = resize_grid(images, new_w=8, new_h=6).collect()
    for r in out:
        assert r.w == 8 and r.h == 6 and len(r.px) == 48
    # constant image resizes to the same constant
    g = np.full((24, 32), 7.0, dtype=np.float32)
    from pycuda_raster_spark.functions.codecs import encode

    const = spark.createDataFrame(
        [("c0", bytearray(encode(g, "raw")), 32, 24, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = resize_grid(const, 8, 6).collect()[0]
    assert np.allclose(np.asarray(r.px), 7.0)


def test_audio_features_rawa(spark):
    from pycuda_raster_spark.operators.multimodal import audio_features

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr
    sine = (0.5 * np.sin(2 * np.pi * 440 * t)).astype("<f4")  # 1s 440Hz
    rows = [("a0", bytearray(sine.tobytes()), sr, "rawa")]
    df = spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int, fmt string")
    r = audio_features(df).collect()[0]
    assert r.n_samples == sr and abs(r.duration_s - 1.0) < 1e-9
    assert abs(r.rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(r.peak - 0.5) < 1e-6
    assert abs(r.zero_crossings - 880) <= 2  # 2 crossings per cycle
    be = np.asarray(r.band_energy)
    assert abs(be.sum() - 1.0) < 1e-9
    assert be.argmax() == 0  # 440 Hz lives in the lowest of 8 bands
    # compressed formats stub
    bad = spark.createDataFrame(
        [("a1", bytearray(b"abc"), sr, "mp3")],
        "audio_id string, bytes binary, sample_rate int, fmt string")
    with pytest.raises(Exception, match="NotImplementedError|unavailable"):
        audio_features(bad).collect()
    assert audio_features(bad, deterministic_fake=True).count() == 1


def test_frame_sample_rawv(spark):
    nf, h, w = 6, 4, 5
    frames = np.arange(nf * h * w, dtype=np.float32).reshape(nf, h, w)
    vids = spark.createDataFrame(
        [("v0", bytearray(frames.tobytes()), w, h, nf, "rawv")],
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string",
    )
    out = sorted(frame_sample(vids, every_nth=2).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2, 4]
    for r in out:
        assert np.array_equal(np.asarray(r.px), frames[r.frame_idx].ravel())


def test_lang_id_multi_predictions(spark):
    """The 4-profile language ID must classify clearly-monolingual
    sentences correctly, fall back to 'unk' on function-word-free text,
    and stay pure-JVM (no Python stages in the plan)."""
    from pycuda_raster_spark.operators.text import with_lang_id_multi

    rows = [
        (0, "the cat is on the mat and the dog is in the house"),
        (1, "der hund ist nicht mit der katze und das haus ist zu den feldern"),
        (2, "le chat est dans la maison et les oiseaux sont pour une chanson"),
        (3, "el perro no es como los gatos una casa para las aves por favor"),
        (4, "zxqwv plktr mnbvc asdfg qwert"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in with_lang_id_multi(df).collect()}
    assert out[0].lang_pred == "en"
    assert out[1].lang_pred == "de"
    assert out[2].lang_pred == "fr"
    assert out[3].lang_pred == "es"
    assert out[4].lang_pred == "unk"
    # rates are exact hit/token ratios
    assert abs(out[0].rate_en - 9 / 13) < 1e-12
    plan = with_lang_id_multi(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Python" not in plan


def test_repetition_stats_edges_and_tiebreak(spark):
    from pycuda_raster_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            # "b c" x3 of 6 grams -> share 0.5 > 0.125 -> repetitive
            (1, "a b c b c b c"),
            # 8 distinct 2-grams, tie on count=1 -> lexicographic pick;
            # share exactly 1/8 = threshold -> NOT repetitive (strict >)
            (2, "i h g f e d c b a"),
            (3, "solo"),          # < 2 tokens: no grams
            (4, ""),              # empty text -> split gives one '' token
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert len(out) == 4

    r1 = out[1]
    assert r1.top2 == "b c" and r1.top2_n == 3
    assert r1.top2_share == 3.0 / 6.0 and bool(r1.repetitive)
    assert r1.n_tokens == 7 and r1.n_distinct_tokens == 3

    r2 = out[2]
    assert r2.top2 == "b a" and r2.top2_n == 1  # smallest gram among ties
    assert r2.top2_share == 0.125 and not r2.repetitive

    for d in (3, 4):
        assert out[d].top2 is None and out[d].top2_n == 0
        assert out[d].top2_share == 0.0 and not out[d].repetitive
