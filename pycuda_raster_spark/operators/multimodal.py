"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training corpus carries image/audio/video as ``binary`` columns
with metadata; the Spark-side contract (schema, batch shape, partitioning,
UDF signatures) is what this module makes real. The engine's own raster
codecs (raw/png/q8) decode for real; external codecs (jpeg/mp3/h264...)
are STUBBED — the sandbox has no PIL/ffmpeg — behind
``NotImplementedError`` with a deterministic-fake escape hatch so the
plumbing is testable end-to-end.

* ``decode_features``  — binary -> fixed-length feature vector
  (mean/std/min/max/8-bin histogram of decoded pixels), mapInPandas.
* ``resize_grid``      — decoded grid -> (new_h, new_w) box-mean resize,
  vectorized NumPy.
* ``frame_sample``     — "video" = concatenated frames in one blob;
  deterministic every-nth frame sampling. Real for fmt='rawv' (our
  synthetic container), stubbed otherwise.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import codecs

SUPPORTED_FMTS = set(codecs._DECODERS)

FEATURE_SCHEMA = "image_id string, fmt string, features array<double>"


def _decode_or_stub(data: bytes, fmt: str, w: int, h: int, fake: bool) -> np.ndarray:
    if fmt in SUPPORTED_FMTS:
        return codecs.decode(data, fmt, w, h)
    if fake:
        # deterministic fake: hash-seeded grid with the right shape, so the
        # downstream plumbing (shapes, batching, schema) is exercised
        seed = int.from_bytes(bytes(data)[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
        return np.random.default_rng(seed).uniform(0, 255, size=(h, w)).astype(np.float32)
    raise NotImplementedError(
        f"codec for fmt={fmt!r} not available in this environment "
        f"(supported: {sorted(SUPPORTED_FMTS)}); pass deterministic_fake=True "
        "to exercise the pipeline plumbing"
    )


def decode_features(images: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """images -> (image_id, fmt, features[12]): mean, std, min, max + 8-bin
    min-max histogram of valid pixels. Batched decode, NumPy reductions."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for row in pdf.itertuples(index=False):
                g = _decode_or_stub(row.bytes, row.fmt, int(row.w), int(row.h),
                                    deterministic_fake)
                v = g[g != codecs.NODATA].astype(np.float64)
                if v.size == 0:
                    feats.append(np.zeros(12))
                    continue
                hist, _ = np.histogram(v, bins=8, range=(v.min(), v.max() + 1e-9))
                feats.append(np.concatenate([
                    [v.mean(), v.std(), v.min(), v.max()], hist / v.size,
                ]))
            yield pd.DataFrame({
                "image_id": pdf["image_id"], "fmt": pdf["fmt"], "features": feats,
            })

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "image_id string, w int, h int, px array<float>"


def resize_grid(images: DataFrame, new_w: int, new_h: int,
                deterministic_fake: bool = False) -> DataFrame:
    """Box-mean resize of the decoded grid to (new_h, new_w)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                g = _decode_or_stub(row.bytes, row.fmt, int(row.w), int(row.h),
                                    deterministic_fake).astype(np.float64)
                ys = np.linspace(0, g.shape[0], new_h + 1).astype(int)
                xs = np.linspace(0, g.shape[1], new_w + 1).astype(int)
                r = np.empty((new_h, new_w), dtype=np.float32)
                for i in range(new_h):
                    band = g[ys[i]:ys[i + 1]]
                    csum = np.concatenate([[0.0], band.mean(axis=0).cumsum()])
                    r[i] = (csum[xs[1:]] - csum[xs[:-1]]) / np.maximum(xs[1:] - xs[:-1], 1)
                out.append(r.ravel())
            yield pd.DataFrame({
                "image_id": pdf["image_id"],
                "w": np.full(len(pdf), new_w, dtype=np.int32),
                "h": np.full(len(pdf), new_h, dtype=np.int32),
                "px": out,
            })

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        gen, schema=RESIZE_SCHEMA
    )


AUDIO_SCHEMA = (
    "audio_id string, n_samples long, duration_s double, rms double, "
    "peak double, zero_crossings long, band_energy array<double>"
)


def audio_features(audios: DataFrame, n_bands: int = 8,
                   deterministic_fake: bool = False) -> DataFrame:
    """'Audio' (audio_id, bytes, sample_rate, fmt) -> waveform features:
    RMS, peak, zero-crossing count, coarse band energies (FFT magnitude
    binned into n_bands). fmt='rawa' = float32 little-endian PCM (real
    path); compressed formats (mp3/ogg/...) raise NotImplementedError —
    no codec libs in this environment — unless deterministic_fake."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("audio_id", "n_samples", "duration_s",
                                    "rms", "peak", "zero_crossings",
                                    "band_energy")}
            for row in pdf.itertuples(index=False):
                if row.fmt == "rawa":
                    wav = np.frombuffer(bytes(row.bytes), dtype="<f4").astype(np.float64)
                elif deterministic_fake:
                    seed = int.from_bytes(bytes(row.bytes)[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
                    wav = np.random.default_rng(seed).uniform(-1, 1, size=16000)
                else:
                    raise NotImplementedError(
                        f"audio codec fmt={row.fmt!r} unavailable; only 'rawa' "
                        "(float32 PCM) is real in this environment"
                    )
                sr = float(row.sample_rate)
                spec = np.abs(np.fft.rfft(wav)) ** 2
                edges = np.linspace(0, len(spec), n_bands + 1).astype(int)
                bands = np.array([
                    spec[edges[i]:edges[i + 1]].sum() for i in range(n_bands)
                ])
                tot = bands.sum()
                rows["audio_id"].append(row.audio_id)
                rows["n_samples"].append(len(wav))
                rows["duration_s"].append(len(wav) / sr)
                rows["rms"].append(float(np.sqrt(np.mean(wav * wav))))
                rows["peak"].append(float(np.abs(wav).max()) if len(wav) else 0.0)
                rows["zero_crossings"].append(int((np.diff(np.signbit(wav)) != 0).sum()))
                rows["band_energy"].append(bands / tot if tot > 0 else bands)
            yield pd.DataFrame(rows)

    return audios.select("audio_id", "bytes", "sample_rate", "fmt").mapInPandas(
        gen, schema=AUDIO_SCHEMA
    )


FRAME_SCHEMA = "video_id string, frame_idx int, px array<float>"


def frame_sample(videos: DataFrame, every_nth: int = 2,
                 deterministic_fake: bool = False) -> DataFrame:
    """'Videos' (video_id, bytes, w, h, n_frames, fmt) -> sampled frames.
    fmt='rawv' = n_frames float32 grids concatenated (real path); other
    container formats raise NotImplementedError unless faked."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, pxs = [], [], []
            for row in pdf.itertuples(index=False):
                w, h, nf = int(row.w), int(row.h), int(row.n_frames)
                if row.fmt == "rawv":
                    frames = np.frombuffer(bytes(row.bytes), dtype="<f4").reshape(nf, h, w)
                elif deterministic_fake:
                    seed = int.from_bytes(bytes(row.bytes)[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
                    frames = np.random.default_rng(seed).uniform(
                        0, 255, size=(nf, h, w)).astype(np.float32)
                else:
                    raise NotImplementedError(
                        f"video codec fmt={row.fmt!r} unavailable; only 'rawv' "
                        "is real in this environment"
                    )
                for fi in range(0, nf, every_nth):
                    vids.append(row.video_id)
                    idxs.append(fi)
                    pxs.append(frames[fi].ravel())
            yield pd.DataFrame({"video_id": vids, "frame_idx": idxs, "px": pxs})

    return videos.select("video_id", "bytes", "w", "h", "n_frames", "fmt").mapInPandas(
        gen, schema=FRAME_SCHEMA
    )
