"""Video/audio columns: opaque binary + typed metadata, Arrow-batched.

The build brief's multimodal contract: treat video/audio as opaque
``binary`` columns with typed metadata and implement decode /
frame-sample / feature-extract as pandas stages over ``mapInPandas``,
stubbing codecs the sandbox lacks while keeping the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) real.

Video is NOT stubbed: ``SGV1`` is a trivial but real container —
magic, frame count, then length-prefixed PNG frames — decoded with the
repo's own codec (functions/imagecodec), so frame sampling, dims, and
per-frame phash are bit-real and tested. Audio IS stubbed: there is no
audio codec in this sandbox, so ``decode_audio`` raises
``NotImplementedError`` and ``audio_features`` substitutes a
clearly-marked deterministic fake (md5-derived pseudo-features) that
keeps the dataflow shape testable.

At scale: one video row can be large — the sampler is an iterator-of-
batches ``mapInPandas`` (no shuffle), so rows stream through workers
without materializing a partition in memory; sampled-frame output is
written partitioned by a hash bucket of video_id like the image store.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from scraper_spark.functions.hashes import md5_long
from scraper_spark.functions.imagecodec import decode_image, encode_png, phash64

_MAGIC = b"SGV1"


# ------------------------------------------------------------- container ---
def encode_video(frames: list[np.ndarray]) -> bytes:
    """Concatenate PNG-encoded frames into an SGV1 blob."""
    out = [_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        data = encode_png(f)
        out.append(struct.pack("<I", len(data)))
        out.append(data)
    return b"".join(out)


def frame_count(data: bytes) -> int:
    if data[:4] != _MAGIC:
        raise ValueError("not an SGV1 payload")
    return struct.unpack_from("<I", data, 4)[0]


def iter_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_idx, png_bytes) without decoding pixels."""
    n = frame_count(data)
    off = 8
    for i in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        yield i, data[off : off + ln]
        off += ln


def decode_frame(data: bytes, idx: int) -> np.ndarray:
    for i, png in iter_frames(data):
        if i == idx:
            return decode_image(png)
    raise IndexError(f"frame {idx} out of range")


# --------------------------------------------------------------- sampling --
def sample_frames(
    videos: DataFrame,
    every_n: int = 2,
    id_col: str = "video_id",
    bytes_col: str = "vbytes",
) -> DataFrame:
    """Explode each video row into its sampled frames (idx % every_n
    == 0) with real decode: (video_id, frame_idx, n_frames, w, h,
    phash). One Arrow stage, no shuffle; batch shape is rows-of-videos
    in, rows-of-frames out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                blob = bytes(blob)
                n = frame_count(blob)
                for i, png in iter_frames(blob):
                    if i % every_n != 0:
                        continue
                    img = decode_image(png)
                    rows.append(
                        (vid, i, n, img.shape[1], img.shape[0], phash64(img))
                    )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "frame_idx", "n_frames", "w", "h", "phash"],
            )

    return videos.mapInPandas(
        run,
        "video_id string, frame_idx int, n_frames int, w int, h int, phash long",
    )


# ------------------------------------------------------------------ audio --
def decode_audio(data: bytes) -> np.ndarray:
    """STUB — no audio codec ships in this sandbox. The real
    implementation decodes to a waveform ndarray; the dataflow around
    it (audio_features) is exercised with the deterministic fake."""
    raise NotImplementedError(
        "audio decode requires a codec library not present in this sandbox"
    )


def _fake_audio_features(blob: bytes) -> tuple[float, float, int]:
    """DETERMINISTIC FAKE features (md5-derived), clearly marked: keeps
    the feature-extraction dataflow testable without a codec. Replaced
    by real (duration, rms, sample_rate) when decode_audio lands."""
    h = md5_long(blob.hex())
    return (round((h % 10_000) / 100.0, 2), round((h % 997) / 997.0, 4), 16_000)


def audio_features(
    audio: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "abytes",
    use_fake: bool = True,
) -> DataFrame:
    """(audio_id, duration_s, rms, sample_rate) per clip. With
    ``use_fake=False`` this calls the (stubbed) real decoder — the
    production path once a codec is available."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                blob = bytes(blob)
                if use_fake:
                    dur, rms, sr = _fake_audio_features(blob)
                else:
                    wave = decode_audio(blob)  # NotImplementedError here
                    sr = 16_000
                    dur = round(len(wave) / sr, 2)
                    rms = round(float(np.sqrt((wave**2).mean())), 4)
                rows.append((aid, dur, rms, sr))
            yield pd.DataFrame(
                rows, columns=["audio_id", "duration_s", "rms", "sample_rate"]
            )

    return audio.mapInPandas(
        run, "audio_id string, duration_s double, rms double, sample_rate int"
    )
