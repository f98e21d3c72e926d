"""Video/audio columns: opaque binary + typed metadata, Arrow-batched.

The build brief's multimodal contract: treat video/audio as opaque
``binary`` columns with typed metadata and implement decode /
frame-sample / feature-extract as pandas stages over ``mapInPandas``,
stubbing codecs the sandbox lacks while keeping the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) real.

Video is NOT stubbed: ``SGV1`` is a trivial but real container —
magic, frame count, then length-prefixed PNG frames — decoded with the
repo's own codec (functions/imagecodec), so frame sampling, dims, and
per-frame phash are bit-real and tested. Audio is real for
UNCOMPRESSED payloads: RIFF/WAVE is a public container needing no
codec library, so ``decode_audio`` parses PCM 8/16/32-bit and IEEE
float32 waveforms with pure struct+numpy (``encode_wav`` is the
fixture-side inverse). Compressed codecs (MP3/AAC/…) remain out of
scope in this sandbox and raise ``ValueError``; for opaque non-WAV
payloads ``audio_features(use_fake=True)`` keeps the clearly-marked
deterministic fake so the dataflow shape stays testable.

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
_WAV_FMT_PCM = 1
_WAV_FMT_FLOAT = 3


def encode_wav(wave: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Float waveform in [-1, 1] → RIFF/WAVE 16-bit PCM bytes. Accepts
    shape (n,) mono or (n, ch); channels interleave frame-major as the
    format requires."""
    w = np.asarray(wave, dtype=np.float64)
    if w.ndim == 1:
        w = w[:, None]
    pcm = np.clip(np.round(w * 32767.0), -32768, 32767).astype("<i2")
    ch = pcm.shape[1]
    data = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", _WAV_FMT_PCM, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Real RIFF/WAVE decode — WAV is a public uncompressed container,
    so no codec library is needed: pure struct chunk-walk + numpy
    frombuffer. Returns (waveform, sample_rate); waveform is float64
    in [-1, 1], shape (n_frames,) for mono else (n_frames, n_channels).
    Handles PCM 8-bit unsigned / 16-bit / 32-bit signed and IEEE
    float32, skips foreign chunks (LIST, fact, …) with the format's
    even-byte padding. Compressed codecs (MP3/AAC/…) stay out of scope
    in this sandbox → ValueError, as does any non-RIFF payload."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, fmt, raw = 12, None, None
    while off + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, off)
        off += 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, off)
        elif cid == b"data":
            raw = data[off : off + size]
        off += size + (size & 1)  # chunks pad to even offsets
    if fmt is None or raw is None:
        raise ValueError("RIFF/WAVE missing fmt or data chunk")
    code, ch, sr, _byte_rate, _align, bits = fmt
    if code == _WAV_FMT_PCM and bits == 16:
        w = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
        w = w.astype(np.float64) / 32768.0
    elif code == _WAV_FMT_PCM and bits == 8:
        w = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif code == _WAV_FMT_PCM and bits == 32:
        w = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<i4")
        w = w.astype(np.float64) / 2147483648.0
    elif code == _WAV_FMT_FLOAT and bits == 32:
        w = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<f4").astype(np.float64)
    else:
        raise ValueError(
            f"unsupported WAVE format code={code} bits={bits} "
            "(compressed codecs are out of scope in this sandbox)"
        )
    if ch > 1:
        w = w[: len(w) // ch * ch].reshape(-1, ch)
    return w, sr


# 64-bit fingerprint layout: _FP_FRAMES+1 time frames x _FP_BANDS+1
# frequency bands -> _FP_FRAMES * _FP_BANDS = 64 sign bits
_FP_FRAMES = 16
_FP_BANDS = 4


def audio_fingerprint64(wave: np.ndarray, sample_rate: int) -> int:
    """Robust 64-bit audio fingerprint (signed i64, matching the
    stored LongType): the Haitsma-Kalker construction (published —
    "A Highly Robust Audio Fingerprinting System", ISMIR 2002) scaled
    down to one word per clip. The waveform is mono-mixed, split into
    17 equal time frames, each frame's spectrum (rfft power) is
    pooled into 5 log-spaced bands, and bit (t, b) is the sign of the
    band-energy delta's time difference:

        bit(t,b) = [ (E(t+1,b) - E(t+1,b+1)) - (E(t,b) - E(t,b+1)) > 0 ]

    Sign-of-difference bits survive gain changes exactly (energy
    scaling cancels in the comparison) and low-level noise flips only
    bits whose margin was already near zero — so near-identical clips
    land within small Hamming distance and the banded 64-bit dedup
    machinery (operators/phash_dedup.py — generic over any i64 hash
    column) applies unchanged. Deterministic: no randomness, float64
    throughout, ties (== 0) are bit 0. Silence → fingerprint 0.

    The ``sample_rate`` argument pins the analysis band to 0-4 kHz
    (speech band) when the clip's rate exceeds 8 kHz, so the same
    recording resampled at a higher rate keeps similar band energies.
    """
    w = np.asarray(wave, dtype=np.float64)
    if w.ndim == 2:
        w = w.mean(axis=1)
    if len(w) < (_FP_FRAMES + 1) * 2 or not np.any(w):
        return 0
    frames = np.array_split(w, _FP_FRAMES + 1)
    # per-frame band energies: rfft power pooled into log-spaced bands
    # within 0..min(nyquist, 4 kHz)
    energies = np.zeros((_FP_FRAMES + 1, _FP_BANDS + 1))
    for t, fr in enumerate(frames):
        spec = np.abs(np.fft.rfft(fr)) ** 2
        n = len(spec)
        lim = n
        if sample_rate > 8_000:
            lim = max(_FP_BANDS + 2, int(n * 4_000.0 / (sample_rate / 2.0)))
            lim = min(lim, n)
        # log-spaced band edges over bins [1, lim) (skip DC)
        edges = np.unique(
            np.round(
                np.logspace(0, np.log10(max(lim - 1, 2)), _FP_BANDS + 2)
            ).astype(int)
        )
        while len(edges) < _FP_BANDS + 2:  # tiny frames: pad edges
            edges = np.append(edges, edges[-1] + 1)
        for b in range(_FP_BANDS + 1):
            lo, hi = edges[b], max(edges[b + 1], edges[b] + 1)
            energies[t, b] = spec[lo:hi].sum() if lo < n else 0.0
    fp = 0
    for t in range(_FP_FRAMES):
        for b in range(_FP_BANDS):
            d_next = energies[t + 1, b] - energies[t + 1, b + 1]
            d_cur = energies[t, b] - energies[t, b + 1]
            if d_next - d_cur > 0:
                fp |= 1 << (t * _FP_BANDS + b)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def audio_fingerprints(
    audio: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "abytes",
) -> DataFrame:
    """(<id_col>, afp) — one 64-bit fingerprint per RIFF/WAVE clip,
    one Arrow stage, no shuffle. The id column keeps the input's name
    AND type (string or integral ids both work), so the output feeds
    the generic banded-Hamming dedup exactly like image phashes:
    ``phash_near_dup_pairs(fps, id_col=..., phash_col="afp")`` for
    corpus-wide pairs, ``phash_build_index``/``phash_dedup_table`` for
    incremental batch-vs-corpus dedup, and
    ``streaming_image_ingest_dedup`` for dedup-at-ingest — the band
    machinery is generic over any i64 hash column, so audio needs no
    parallel operator set."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [audio.schema[id_col], StructField("afp", LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                wave, sr = decode_audio(bytes(blob))
                rows.append((aid, audio_fingerprint64(wave, sr)))
            yield pd.DataFrame(rows, columns=[id_col, "afp"])

    return audio.mapInPandas(run, out_schema)


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
    use_fake: bool = False,
) -> DataFrame:
    """(<id_col>, duration_s, rms, sample_rate) per clip — the id
    column keeps the input's name and type, like
    :func:`audio_fingerprints`. The default path REALLY decodes
    (RIFF/WAVE PCM via decode_audio); pass ``use_fake=True`` for opaque
    non-WAV fixture payloads — that path substitutes the clearly-marked
    md5-derived fake so the dataflow shape stays testable without a
    compressed-codec library."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            audio.schema[id_col],
            StructField("duration_s", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("sample_rate", IntegerType()),
        ]
    )

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
                    wave, sr = decode_audio(blob)
                    dur = round(len(wave) / sr, 2)
                    rms = (
                        round(float(np.sqrt((wave**2).mean())), 4)
                        if len(wave)
                        else 0.0
                    )
                rows.append((aid, dur, rms, sr))
            yield pd.DataFrame(
                rows, columns=[id_col, "duration_s", "rms", "sample_rate"]
            )

    return audio.mapInPandas(run, out_schema)
