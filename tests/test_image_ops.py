"""Image transform operators (SURVEY §2.10 I1-I3) over the fixture corpus."""

import os

import numpy as np
import pytest

from scraper_spark.functions import image_ops as ops
from scraper_spark.functions.imagecodec import decode_image, encode_png


def test_crop_box_semantics():
    img = np.arange(10 * 8 * 3, dtype=np.uint8).reshape(10, 8, 3)
    out = ops.crop(img, (2, 1, 6, 5))
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out, img[1:5, 2:6])


def test_binarize_threshold():
    img = np.array([[0, 100, 127, 128, 255]], dtype=np.uint8)
    out = ops.binarize(img, 127)
    assert out.tolist() == [[0, 0, 0, 255, 255]]


def test_grayscale_luma_weights():
    img = np.zeros((1, 3, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]
    img[0, 1] = [0, 255, 0]
    img[0, 2] = [0, 0, 255]
    g = ops.grayscale(img)
    assert abs(int(g[0, 0]) - 76) <= 1   # 0.299
    assert abs(int(g[0, 1]) - 150) <= 1  # 0.587
    assert abs(int(g[0, 2]) - 29) <= 1   # 0.114


def test_spark_pipeline_compose(spark, fixture_dir):
    df = (
        spark.read.parquet(os.path.join(fixture_dir, "image_captions.parquet"))
        .select("image_id", "bytes")
        .limit(8)
    )
    out = ops.binarize_images(ops.grayscale_images(df)).toPandas()
    assert len(out) == 8
    for b in out["bytes"]:
        arr = decode_image(bytes(b))
        assert arr.ndim == 2  # gray
        assert set(np.unique(arr)) <= {0, 255}  # binarized


def test_transform_preserves_other_columns(spark):
    img = encode_png(np.full((4, 4, 3), 200, dtype=np.uint8))
    df = spark.createDataFrame([("a", img, 7)], "image_id string, bytes binary, k int")
    out = ops.grayscale_images(df).collect()[0]
    assert out.image_id == "a" and out.k == 7
    assert decode_image(bytes(out.bytes)).ndim == 2


def test_area_resize_shapes_and_mean_preservation():
    from scraper_spark.functions.imagecodec import area_resize

    img = np.arange(32 * 48 * 3, dtype=np.uint8).reshape(32, 48, 3)
    out = area_resize(img, 16, 12)
    assert out.shape == (16, 12, 3)
    # area averaging preserves the global mean (within rounding)
    assert abs(float(out.mean()) - float(img.mean())) < 1.5
    gray = area_resize(img[:, :, 0], 8, 8)
    assert gray.shape == (8, 8)


def test_resize_images_stage(spark):
    img = encode_png(np.full((20, 30, 3), 128, dtype=np.uint8))
    df = spark.createDataFrame([("a", img)], "image_id string, bytes binary")
    out = ops.resize_images(df, 10, 15).collect()[0]
    dec = decode_image(bytes(out.bytes))
    assert dec.shape[:2] == (10, 15)
    assert int(dec.mean()) == 128  # flat image stays flat


def test_video_container_and_frame_sampler(spark):
    from scraper_spark.functions import video_ops as V
    from scraper_spark.functions.imagecodec import phash64

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (12, 10, 3)).astype(np.uint8) for _ in range(5)]
    blob = V.encode_video(frames)
    assert V.frame_count(blob) == 5
    assert np.array_equal(V.decode_frame(blob, 3), frames[3])  # PNG round-trip exact
    df = spark.createDataFrame([("v0", blob)], "video_id string, vbytes binary")
    out = V.sample_frames(df, every_n=2).toPandas().sort_values("frame_idx")
    assert list(out.frame_idx) == [0, 2, 4]
    assert list(out.n_frames) == [5, 5, 5]
    assert list(out.w) == [10, 10, 10] and list(out.h) == [12, 12, 12]
    for idx, ph in zip(out.frame_idx, out.phash):
        assert ph == phash64(frames[idx])


def test_audio_wav_roundtrip_and_features(spark):
    import numpy as np
    import pytest as _pytest

    from scraper_spark.functions import video_ops as V

    # pixel-exact analog for audio: encode→decode round-trip within
    # 16-bit quantization, on a known sine (RMS = 1/√2 analytically)
    sr = 8_000
    t = np.arange(sr * 2, dtype=np.float64) / sr  # 2.0 s
    sine = np.sin(2 * np.pi * 440.0 * t)
    # conventional asymmetric PCM mapping (encode ×32767, decode
    # ÷32768) bounds the error at |x|/32768 + rounding ≤ 1.5/32768
    wave, got_sr = V.decode_audio(V.encode_wav(sine, sample_rate=sr))
    assert got_sr == sr and wave.shape == sine.shape
    assert np.abs(wave - sine).max() <= 1.5 / 32_768
    # stereo keeps frame-major interleave: (n, 2) in → (n, 2) out
    st = np.stack([sine, -sine], axis=1)
    wst, _ = V.decode_audio(V.encode_wav(st, sample_rate=sr))
    assert wst.shape == st.shape and np.abs(wst - st).max() <= 1.5 / 32_768
    # non-WAV payloads are a ValueError (compressed codecs out of scope)
    with _pytest.raises(ValueError):
        V.decode_audio(b"xx")

    # real-decode path through the Spark stage
    df = spark.createDataFrame(
        [
            ("a0", bytearray(V.encode_wav(sine, sample_rate=sr))),
            ("a1", bytearray(V.encode_wav(0.5 * sine, sample_rate=16_000))),
        ],
        "audio_id string, abytes binary",
    )
    out = V.audio_features(df).toPandas().sort_values("audio_id")
    assert list(out.audio_id) == ["a0", "a1"]
    assert list(out.sample_rate) == [sr, 16_000]
    assert list(out.duration_s) == [2.0, 1.0]
    assert abs(out.rms.iloc[0] - 1 / np.sqrt(2)) < 1e-3
    assert abs(out.rms.iloc[1] - 0.5 / np.sqrt(2)) < 1e-3

    # opaque non-WAV payloads keep the marked deterministic-fake path
    opaque = spark.createDataFrame(
        [("b0", b"payload0"), ("b1", b"payload1")], "audio_id string, abytes binary"
    )
    f1 = V.audio_features(opaque, use_fake=True).toPandas().sort_values("audio_id")
    f2 = V.audio_features(opaque, use_fake=True).toPandas().sort_values("audio_id")
    assert (f1.reset_index(drop=True) == f2.reset_index(drop=True)).all().all()
    assert (f1.sample_rate == 16_000).all()


def _clip(seed, sr=16_000, secs=2.0):
    """Speech-like fixture clip: a few slowly-chirping tones, seeded."""
    import numpy as np

    t = np.arange(int(sr * secs), dtype=np.float64) / sr
    r = np.random.default_rng(seed)
    freqs, amps = r.uniform(100, 3500, 6), r.uniform(0.1, 0.5, 6)
    s = sum(
        a * np.sin(2 * np.pi * f * t * (1 + 0.1 * np.sin(2 * np.pi * 0.5 * t)))
        for f, a in zip(freqs, amps)
    )
    return s / np.abs(s).max() * 0.8


def test_audio_fingerprint_properties():
    """The 64-bit Haitsma-Kalker-style fingerprint must be (a) exactly
    gain- and mono-mix-invariant (sign-of-difference bits cancel
    scaling), (b) near-dup-stable under low-level noise (hamming ≤ 3 —
    inside the banded dedup's pigeonhole-complete radius), (c) far
    apart for distinct clips, (d) 0 on silence, (e) deterministic."""
    import numpy as np

    from scraper_spark.functions.video_ops import audio_fingerprint64

    sr = 16_000
    base = _clip(1, sr)
    fp = audio_fingerprint64(base, sr)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert fp != 0 and fp == audio_fingerprint64(base, sr)
    assert ham(fp, audio_fingerprint64(0.5 * base, sr)) == 0
    stereo = np.stack([base, 0.9 * base], axis=1)
    assert ham(fp, audio_fingerprint64(stereo, sr)) == 0
    rng = np.random.default_rng(11)
    noisy = base + rng.normal(0, 0.003, len(base))
    assert ham(fp, audio_fingerprint64(noisy, sr)) <= 3
    for seed in range(2, 8):
        assert ham(fp, audio_fingerprint64(_clip(seed, sr), sr)) > 3
    assert audio_fingerprint64(np.zeros(100_000), sr) == 0


def test_audio_fingerprint_dedup_dataflow(spark, tmp_path):
    """Audio near-dup dedup end-to-end through the GENERIC banded i64
    machinery: fingerprints from the Arrow stage feed
    phash_near_dup_pairs (corpus pairs) and the stored band index
    (incremental batch-vs-corpus probe) with no audio-specific join
    code. Planted: a2 is a noisy copy of a0; b0 (the probe batch) is a
    noisy copy of a1."""
    import numpy as np

    from scraper_spark.functions import video_ops as V
    from scraper_spark.operators.phash_dedup import (
        phash_build_index,
        phash_dedup_table,
        phash_near_dup_pairs,
    )
    from scraper_spark.sources.tableio import TableIO

    sr = 16_000
    rng = np.random.default_rng(5)
    c0, c1, c2 = _clip(1, sr), _clip(2, sr), _clip(3, sr)
    rows = [
        ("a0", c0),
        ("a1", c1),
        ("a2", c0 + rng.normal(0, 0.003, len(c0))),  # near-dup of a0
        ("a3", c2),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(V.encode_wav(w, sample_rate=sr))) for i, w in rows],
        "audio_id string, abytes binary",
    )
    fps = V.audio_fingerprints(df)
    pairs = phash_near_dup_pairs(
        fps, max_hamming=3, id_col="audio_id", phash_col="afp"
    ).toPandas()
    assert sorted(zip(pairs.id_a, pairs.id_b)) == [("a0", "a2")]

    # incremental: corpus index from a0-a3, probe a noisy copy of a1
    t = TableIO(str(tmp_path / "afp_bands"))
    phash_build_index(fps, t, id_col="audio_id", phash_col="afp")
    probe = spark.createDataFrame(
        [("b0", bytearray(V.encode_wav(
            c1 + rng.normal(0, 0.003, len(c1)), sample_rate=sr)))],
        "audio_id string, abytes binary",
    )
    hits = phash_dedup_table(
        spark, t, V.audio_fingerprints(probe),
        max_hamming=3, id_col="audio_id", phash_col="afp",
    ).toPandas()
    assert sorted(zip(hits.id_a, hits.id_b)) == [("a1", "b0")]


def test_audio_fingerprints_preserves_id_name_and_type(spark):
    """The fingerprint stage's id column keeps the INPUT's name and
    type (the banded dedup machinery is fed ids of either string or
    integral type — hardcoding 'audio_id string' would crash on long
    ids and silently rename custom columns)."""
    import numpy as np

    from scraper_spark.functions import video_ops as V

    sr = 16_000
    w = _clip(4, sr)
    df = spark.createDataFrame(
        [(7, bytearray(V.encode_wav(w, sample_rate=sr))),
         (8, bytearray(V.encode_wav(0.5 * w, sample_rate=sr)))],
        "clip_id long, abytes binary",
    )
    out = V.audio_fingerprints(df, id_col="clip_id")
    assert out.schema["clip_id"].dataType.simpleString() == "bigint"
    got = out.toPandas().sort_values("clip_id")
    assert list(got.clip_id) == [7, 8]
    assert got.afp.iloc[0] == got.afp.iloc[1] != 0  # gain-invariant
    # audio_features shares the contract (same review finding)
    feats = V.audio_features(df, id_col="clip_id")
    assert feats.schema["clip_id"].dataType.simpleString() == "bigint"
    fgot = feats.toPandas().sort_values("clip_id")
    assert list(fgot.clip_id) == [7, 8]
    assert list(fgot.sample_rate) == [sr, sr]
