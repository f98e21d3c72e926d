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


def test_audio_stub_and_fake_features(spark):
    import pytest as _pytest

    from scraper_spark.functions import video_ops as V

    with _pytest.raises(NotImplementedError):
        V.decode_audio(b"xx")
    df = spark.createDataFrame(
        [("a0", b"payload0"), ("a1", b"payload1")], "audio_id string, abytes binary"
    )
    out = V.audio_features(df).toPandas().sort_values("audio_id")
    out2 = V.audio_features(df).toPandas().sort_values("audio_id")
    assert list(out.audio_id) == ["a0", "a1"]
    assert (out.reset_index(drop=True) == out2.reset_index(drop=True)).all().all()
    assert (out.sample_rate == 16_000).all()
