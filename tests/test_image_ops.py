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
