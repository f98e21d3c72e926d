"""Image column transforms: crop, grayscale, binarize, re-encode.

The reference's PIL pipeline — screenshot crop (reference:
handlers/pam_invoice.py:143-153, I1), ``convert('L')`` grayscale
(handlers/baidu_api.py:150, I2), threshold binarize
(``img.point(lambda p: p > t and 255)``, baidu_api.py:151, I3),
save/reload round-trip (baidu_api.py:152-154, I4) — re-expressed as
Arrow-batched ``mapInPandas`` stages over a ``bytes`` binary column.
Per-pixel math is vectorized numpy; the codec layer is
functions/imagecodec (no Pillow in this sandbox — SURVEY §2.10).

Each operator is bytes→bytes so stages compose into one fused Python
stage (no shuffle between them).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from scraper_spark.functions.imagecodec import (
    decode_image,
    encode_image,
    to_gray,
)


def crop(img: np.ndarray, box: tuple[int, int, int, int]) -> np.ndarray:
    """(x0, y0, x1, y1) crop — PIL box semantics (pam_invoice.py:149)."""
    x0, y0, x1, y1 = box
    return img[y0:y1, x0:x1]


def grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, rounded to uint8 (PIL convert('L') semantics)."""
    return np.clip(np.round(to_gray(img)), 0, 255).astype(np.uint8)


def binarize(img: np.ndarray, threshold: int = 127) -> np.ndarray:
    """(p > threshold) → 255 else 0, vectorized (baidu_api.py:151)."""
    gray = grayscale(img) if img.ndim == 3 else img
    return ((gray > threshold) * 255).astype(np.uint8)


def _bytes_transform(
    fn: Callable[[np.ndarray], np.ndarray], out_fmt: str = "png"
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for b in pdf["bytes"]:
                if b is None:
                    out.append(None)
                    continue
                out.append(encode_image(fn(decode_image(bytes(b))), out_fmt))
            yield pdf.assign(bytes=out)

    return run


def transform_images(
    df: DataFrame,
    fn: Callable[[np.ndarray], np.ndarray],
    out_fmt: str = "png",
) -> DataFrame:
    """Apply a pixel transform to the ``bytes`` column, preserving all
    other columns. One Arrow stage, no shuffle."""
    schema = df.schema
    return df.mapInPandas(_bytes_transform(fn, out_fmt), schema)


def grayscale_images(df: DataFrame) -> DataFrame:
    return transform_images(df, grayscale)


def binarize_images(df: DataFrame, threshold: int = 127) -> DataFrame:
    return transform_images(df, lambda im: binarize(im, threshold))


def crop_images(df: DataFrame, box: tuple[int, int, int, int]) -> DataFrame:
    return transform_images(df, lambda im: crop(im, box))


def resize_images(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    from scraper_spark.functions.imagecodec import area_resize

    return transform_images(df, lambda im: area_resize(im, out_h, out_w))
