"""Image codec invariants (SURVEY §5.2 item 4, input_hint fidelity)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from scraper_spark.functions import imagecodec as ic


def _rand_img(seed, h=48, w=64, ch=3):
    rng = np.random.default_rng(seed)
    shape = (h, w, ch) if ch == 3 else (h, w)
    return rng.integers(0, 256, shape).astype(np.uint8)


def test_png_roundtrip_bit_exact_rgb():
    img = _rand_img(1)
    assert np.array_equal(ic.decode_png(ic.encode_png(img)), img)


def test_png_roundtrip_bit_exact_gray():
    img = _rand_img(2, ch=1)
    assert np.array_equal(ic.decode_png(ic.encode_png(img)), img)


@given(st.integers(0, 10_000), st.integers(8, 40), st.integers(8, 40))
@settings(max_examples=25, deadline=None)
def test_png_roundtrip_property(seed, h, w):
    img = _rand_img(seed, h, w)
    assert np.array_equal(ic.decode_png(ic.encode_png(img)), img)


def test_lossy_psnr_above_input_hint_bound():
    # worst case for a DCT codec is dense noise; still must clear 40 dB
    img = _rand_img(3)
    dec = ic.decode_lossy(ic.encode_lossy(img, 95))
    assert ic.psnr(img, dec) >= 40.0
    assert dec.shape == img.shape


def test_lossy_deterministic():
    img = _rand_img(4)
    assert ic.encode_lossy(img, 95) == ic.encode_lossy(img, 95)


def test_decode_dispatch_by_magic():
    img = _rand_img(5)
    assert np.array_equal(ic.decode_image(ic.encode_image(img, "png")), img)
    out = ic.decode_image(ic.encode_image(img, "jpg"))
    assert out.shape == img.shape


def test_phash_stable_under_lossless_reencode():
    img = _rand_img(6)
    p1 = ic.phash64(img)
    p2 = ic.phash64(ic.decode_png(ic.encode_png(img)))
    assert p1 == p2


def test_phash_near_for_lossy_far_for_different():
    a = _rand_img(7)
    b = _rand_img(8)
    pa = ic.phash64(a)
    pa2 = ic.phash64(ic.decode_lossy(ic.encode_lossy(a, 95)))
    pb = ic.phash64(b)
    assert ic.hamming64(pa, pa2) <= 4
    assert ic.hamming64(pa, pb) > 10


def test_phash_int64_range():
    for s in range(20):
        p = ic.phash64(_rand_img(100 + s))
        assert -(1 << 63) <= p < (1 << 63)


def test_unsupported_shape_raises():
    with pytest.raises(ValueError):
        ic.encode_png(np.zeros((4, 4, 4), np.uint8))
