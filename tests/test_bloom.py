"""Bloom seen-set: zero false negatives (SURVEY §5.2 item 2)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from scraper_spark.plans import seen as bloom


def _build_local(urls: pd.Series) -> dict:
    """Driver-side build mirroring the applyInPandas body."""
    from scraper_spark.functions.hashes import md5_long

    segs = {}
    seg_ids = urls.map(lambda u: bloom.bucket_from_long(md5_long(u)))
    for seg in set(seg_ids):
        sub = urls[seg_ids == seg]
        segs[seg] = bloom._bitset_from_positions(bloom._bit_positions(sub))
    return segs


def test_zero_false_negatives_small():
    urls = pd.Series([f"http://h{i % 7}.example/d/{i}" for i in range(500)])
    maybe = bloom.probe(urls, _build_local(urls))
    assert maybe.all(), "inserted URL reported definitely-unseen (false negative)"


def test_fpr_reasonable():
    inserted = pd.Series([f"http://a.example/p/{i}" for i in range(2000)])
    others = pd.Series([f"http://b.example/q/{i}" for i in range(2000)])
    fp = bloom.probe(others, _build_local(inserted)).mean()
    assert fp < 0.01, f"false positive rate too high: {fp}"


def test_distributed_build_matches_local(spark):
    urls = [f"http://h{i % 5}.example/d/{i}" for i in range(300)]
    df = spark.createDataFrame([(u,) for u in urls], "canon_url string")
    dist = bloom.merge_segment_frames([bloom.build_segments(df).toPandas()])
    local = _build_local(pd.Series(urls))
    assert set(dist) == set(local)
    for seg in local:
        assert np.array_equal(dist[seg], local[seg])


@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=50, unique=True))
@settings(max_examples=30, deadline=None)
def test_no_false_negative_property(urls):
    s = pd.Series(urls)
    assert bloom.probe(s, _build_local(s)).all()
