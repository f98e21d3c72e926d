"""Cuckoo-filter seen prefilter (plans/cuckoo.py): the no-false-
negative contract, deletion, determinism, serialization/merge, and
signature-compatibility with the Bloom probe."""

import numpy as np
import pandas as pd
import pytest

from scraper_spark.functions.hashes import md5_long
from scraper_spark.plans import cuckoo as C


def _urls(n, prefix="u"):
    return pd.Series([f"http://h{i % 97}.test/{prefix}{i}" for i in range(n)])


def test_no_false_negatives_and_fp_bounded():
    urls = _urls(120_000)  # ~250k capacity/segment but urls spread over 64 segs
    segs = C.merge_segment_frames(
        [C.segments_to_frame(_build_local(urls))]
    )
    assert C.probe(urls, segs).all(), "false negative — contract broken"
    other = _urls(50_000, prefix="x")
    fp_rate = C.probe(other, segs).mean()
    assert fp_rate < 0.02, fp_rate


def _build_local(urls, n_buckets=C.N_BUCKETS):
    by_seg = {}
    h = urls.map(md5_long).to_numpy(dtype=np.int64)
    for seg_id in np.unique(h % C.N_SEGMENTS):
        f = C.CuckooSegment(n_buckets=n_buckets)
        f.insert_hashes(h[h % C.N_SEGMENTS == seg_id])
        by_seg[int(seg_id)] = f
    return by_seg


def test_stash_overflow_keeps_no_fn():
    # tiny table (64 buckets × 4 slots = 256 capacity) + 600 items per
    # segment → heavy overflow into the stash; membership must hold.
    f = C.CuckooSegment(n_buckets=64)
    h = _urls(600).map(md5_long).to_numpy(dtype=np.int64)
    f.insert_hashes(h)
    assert len(f.stash) > 0, "test did not exercise the stash"
    assert f.probe_hashes(h).all()


def test_delete_removes_membership():
    urls = _urls(5_000)
    segs = _build_local(urls)
    keep, drop = urls[: 2_500], urls[2_500:]
    removed = C.delete(drop, segs)
    assert removed == len(drop)
    assert C.probe(keep, segs).all(), "delete broke other members"
    # deleted items may still FP off other members' fingerprints, but
    # the overwhelming majority must now read absent
    assert C.probe(drop, segs).mean() < 0.02
    # double-delete: nothing left to remove for most
    assert C.delete(drop, segs) < len(drop) * 0.02


def test_serialization_roundtrip_identical():
    segs = _build_local(_urls(20_000))
    frame = C.segments_to_frame(segs)
    back = C.merge_segment_frames([frame])
    for s, f in segs.items():
        assert np.array_equal(back[s].table, f.table)
        assert back[s].stash == f.stash


def test_merge_of_halves_covers_union():
    a, b = _urls(8_000), _urls(8_000, prefix="b")
    merged = C.merge_segment_frames(
        [C.segments_to_frame(_build_local(a)), C.segments_to_frame(_build_local(b))]
    )
    assert C.probe(a, merged).all() and C.probe(b, merged).all()


def test_distributed_build_matches_local(spark):
    urls = _urls(12_000)
    df = spark.createDataFrame(pd.DataFrame({"canon_url": urls}))
    dist = C.merge_segment_frames([C.build_segments(df).toPandas()])
    local = _build_local(urls)
    assert set(dist) == set(local)
    for s in local:
        # sorted insert makes the build order-independent → the
        # distributed state is BIT-identical to the local one
        assert np.array_equal(dist[s].table, local[s].table)
        assert dist[s].stash == local[s].stash


def test_distributed_delete_rows(spark):
    """kind='del' state rows (cuckoo.delete_segments) remove membership
    at the merge site — the DISTRIBUTED deletion path (re-crawl TTL)
    that works when the filter is table-resident and never on the
    driver: build table rows + delete rows as DataFrames, fold them
    with segments_from_state_rows (the same kernel the join-mode probe
    and compaction run), and the deleted urls must read definitely-
    unseen while every survivor still reads maybe-seen (no-FN)."""
    urls = _urls(6_000)
    df = spark.createDataFrame(pd.DataFrame({"canon_url": urls}))
    tables = C.build_segments(df).toPandas()
    tables.insert(1, "kind", "table")
    gone = pd.Series(urls[: 1_000])
    dels = C.delete_segments(
        spark.createDataFrame(pd.DataFrame({"canon_url": gone}))
    ).toPandas()
    state = pd.concat([tables, dels], ignore_index=True)
    segs = C.segments_from_state_rows(state)
    kept = pd.Series(urls[1_000:]).reset_index(drop=True)
    assert C.probe(kept, segs).all(), "no-FN broken for survivors"
    # deleted urls may still collide with a survivor's fingerprint in
    # the same bucket (standard FP), but the overwhelming majority must
    # now read definitely-unseen
    assert C.probe(gone, segs).mean() < 0.02


def test_merge_kernel_del_only_group():
    """Join-mode compaction on a segment group containing ONLY
    kind='del' rows (deletes against a segment never inserted into) —
    a delete on an empty filter is a no-op, so the kernel must emit an
    empty table row, not crash (ADVICE r04)."""
    from scraper_spark.plans.frontier import _merge_cuckoo_state

    pdf = pd.DataFrame(
        {
            "seg": [3, 3],
            "kind": ["del", "del"],
            "words": [[12345, 67890], [111]],
            "stash": [[], []],
        }
    )
    out = _merge_cuckoo_state(pdf)
    assert list(out["seg"]) == [3] and list(out["kind"]) == ["table"]
    segs = C.segments_from_state_rows(out)
    assert not C.probe(_urls(10), segs).any()  # empty filter: all unseen


def test_probe_signature_matches_bloom():
    """Drop-in seam: cuckoo.probe(pd.Series, segments) -> bool ndarray,
    empty-safe, like seen.probe."""
    assert C.probe(pd.Series([], dtype=object), {}).shape == (0,)
    assert C.probe(_urls(5), {}).sum() == 0  # no segments → all unseen


@pytest.mark.parametrize("n_buckets", [64, 1 << 12])
def test_deterministic_rebuild(n_buckets):
    urls = _urls(3_000)
    s1 = _build_local(urls, n_buckets=n_buckets)
    s2 = _build_local(urls.sample(frac=1.0, random_state=7), n_buckets=n_buckets)
    for s in s1:
        assert np.array_equal(s1[s].table, s2[s].table)
        assert sorted(s1[s].stash) == sorted(s2[s].stash)


def test_merge_rejects_mismatched_segment_sizes():
    """Packed (bucket, fp) pairs lose the original hash, so bucket
    indices cannot be re-derived for a different table size — merging
    differently-sized segments must fail fast (silent merge = items in
    buckets the probe never checks = false negatives), and resizing
    n_buckets is a rebuild-from-log operation."""
    import numpy as np
    import pandas as pd
    import pytest

    from scraper_spark.plans.cuckoo import CuckooSegment, merge_segment_frames

    small = CuckooSegment(n_buckets=2**10)
    big = CuckooSegment(n_buckets=2**12)
    small.insert_hashes(np.arange(10, dtype=np.int64) * 7919)
    big.insert_hashes(np.arange(10, 20, dtype=np.int64) * 7919)

    def row(seg):
        w, s = seg.to_arrays()
        return {"seg": 0, "words": w, "stash": s}

    frame = pd.DataFrame([row(small), row(big)])
    with pytest.raises(ValueError, match="size mismatch"):
        merge_segment_frames([frame])


# --------------------------- property test (hypothesis) ----------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=120,
             unique=True),
    st.data(),
)
def test_no_false_negative_after_random_deletes(urls, data):
    """The multiset no-false-negative guarantee the re-crawl TTL
    leans on, as a property: insert a random URL set (some twice),
    delete a random subset once — every URL inserted twice, and every
    never-deleted URL, must still probe True. Mirrors the Bloom
    property test at the same strength the deletable structure adds."""
    dup = data.draw(st.lists(st.sampled_from(urls), max_size=20,
                             unique=True), label="inserted_twice")
    dels = data.draw(st.lists(st.sampled_from(urls), max_size=40,
                              unique=True), label="deleted_once")
    s = pd.Series(urls + dup)
    segs = _build_local(s, n_buckets=64)  # small table → stash pressure
    C.delete(pd.Series(dels), segs)
    survivors = [u for u in urls if u in set(dup) or u not in set(dels)]
    if survivors:
        assert C.probe(pd.Series(survivors), segs).all(), (
            "false negative after multiset delete"
        )
