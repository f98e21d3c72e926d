"""Cuckoo-filter URL-seen prefilter — the north rule's named
alternative to the partitioned Bloom filter (plans/seen.py).

Same contract as the Bloom path: a probabilistic prefilter in front of
the EXACT ``left_anti`` seen join — "definitely unseen" rows skip the
join, "maybe seen" rows pay it, so false positives cost a lookup and
false negatives are impossible (overflow during insertion goes to an
exact stash, never dropped). What cuckoo buys over Bloom for a crawl
frontier:

- **deletion** — re-crawl / TTL semantics need removing a url from the
  seen structure; a Bloom filter cannot unset bits shared with other
  members, a cuckoo filter removes one fingerprint copy exactly.
- **bounded probe cost** — membership reads exactly two buckets (plus
  a stash set lookup), not K scattered bit reads.

Layout mirrors seen.py so the engine's segment machinery transfers:
``N_SEGMENTS`` segments keyed by the parity md5 bucket of the url;
per segment a table of ``n_buckets`` buckets × ``SLOTS`` slots of
16-bit fingerprints (0 = empty; fp 0 remaps to 1), packed 4/word into
``array<long>`` for DataFrame/parquet transport. Derivations all come
from the 60-bit parity hash (functions/hashes.md5_long) so the
single-process oracle could mirror them if ever needed:

    fp = h & 0xFFFF  (0→1)          i1 = (h >> 16) & (n_buckets - 1)
    i2 = i1 XOR ((fp * 0x5bd1) & (n_buckets - 1))   — symmetric, so
    either bucket + fp recovers the partner (classic Fan et al.
    partial-key cuckoo hashing, public algorithm).

Insertion kicks deterministically (slot = depth % SLOTS — NO
randomness, repo invariant) up to MAX_KICKS, then stashes. At default
sizing a segment holds ~250k urls at <95% load; at 10^10 urls raise
N_SEGMENTS / n_buckets — segments stay individually broadcastable or
ride the same seg-keyed cogroup join as Bloom.

Scale note: a cuckoo filter stores ~2.2 bytes/url (vs Bloom's ~1 bit)
— the price of deletability; pick per workload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from scraper_spark.functions.hashes import bucket_col, md5_long

N_SEGMENTS = 64  # same segment key space as plans/seen.py
N_BUCKETS = 1 << 16
SLOTS = 4
MAX_KICKS = 500
_FP_MULT = 0x5BD1  # odd → bijective on the low 16 bits


def _derive(h: np.ndarray, n_buckets: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fp, i1, i2) arrays from 60-bit parity hashes."""
    h = np.asarray(h, dtype=np.int64)
    fp = (h & 0xFFFF).astype(np.int64)
    fp[fp == 0] = 1
    i1 = (h >> 16) & (n_buckets - 1)
    i2 = i1 ^ ((fp * _FP_MULT) & (n_buckets - 1))
    return fp, i1, i2


class CuckooSegment:
    """One segment's filter state: uint16 table (n_buckets, SLOTS) +
    exact stash of packed (bucket << 16 | fp) entries."""

    def __init__(self, n_buckets: int = N_BUCKETS):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        self.stash: list[int] = []

    # ---------------------------------------------------------- insert ---
    def _partner(self, fp: int, b: int) -> int:
        return b ^ ((fp * _FP_MULT) & (self.n_buckets - 1))

    def insert_pair(self, fp: int, b: int) -> None:
        """Insert fingerprint fp whose CURRENT bucket is b (its partner
        is derivable) — the primitive both insert_hash and merge use."""
        for cand in (b, self._partner(fp, b)):
            row = self.table[cand]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = fp
                return
        # deterministic kicking: evict slot (depth % SLOTS)
        cur_fp, cur_b = fp, b
        for depth in range(MAX_KICKS):
            slot = depth % SLOTS
            evicted = int(self.table[cur_b, slot])
            self.table[cur_b, slot] = cur_fp
            cur_fp = evicted
            cur_b = self._partner(cur_fp, cur_b)
            row = self.table[cur_b]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = cur_fp
                return
        # table effectively full here → EXACT stash; never a lost url
        self.stash.append((cur_b << 16) | cur_fp)

    def insert_hashes(self, hashes: np.ndarray) -> None:
        fp, i1, _ = _derive(hashes, self.n_buckets)
        # sort for an order-independent (hence deterministic) build
        order = np.lexsort((fp, i1))
        for j in order:
            self.insert_pair(int(fp[j]), int(i1[j]))

    # ----------------------------------------------------------- probe ---
    def probe_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """bool array, True = MAYBE present (FP possible, FN impossible)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = _derive(hashes, self.n_buckets)
        fp16 = fp.astype(np.uint16)
        hit = (self.table[i1] == fp16[:, None]).any(axis=1) | (
            self.table[i2] == fp16[:, None]
        ).any(axis=1)
        if self.stash:
            st = np.asarray(self.stash, dtype=np.int64)
            hit |= np.isin((i1 << 16) | fp, st) | np.isin((i2 << 16) | fp, st)
        return hit

    # ---------------------------------------------------------- delete ---
    def delete_hashes(self, hashes: np.ndarray) -> int:
        """Remove one stored copy per hash (sorted for determinism).
        Returns how many were removed."""
        n = 0
        for h in sorted(int(x) for x in np.asarray(hashes, dtype=np.int64)):
            if self.delete_hash(h):
                n += 1
        return n

    def delete_hash(self, h: int) -> bool:
        """Remove ONE copy of the item's fingerprint (valid only for
        items actually inserted — standard cuckoo-filter contract).
        Returns True if a copy was removed."""
        fp, i1, i2 = _derive(np.asarray([h]), self.n_buckets)
        fp, i1, i2 = int(fp[0]), int(i1[0]), int(i2[0])
        for b in (i1, i2):
            row = self.table[b]
            where = np.flatnonzero(row == np.uint16(fp))
            if len(where):
                row[where[0]] = 0
                return True
            packed = (b << 16) | fp
            if packed in self.stash:
                self.stash.remove(packed)
                return True
        return False

    # --------------------------------------------------------- serialize ---
    # dtypes pinned little-endian ('<u2'/'<i8'): segment rows are built
    # on executors and merged wherever the probe runs, so a mixed-
    # endianness cluster must not silently permute fingerprint bytes
    # (seen-filter false negatives = dropped urls). ADVICE r03.
    def to_arrays(self) -> tuple[list[int], list[int]]:
        words = np.ascontiguousarray(self.table, dtype="<u2").reshape(-1).view("<i8")
        return words.astype(np.int64).tolist(), list(self.stash)

    @classmethod
    def from_arrays(
        cls, words: list[int], stash: list[int], n_buckets: int | None = None
    ) -> "CuckooSegment":
        w = np.asarray(words, dtype="<i8")
        nb = n_buckets if n_buckets is not None else (len(w) * 4) // SLOTS
        seg = cls(n_buckets=nb)
        seg.table = w.view("<u2").reshape(nb, SLOTS).astype(np.uint16)
        seg.stash = [int(x) for x in stash]
        return seg

    def occupied(self) -> "np.ndarray":
        """Packed (bucket << 16 | fp) for every occupied slot + stash —
        enough to rebuild/merge (partner bucket is derivable)."""
        b, s = np.nonzero(self.table)
        packed = (b.astype(np.int64) << 16) | self.table[b, s].astype(np.int64)
        if self.stash:
            packed = np.concatenate([packed, np.asarray(self.stash, dtype=np.int64)])
        return packed


# ------------------------------------------------------- frame plumbing ---
SCHEMA = "seg int, words array<long>, stash array<long>"


def hash_segments(urls_df: DataFrame, url_col: str = "canon_url") -> DataFrame:
    """(seg, bits = sorted parity hashes) per touched segment — the
    cuckoo DELTA representation. Unlike Bloom bit segments these are
    the raw insertable hashes (a cuckoo table can't be OR-merged, so
    deltas stay as hashes until the driver/compaction inserts them);
    row size is O(new urls this round), bounded by the round. Shares
    the fused-collect shape (seg int, bits array<long>) with
    seen.build_segments so the engine's single per-round collect is
    filter-agnostic."""
    from scraper_spark.functions.hashes import md5_long_col

    return (
        urls_df.select(md5_long_col(F.col(url_col)).alias("h"))
        .groupBy((F.col("h") % F.lit(N_SEGMENTS)).cast("int").alias("seg"))
        .agg(F.sort_array(F.collect_list("h")).alias("bits"))
    )


def build_segments(
    urls_df: DataFrame, url_col: str = "canon_url", n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Distributed build, same dataflow as seen.build_segments: shuffle
    urls by segment, build each segment's whole filter in one worker
    (sorted insert → deterministic state), one output row per segment."""

    def per_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = CuckooSegment(n_buckets=n_buckets)
        hashes = pdf[url_col].map(md5_long).to_numpy(dtype=np.int64)
        seg.insert_hashes(hashes)
        words, stash = seg.to_arrays()
        return pd.DataFrame(
            {"seg": [int(pdf["seg"].iloc[0])], "words": [words], "stash": [stash]}
        )

    return (
        urls_df.select(url_col)
        .withColumn("seg", bucket_col(F.col(url_col), N_SEGMENTS))
        .groupBy("seg")
        .applyInPandas(per_seg, SCHEMA)
    )


def merge_segment_frames(frames: list[pd.DataFrame]) -> dict[int, CuckooSegment]:
    """Merge serialized segment rows into {seg: CuckooSegment} by
    re-inserting occupied (bucket, fp) pairs — the cuckoo analog of the
    Bloom OR-merge (possible from serialized state because the partner
    bucket is derivable from fp + either bucket)."""
    out: dict[int, CuckooSegment] = {}
    for pdf in frames:
        for seg_id, words, stash in zip(pdf["seg"], pdf["words"], pdf["stash"]):
            incoming = CuckooSegment.from_arrays(list(words), list(stash))
            cur = out.get(int(seg_id))
            if cur is None:
                out[int(seg_id)] = incoming
                continue
            if cur.n_buckets != incoming.n_buckets:
                # packed (bucket, fp) pairs lose the original hash, so
                # bucket indices CANNOT be re-derived for a different
                # table size — a silent merge would misplace items and
                # break the no-false-negative contract. Resizing
                # n_buckets requires a rebuild from the crawl log
                # (build_segments), exactly like a Bloom re-size.
                raise ValueError(
                    f"cuckoo segment {int(seg_id)} size mismatch: "
                    f"{cur.n_buckets} vs {incoming.n_buckets} buckets — "
                    "resizing requires a rebuild from the log"
                )
            for packed in np.sort(incoming.occupied()):
                cur.insert_pair(int(packed) & 0xFFFF, int(packed) >> 16)
    return out


def segments_from_state_rows(pdf: pd.DataFrame) -> dict[int, CuckooSegment]:
    """{seg: CuckooSegment} from filter-STATE rows ``(seg, kind, words,
    stash)``: ``kind='table'`` rows are serialized segments (merged
    first), ``kind='delta'`` rows carry raw insertable hashes (inserted
    second, sorted inside insert_hashes), ``kind='del'`` rows carry raw
    hashes whose copies are REMOVED last — the distributed deletion
    path (re-crawl TTL) that keeps the structure's headline feature
    when the filter is table-resident and never on the driver. Apply
    order is tables → deltas → dels, so within one compaction window a
    delete sees every insert; the standard cuckoo contract applies
    (delete only items actually inserted — one stored copy is removed
    per deleted hash, multiset semantics). Shared by the broadcast-mode
    driver resume, the seg-keyed cogroup join probe (executors) and
    join-mode compaction — membership is order-invariant given that
    apply order, which is all the prefilter contract requires."""
    tables = pdf[pdf["kind"] == "table"]
    segs = merge_segment_frames([tables]) if len(tables) else {}
    deltas = pdf[pdf["kind"] == "delta"]
    for seg_id, hashes in zip(deltas["seg"], deltas["words"]):
        f = segs.setdefault(int(seg_id), CuckooSegment())
        f.insert_hashes(np.asarray(hashes, dtype=np.int64))
    dels = pdf[pdf["kind"] == "del"]
    for seg_id, hashes in zip(dels["seg"], dels["words"]):
        f = segs.get(int(seg_id))
        if f is not None:
            f.delete_hashes(np.asarray(hashes, dtype=np.int64))
    return segs


def delete_segments(urls_df: DataFrame, url_col: str = "canon_url") -> DataFrame:
    """(seg, kind='del', words=sorted hashes, stash=[]) rows that, when
    appended to the filter-state table, remove the urls from the filter
    at the next merge site (probe cogroup / compaction / resume) — the
    distributed analog of :func:`delete`, for re-crawl TTL eviction at
    table scales where no driver should hold the filter."""
    from pyspark.sql import functions as F

    return hash_segments(urls_df, url_col).select(
        "seg",
        F.lit("del").alias("kind"),
        F.col("bits").alias("words"),
        F.array().cast("array<long>").alias("stash"),
    )


def segments_to_frame(segments: dict[int, CuckooSegment]) -> pd.DataFrame:
    rows = [(s, *f.to_arrays()) for s, f in sorted(segments.items())]
    return pd.DataFrame(rows, columns=["seg", "words", "stash"])


def probe(urls: pd.Series, segments: dict[int, CuckooSegment]) -> np.ndarray:
    """Vectorized membership test → bool array (True = MAYBE seen).
    Drop-in signature match for seen.probe."""
    if not segments or len(urls) == 0:
        return np.zeros(len(urls), dtype=bool)
    h = urls.map(md5_long).to_numpy(dtype=np.int64)
    seg_ids = h % N_SEGMENTS
    maybe = np.zeros(len(urls), dtype=bool)
    for seg in np.unique(seg_ids):
        f = segments.get(int(seg))
        if f is None:
            continue
        mask = seg_ids == seg
        maybe[mask] = f.probe_hashes(h[mask])
    return maybe


def delete(urls: pd.Series, segments: dict[int, CuckooSegment]) -> int:
    """Remove urls from the filter in place (driver-side maintenance
    op — e.g. re-crawl TTL eviction). Returns how many were removed."""
    n = 0
    for u in urls:
        h = md5_long(u)
        f = segments.get(h % N_SEGMENTS)
        if f is not None and f.delete_hash(h):
            n += 1
    return n
