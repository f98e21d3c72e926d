"""URL-seen structure: partitioned Bloom prefilter + exact anti-join.

The reference dedups at load time by business key — concat stored +
incoming, flag dups, delete (reference: handlers/db.py:38-54, SURVEY
§2.1/J2). At 10^10-URL scale the north rule demands an *exact* seen
set with a probabilistic prefilter:

- ``url_seen`` — an append-only TableIO table of canon_urls (at real
  scale: Iceberg, bucket-partitioned by the url hash).
- Bloom segments — one row per segment ``(seg, bits:array<long>)``,
  built DISTRIBUTED via groupBy(seg).applyInPandas with numpy bit-ops
  (PySpark ≤ 4.x exposes no bloom_filter_agg; SURVEY §2.5), OR-merged
  across rounds the same way.
- Probe — segments broadcast to an Arrow-batched filter: rows the
  Bloom calls "definitely unseen" skip the join entirely; only the
  "maybe seen" remainder pays the exact ``left_anti`` against
  url_seen. False positives cost a join lookup, never a lost URL;
  false negatives are impossible (property-tested).

Sizing: BITS_PER_SEGMENT=2^20, 64 segments, k=7 → ~8 MB broadcast,
<1% FPR at ~6M urls/segment-bit-budget. At 10^10 urls the same layout
scales by raising N_SEGMENTS (segments stay individually broadcastable
or move to a seg-keyed shuffle join — same dataflow).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from scraper_spark.functions.hashes import bucket_col, md5_long

N_SEGMENTS = 64
BITS_PER_SEGMENT = 1 << 20
K_HASHES = 7
_WORDS = BITS_PER_SEGMENT // 64


def _bit_positions(urls: pd.Series) -> np.ndarray:
    """(len, K_HASHES) int64 bit indices via Kirsch-Mitzenmacher double
    hashing over the md5-derived 60-bit value."""
    h = urls.map(md5_long).to_numpy(dtype=np.int64)
    h1 = h & (BITS_PER_SEGMENT - 1)
    h2 = ((h >> 20) | 1) & 0x7FFFFFFF
    i = np.arange(K_HASHES, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % BITS_PER_SEGMENT


def _bitset_from_positions(pos: np.ndarray) -> np.ndarray:
    bits = np.zeros(_WORDS, dtype=np.uint64)
    flat = pos.reshape(-1)
    np.bitwise_or.at(bits, flat >> 6, np.uint64(1) << (flat & 63).astype(np.uint64))
    return bits


def build_segments(urls_df: DataFrame, url_col: str = "canon_url") -> DataFrame:
    """Distributed Bloom build: one output row per touched segment."""

    def per_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = _bitset_from_positions(_bit_positions(pdf[url_col]))
        return pd.DataFrame(
            {"seg": [int(pdf["seg"].iloc[0])], "bits": [bits.view(np.int64).tolist()]}
        )

    return (
        urls_df.select(url_col)
        .withColumn("seg", bucket_col(F.col(url_col), N_SEGMENTS))
        .groupBy("seg")
        .applyInPandas(per_seg, "seg int, bits array<long>")
    )


def merge_segment_frames(frames: list[pd.DataFrame]) -> dict[int, np.ndarray]:
    """OR-merge collected segment rows into {seg: uint64 bitset}."""
    out: dict[int, np.ndarray] = {}
    for pdf in frames:
        for seg, bits in zip(pdf["seg"], pdf["bits"]):
            arr = np.asarray(bits, dtype=np.int64).view(np.uint64)
            if seg in out:
                out[seg] = out[seg] | arr
            else:
                out[seg] = arr.copy()
    return out


def segments_to_frame(segments: dict[int, np.ndarray]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "seg": list(segments.keys()),
            "bits": [v.view(np.int64).tolist() for v in segments.values()],
        }
    )


def probe(urls: pd.Series, segments: dict[int, np.ndarray]) -> np.ndarray:
    """Vectorized membership test → bool array (True = MAYBE seen)."""
    if not segments or len(urls) == 0:
        return np.zeros(len(urls), dtype=bool)
    seg_ids = urls.map(lambda u: bucket_from_long(md5_long(u))).to_numpy()
    pos = _bit_positions(urls)
    maybe = np.zeros(len(urls), dtype=bool)
    for seg in np.unique(seg_ids):
        bits = segments.get(int(seg))
        mask = seg_ids == seg
        if bits is None:
            continue
        p = pos[mask]
        word = bits[p >> 6]
        hit = (word >> (p & 63).astype(np.uint64)) & np.uint64(1)
        maybe[mask] = hit.all(axis=1)
    return maybe


def bucket_from_long(h: int) -> int:
    return h % N_SEGMENTS


def probe_oracle_sql(members_sql: str, candidates_sql: str) -> str:
    """Relational mirror of the Bloom filter for the DuckDB oracle.

    The filter is pure md5 arithmetic (Kirsch-Mitzenmacher double
    hashing, hashes.py parity), so DuckDB can reproduce it EXACTLY —
    including false positives: a candidate is "maybe seen" iff all
    K_HASHES of its (seg, bit) positions appear in the set of positions
    the member urls set. ``members_sql`` / ``candidates_sql`` must each
    yield one column ``s``. Output: (candidate, maybe) — bit-identical
    to build_segments + probe."""
    from scraper_spark.functions.hashes import md5_long_sql

    h = md5_long_sql("s")
    bits = BITS_PER_SEGMENT
    return f"""
        WITH mem AS ({members_sql}),
        cand AS ({candidates_sql}),
        mh AS (SELECT {h} AS h FROM mem),
        mpos AS (
          SELECT DISTINCT (h % {N_SEGMENTS}) AS seg,
                 ((h % {bits}) + i.range * (((h >> 20) | 1) & 2147483647))
                   % {bits} AS pos
          FROM mh CROSS JOIN range({K_HASHES}) i
        ),
        ch AS (SELECT s, {h} AS h FROM cand),
        cpos AS (
          SELECT s, (h % {N_SEGMENTS}) AS seg,
                 ((h % {bits}) + i.range * (((h >> 20) | 1) & 2147483647))
                   % {bits} AS pos
          FROM ch CROSS JOIN range({K_HASHES}) i
        )
        SELECT c.s AS candidate, bool_and(m.pos IS NOT NULL) AS maybe
        FROM cpos c LEFT JOIN mpos m ON c.seg = m.seg AND c.pos = m.pos
        GROUP BY c.s
    """
