"""Distributed URL-frontier + fetch scheduler — the engine core.

Replaces the reference's sequential nested crawl loops (reference:
handlers/scrapers.py:84-150; per-item sleeps handlers/haozu.py:41;
checkpoint anti-join handlers/db.py:191-203) with a round-synchronous
Spark dataflow (SURVEY §3.1 "Spark lifecycle"):

    seeds → canonicalize → round { schedule → fetch → log →
        seen-update → parse/explode links → dedup → payload decode →
        checkpoint }

Each arrow is Catalyst-planned; per round there is exactly ONE
scheduling shuffle (the per-host window, two-phase/salted so no window
partition exceeds ``salt × budget`` rows even on 10^8-URL hot hosts)
and ONE dedup join (Bloom-prefiltered exact left_anti). Fetch, parse,
and image decode run inside Arrow-batched pandas stages with no
shuffle.

Round execution shape: ONE fused driver action (stats + Bloom-delta
segments in a single collect over the cached fetch), then the table
writes — crawl log, fetch errors, image payload, frontier delta (with
compaction chained inside), bloom delta — run CONCURRENTLY from a
thread pool; they touch disjoint tables and the frontier delta
derives its seen set from (pre-round seen ∪ this round's terminal
fetches), so nothing orders them. This collapses the sequential
per-round job-latency floor that capped N→4N scaling efficiency in
round 1 (VERDICT r01).

Determinism: the crawl log carries a global ``seq`` in the spec's
total order, assigned by per-bucket row_number windows plus
driver-side cumulative offsets from the fused stats collect
(``with_global_seq`` — JVM-side, no single-partition sort, no RDD
round-trip). No wall clock or randomness touches any order-observable
value; round wall-times go only to the metrics table.

Scale notes (10^10 frontier): the frontier is MERGE-ON-READ — rounds
append O(delta) 'del'/'add' records and the pending view is resolved
with a first-add-wins window (one canon_url exchange — re-discovering
a pending url is a no-op, so no frontier-subtraction joins exist
anywhere in the loop); every ``compact_every`` deltas the
resolved view is rewritten as a single snapshot hive-partitioned by
host_bucket (Iceberg analog: positional deletes + periodic compaction
into ``PARTITIONED BY (bucket(host))``). url_seen stays DERIVED from
the append-only crawl log + errors, both hive-partitioned by
url_bucket so the per-round dedup anti-join reads only touched
buckets. The URL-seen prefilter (Bloom bit segments or partial-key
cuckoo tables — ``seen_filter``) lives in a snapshot-committed TableIO
table (delta appends + distributed merge + compaction) with two probe
modes shared by both structures: a driver-merged broadcast while the
filter fits an executor heap, and a seg-keyed cogroup join
(``bloom_probe_mode="join"``) in which no filter state ever touches
the driver — the shape for filters beyond broadcastable (Bloom past
~10^9 urls of bits; cuckoo's ~2.2 bytes/url well before that), proven
output-identical by the equivalence suite.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from scraper_spark.functions.canon import canonicalize_udf, host_udf
from scraper_spark.functions.hashes import bucket_col
from scraper_spark.functions.imagecodec import decode_image, phash64
from scraper_spark.plans import cuckoo
from scraper_spark.plans import seen as bloom
from scraper_spark.plans.spec import (
    N_HOST_BUCKETS,
    N_URL_BUCKETS,
    STATUS_MISSING,
    STATUS_OK,
    STATUS_TRANSIENT,
    PolitenessConfig,
    schedule_round as spec_schedule_round,
)
from scraper_spark.sources.page_store import fetch
from scraper_spark.sources.tableio import TableIO

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("host_bucket", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("discovery_time", T.IntegerType(), True),
        T.StructField("attempt", T.IntegerType(), True),
    ]
)

# merge-on-read frontier: the stored table carries FRONTIER_SCHEMA plus
# (op, delta_round); pending state is resolved at read time and the
# table is compacted (partitioned overwrite) every COMPACT_EVERY deltas
FRONTIER_DELTA_SCHEMA = T.StructType(
    list(FRONTIER_SCHEMA.fields)
    + [
        T.StructField("op", T.StringType(), False),
        T.StructField("delta_round", T.IntegerType(), False),
    ]
)

# url_bucket (md5 of canon_url mod N_URL_BUCKETS) is the hive
# partition key of the stored log: the seen set is DERIVED from this
# table, so bucketing the log buckets the seen set — the per-round
# dedup anti-join reads only the url buckets its candidates touch
# (Iceberg analog: PARTITIONED BY (bucket(N, canon_url))).
LOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("host_bucket", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("discovery_time", T.IntegerType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("url_bucket", T.IntegerType(), True),
    ]
)

SEEN_SCHEMA = T.StructType([T.StructField("canon_url", T.StringType(), False)])

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("canon_url", T.StringType(), True),
        T.StructField("round", T.IntegerType(), True),
    ]
)

SCHEDULE_SALTS = 32  # phase-1 fan-out of the per-host top-k


def _or_merge_segments(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: OR-merge one segment's delta rows."""
    merged = None
    for bits in pdf["bits"]:
        arr = np.asarray(bits, dtype=np.int64)
        merged = arr if merged is None else (merged | arr)
    return pd.DataFrame(
        {"seg": [int(pdf["seg"].iloc[0])], "bits": [merged.tolist()]}
    )


def _merge_cuckoo_state(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: fold one segment's cuckoo state rows
    (serialized kind='table' + raw-hash kind='delta' inserts +
    kind='del' removals, applied in that order) into ONE kind='table'
    row — the join-mode compaction step."""
    segs = cuckoo.segments_from_state_rows(pdf)
    if segs:
        seg_id, f = next(iter(segs.items()))
    else:
        # del-only group (deletes against a segment never inserted into):
        # a delete on an empty filter is a no-op → emit an empty table row.
        seg_id, f = int(pdf["seg"].iloc[0]), cuckoo.CuckooSegment()
    words, stash = f.to_arrays()
    return pd.DataFrame(
        {"seg": [seg_id], "kind": ["table"], "words": [words], "stash": [stash]}
    )


def with_global_seq(
    df: DataFrame,
    bucket_col_name: str,
    order_cols: list[str],
    offset: int,
    bucket_counts: dict[int, int],
) -> DataFrame:
    """Total-order global ``seq`` without a single-partition window:
    row_number within each ``bucket`` partition + driver-side cumsum of
    per-bucket counts (precomputed — fused into the round's single
    stats collect), broadcast back. Entirely JVM-side — no RDD
    round-trip, no global sort."""
    spark = df.sparkSession
    offsets, acc = [], offset
    for b in sorted(bucket_counts):
        offsets.append((b, acc))
        acc += bucket_counts[b]
    if not offsets:
        return df.withColumn("seq", F.lit(0).cast("long")).limit(0)
    off_df = spark.createDataFrame(offsets, f"{bucket_col_name} int, _off long")
    w = W.partitionBy(bucket_col_name).orderBy(*order_cols)
    return (
        df.join(F.broadcast(off_df), bucket_col_name)
        .withColumn("seq", (F.col("_off") + F.row_number().over(w) - 1).cast("long"))
        .drop("_off")
    )


def robots_allowed_col(pq, rules):
    """Column-side REP decision (RFC 9309 §2.2.2) over the per-host
    prefix-rule structs ``rules: array<struct<p:string,allow:boolean>>``
    for path+query column ``pq``: keep the matching rules, fold to the
    (longest, allow-wins-tie) winner, allow iff there are no rules
    (null host → not in the robots dim), no rule matches, or the
    winner is an Allow. Pure array expressions — evaluated inside the
    schedule's single broadcast join, no extra shuffle.

    The EXACT column mirror of ``spec.robots_blocked`` (the oracle's
    evaluator) — keep the two in lockstep; randomized parity is pinned
    in tests/test_schedule.py::test_rep_column_python_parity."""
    matches = F.filter(rules, lambda r: pq.startswith(r["p"]))
    best = F.aggregate(
        matches,
        F.struct(F.lit(-1).alias("l"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            (F.length(r["p"]) > acc["l"])
            | ((F.length(r["p"]) == acc["l"]) & r["allow"]),
            F.struct(F.length(r["p"]).alias("l"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    return rules.isNull() | (best["l"] < 0) | best["allow"]


class CrawlEngine:
    """Round-synchronous distributed crawler over a fixture dir."""

    def __init__(
        self,
        spark: SparkSession,
        fixture_dir: str,
        work_dir: str,
        use_bloom: bool = True,
        decode_images: bool = True,
        store_image_bytes: bool = True,
        bloom_min_rows: int = 500_000,
        images_broadcast_max: int = 100_000,
        compact_every: int = 16,
        seen_prune_min_rows: int = 1_000_000,
        bloom_probe_mode: str = "auto",
        seen_filter: str = "bloom",
        tiny_schedule_max: int = 1000,
        dims_broadcast_max: int = 5_000_000,
        log_compact_every: int = 32,
    ):
        self.spark = spark
        self.fixture_dir = fixture_dir
        self.work_dir = work_dir
        self.use_bloom = use_bloom
        self.decode_images = decode_images
        # at 100 TB the payload table stores bytes BY REFERENCE (the
        # source store/object store keeps them); duplicating binary into
        # the output table doubles the write path. Tests keep True to
        # exercise the binary sink; the bench measures the reference mode.
        self.store_image_bytes = store_image_bytes
        # Bloom is a prefilter for a HUGE seen set; below this many seen
        # URLs the exact anti-join is already trivial and the per-round
        # segment build is pure latency. Tests pass 0 to force the
        # Bloom path; correctness is identical either way (property:
        # test_no_bloom_same_result).
        self.bloom_min_rows = bloom_min_rows
        # a round's fetched rows are usually the small join side, but a
        # hot round can schedule 10^6-10^7 rows (GBs of url/caption
        # strings) — broadcasting that OOMs executors. Above this row
        # count the payload join falls back to a shuffle join against
        # the bucketed store (VERDICT r01).
        self.images_broadcast_max = images_broadcast_max
        # merge-on-read frontier: compact (partitioned overwrite) after
        # this many delta snapshots so read-side resolution stays O(1)
        # snapshots; between compactions per-round writes are O(delta)
        self.compact_every = compact_every
        # below this many logged urls the full-seen anti-join is cheap
        # and the bucket-pruned path's one extra per-round action (the
        # ≤N_URL_BUCKETS-row touched-bucket collect over the already-
        # persisted probe side) is pure latency; above it, pruning makes
        # the per-round seen scan O(maybe-seen ∩ touched buckets)
        # instead of O(seen). Tests pass 0 to force the pruned path;
        # correctness is identical (test_seen_bucket_prune_invariant).
        self.seen_prune_min_rows = seen_prune_min_rows
        # at or below this many frontier rows (footer count) the round
        # is latency-bound, not work-bound: scheduling runs driver-side
        # through spec.schedule_round (the oracle's own kernel — one
        # bounded collect) instead of the distributed window. 0 forces
        # the distributed path (test_scale_paths_invariant).
        self.tiny_schedule_max = tiny_schedule_max
        # "broadcast": driver OR-merges the segment table and broadcasts
        # (~8 MB at this sizing — right while the filter fits an
        # executor heap). "join": Bloom bits NEVER touch the driver —
        # segment deltas are built and appended distributed, and the
        # probe is a seg-keyed cogroup (shuffle candidates by segment,
        # OR-merge + test bits inside the per-segment Arrow group).
        # "auto" sizes the gate like the images-stage broadcast gate:
        # the filter's byte size is static (N_SEGMENTS × segment bits),
        # so the mode resolves at construction — broadcast below
        # BLOOM_BROADCAST_MAX_BYTES, join above. Identical semantics
        # either way (test_bloom_join_probe_same_result); at 10^10 urls
        # N_SEGMENTS grows past broadcastable and "join" is the only
        # shape that survives.
        assert bloom_probe_mode in ("auto", "broadcast", "join")
        # seen_filter picks the probabilistic prefilter STRUCTURE (the
        # exact anti-join downstream is identical either way — output
        # invariance: test_cuckoo_filter_same_result): "bloom" = the
        # default OR-mergeable bit segments (plans/seen.py), "cuckoo" =
        # partial-key cuckoo tables (plans/cuckoo.py — deletable,
        # 2-bucket probes, the north rule's named alternative). Both
        # support both probe modes: cuckoo deltas are raw-hash rows
        # (tables don't OR-merge) folded into serialized tables at
        # compaction, and in join mode neither fingerprints nor hashes
        # ever touch the driver (test_cuckoo_join_probe_same_result) —
        # the shape that survives the structure's ~2.2 bytes/url at
        # 10^10 urls (22 GB of state no driver should hold).
        assert seen_filter in ("bloom", "cuckoo")
        self.seen_filter = seen_filter
        if bloom_probe_mode == "auto":
            filter_bytes = (
                cuckoo.N_SEGMENTS * cuckoo.N_BUCKETS * cuckoo.SLOTS * 2
                if seen_filter == "cuckoo"
                else bloom.N_SEGMENTS * bloom.BITS_PER_SEGMENT // 8
            )
            bloom_probe_mode = (
                "broadcast"
                if filter_bytes <= self.BLOOM_BROADCAST_MAX_BYTES
                else "join"
            )
        self.bloom_probe_mode = bloom_probe_mode
        self.pol = PolitenessConfig.load(os.path.join(fixture_dir, "politeness.json"))
        # re-crawl TTL in rounds (None = off), from politeness.json —
        # semantics in spec.py; seen derivation filters the log to the
        # window, and the cuckoo filter mirrors expiry with kind='del'
        # rows (the distributed deletion path's consumer)
        self.ttl = self.pol.recrawl_after_rounds
        # append-only log/error tables: merge delta snapshots into one
        # compact pile every this-many live entries (2-level LSM — see
        # _maintain_log_tables); ≤ 0 disables
        self.log_compact_every = log_compact_every
        # round at which the seen filter activated (persisted in
        # state.json): cuckoo TTL deletes are only valid for terminal
        # rounds whose inserts the filter actually received — the
        # activation build covers the window (act-ttl, act], so deletes
        # are issued only for rnd > activation round (deleting a
        # never-inserted url could evict a colliding fingerprint and
        # break the no-false-negative guarantee)
        self._filter_round: int | None = None
        self.store_path = os.path.join(fixture_dir, "page_store.parquet")
        self.images_path = os.path.join(fixture_dir, "image_captions.parquet")
        # bucket modulus comes from the corpus itself — a constant
        # mismatch would silently drop rows from the payload inner join
        from scraper_spark.sources.fixtures import store_bucket_count

        self.n_image_buckets = store_bucket_count(self.images_path)

        self.t_frontier = TableIO(os.path.join(work_dir, "frontier"))
        self.t_log = TableIO(os.path.join(work_dir, "crawl_log"))
        self.t_errors = TableIO(os.path.join(work_dir, "fetch_errors"))
        self.t_images = TableIO(os.path.join(work_dir, "images"))
        # Bloom segments live in a snapshot-committed table like every
        # other piece of crawl state (VERDICT r02 #4 — formerly a
        # driver-held npz sidecar): rounds append O(touched-segment)
        # delta rows (seg, bits), reads OR-merge, compaction rewrites
        # one merged snapshot. Being in _tables puts it under the same
        # state.json commit + rollback as the data tables, so resume
        # restores the filter to the committed round boundary.
        self.t_bloom = TableIO(os.path.join(work_dir, "bloom"))
        self._tables = {
            "frontier": self.t_frontier,
            "crawl_log": self.t_log,
            "fetch_errors": self.t_errors,
            "images": self.t_images,
            "bloom": self.t_bloom,
        }

        # politeness + robots dims as TABLES (VERDICT r03 #2): at the
        # north rule's 10^8-host web these are real dimension tables
        # (broadcast while small, bucket-joined beyond), not driver-
        # built literal plans holding O(hosts) driver memory. The JSON
        # config loads into two TableIO tables once per work dir and
        # the per-round joins read them back; robots stays
        # pre-aggregated to (host, rules array) so the filter is one
        # broadcast join + exists(), no distinct/anti-join shuffles
        # (plan-pinned by test_schedule_dim_tables_million_hosts).
        # Reference analog being scaled: per-site config constants
        # (reference: handlers/haozu.py:19-23) and the logs-table
        # driven entity list (handlers/db.py:191-203).
        self.t_tokens = TableIO(os.path.join(work_dir, "dim_tokens"))
        self.t_robots = TableIO(os.path.join(work_dir, "dim_robots"))
        tokens_pdf = pd.DataFrame(
            {
                "host": list(self.pol.host_tokens.keys()),
                "tokens": [int(t) for t in self.pol.host_tokens.values()],
            }
        )
        # robots dim rows are REP rule lists [(path, allow)] — merged
        # from the legacy disallow-prefix config and any parsed
        # robots.txt bodies (spec.PolitenessConfig / functions/robots.py)
        rules_rows = [
            (h, [(p, bool(a)) for p, a in rs])
            for h, rs in sorted(self.pol.robots_rules.items())
        ]
        # dims are pure config projections, so (a) skip the two Spark
        # write jobs when the config is unchanged (fingerprint file —
        # every re-construction on a long-lived work dir would
        # otherwise pay them), and (b) expire superseded snapshots
        # right after an overwrite: dims are outside _tables (they are
        # config, not crash-covered crawl STATE, so no rollback ever
        # reads an old dim snapshot) and would otherwise accrete one
        # orphaned snapshot dir per construction forever.
        from scraper_spark.functions.hashes import md5_long

        dim_fp = str(
            md5_long(
                json.dumps(
                    [sorted(self.pol.host_tokens.items()), rules_rows],
                    sort_keys=True,
                )
            )
        )
        fp_path = os.path.join(work_dir, "dim_fingerprint.json")
        stored_fp = None
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                stored_fp = json.load(f).get("fp")
        if not (
            stored_fp == dim_fp
            and self.t_tokens.exists()
            and self.t_robots.exists()
        ):
            self.t_tokens.overwrite(
                spark.createDataFrame(tokens_pdf, "host string, tokens int")
            )
            self.t_robots.overwrite(
                spark.createDataFrame(
                    rules_rows,
                    "host string, rules array<struct<p:string,allow:boolean>>",
                )
            )
            self.t_tokens.expire_snapshots(self.t_tokens.current_snapshot_id())
            self.t_robots.expire_snapshots(self.t_robots.current_snapshot_id())
            tmp_fp = fp_path + ".tmp"
            with open(tmp_fp, "w") as f:
                json.dump({"fp": dim_fp}, f)
            os.replace(tmp_fp, fp_path)
        self.tokens_df = self.t_tokens.read(spark)
        self.robots_df = self.t_robots.read(spark)
        # broadcast the dims only while they FIT (footer row count — no
        # job): beyond dims_broadcast_max hosts the hint is dropped and
        # the schedule joins become ordinary shuffle joins on host
        # (Catalyst/AQE picks the strategy from real sizes) — the
        # 10^8-host shape. Output-invariant: test_schedule_dims_shuffle_same_result
        # pins both paths to identical schedules.
        dim_rows = max(self.t_tokens.rows(), self.t_robots.rows())
        self._dims_small = dim_rows <= dims_broadcast_max
        self.parallelism = spark.sparkContext.defaultParallelism

        # broadcast-mode driver state: {seg: bit ndarray} (bloom) or
        # {seg: CuckooSegment} (cuckoo); _filter_probe is the matching
        # vectorized membership fn — both share probe(urls, segments)
        self._bloom_segments: dict = {}
        self._filter_probe = (
            cuckoo.probe if seen_filter == "cuckoo" else bloom.probe
        )
        self._bloom_bc = None
        self._round_persists: list[DataFrame] = []

    # ------------------------------------------------------------- state
    def _state_path(self) -> str:
        return os.path.join(self.work_dir, "state.json")

    BLOOM_SCHEMA = "seg int, bits array<long>"
    # cuckoo filter state rows: kind='table' carries a serialized
    # segment (packed fingerprint words + exact stash), kind='delta'
    # carries raw insertable hashes in `words`, kind='del' raw hashes
    # to REMOVE (cuckoo.delete_segments — re-crawl TTL eviction),
    # applied tables → deltas → dels at every merge site
    CUCKOO_SCHEMA = "seg int, kind string, words array<long>, stash array<long>"
    # auto-mode ceiling for holding + broadcasting the merged filter
    # (comfortably under a 4-8 GB executor heap's broadcast budget)
    BLOOM_BROADCAST_MAX_BYTES = 256 << 20

    def _bloom_active(self) -> bool:
        """Is the Bloom prefilter live? Broadcast mode: driver holds
        merged segments. Join mode: any committed segment snapshot."""
        if self.bloom_probe_mode == "broadcast":
            return bool(self._bloom_segments)
        return self.t_bloom.current_snapshot_id() is not None

    def _append_bloom_delta(self, delta: dict) -> None:
        """Append this round's filter delta (broadcast mode; the data
        came back on the fused stats collect). Bloom: OR-delta bit
        segments, merged on read. Cuckoo: raw-hash rows (kind='delta')
        — tables don't OR-merge, so deltas stay insertable hashes and
        compaction folds them into serialized tables. Either way the
        rows are O(touched segments) / O(round urls) and snapshot count
        stays bounded by compaction."""
        if not delta:
            return
        if self.seen_filter == "cuckoo":
            pdf = pd.DataFrame(
                {
                    "seg": list(delta.keys()),
                    "kind": "delta",
                    "words": [np.asarray(v, dtype=np.int64).tolist() for v in delta.values()],
                    "stash": [[] for _ in delta],
                }
            )
            self.t_bloom.append(
                self.spark.createDataFrame(pdf, self.CUCKOO_SCHEMA)
            )
        else:
            pdf = bloom.segments_to_frame(delta)
            self.t_bloom.append(
                self.spark.createDataFrame(pdf, self.BLOOM_SCHEMA)
            )
        self._maybe_compact_bloom()

    def _bloom_deltas_since_compact(self) -> int:
        n = 0
        for s in reversed(self.t_bloom.snapshots()):
            if s["op"] == "overwrite":
                break
            n += 1
        return n

    def _maybe_compact_bloom(self) -> None:
        if self._bloom_deltas_since_compact() < self.compact_every:
            return
        if self.bloom_probe_mode == "broadcast":
            # the driver already holds the merged state — free rewrite
            if self.seen_filter == "cuckoo":
                pdf = cuckoo.segments_to_frame(self._bloom_segments)
                pdf.insert(1, "kind", "table")
                self.t_bloom.overwrite(
                    self.spark.createDataFrame(pdf, self.CUCKOO_SCHEMA)
                )
                return
            pdf = bloom.segments_to_frame(self._bloom_segments)
            self.t_bloom.overwrite(
                self.spark.createDataFrame(pdf, self.BLOOM_SCHEMA)
            )
        else:
            # distributed merge: one groupBy(seg) Arrow stage. Bloom
            # OR-merges bit rows; cuckoo folds serialized tables + raw-
            # hash delta rows into one kind='table' row per segment —
            # in join mode no filter state touches the driver even at
            # compaction.
            if self.seen_filter == "cuckoo":
                merged = (
                    self.t_bloom.read(self.spark)
                    .groupBy("seg")
                    .applyInPandas(_merge_cuckoo_state, self.CUCKOO_SCHEMA)
                )
            else:
                merged = (
                    self.t_bloom.read(self.spark)
                    .groupBy("seg")
                    .applyInPandas(_or_merge_segments, self.BLOOM_SCHEMA)
                )
            self.t_bloom.overwrite(merged)

    def _load_bloom(self) -> None:
        """Rebuild the driver-held merged segments from the table
        (broadcast mode resume). Join mode never holds bits on the
        driver — the table IS the state. Cuckoo: merge the serialized
        'table' rows, then insert the not-yet-compacted 'delta' hashes
        (insertion order doesn't affect membership, which is all the
        prefilter contract requires)."""
        self._bloom_segments = {}
        if self.t_bloom.current_snapshot_id() is None:
            return
        pdf = self.t_bloom.read(self.spark).toPandas()
        if self.seen_filter == "cuckoo":
            self._bloom_segments = cuckoo.segments_from_state_rows(pdf)
        else:
            self._bloom_segments = bloom.merge_segment_frames([pdf])

    def _commit_state(self, next_round: int, seq: int) -> None:
        state = {
            "round": next_round,
            "seq": seq,
            # recorded so a resume with a DIFFERENT filter structure
            # fails fast instead of mis-parsing the other structure's
            # table schema (ADVICE r03); probe mode is informational —
            # broadcast/join share the table format and may change
            # across resumes
            "seen_filter": self.seen_filter,
            "bloom_probe_mode": self.bloom_probe_mode,
            "filter_round": self._filter_round,
            "snapshots": {
                name: t.current_snapshot_id() for name, t in self._tables.items()
            },
        }
        os.makedirs(self.work_dir, exist_ok=True)
        tmp = self._state_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        os.replace(tmp, self._state_path())

    def _load_state(self) -> dict | None:
        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # ------------------------------------------------------------- init
    def _init_frontier(self) -> None:
        seeds = self.spark.read.parquet(os.path.join(self.fixture_dir, "seeds.parquet"))
        frontier = (
            seeds.select(canonicalize_udf("url").alias("canon_url"))
            .dropDuplicates(["canon_url"])
            .withColumn("host", host_udf("canon_url"))
            .withColumn(
                "host_bucket", bucket_col(F.col("host"), N_HOST_BUCKETS).cast("int")
            )
            .withColumn("depth", F.lit(0))
            .withColumn("discovery_time", F.lit(0))
            .withColumn("attempt", F.lit(0))
        )
        self.t_frontier.overwrite(
            self._as_delta(frontier, "add", -1), partition_by=["host_bucket"]
        )
        self._commit_state(0, 0)

    # ------------------------------------------ merge-on-read frontier
    # The stored frontier is append-only between compactions: each round
    # appends one delta snapshot ('del' for every scheduled url, 'add'
    # for retries and fresh discoveries) instead of rewriting the whole
    # table — per-round frontier I/O is O(round delta), not O(frontier)
    # (VERDICT r01; the Iceberg analog is merge-on-read row deletes).
    # Read-side resolution keeps the newest record per url (an 'add'
    # beats a 'del' within the same round: a scheduled transient that
    # retries is removed AND re-enqueued that round). Every
    # ``compact_every`` deltas the resolved view is rewritten as one
    # snapshot hive-partitioned by host_bucket — the SURVEY §4.2.2
    # bucket layout, so bucket-local scans survive at 10^10 urls.
    @staticmethod
    def _as_delta(df: DataFrame, op: str, delta_round: int) -> DataFrame:
        out = df.withColumn("op", F.lit(op)).withColumn(
            "delta_round", F.lit(delta_round).cast("int")
        )
        return out.select([f.name for f in FRONTIER_DELTA_SCHEMA.fields])

    def _deltas_since_compact(self) -> int:
        n = 0
        for s in reversed(self.t_frontier.snapshots()):
            if s["op"] == "overwrite":
                break
            n += 1
        return n

    def frontier_view(self) -> DataFrame:
        """Resolve the merge-on-read delta log to the pending frontier.

        Resolution rule — FIRST-ADD-WINS after the last delete: per
        url, take the newest 'del' round (a retry 'add' shares its
        del's round and survives it), then among surviving 'add's keep
        the EARLIEST (min delta_round; within a round the retry add —
        attempt > 0 — outranks a fresh link re-add). This makes
        re-discovery of an already-pending url a NO-OP by construction:
        a later link 'add' loses to the original record, so first
        discovery wins (spec.py) without any engine-side subtraction —
        which is what lets the round loop skip the two O(frontier)
        passes (remaining + known anti-joins) older revisions spent
        purely on keeping duplicate adds out of the table. Duplicate
        adds cost O(links) delta rows that vanish at resolution.

        One exchange on canon_url serves both window passes (the
        last-del max and the winner row_number share partitioning)."""
        raw = self.t_frontier.read(self.spark, schema=FRONTIER_DELTA_SCHEMA)
        if self._deltas_since_compact() == 0:
            # freshly initialized/compacted: stored rows ARE the
            # resolved state — skip the resolution shuffle entirely
            return raw.select([f.name for f in FRONTIER_SCHEMA.fields])
        w = W.partitionBy("canon_url")
        last_del = F.max(
            F.when(F.col("op") == "del", F.col("delta_round"))
        ).over(w)
        alive = raw.withColumn("_ldr", F.coalesce(last_del, F.lit(-2))).where(
            (F.col("op") == "add") & (F.col("delta_round") >= F.col("_ldr"))
        )
        wr = W.partitionBy("canon_url").orderBy(
            F.col("delta_round").asc(), F.col("attempt").desc()
        )
        return (
            alive.withColumn("_rn", F.row_number().over(wr))
            .where(F.col("_rn") == 1)
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )

    def _maybe_compact(self, frontier_rows: int | None = None) -> None:
        """Rewrite the resolved view as one snapshot every
        ``compact_every`` deltas — or every 4 while the table is SMALL
        (footer row count, no job): each uncompacted delta adds a scan
        node to every frontier_view plan, and in the latency-bound
        drain regime (tiny rounds, multi-JVM job floors) that per-round
        plan growth dominates while the rewrite costs ~nothing. At bulk
        scale the 100k-row gate is never true and the O(frontier)
        rewrite keeps its 16-delta amortization. Layout-only: the
        resolved view is unchanged, so crawl output is invariant."""
        n = self._deltas_since_compact()
        if n == 0:
            return
        # round-start footer count from run() (over-counts by this
        # round's delta — the gates only pick WHEN to rewrite, so an
        # off-by-a-round threshold crossing is harmless); only walk
        # footers ourselves when called standalone, and never when the
        # delta count alone already decides
        if n < self.compact_every and frontier_rows is None:
            frontier_rows = self.t_frontier.rows()
        # drain regime (< 5k rows): compact EVERY round — the O(tiny)
        # rewrite rides this same write job, and the next round's
        # frontier_view takes the deltas==0 fast path, deleting the
        # resolution exchange from every drain round entirely
        if n >= self.compact_every or frontier_rows < 5_000 or (
            n >= 4 and frontier_rows < 100_000
        ):
            self.t_frontier.overwrite(
                self._as_delta(self.frontier_view(), "add", -1),
                partition_by=["host_bucket"],
            )

    def _resume(self) -> tuple[int, int]:
        """Roll every table back to the last committed round boundary;
        rebuild the Bloom broadcast. Returns (next_round, seq_offset)."""
        state = self._load_state()
        if state is None:
            self._init_frontier()
            state = self._load_state()
        committed_filter = state.get("seen_filter", self.seen_filter)
        if committed_filter != self.seen_filter:
            raise ValueError(
                f"work dir {self.work_dir!r} was written with "
                f"seen_filter={committed_filter!r}; resuming with "
                f"{self.seen_filter!r} would mis-parse the committed "
                "filter table — pass the original seen_filter (or use a "
                "fresh work dir)"
            )
        for name, sid in state["snapshots"].items():
            t = self._tables.get(name)
            if t is None:
                continue
            cur = t.current_snapshot_id()
            if sid is None:
                if cur is not None:
                    t.rollback(0)
            elif cur is not None and cur > sid:
                t.rollback(sid)
        if self.use_bloom and self.bloom_probe_mode == "broadcast":
            self._load_bloom()
        self._refresh_bloom_bc()
        self._filter_round = state.get("filter_round")
        if self._filter_round is None and self._bloom_active():
            # pre-TTL state file with a live filter: pin activation to
            # the resume round — conservative (skips deletes for rows
            # inserted before, which only leaves filter slack)
            self._filter_round = state["round"]
        return state["round"], state["seq"]

    def _refresh_bloom_bc(self) -> None:
        if self._bloom_bc is not None:
            self._bloom_bc.destroy()
        self._bloom_bc = self.spark.sparkContext.broadcast(self._bloom_segments)

    # ------------------------------------------------------------ stages
    def seen_df(
        self, buckets: set[int] | None = None, rnd: int | None = None
    ) -> DataFrame:
        """The exact URL-seen set, DERIVED from the crawl log + error
        table instead of materialized separately: seen = terminally
        fetched (log status != 503) ∪ retry-exhausted (fetch_errors).
        Parquet column pruning makes the derived read as cheap as a
        dedicated table and saves one table write per round; at real
        scale the same projection is an Iceberg metadata-pruned scan.

        With the re-crawl TTL on (``recrawl_after_rounds``) and ``rnd``
        given, terminal log rows count only while round > rnd - ttl
        (spec.py): a pure FILTER, no groupBy — any row in the window
        makes the url seen, and a url whose newest row fell out has
        only out-of-window rows. fetch_errors stay permanent (errors
        don't re-crawl). ``rnd=None`` (tests, resume audits) returns
        the historical seen set.

        ``buckets`` restricts the read to those url_bucket partitions —
        manifest-level file pruning inside TableIO.read (only touched
        leaf dirs are even listed; on a single compacted root the same
        predicate becomes Catalyst PartitionFilters). Restriction is
        lossless for any consumer that joins on canon_url against a
        probe side confined to the same buckets: canon_url determines
        url_bucket, so no match can cross a bucket boundary."""
        prune = buckets is not None and len(buckets) < N_URL_BUCKETS
        part = {"url_bucket": set(buckets)} if prune else None
        log = self.t_log.read(self.spark, schema=LOG_SCHEMA, partitions=part)
        live = F.col("status") != STATUS_TRANSIENT
        if self.ttl is not None and rnd is not None:
            # parquet round min/max stats prune whole files (each
            # append holds one round's rows); the Iceberg analog is a
            # round-partitioned metadata prune
            live = live & (F.col("round") > rnd - self.ttl)
        seen = log.where(live).select("canon_url")
        if self.t_errors.current_snapshot_id():
            err = self.t_errors.read(self.spark, partitions=part)
            seen = seen.unionByName(err.select("canon_url"))
        return seen

    def _schedule(self, frontier: DataFrame, frontier_rows: int | None) -> DataFrame:
        """Robots filter (``robots_allowed_col``) + per-host budgeted
        top-k.

        Robots: one broadcast join + ``exists`` over the per-host prefix
        array — no extra shuffle. Top-k: a salted two-phase window when
        the frontier is large (bounds every window partition to
        ``salts × budget`` rows on hot hosts); a single window when the
        frontier is small (row count from parquet footers, free) — the
        extra phase would be pure latency there."""
        pq = F.regexp_replace("canon_url", r"^[a-z][a-z0-9+.\-]*://[^/]*", "")
        hint = F.broadcast if self._dims_small else (lambda df: df)
        cand = (
            frontier.join(hint(self.robots_df), "host", "left")
            .where(robots_allowed_col(pq, F.col("rules")))
            .drop("rules")
        )
        cand = cand.join(hint(self.tokens_df), "host", "left").withColumn(
            "tokens", F.coalesce("tokens", F.lit(self.pol.default_tokens))
        )
        order = [F.col("depth"), F.col("discovery_time"), F.col("canon_url")]
        big = frontier_rows is None or frontier_rows > 200_000
        if big:
            # phase 1: top-k inside (host, salt) bounds window partitions
            salt = F.pmod(F.xxhash64("canon_url"), F.lit(SCHEDULE_SALTS))
            w1 = W.partitionBy("host", salt).orderBy(*order)
            cand = cand.withColumn("_r", F.row_number().over(w1)).where(
                F.col("_r") <= F.col("tokens")
            )
        # exact top-k per host
        w2 = W.partitionBy("host").orderBy(*order)
        return (
            cand.withColumn("_r", F.row_number().over(w2))
            .where(F.col("_r") <= F.col("tokens"))
            .drop("_r", "tokens")
        )

    def _images_stage(
        self,
        fetched: DataFrame,
        rnd: int,
        pbuckets: set[int] | None = None,
        n_ok: int | None = None,
    ) -> DataFrame:
        """Payload pipeline: fetched detail rows → image bytes → decode →
        phash/dims, Arrow-batched (SURVEY §2.10 I4/I6).

        The round's fetched rows are usually the small side — broadcast
        them explicitly (post-UDF stats are unknown, so Catalyst would
        otherwise sort-merge — i.e. SORT the whole multi-GB store every
        round) — but ONLY while the round is provably small (``n_ok``
        from the fused stats collect vs ``images_broadcast_max``): a
        10^6-row round's url+caption strings are GBs and would OOM the
        executors as a broadcast. Large rounds shuffle-join instead; the
        (pbucket, image_id) key co-locates with the bucketed store.
        ``pbuckets`` (same stats collect) statically prunes the
        hive-partitioned store to the touched buckets; sparse rounds
        read a handful of files."""
        from scraper_spark.functions.hashes import bucket_col as _bucket

        n_buckets = self.n_image_buckets
        with_img = fetched.where(
            (F.col("status") == STATUS_OK) & F.col("image_id").isNotNull()
        ).select(
            "canon_url",
            "image_id",
            "caption",
            _bucket(F.col("image_id"), n_buckets).cast("int").alias("pbucket"),
        )
        store = self.spark.read.parquet(self.images_path).select(
            "image_id", "bytes", "fmt", F.col("pbucket").cast("int").alias("pbucket")
        )
        pruned = pbuckets is not None and len(pbuckets) < n_buckets
        if pruned:
            store = store.where(F.col("pbucket").isin(sorted(pbuckets)))
        # inner join is exact here: the store holds every fetched
        # image_id by construction (fetch returned it from the same
        # corpus); broadcast the per-round side only when provably small
        small = n_ok is None or n_ok <= self.images_broadcast_max
        right = F.broadcast(with_img) if small else with_img
        joined = store.join(right, ["pbucket", "image_id"], "inner")
        # decouple the decode stage from the scan tasks whenever the
        # round is small enough to broadcast: decoding INSIDE the scan
        # tasks interleaves the multi-GB store scan with Python IPC
        # stalls and spreads the matched rows over hundreds of midget
        # Arrow batches — measured 2× slower at BOTH 2 and 8 cores on a
        # 5.7k-image round against the 8.8 GB bench store (BENCH.md r4:
        # 36.8→17.2 s at 2 cores, 11.3→4.9 s at 8). The shuffle moves
        # only the matched rows (≤ images_broadcast_max, the same bound
        # that gated the broadcast). Full-scan-sized rounds skip it —
        # there the post-join rows ARE the scan, and re-shuffling every
        # image byte buys nothing. Tiny rounds (a handful of images)
        # also skip: the decode finishes faster inside the scan tasks
        # than the extra stage costs.
        tiny_round = n_ok is not None and n_ok < 4 * self.parallelism
        if not tiny_round and (
            small or (pruned and len(pbuckets) < self.parallelism)
        ):
            joined = joined.repartition(self.parallelism, "image_id")

        keep_bytes = self.store_image_bytes

        def decode(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ws, hs, ph = [], [], []
                for b in pdf["bytes"]:
                    if b is None:
                        ws.append(None), hs.append(None), ph.append(None)
                        continue
                    img = decode_image(bytes(b))
                    hh, ww = img.shape[:2]
                    ws.append(ww)
                    hs.append(hh)
                    ph.append(phash64(img))
                yield pd.DataFrame(
                    {
                        "image_id": pdf["image_id"],
                        "bytes": pdf["bytes"] if keep_bytes else None,
                        "w": pd.array(ws, dtype="Int32"),
                        "h": pd.array(hs, dtype="Int32"),
                        "fmt": pdf["fmt"],
                        "caption": pdf["caption"],
                        "phash": pd.array(ph, dtype="Int64"),
                        "canon_url": pdf["canon_url"],
                        "round": np.full(len(pdf), rnd, dtype=np.int32),
                    }
                )

        return joined.mapInPandas(decode, IMAGES_SCHEMA)

    def _dedup_links(
        self,
        links: DataFrame,
        seen_base: DataFrame,
        terminal: DataFrame,
        prune: bool = False,
        rnd: int | None = None,
    ) -> DataFrame:
        """links − seen (Bloom prefilter on the big anti-join;
        exactness always from the left_anti). Links to urls already
        PENDING in the frontier pass through deliberately: frontier
        resolution is first-add-wins (frontier_view), so a duplicate
        add is a no-op — subtracting them here cost two O(frontier)
        passes per round (the old remaining/known anti-joins) to save
        O(links) delta rows. The caller passes the seen pieces
        explicitly — ``seen_base`` is the pre-round seen set (dirs
        resolved before any concurrent append commits) and ``terminal``
        this round's terminal fetches, which lets the frontier delta
        write run concurrently with the log append instead of reading
        the just-committed log snapshot.

        ``prune=True`` (gated on seen size by the caller) makes the
        exact join BUCKET-LOCAL: collect the ≤N_URL_BUCKETS distinct
        url buckets of the maybe-seen probe side (one bounded action
        over the already-persisted marked frame) and re-derive the seen
        side partition-pruned to exactly those buckets — per-round seen
        I/O is O(touched buckets), not O(seen). Lossless: canon_url
        determines url_bucket, so a probe row can only match seen rows
        in its own bucket. Pruning rides the Bloom path — at the seen
        sizes where it matters the Bloom prefilter is always active."""
        fresh = links
        if not (self.use_bloom and self._bloom_active()):
            return fresh.join(
                seen_base.unionByName(terminal), "canon_url", "left_anti"
            )
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in fresh.schema.fields
        )
        if self.bloom_probe_mode == "join":
            # the committed segment table can't contain THIS round's
            # terminal fetches (their delta append commits concurrently,
            # after this plan is built), so links back to them would be
            # "definitely unseen" and skip the exact join. Remove them
            # up front — terminal is O(round), a cheap small-side
            # anti-join — so the Bloom no-false-negative guarantee holds
            # for everything the filter has actually been fed.
            fresh = fresh.join(
                terminal.select("canon_url"), "canon_url", "left_anti"
            )
            marked = self._probe_join_mark(fresh, schema + ", _maybe boolean")
        else:
            bc = self._bloom_bc
            probe_fn = self._filter_probe  # bloom or cuckoo, same contract

            def mark(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    maybe = probe_fn(pdf["canon_url"], bc.value)
                    yield pdf.assign(_maybe=maybe)

            marked = fresh.mapInPandas(mark, schema + ", _maybe boolean")
        marked = marked.persist()
        self._round_persists.append(marked)
        definite = marked.where(~F.col("_maybe")).drop("_maybe")
        maybe = marked.where(F.col("_maybe")).drop("_maybe")
        if prune:
            touched = {
                r["ub"]
                for r in maybe.select(
                    bucket_col(F.col("canon_url"), N_URL_BUCKETS)
                    .cast("int")
                    .alias("ub")
                )
                .distinct()
                .collect()
            }
            # terminal stays unrestricted: its rows are genuinely seen
            # and it is O(round) — only the big log-derived scan prunes
            seen_join = self.seen_df(buckets=touched, rnd=rnd).unionByName(
                terminal
            )
        else:
            seen_join = seen_base.unionByName(terminal)
        return definite.unionByName(
            maybe.join(seen_join, "canon_url", "left_anti")
        )

    def _probe_join_mark(self, fresh: DataFrame, out_schema: str) -> DataFrame:
        """Seg-keyed filter probe with NO driver/broadcast state:
        shuffle candidates by their md5 segment, cogroup with that
        segment's state rows, merge + test membership inside the
        per-segment Arrow group (Bloom: OR the bit rows; cuckoo: merge
        serialized tables + insert raw-hash deltas). One O(candidates)
        shuffle on a uniformly-hashed 1-int key; the state side ships
        each segment's rows exactly once per probe — the shape that
        survives when the merged filter outgrows any broadcast (Bloom:
        N_SEGMENTS × 128 KB; cuckoo: ~2.2 bytes/url ≈ 22 GB at 10^10).
        Table dirs resolve NOW, before the round's concurrent filter
        append commits."""
        seg_df = self.t_bloom.read(self.spark)
        is_cuckoo = self.seen_filter == "cuckoo"

        def probe_grp(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
            if len(lpdf) == 0:
                return lpdf.drop(columns=["seg"]).assign(
                    _maybe=pd.Series([], dtype=bool)
                )
            if is_cuckoo:
                segs = cuckoo.segments_from_state_rows(rpdf) if len(rpdf) else {}
                maybe = cuckoo.probe(lpdf["canon_url"], segs)
            else:
                segs = bloom.merge_segment_frames([rpdf]) if len(rpdf) else {}
                maybe = bloom.probe(lpdf["canon_url"], segs)
            return lpdf.drop(columns=["seg"]).assign(_maybe=maybe)

        # same 64-way md5 segment key for either filter (bloom.N_SEGMENTS
        # == cuckoo.N_SEGMENTS; both derive seg = md5_long % N)
        cand = fresh.withColumn(
            "seg", bucket_col(F.col("canon_url"), bloom.N_SEGMENTS).cast("int")
        )
        return (
            cand.groupBy("seg")
            .cogroup(seg_df.groupBy("seg"))
            .applyInPandas(probe_grp, out_schema)
        )

    def _maintain_log_tables(self) -> None:
        """Post-commit storage maintenance (runs AFTER state.json
        advances, so everything it touches is already crash-covered):

        - expire_snapshots on every table with its just-committed id —
          physically drops data dirs no resume can reference (entries
          under the newest covered overwrite, and entries replaced by a
          covered compact), bounding disk across thousands of rounds;
        - crawl_log / fetch_errors: when the live delta entries reach
          ``log_compact_every``, merge them into ONE op='compact'
          snapshot (TableIO.compact_appends — a 2-level LSM pile over
          the overwrite base, one file per url_bucket), or PROMOTE with
          a full overwrite once the pile has grown to the base's size
          (size-tiered: total rewrite I/O stays O(N log N), and the
          pile rewrite between promotions is bounded by the base).
          The compact entry replaces its constituents only for readers
          at/after it; a torn-round rollback (always to the committed
          id, which is older) resurfaces the originals — byte-identical
          resume across a compaction boundary is pinned by
          test_log_compaction_resume.

        VERDICT r04 #2 / ADVICE r03: the one-scan multi-root read fixed
        O(rounds) plan growth; this bounds the physical file count."""
        state = self._load_state() or {"snapshots": {}}
        committed = state.get("snapshots", {})
        for name, t in self._tables.items():
            sid = committed.get(name)
            if sid:
                t.expire_snapshots(sid)
        if self.log_compact_every <= 0:
            return
        for name in ("crawl_log", "fetch_errors"):
            t = self._tables[name]
            sid = committed.get(name)
            if sid is None:
                continue
            pend = t.pending_appends(sid)
            if len(pend) < self.log_compact_every:
                continue
            total = t.rows()
            pend_rows = t.rows_in_dirs(
                [os.path.join(t.root, s["dir"]) for s in pend]
            )
            if pend_rows >= total - pend_rows:
                # pile caught up with the base → promote (full rewrite;
                # one task per bucket so the base stays ≤64 files)
                full = t.read(
                    self.spark,
                    schema=LOG_SCHEMA if name == "crawl_log" else None,
                )
                t.overwrite(
                    full.repartition(F.col("url_bucket")),
                    partition_by=["url_bucket"],
                )
            else:
                t.compact_appends(self.spark, sid, partition_by=["url_bucket"])

    # ------------------------------------------------------------- round
    def run(self, max_rounds: int = 100_000) -> dict:
        """Run (or resume) the crawl to frontier exhaustion. Returns
        summary counters."""
        start_round, seq = self._resume()
        totals = {
            "rounds": 0,
            "fetched": 0,
            "log_rows": seq,
            # rnd of the last loop iteration entered — the round whose
            # TTL expiry the final seen reflects (mirror of the
            # oracle's CrawlResult.final_round); compare seen via
            # seen_df(rnd=final_round)
            "final_round": start_round,
        }
        rnd = start_round
        while rnd < start_round + max_rounds:
            totals["final_round"] = rnd
            t0 = time.monotonic()
            phases: dict[str, float] = {}
            _pt = [t0]

            def _mark(name: str) -> None:
                now = time.monotonic()
                phases[name] = round(now - _pt[0], 2)
                _pt[0] = now

            frontier = self.frontier_view().persist()
            self._round_persists.append(frontier)
            # footer row count includes unresolved deltas (over-count) —
            # used only for the big/small plan heuristics, where an
            # over-estimate just picks the salted/partitioned path
            frontier_rows = self.t_frontier.rows()
            if frontier_rows <= self.tiny_schedule_max:
                # drain/startup regime: schedule DRIVER-SIDE with the
                # same spec.schedule_round kernel the oracle runs — a
                # bounded collect (≤ tiny_schedule_max rows) that
                # deletes the window shuffle and the robots/tokens dim
                # scans from the round plan, where they are pure fixed
                # latency (VERDICT r03 #5). Bulk rounds keep the
                # distributed salted-window path; output-invariance of
                # the two paths: test_scale_paths_invariant (this gate
                # forced to 0) vs the default configs.
                rows = frontier.collect()
                sched = spec_schedule_round(rows, self.pol)
                scheduled = self.spark.createDataFrame(
                    [tuple(r[f.name] for f in FRONTIER_SCHEMA.fields) for r in sched],
                    FRONTIER_SCHEMA,
                )
            else:
                scheduled = self._schedule(frontier, frontier_rows)
                # spread the fetch across all cores: the scheduling
                # window's output is AQE-coalesced to few partitions;
                # (host, url) repartition also co-locates per-host
                # batches (politeness-friendly client sessions).
                scheduled = scheduled.repartition(
                    self.parallelism, "host", "canon_url"
                )
            fetched = fetch(scheduled, self.store_path).persist()
            self._round_persists.append(fetched)
            # seen set as of the round start (dirs resolved NOW, before
            # any concurrent append commits); rnd applies the re-crawl
            # TTL window when the policy is on
            seen_base = self.seen_df(rnd=rnd)
            # cuckoo TTL expiry: urls whose terminal fetch was at round
            # rnd - ttl fall out of the seen window THIS round — mirror
            # that in the prefilter with one delete per expiring LOG ROW
            # (per-row deletes balance the per-row inserts: cuckoo
            # delete is multiset, so a refetched url keeps its newer
            # copy). Only valid once the filter has actually received
            # those inserts (activation covers (act-ttl, act] — see
            # _filter_round).
            ttl_del_due = (
                self.ttl is not None
                and self.use_bloom
                and self.seen_filter == "cuckoo"
                and self._filter_round is not None
                and rnd > self._filter_round
                and rnd - self.ttl >= 0
            )
            expiring = None
            if ttl_del_due:
                expiring = (
                    self.t_log.read(self.spark, schema=LOG_SCHEMA)
                    .where(
                        (F.col("status") != STATUS_TRANSIENT)
                        & (F.col("round") == rnd - self.ttl)
                    )
                    .select("canon_url")
                )
            is_transient = F.col("status") == STATUS_TRANSIENT
            exhausted = F.col("attempt") + 1 >= self.pol.max_attempts
            terminal = fetched.where(~is_transient | exhausted).select("canon_url")

            # ---- ONE fused stats(+bloom-delta) collect per round:
            # status counts, exhausted count, per-bucket counts (seeding
            # the global-seq offsets), touched image pbuckets, and — in
            # Bloom steady state — the round's Bloom segment bits, all in
            # a single job over the cached fetch (ADVICE r01: fewer
            # fixed-latency jobs per round)
            from scraper_spark.functions.hashes import bucket_col as _bucket

            will_exhaust = is_transient & exhausted
            stats_agg = (
                fetched.groupBy("host_bucket", "status", will_exhaust.alias("exh"))
                .agg(
                    F.count("*").alias("n"),
                    F.collect_set(
                        _bucket(F.col("image_id"), self.n_image_buckets).cast("int")
                    ).alias("pb"),
                )
                .select(
                    F.lit("stats").alias("kind"),
                    "host_bucket",
                    "status",
                    "exh",
                    "n",
                    "pb",
                    F.lit(None).cast("int").alias("seg"),
                    F.lit(None).cast("array<long>").alias("bits"),
                )
            )
            fuse_bloom_delta = (
                self.use_bloom
                and self.bloom_probe_mode == "broadcast"
                and bool(self._bloom_segments)
            )
            if fuse_bloom_delta:
                # same (seg, bits) fused shape for either filter: bloom
                # rides its OR-delta bit segments, cuckoo its raw-hash
                # lists (cuckoo.hash_segments) — the union schema and
                # the single per-round collect don't change
                delta_src = (
                    cuckoo.hash_segments(terminal)
                    if self.seen_filter == "cuckoo"
                    else bloom.build_segments(terminal)
                )
                bloom_agg = delta_src.select(
                    F.lit("bloom").alias("kind"),
                    F.lit(None).cast("int").alias("host_bucket"),
                    F.lit(None).cast("int").alias("status"),
                    F.lit(None).cast("boolean").alias("exh"),
                    F.lit(None).cast("long").alias("n"),
                    F.lit(None).cast("array<int>").alias("pb"),
                    "seg",
                    "bits",
                )
                fused = stats_agg.unionByName(bloom_agg)
            else:
                fused = stats_agg
            if ttl_del_due and self.bloom_probe_mode == "broadcast":
                # expiry hashes ride the same single per-round collect
                del_agg = cuckoo.hash_segments(expiring).select(
                    F.lit("del").alias("kind"),
                    F.lit(None).cast("int").alias("host_bucket"),
                    F.lit(None).cast("int").alias("status"),
                    F.lit(None).cast("boolean").alias("exh"),
                    F.lit(None).cast("long").alias("n"),
                    F.lit(None).cast("array<int>").alias("pb"),
                    "seg",
                    "bits",
                )
                fused = fused.unionByName(del_agg)
            fused_rows = fused.collect()
            counts: dict[int, int] = {}
            bucket_counts: dict[int, int] = {}
            pbuckets: set[int] = set()
            n_exhausted = 0
            bloom_rows = []
            del_rows = []
            for r in fused_rows:
                if r["kind"] == "bloom":
                    bloom_rows.append((r["seg"], r["bits"]))
                    continue
                if r["kind"] == "del":
                    del_rows.append((r["seg"], r["bits"]))
                    continue
                counts[r["status"]] = counts.get(r["status"], 0) + r["n"]
                bucket_counts[r["host_bucket"]] = (
                    bucket_counts.get(r["host_bucket"], 0) + r["n"]
                )
                pbuckets.update(r["pb"])
                if r["exh"]:
                    n_exhausted += r["n"]
            n_sched = sum(counts.values())
            _mark("fetch_stats")
            if n_sched == 0:
                break
            seq_new = seq + n_sched

            # ---- Bloom update. Broadcast mode: driver-side numpy merge
            # (the segment build already rode the fused job in steady
            # state); the table append rides the concurrent write pool.
            # Join mode: the bits NEVER touch the driver — the delta
            # build is a lazy DataFrame appended by the write pool, and
            # the probe cogroups against the table.
            bloom_delta_job = None
            if (
                self.use_bloom
                and self.bloom_probe_mode == "broadcast"
                and self.seen_filter == "cuckoo"
            ):
                # cuckoo deltas are raw-hash lists; the driver INSERTS
                # them (a cuckoo table can't be OR-merged) and persists
                # the same hashes as kind='delta' rows
                delta_c: dict[int, np.ndarray] = {}
                if fuse_bloom_delta:
                    delta_c = {
                        int(seg): np.asarray(bits, dtype=np.int64)
                        for seg, bits in bloom_rows
                    }
                elif seq_new >= self.bloom_min_rows:
                    pdf = cuckoo.hash_segments(
                        seen_base.unionByName(terminal)
                    ).toPandas()
                    delta_c = {
                        int(s): np.asarray(b, dtype=np.int64)
                        for s, b in zip(pdf["seg"], pdf["bits"])
                    }
                    if self._filter_round is None:
                        self._filter_round = rnd
                del_c = {
                    int(seg): np.asarray(bits, dtype=np.int64)
                    for seg, bits in del_rows
                }
                if delta_c or del_c:
                    for seg, hashes in delta_c.items():
                        f = self._bloom_segments.setdefault(
                            seg, cuckoo.CuckooSegment()
                        )
                        f.insert_hashes(hashes)
                    # TTL expiry: one delete per expiring log row — this
                    # round's inserts are round rnd, the dels round
                    # rnd - ttl, so order between them is immaterial
                    for seg, hashes in del_c.items():
                        f = self._bloom_segments.get(seg)
                        if f is not None:
                            f.delete_hashes(hashes)
                    self._refresh_bloom_bc()

                    def bloom_delta_job(d=delta_c, dd=del_c):
                        # durable kind='del' rows FIRST: broadcast-mode
                        # compaction overwrites from the driver state
                        # (dels already applied), so no del row may
                        # remain in the table after a compaction that
                        # covered it — dels-then-deltas means any
                        # compaction (which only _append_bloom_delta
                        # triggers) sweeps the del rows away with it
                        if dd:
                            pdf = pd.DataFrame(
                                {
                                    "seg": list(dd.keys()),
                                    "kind": "del",
                                    "words": [v.tolist() for v in dd.values()],
                                    "stash": [[] for _ in dd],
                                }
                            )
                            self.t_bloom.append(
                                self.spark.createDataFrame(
                                    pdf, self.CUCKOO_SCHEMA
                                )
                            )
                        self._append_bloom_delta(d)
                        if dd and not d:
                            self._maybe_compact_bloom()

            elif self.use_bloom and self.bloom_probe_mode == "broadcast":
                delta: dict[int, np.ndarray] = {}
                if fuse_bloom_delta:
                    delta = bloom.merge_segment_frames(
                        [pd.DataFrame(bloom_rows, columns=["seg", "bits"])]
                    )
                elif seq_new >= self.bloom_min_rows:
                    # activation: one full build over the whole seen set
                    # (amortized — once when crossing the threshold, or
                    # on resume from an empty table)
                    delta = bloom.merge_segment_frames(
                        [
                            bloom.build_segments(
                                seen_base.unionByName(terminal)
                            ).toPandas()
                        ]
                    )
                    if self._filter_round is None:
                        self._filter_round = rnd
                if delta:
                    for seg, bits in delta.items():
                        if seg in self._bloom_segments:
                            self._bloom_segments[seg] = (
                                self._bloom_segments[seg] | bits
                            )
                        else:
                            self._bloom_segments[seg] = bits
                    self._refresh_bloom_bc()

                    def bloom_delta_job(d=delta):
                        self._append_bloom_delta(d)

            elif self.use_bloom:
                # join mode: the delta is a LAZY distributed build — no
                # filter state ever reaches the driver. Bloom appends
                # OR-able bit rows; cuckoo appends raw-hash kind='delta'
                # rows that compaction folds into serialized tables.
                src_df = None
                if self._bloom_active():
                    src_df = terminal
                elif seq_new >= self.bloom_min_rows:
                    src_df = seen_base.unionByName(terminal)
                    if self._filter_round is None:
                        self._filter_round = rnd
                if src_df is not None:
                    if self.seen_filter == "cuckoo":
                        delta_df = cuckoo.hash_segments(src_df).select(
                            "seg",
                            F.lit("delta").alias("kind"),
                            F.col("bits").alias("words"),
                            F.array().cast("array<long>").alias("stash"),
                        )
                        if ttl_del_due:
                            # TTL expiry rows ride the same append; the
                            # join probe resolves table dirs at round
                            # START, so the dels take effect from the
                            # next round's probe — lag is safe (the
                            # filter stays a superset of the window-
                            # filtered seen, and the exact anti-join
                            # already excludes expired urls this round)
                            delta_df = delta_df.unionByName(
                                cuckoo.delete_segments(expiring)
                            )
                    else:
                        delta_df = bloom.build_segments(src_df)

                    def bloom_delta_job(df=delta_df):
                        self.t_bloom.append(df)
                        self._maybe_compact_bloom()

            _mark("bloom")

            # ---- build the independent table writes (up to five: log,
            # errors, images, frontier+compaction, bloom delta) ----------
            # url_seen stays DERIVED from crawl_log + fetch_errors (see
            # seen_df) — no per-round table write for it
            log = with_global_seq(
                fetched.select(
                    F.lit(rnd).cast("int").alias("round"),
                    "canon_url",
                    "host",
                    "host_bucket",
                    "depth",
                    "discovery_time",
                    F.col("status").cast("int"),
                    bucket_col(F.col("canon_url"), N_URL_BUCKETS)
                    .cast("int")
                    .alias("url_bucket"),
                ),
                "host_bucket",
                ["depth", "discovery_time", "canon_url"],
                seq,
                bucket_counts,
            ).select([f.name for f in LOG_SCHEMA.fields])

            retry = (
                fetched.where(is_transient & ~exhausted)
                .select(
                    "canon_url",
                    "host",
                    "host_bucket",
                    "depth",
                    "discovery_time",
                    (F.col("attempt") + 1).cast("int").alias("attempt"),
                )
            )
            # NOTE: no remaining/known subtraction — links to urls
            # already pending in the frontier become duplicate 'add'
            # deltas that first-add-wins resolution discards
            # (frontier_view). Two O(frontier) passes per round gone.
            links = fetched.where(
                (F.col("status") == STATUS_OK) & F.col("links").isNotNull()
            ).select("depth", F.explode("links").alias("link"))
            if counts.get(STATUS_OK, 0) > 2000:
                # canonicalization is the round's biggest Python stage;
                # fetched's partitioning follows page counts, not link
                # counts — rebalance so every core decodes URLs
                links = links.repartition(self.parallelism)
            links = (
                links.select(
                    canonicalize_udf("link").alias("canon_url"),
                    (F.col("depth") + 1).alias("depth"),
                )
                .groupBy("canon_url")
                .agg(F.min("depth").cast("int").alias("depth"))
            )
            fresh = self._dedup_links(
                links,
                seen_base,
                terminal,
                # seq counts exactly the logged urls — a free, exact
                # seen-size signal (no footer walk)
                prune=seq >= self.seen_prune_min_rows,
                rnd=rnd,
            )
            fresh = (
                fresh.withColumn("host", host_udf("canon_url"))
                .withColumn(
                    "host_bucket", bucket_col(F.col("host"), N_HOST_BUCKETS).cast("int")
                )
                .withColumn("discovery_time", F.lit(rnd + 1))
                .withColumn("attempt", F.lit(0))
                .select([f.name for f in FRONTIER_SCHEMA.fields])
            )
            # frontier delta: O(round) rows appended, no table rewrite
            deltas = (
                self._as_delta(
                    fetched.select([f.name for f in FRONTIER_SCHEMA.fields]),
                    "del",
                    rnd,
                )
                .unionByName(self._as_delta(retry, "add", rnd))
                .unionByName(self._as_delta(fresh, "add", rnd))
            )

            # ---- run the writes CONCURRENTLY: four independent tables,
            # four independent Spark jobs — overlapping them collapses
            # the per-round fixed job-latency floor that capped N→4N
            # scaling efficiency (VERDICT/ADVICE r01). Ordering is free:
            # the frontier delta derives seen from seen_base ∪ terminal,
            # not from the in-flight log append.
            from concurrent.futures import ThreadPoolExecutor

            write_times: dict[str, float] = {}

            def _timed(name, fn):
                def run():
                    t = time.monotonic()
                    fn()
                    write_times[name] = round(time.monotonic() - t, 2)

                return run

            # log + errors are hive-partitioned by url_bucket (they are
            # what the seen set derives from). On bulk rounds a
            # pre-write repartition confines each bucket to one task so
            # a round adds at most N_URL_BUCKETS files, not tasks ×
            # buckets; on tiny (startup/drain) rounds a narrow
            # coalesce(1) bounds files the same way WITHOUT the extra
            # shuffle stage — part of the fixed per-round latency the
            # N→4N e2e efficiency pays for (VERDICT r02 #5)
            def _bucket_layout(df, n_rows):
                if n_rows <= 5000:
                    return df.coalesce(1)
                return df.repartition(F.col("url_bucket"))

            jobs = [
                _timed(
                    "log",
                    lambda: self.t_log.append(
                        _bucket_layout(log, n_sched),
                        partition_by=["url_bucket"],
                    ),
                )
            ]
            if n_exhausted > 0:
                errors = fetched.where(is_transient & exhausted).select(
                    "canon_url",
                    F.lit(rnd).cast("int").alias("round"),
                    bucket_col(F.col("canon_url"), N_URL_BUCKETS)
                    .cast("int")
                    .alias("url_bucket"),
                )
                jobs.append(
                    _timed(
                        "errors",
                        lambda: self.t_errors.append(
                            _bucket_layout(errors, n_exhausted),
                            partition_by=["url_bucket"],
                        ),
                    )
                )
            if self.decode_images and counts.get(STATUS_OK, 0) > 0 and pbuckets:
                jobs.append(
                    _timed(
                        "images",
                        lambda: self.t_images.append(
                            self._images_stage(
                                fetched, rnd, pbuckets,
                                n_ok=counts.get(STATUS_OK, 0),
                            )
                        ),
                    )
                )
            # deltas are written UNPARTITIONED: they are O(round) rows
            # and live at most compact_every rounds — hive-bucketing
            # them would write tasks×64 tiny files per round. Only the
            # compacted base carries the host_bucket layout.
            # frontier compaction depends only on the delta append —
            # chain it inside that job so it overlaps the log/images
            # writes instead of adding a serial post-writes wave
            # (VERDICT r02 #5).
            # DRAIN REGIME (< 5k frontier rows — same gate as
            # _maybe_compact's every-round rewrite): the delta append +
            # compaction pair is TWO tiny Spark jobs where one
            # suffices. Write the next resolved frontier directly as
            # one compacted snapshot: remaining = view − scheduled,
            # retry re-adds win over fresh links (same round, attempt
            # desc), pending rows win over fresh re-adds (earlier add)
            # — exactly frontier_view's first-add-wins order, so the
            # stored state is byte-equal to resolve(view ∪ deltas)
            # (equivalence suite covers this path via the drain rounds
            # every fixture crawl ends with). Bulk rounds keep the
            # O(delta) append — the direct rewrite is O(frontier).
            if frontier_rows < 5_000:
                remaining = frontier.join(
                    fetched.select("canon_url"), "canon_url", "left_anti"
                )
                keep = remaining.unionByName(retry)
                next_frontier = keep.unionByName(
                    fresh.join(keep.select("canon_url"), "canon_url", "left_anti")
                )

                def frontier_job():
                    self.t_frontier.overwrite(
                        self._as_delta(next_frontier, "add", -1),
                        partition_by=["host_bucket"],
                    )

            else:

                def frontier_job():
                    self.t_frontier.append(deltas)
                    self._maybe_compact(frontier_rows)

            jobs.append(_timed("frontier", frontier_job))
            if bloom_delta_job is not None:
                jobs.append(_timed("bloom", bloom_delta_job))
            with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
                for fut in [ex.submit(j) for j in jobs]:
                    fut.result()
            phases["write_jobs"] = write_times
            seq = seq_new
            _mark("writes")

            # ---- metrics (driver-side lineage JSONL; timings are not
            # order-observable, so the determinism ban doesn't apply) ----
            wall = time.monotonic() - t0
            with open(os.path.join(self.work_dir, "metrics.jsonl"), "a") as f:
                f.write(
                    json.dumps(
                        {
                            "round": rnd,
                            "scheduled": n_sched,
                            "ok": counts.get(STATUS_OK, 0),
                            "missing": counts.get(STATUS_MISSING, 0),
                            "transient": counts.get(STATUS_TRANSIENT, 0),
                            "wall_ms": round(wall * 1000, 2),
                            "seq_end": seq,
                            "phases": phases,
                        }
                    )
                    + "\n"
                )
            for df_p in self._round_persists:
                df_p.unpersist()
            self._round_persists.clear()
            self._commit_state(rnd + 1, seq)
            # post-commit storage maintenance (expire + log compaction)
            # — everything it rewrites is already crash-covered
            self._maintain_log_tables()
            totals["fetched"] += n_sched
            totals["rounds"] += 1
            rnd += 1
        for df_p in self._round_persists:  # break path (empty frontier)
            df_p.unpersist()
        self._round_persists.clear()
        totals["log_rows"] = seq
        return totals
