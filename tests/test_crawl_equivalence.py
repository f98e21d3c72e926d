"""Golden end-to-end: Spark engine ≡ oracle crawler (SURVEY §5.2 item 3),
kill/resume byte-identity (item 5), hash parity, image fidelity (item 4).

These are the north-rule gates: exact crawl order, exact URL-seen set,
byte-identical resume, PSNR ≥ 40 dB + caption equality on every stored
image row.
"""

import os

import numpy as np
import pandas as pd
import pytest

from scraper_spark.functions import imagecodec as ic
from scraper_spark.plans.frontier import CrawlEngine
from scraper_spark.plans.oracle import crawl as oracle_crawl

LOG_COLS = [
    "seq", "round", "canon_url", "host", "host_bucket",
    "depth", "discovery_time", "status",
]


def _engine_log(eng, spark) -> pd.DataFrame:
    pdf = eng.t_log.read(spark).toPandas().sort_values("seq").reset_index(drop=True)
    return pdf[LOG_COLS].astype(
        {c: "int64" for c in LOG_COLS if c not in ("canon_url", "host")}
    )


@pytest.fixture(scope="module")
def crawl_pair(spark, fixture_dir, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("crawl_work"))
    # bloom_min_rows=0 forces the Bloom prefilter path even on the tiny
    # test corpus (production default defers it to large seen sets)
    eng = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0)
    totals = eng.run()
    ora = oracle_crawl(fixture_dir)
    return eng, ora, totals


def test_crawl_log_exact_match(spark, crawl_pair):
    eng, ora, _ = crawl_pair
    elog = _engine_log(eng, spark)
    olog = ora.log.astype(elog.dtypes.to_dict())
    assert len(elog) == len(olog)
    pd.testing.assert_frame_equal(elog, olog)


def test_url_seen_exact_match(spark, crawl_pair):
    eng, ora, _ = crawl_pair
    eseen = set(eng.seen_df().toPandas()["canon_url"])
    assert eseen == ora.seen


def test_errors_match(spark, crawl_pair):
    eng, ora, _ = crawl_pair
    try:
        eerr = set(eng.t_errors.read(spark).toPandas()["canon_url"])
    except ValueError:
        eerr = set()
    assert eerr == set(ora.errors)


def test_image_rows_match_oracle_and_fidelity(spark, fixture_dir, crawl_pair):
    eng, ora, _ = crawl_pair
    imgs = eng.t_images.read(spark).toPandas()
    # set equivalence with the oracle's harvested (image_id, canon_url)
    assert set(zip(imgs.image_id, imgs.canon_url)) == set(
        zip(ora.images.image_id, ora.images.canon_url)
    )
    # input_hint invariants vs the source corpus: caption equality,
    # decoded-pixel fidelity (bit-exact png / PSNR ≥ 40 dB lossy)
    src = pd.read_parquet(os.path.join(fixture_dir, "image_captions.parquet"))
    src = src.set_index("image_id")
    for row in imgs.itertuples(index=False):
        s = src.loc[row.image_id]
        assert row.caption == s["caption"]
        dec = ic.decode_image(bytes(row.bytes))
        sdec = ic.decode_image(bytes(s["bytes"]))
        if s["fmt"] == "png":
            assert np.array_equal(dec, sdec)
        else:
            assert ic.psnr(dec, sdec) == np.inf  # same stored bytes decode equal
        assert row.phash == s["phash"]  # engine recomputed phash from bytes
        assert (row.h, row.w) == dec.shape[:2]


def test_resume_byte_identical(spark, fixture_dir, tmp_path_factory, crawl_pair):
    """Kill after a round-k commit, resume, require identical log+seen."""
    eng_full, _, totals = crawl_pair
    work2 = str(tmp_path_factory.mktemp("crawl_resume"))
    eng = CrawlEngine(spark, fixture_dir, work2, bloom_min_rows=0)
    k = max(1, totals["rounds"] // 3)
    eng.run(max_rounds=k)  # "killed" after k committed rounds
    eng2 = CrawlEngine(spark, fixture_dir, work2, bloom_min_rows=0)
    eng2.run()
    a = _engine_log(eng_full, spark)
    b = _engine_log(eng2, spark)
    pd.testing.assert_frame_equal(a, b)
    sa = set(eng_full.seen_df().toPandas()["canon_url"])
    sb = set(eng2.seen_df().toPandas()["canon_url"])
    assert sa == sb


def test_resume_rolls_back_torn_round(
    spark, fixture_dir, tmp_path_factory, crawl_pair
):
    """Crash MID-round: the concurrent write pool committed some table
    snapshots, but the crash landed before ``state.json`` advanced.
    ``_resume`` must roll every table back to the last committed round
    boundary so the re-run is byte-identical to an uninterrupted one."""
    from scraper_spark.plans.frontier import FRONTIER_DELTA_SCHEMA, LOG_SCHEMA

    eng_full, _, totals = crawl_pair
    work = str(tmp_path_factory.mktemp("crawl_torn"))
    eng = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0)
    k = max(1, totals["rounds"] // 3)
    eng.run(max_rounds=k)
    # torn round k+1: log + frontier-delta appends landed, the other
    # writes and the state commit did not (rows copied from round k —
    # content is irrelevant, the snapshots just must be newer than the
    # committed ids)
    log_df = eng.t_log.read(spark, schema=LOG_SCHEMA)
    eng.t_log.append(log_df.limit(7), partition_by=["url_bucket"])
    fr = eng.t_frontier.read(spark, schema=FRONTIER_DELTA_SCHEMA)
    eng.t_frontier.append(fr.limit(3))
    eng2 = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0)
    eng2.run()
    pd.testing.assert_frame_equal(
        _engine_log(eng_full, spark), _engine_log(eng2, spark)
    )
    assert set(eng2.seen_df().toPandas()["canon_url"]) == set(
        eng_full.seen_df().toPandas()["canon_url"]
    )


def test_no_bloom_same_result(spark, fixture_dir, tmp_path_factory, crawl_pair):
    """Bloom is a prefilter only — disabling it must not change anything."""
    eng_full, _, _ = crawl_pair
    work = str(tmp_path_factory.mktemp("crawl_nobloom"))
    eng = CrawlEngine(spark, fixture_dir, work, use_bloom=False, decode_images=False)
    eng.run()
    pd.testing.assert_frame_equal(_engine_log(eng_full, spark), _engine_log(eng, spark))


def test_scale_paths_invariant(spark, fixture_dir, tmp_path_factory, crawl_pair):
    """One crawl with every scale-path knob forced to its large-corpus
    setting — images_broadcast_max=0 (shuffle-join payload path, the
    plan a 10^6-row round takes), compact_every=2 (aggressive
    merge-on-read frontier compaction) and tiny_schedule_max=0 (the
    DISTRIBUTED salted-window scheduling path on every round, never
    the driver-side spec kernel) — must be output-identical to the
    default run: physical layout, join strategy and schedule execution
    site are invisible."""
    eng_full, _, _ = crawl_pair
    work = str(tmp_path_factory.mktemp("crawl_scalepaths"))
    eng = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0,
                      images_broadcast_max=0, compact_every=2,
                      tiny_schedule_max=0)
    eng.run()
    pd.testing.assert_frame_equal(
        _engine_log(eng_full, spark), _engine_log(eng, spark)
    )
    a = eng_full.t_images.read(spark).toPandas()
    b = eng.t_images.read(spark).toPandas()
    key = ["image_id", "canon_url"]
    assert set(map(tuple, a[key].values)) == set(map(tuple, b[key].values))
    am = a.sort_values(key).reset_index(drop=True)
    bm = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        am[["image_id", "w", "h", "phash", "caption", "round"]],
        bm[["image_id", "w", "h", "phash", "caption", "round"]],
    )


def test_seen_bucket_prune_invariant(spark, fixture_dir, tmp_path_factory, crawl_pair):
    """seen_prune_min_rows=0 forces the bucket-local dedup path every
    round (production defers it to big seen sets): output must be
    byte-identical, and the pruned seen read must show static partition
    pruning on url_bucket — the scan opens only touched buckets."""
    import contextlib
    import io

    eng_full, _, _ = crawl_pair
    work = str(tmp_path_factory.mktemp("crawl_prune"))
    eng = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0,
                      seen_prune_min_rows=0)
    eng.run()
    pd.testing.assert_frame_equal(_engine_log(eng_full, spark), _engine_log(eng, spark))
    assert set(eng.seen_df().toPandas()["canon_url"]) == set(
        eng_full.seen_df().toPandas()["canon_url"]
    )
    # the pruned derivation opens ONLY the touched url buckets: TableIO
    # prunes leaf dirs manifest-side (Iceberg-manifest analog), so the
    # scan's file list — stronger than a PartitionFilters string — must
    # contain no other bucket
    pruned = eng.seen_df(buckets={0, 1})
    files = pruned.inputFiles()
    assert files, "pruned seen read lists no files"
    assert all("url_bucket=0/" in f or "url_bucket=1/" in f for f in files), files
    full_files = eng.seen_df().inputFiles()
    assert len(files) < len(full_files)


def test_bloom_join_probe_same_result(spark, fixture_dir, tmp_path_factory, crawl_pair):
    """bloom_probe_mode='join' (seg-keyed cogroup probe, Bloom bits
    never on the driver — the beyond-broadcast shape) must be
    output-identical to the default broadcast probe, and its state must
    live in the bloom table, not in driver memory."""
    eng_full, _, _ = crawl_pair
    work = str(tmp_path_factory.mktemp("crawl_bloomjoin"))
    eng = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0,
                      bloom_probe_mode="join")
    eng.run()
    pd.testing.assert_frame_equal(_engine_log(eng_full, spark), _engine_log(eng, spark))
    assert eng._bloom_segments == {}  # bits never held on the driver
    assert eng.t_bloom.current_snapshot_id() is not None
    # the table state round-trips: distributed rows OR-merge to the
    # same filter the broadcast engine accumulated
    from scraper_spark.plans import seen as bloom

    tbl = bloom.merge_segment_frames([eng.t_bloom.read(spark).toPandas()])
    ref = eng_full._bloom_segments
    assert set(tbl) == set(ref)
    for seg in ref:
        assert (tbl[seg] == ref[seg]).all()


def test_cuckoo_filter_same_result(spark, fixture_dir, tmp_path_factory, crawl_pair):
    """seen_filter='cuckoo' (partial-key cuckoo tables instead of Bloom
    bit segments — the north rule's named alternative) must be
    output-identical to the default: either structure only prefilters
    the exact anti-join. Also checks the filter state round-trips
    through its table (kind='table'/'delta' rows) with full membership
    and that a resumed engine rebuilds it."""
    eng_full, _, _ = crawl_pair
    work = str(tmp_path_factory.mktemp("crawl_cuckoo"))
    eng = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0,
                      seen_filter="cuckoo")
    eng.run()
    pd.testing.assert_frame_equal(_engine_log(eng_full, spark), _engine_log(eng, spark))
    assert eng.bloom_probe_mode == "broadcast"
    assert eng._bloom_segments, "cuckoo segments never activated"
    seen_urls = eng.seen_df().toPandas()["canon_url"]
    from scraper_spark.plans import cuckoo as C

    # live driver state: every seen url must read MAYBE (no-FN contract)
    assert C.probe(seen_urls, eng._bloom_segments).all()
    # cold resume rebuilds the filter from the committed table
    eng2 = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0,
                       seen_filter="cuckoo")
    eng2.run()  # finished crawl → no-op resume
    assert C.probe(seen_urls, eng2._bloom_segments).all()


def test_cuckoo_join_probe_same_result(spark, fixture_dir, tmp_path_factory, crawl_pair):
    """seen_filter='cuckoo' + bloom_probe_mode='join': the seg-keyed
    cogroup probe merges serialized tables + raw-hash delta rows inside
    the per-segment Arrow group, compaction folds deltas distributed —
    NO cuckoo state on the driver at any point (the shape that survives
    ~2.2 bytes/url at 10^10 urls). Output must be identical to the
    default broadcast-Bloom run."""
    eng_full, _, _ = crawl_pair
    work = str(tmp_path_factory.mktemp("crawl_cuckoojoin"))
    # compact_every=3 forces at least one join-mode cuckoo compaction
    # (the distributed _merge_cuckoo_state kernel) mid-crawl
    eng = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0,
                      seen_filter="cuckoo", bloom_probe_mode="join",
                      compact_every=3)
    eng.run()
    pd.testing.assert_frame_equal(_engine_log(eng_full, spark), _engine_log(eng, spark))
    assert eng.bloom_probe_mode == "join"
    assert eng._bloom_segments == {}  # state never held on the driver
    assert eng.t_bloom.current_snapshot_id() is not None
    from scraper_spark.plans import cuckoo as C

    state = eng.t_bloom.read(spark).toPandas()
    assert "table" in set(state["kind"])  # compaction folded delta rows
    # state rows merge to a filter with full membership over the final
    # seen set (no-false-negative contract)
    segs = C.segments_from_state_rows(state)
    seen_urls = eng.seen_df().toPandas()["canon_url"]
    assert C.probe(seen_urls, segs).all()


def test_resume_probe_mode_switch_ok(spark, fixture_dir, tmp_path_factory, crawl_pair):
    """Broadcast and join probe modes share the filter-table format, so
    resuming a run under the OTHER mode is legal (the state.json
    comment's claim, pinned): kill a broadcast-mode crawl mid-run,
    resume it in join mode, and the final log must be byte-equal to an
    uninterrupted run."""
    eng_full, _, totals = crawl_pair
    work = str(tmp_path_factory.mktemp("crawl_modeswitch"))
    eng = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0,
                      bloom_probe_mode="broadcast")
    k = max(1, totals["rounds"] // 2)
    eng.run(max_rounds=k)
    eng2 = CrawlEngine(spark, fixture_dir, work, bloom_min_rows=0,
                       bloom_probe_mode="join")
    eng2.run()
    pd.testing.assert_frame_equal(
        _engine_log(eng_full, spark), _engine_log(eng2, spark)
    )
    assert eng2._bloom_segments == {}  # join mode held nothing


def test_resume_seen_filter_mismatch_fails_fast(spark, fixture_dir, crawl_pair):
    """Resuming a work dir with a different seen_filter than it was
    written with must fail with an actionable error, not a raw
    KeyError from parsing the other structure's table schema
    (ADVICE r03)."""
    eng_full, _, _ = crawl_pair
    eng = CrawlEngine(spark, fixture_dir, eng_full.work_dir,
                      bloom_min_rows=0, seen_filter="cuckoo")
    with pytest.raises(ValueError, match="seen_filter"):
        eng.run(max_rounds=1)


@pytest.fixture(scope="module")
def ttl_fixture_dir(tmp_path_factory):
    """Small corpus with the re-crawl TTL ON (recrawl_after_rounds=3):
    terminal fetches expire after 3 rounds, so cross-links on pages
    fetched later genuinely re-enqueue them mid-crawl."""
    from scraper_spark.sources.fixtures import generate

    d = str(tmp_path_factory.mktemp("ttl_fixture"))
    generate(d, n_hosts=6, n_urls=110, default_tokens=4, hot_tokens=2,
             image_rate=0.15, recrawl_after_rounds=3)
    return d


@pytest.fixture(scope="module")
def ttl_oracle(ttl_fixture_dir):
    return oracle_crawl(ttl_fixture_dir, max_rounds=14)


@pytest.mark.parametrize(
    "cfg",
    [
        dict(seen_filter="cuckoo", bloom_probe_mode="broadcast"),
        dict(seen_filter="cuckoo", bloom_probe_mode="join"),
        dict(seen_filter="bloom"),
        # TTL across BOTH compaction boundaries: seen_df derives from
        # the crawl log that log compaction physically rewrites, and
        # join-mode TTL expiry appends kind='del' rows that cuckoo
        # compaction sweeps — aggressive windows force both to fire
        # mid-crawl, pinning the full deletion+rewrite interplay the
        # default-window configs above never cross.
        dict(seen_filter="cuckoo", bloom_probe_mode="join",
             log_compact_every=4, compact_every=4),
    ],
    ids=["cuckoo-broadcast", "cuckoo-join", "bloom", "cuckoo-join-compacting"],
)
def test_recrawl_ttl_equivalence(
    spark, ttl_fixture_dir, tmp_path_factory, ttl_oracle, cfg
):
    """Re-crawl TTL (spec.py): engine ≡ oracle with expiry on, in both
    cuckoo probe modes (the distributed kind='del' deletion path doing
    what it exists for) and with the non-deletable Bloom filter (which
    must stay a harmless superset). Exact log + window-filtered seen +
    the policy provably ENGAGED (some url terminally fetched twice)."""
    ora = ttl_oracle
    work = str(tmp_path_factory.mktemp("crawl_ttl"))
    eng = CrawlEngine(spark, ttl_fixture_dir, work, bloom_min_rows=0,
                      decode_images=False, **cfg)
    totals = eng.run(max_rounds=14)
    elog = _engine_log(eng, spark)
    olog = ora.log.astype(elog.dtypes.to_dict())
    pd.testing.assert_frame_equal(elog, olog)
    # the TTL actually fired: at least one url has >= 2 terminal rows
    term = elog[elog.status != 503]
    refetched = term.groupby("canon_url").size()
    assert (refetched >= 2).any(), "fixture produced no re-crawls"
    # final seen under the TTL window at the exit round
    assert totals["final_round"] == ora.final_round
    eseen = set(
        eng.seen_df(rnd=totals["final_round"]).toPandas()["canon_url"]
    )
    assert eseen == ora.seen
    if cfg["seen_filter"] == "cuckoo" and cfg.get("bloom_probe_mode") == "broadcast":
        # the deletes really removed expired urls from the driver-held
        # filter: urls whose last terminal fetch fell out of the window
        # and were never refetched must mostly probe definitely-unseen
        # (individual FPs are possible, all-True would mean no deletes)
        from scraper_spark.plans import cuckoo as C

        last_term = term.groupby("canon_url")["round"].max()
        expired = last_term[last_term + 3 <= totals["final_round"]]
        if len(expired):
            hits = C.probe(
                pd.Series(expired.index), eng._bloom_segments
            )
            assert not hits.all(), "expired urls never left the filter"


def test_recrawl_ttl_resume_byte_identical(
    spark, ttl_fixture_dir, tmp_path_factory, ttl_oracle
):
    """Kill/resume mid-crawl with the TTL ON, after expiry has begun
    (ttl=3, killed after round 7): the resumed engine must reconstruct
    the windowed seen state — derived log filter + durable cuckoo
    kind='del' rows + the activation round in state.json — and finish
    byte-identical to the oracle's uninterrupted 14-round crawl. Uses
    join probe mode so the filter itself is rebuilt from the durable
    segment rows the deletes were appended to."""
    ora = ttl_oracle
    work = str(tmp_path_factory.mktemp("crawl_ttl_resume"))
    cfg = dict(bloom_min_rows=0, decode_images=False,
               seen_filter="cuckoo", bloom_probe_mode="join")
    CrawlEngine(spark, ttl_fixture_dir, work, **cfg).run(max_rounds=7)
    eng2 = CrawlEngine(spark, ttl_fixture_dir, work, **cfg)
    totals = eng2.run(max_rounds=7)  # rounds 8..14 (additive cap)
    elog = _engine_log(eng2, spark)
    pd.testing.assert_frame_equal(elog, ora.log.astype(elog.dtypes.to_dict()))
    assert totals["final_round"] == ora.final_round
    eseen = set(
        eng2.seen_df(rnd=totals["final_round"]).toPandas()["canon_url"]
    )
    assert eseen == ora.seen


def test_log_compaction_bounds_files_and_resumes(
    spark, tmp_path_factory
):
    """crawl_log/fetch_errors physical compaction (VERDICT r04 #2) over
    a ≥32-round crawl with an aggressive window (log_compact_every=4):
    the live snapshot-entry count stays bounded by the window (not
    O(rounds)), expire_snapshots keeps disk in lockstep with the
    manifest, output still matches the oracle exactly, and a kill +
    resume ACROSS a compaction boundary is byte-identical."""
    import os

    from scraper_spark.sources.fixtures import generate

    fx = str(tmp_path_factory.mktemp("compact_fixture"))
    # tokens=1 stretches the crawl past 32 rounds on a small corpus
    generate(fx, n_hosts=4, n_urls=150, default_tokens=1, hot_tokens=1,
             image_rate=0.05, pagination_fanout=2)
    ora = oracle_crawl(fx)
    assert ora.rounds >= 32, f"fixture too short: {ora.rounds} rounds"

    work = str(tmp_path_factory.mktemp("crawl_compact"))
    eng = CrawlEngine(spark, fx, work, bloom_min_rows=0,
                      decode_images=False, log_compact_every=4)
    totals = eng.run()
    elog = _engine_log(eng, spark)
    olog = ora.log.astype(elog.dtypes.to_dict())
    pd.testing.assert_frame_equal(elog, olog)

    # file/entry growth is bounded by the window, not the round count:
    # live view = base(≤1) + pile(≤1) + ≤window uncompacted appends
    live = eng.t_log._entries_as_of(None)
    assert len(live) <= 4 + 2, [s["op"] for s in live]
    assert totals["rounds"] >= 32
    # expire kept disk in lockstep: on-disk snapshot dirs ≈ manifest
    # entries (+1 slack: the last compaction may not be state-covered)
    on_disk = os.listdir(os.path.join(eng.t_log.root, "data"))
    assert len(on_disk) <= len(eng.t_log.snapshots()) + 1

    # kill after a mid-crawl commit (past ≥2 compaction windows), then
    # resume to completion — byte-identical across the boundary
    work2 = str(tmp_path_factory.mktemp("crawl_compact_resume"))
    eng2 = CrawlEngine(spark, fx, work2, bloom_min_rows=0,
                       decode_images=False, log_compact_every=4)
    eng2.run(max_rounds=11)
    eng3 = CrawlEngine(spark, fx, work2, bloom_min_rows=0,
                       decode_images=False, log_compact_every=4)
    eng3.run()
    pd.testing.assert_frame_equal(elog, _engine_log(eng3, spark))
    assert set(eng3.seen_df().toPandas()["canon_url"]) == ora.seen


def test_robots_txt_equivalence(spark, tmp_path_factory):
    """Real robots.txt bodies (functions/robots.py) feeding the dims:
    Allow-over-Disallow REP precedence + crawl-delay → token budget.
    tiny_schedule_max=0 forces the DISTRIBUTED schedule path, so this
    pins the column-side REP expression in frontier._schedule against
    the spec kernel the oracle runs — and proves the rules bind (only
    the allowed subtree of a disallowed prefix is fetched)."""
    import json

    from scraper_spark.sources.fixtures import generate

    fx = str(tmp_path_factory.mktemp("robots_fixture"))
    generate(fx, n_hosts=6, n_urls=110, default_tokens=4, hot_tokens=2,
             image_rate=0.05)
    polp = os.path.join(fx, "politeness.json")
    with open(polp) as f:
        pol = json.load(f)
    pol["user_agent"] = "scraper-spark"
    pol["round_seconds"] = 10
    pol["robots_txt"] = {
        # h2: whole /d subtree disallowed EXCEPT /d/1 (REP longest-match
        # + allow), via the agent-specific group; 2s delay → 5 tokens
        "h2.example": (
            "User-agent: *\nDisallow: /\n\n"
            "User-agent: scraper-spark\n"
            "Disallow: /d\nAllow: /d/1\nCrawl-delay: 2\n"
        ),
        # h3: crawl-delay only (7s at 10s rounds → 1 token)
        "h3.example": "User-agent: *\nCrawl-delay: 7\n",
    }
    with open(polp, "w") as f:
        json.dump(pol, f)

    ora = oracle_crawl(fx)
    work = str(tmp_path_factory.mktemp("crawl_robots"))
    eng = CrawlEngine(spark, fx, work, bloom_min_rows=0,
                      decode_images=False, tiny_schedule_max=0)
    eng.run()
    elog = _engine_log(eng, spark)
    olog = ora.log.astype(elog.dtypes.to_dict())
    pd.testing.assert_frame_equal(elog, olog)
    assert set(eng.seen_df().toPandas()["canon_url"]) == ora.seen
    # the rules actually bound: on h2 only /d/1* details were fetched
    h2 = elog[elog.host == "h2.example"]
    h2_paths = [u.split("h2.example", 1)[1] for u in h2.canon_url]
    d_paths = [p for p in h2_paths if p.startswith("/d/")]
    assert d_paths and all(p.startswith("/d/1") for p in d_paths), d_paths
    # list pages on h2 are blocked by the Disallow:/d? no — /list is
    # outside /d; blocked only via the general-agent group, which the
    # specific group OVERRIDES entirely (group selection, not merge)
    assert any(p.startswith("/list") for p in h2_paths)


def test_retry_exhaustion_path(spark, tmp_path_factory):
    """max_attempts=1 makes every 503 exhaust immediately, so the
    fetch_errors table and the errors-union-seen derivation are
    exercised non-vacuously (with the default max_attempts=3 the
    transient model retries every 503 into success and the exhaustion
    branch never fires — ADVICE r01)."""
    from scraper_spark.sources.fixtures import generate

    fx = str(tmp_path_factory.mktemp("exhaust_fx"))
    generate(fx, n_hosts=4, n_urls=120, default_tokens=8, hot_tokens=4,
             max_attempts=1)
    work = str(tmp_path_factory.mktemp("exhaust_work"))
    eng = CrawlEngine(spark, fx, work, decode_images=False, bloom_min_rows=0)
    eng.run()
    ora = oracle_crawl(fx)
    assert len(ora.errors) > 0, "fixture produced no exhausted 503s"
    eerr = set(eng.t_errors.read(spark).toPandas()["canon_url"])
    assert eerr == set(ora.errors)
    # exhausted urls are SEEN (never re-enqueued) on both sides
    assert set(eng.seen_df().toPandas()["canon_url"]) == ora.seen
    pd.testing.assert_frame_equal(
        _engine_log(eng, spark), ora.log.astype(_engine_log(eng, spark).dtypes.to_dict())
    )


def test_frontier_resolution_first_add_wins(spark, fixture_dir, tmp_path_factory):
    """Unit-pin the merge-on-read resolution rule that lets the round
    loop skip the remaining/known anti-joins: per url, newest 'del'
    round wins, then the EARLIEST surviving 'add' (retry outranks a
    same-round fresh re-add) — so re-discovering a pending url is a
    no-op and first discovery keeps its (depth, discovery_time)."""
    import pandas as pd

    from scraper_spark.plans.frontier import FRONTIER_DELTA_SCHEMA

    eng = CrawlEngine(
        spark, fixture_dir, str(tmp_path_factory.mktemp("resolve_work"))
    )

    def rec(url, depth, disc, attempt, op, rnd):
        return (url, "h", 0, depth, disc, attempt, op, rnd)

    rows = [
        # u1: base add + later fresh re-add → base record wins
        rec("u1", 1, 0, 0, "add", -1),
        rec("u1", 5, 4, 0, "add", 3),
        # u2: add then del → gone
        rec("u2", 1, 1, 0, "add", 1),
        rec("u2", 1, 1, 0, "del", 4),
        # u3: del + same-round retry add → retry survives
        rec("u3", 1, 1, 0, "add", 1),
        rec("u3", 1, 1, 0, "del", 4),
        rec("u3", 1, 1, 1, "add", 4),
        # u4: retry at r4, fresh re-add at r6 → retry record wins
        rec("u4", 1, 1, 0, "add", 1),
        rec("u4", 1, 1, 0, "del", 4),
        rec("u4", 1, 1, 1, "add", 4),
        rec("u4", 7, 7, 0, "add", 6),
        # u5: plain pending url
        rec("u5", 2, 2, 0, "add", 2),
        # u6: retry and fresh re-add in the SAME round → retry
        # (attempt desc tie-break)
        rec("u6", 1, 1, 0, "add", 0),
        rec("u6", 1, 1, 0, "del", 2),
        rec("u6", 1, 1, 1, "add", 2),
        rec("u6", 3, 3, 0, "add", 2),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[f.name for f in FRONTIER_DELTA_SCHEMA.fields],
        ),
        FRONTIER_DELTA_SCHEMA,
    )
    eng.t_frontier.overwrite(df.limit(1))  # base snapshot (op marker)
    eng.t_frontier.append(df)  # delta snapshot → resolution path runs
    got = (
        eng.frontier_view()
        .toPandas()
        .drop_duplicates()
        .set_index("canon_url")
        .sort_index()
    )
    assert set(got.index) == {"u1", "u3", "u4", "u5", "u6"}
    assert (got.loc["u1"].depth, got.loc["u1"].discovery_time) == (1, 0)
    assert got.loc["u3"].attempt == 1
    assert (got.loc["u4"].attempt, got.loc["u4"].depth) == (1, 1)
    assert got.loc["u6"].attempt == 1


def test_hash_parity_python_spark_duckdb(spark):
    """md5-derived bucket/long identical across all three engines."""
    import duckdb

    from scraper_spark.functions import hashes as H
    from pyspark.sql import functions as F

    vals = ["http://a.example/x", "h0.example", "täst", ""]
    pdf = pd.DataFrame({"s": vals})
    sdf = spark.createDataFrame(pdf)
    dg = F.md5(F.col("s"))
    got_spark = [
        tuple(r)
        for r in sdf.select(
            H.md5_long_col(F.col("s")),
            H.bucket_col(F.col("s"), 64),
            H.hex_long_col(dg, 1, 15),
            H.hex_long_col(dg, 16, 13),
        ).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = con.sql(
        f"SELECT {H.md5_long_sql('s')}, {H.bucket_sql('s', 64)}, "
        f"{H.hex_long_sql('md5(s)', 1, 15)}, "
        f"{H.hex_long_sql('md5(s)', 16, 13)} FROM t"
    ).fetchall()
    import hashlib

    def hx(v):
        return hashlib.md5(v.encode()).hexdigest()

    got_py = [
        (
            H.md5_long(v),
            H.bucket(v, 64),
            H.hex_long(hx(v), 1, 15),
            H.hex_long(hx(v), 16, 13),
        )
        for v in vals
    ]
    assert got_spark == got_py
    assert [tuple(r) for r in got_duck] == got_py
