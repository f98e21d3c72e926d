"""Structured Streaming smoke tests (memory sink, processAllAvailable)."""

import os

import pytest

from pyspark.sql import functions as F

from scraper_spark.streaming import stream as ST

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def crawl_work(spark, fixture_dir, tmp_path_factory):
    from scraper_spark.plans.frontier import CrawlEngine

    work = str(tmp_path_factory.mktemp("stream_crawl"))
    CrawlEngine(spark, fixture_dir, work, decode_images=False).run()
    return work


def test_tail_crawl_log_sees_all_rounds(spark, crawl_work):
    from scraper_spark.plans.frontier import CrawlEngine

    from scraper_spark.sources.tableio import TableIO

    q = ST.run_to_memory(
        ST.round_metrics_stream(spark, crawl_work), "round_metrics"
    )
    try:
        got = spark.sql(
            "SELECT sum(n) AS total FROM round_metrics"
        ).collect()[0]["total"]
        # TableIO.read handles the hive-partitioned (url_bucket=N)
        # snapshot roots; a raw multi-root spark.read.parquet would
        # refuse with CONFLICTING_DIRECTORY_STRUCTURES
        batch = TableIO(os.path.join(crawl_work, "crawl_log")).read(spark).count()
        assert got == batch
    finally:
        q.stop()


def test_windowed_event_metrics_matches_batch(spark, tmp_path):
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    streamed = spark.readStream.schema(schema).parquet(str(src_dir))
    agg = ST.windowed_event_metrics(streamed)
    q = ST.run_to_memory(agg, "win_metrics", output_mode="append")
    try:
        got = spark.sql("SELECT sum(n) AS n FROM win_metrics").collect()[0]["n"]
        # append mode emits only windows older than the watermark; the
        # final (max-ts) window may be withheld → bound, not equality
        total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        assert got is not None and 0 < got <= total
    finally:
        q.stop()


def test_stateful_host_counters(spark, crawl_work):
    counters = ST.stateful_host_counters(ST.tail_crawl_log(spark, crawl_work))
    q = ST.run_to_memory(counters, "host_counters", output_mode="update")
    try:
        # last update per host must equal the batch per-host totals
        got = {
            r["host"]: r["total_fetched"]
            for r in spark.sql(
                """SELECT host, max(total_fetched) AS total_fetched
                   FROM host_counters GROUP BY host"""
            ).collect()
        }
        from scraper_spark.sources.tableio import TableIO

        batch = {
            r["host"]: r["n"]
            for r in TableIO(os.path.join(crawl_work, "crawl_log"))
            .read(spark)
            .groupBy("host")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == batch
    finally:
        q.stop()


def test_streaming_ingest_dedup(spark, tmp_path):
    """Dedup-at-ingest over three controlled micro-batches: exact-copy
    duplicates (signature-identical, jaccard_est 1.0 — deterministic)
    are rejected intra-batch (first-wins by doc_id) and against the
    growing stored index; every accepted doc becomes part of the corpus
    later batches dedup against. Expected accept set is hand-derived."""
    import time

    from scraper_spark.sources.tableio import TableIO

    def doc(i, text):
        return (i, text)

    def words(tag, n=12):
        return " ".join(f"{tag}w{j}" for j in range(n))

    b0 = [doc(i, words(f"b0d{i}")) for i in range(10)]          # all distinct
    b1 = [
        doc(10, words("b1d10")),
        doc(11, words("b1d11")),
        doc(12, words("b0d3")),   # == doc 3 (in corpus) -> reject
        doc(13, words("b1d13")),
        doc(14, words("b1d14")),
        doc(15, words("b1d14")),  # == doc 14 (same batch, higher id) -> reject
        doc(16, words("b1d16")),
        doc(17, words("b1d17")),
        doc(18, words("b1d18")),
        doc(19, words("b1d19")),
    ]
    b2 = [
        doc(20, words("b2d20")),
        doc(21, words("b0d3")),   # == doc 3 via rejected doc 12 -> reject
        doc(22, words("b1d14")),  # == doc 14 (accepted in batch 1) -> reject
        doc(23, words("b2d23")),
        doc(24, words("b2d24")),
    ]
    src = tmp_path / "docs_stream"
    src.mkdir()
    schema = "doc_id long, text string"
    now = time.time()
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, schema).toPandas().to_parquet(
            str(src / f"b{i}.parquet"), index=False
        )
        # file source orders micro-batches by mtime (latestFirst=false)
        os.utime(str(src / f"b{i}.parquet"), (now + 10 * i, now + 10 * i))
    streamed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    bands_t = TableIO(str(tmp_path / "bands"))
    sigs_t = TableIO(str(tmp_path / "sigs"))
    acc_t = TableIO(str(tmp_path / "accepted"))
    q = ST.streaming_ingest_dedup(
        streamed, bands_t, sigs_t, acc_t, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = acc_t.read(spark).toPandas().sort_values("doc_id")
    expected = sorted(
        list(range(10)) + [10, 11, 13, 14, 16, 17, 18, 19] + [20, 23, 24]
    )
    assert list(got.doc_id) == expected
    # batch tags survived: later batches really went through the
    # incremental path, and the index covers exactly the accepted docs
    assert set(got.batch_id) == {0, 1, 2}
    assert sigs_t.read(spark).count() == len(expected)
    from scraper_spark.operators.dedup import N_MINHASH, BAND_SIZE

    assert bands_t.read(spark).count() == len(expected) * (N_MINHASH // BAND_SIZE)


def test_streaming_image_ingest_dedup(spark, tmp_path):
    """Image dedup-at-ingest over three controlled micro-batches:
    near-dup phashes (Hamming ≤ 3 of an accepted image) are rejected
    intra-batch (drop the higher id) and against the growing stored
    band index; accepted images fold in with O(batch) work. Expected
    accept set is hand-derived from planted bit flips."""
    import time

    from scraper_spark.sources.tableio import TableIO

    def flip(ph, *bits):
        for b in bits:
            ph ^= 1 << b
        ph &= (1 << 64) - 1
        return ph - (1 << 64) if ph >= (1 << 63) else ph  # wrap to signed i64

    # one full byte per image: any two base hashes are hamming 16 apart
    base = [(i, flip(0xFF << (8 * i))) for i in range(8)]
    b0 = base                                        # all distinct (hamming >= 4 apart)
    b1 = [
        (10, flip(base[3][1], 2)),        # hamming 1 of corpus img 3 -> reject
        (11, (0x1111_2222_3333_4444)),    # fresh -> accept
        (12, flip(0x1111_2222_3333_4444, 5, 9)),  # hamming 2 of img 11 (same batch) -> reject
        (13, (0x0F0F_0F0F_0F0F_0F0F)),    # fresh -> accept
    ]
    b2 = [
        (20, flip(base[3][1], 2, 7, 11)), # hamming 3 of corpus img 3 -> reject
        (21, flip(0x0F0F_0F0F_0F0F_0F0F, 63)),  # hamming 1 of img 13 (accepted b1) -> reject
        (22, (0x7070_7070_0000_0001)),    # fresh -> accept
    ]
    src = tmp_path / "imgs_stream"
    src.mkdir()
    schema = "image_id long, phash long"
    now = time.time()
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, schema).toPandas().to_parquet(
            str(src / f"b{i}.parquet"), index=False
        )
        os.utime(str(src / f"b{i}.parquet"), (now + 10 * i, now + 10 * i))
    streamed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    bands_t = TableIO(str(tmp_path / "ph_bands"))
    acc_t = TableIO(str(tmp_path / "ph_accepted"))
    q = ST.streaming_image_ingest_dedup(
        streamed, bands_t, acc_t, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = acc_t.read(spark).toPandas().sort_values("image_id")
    expected = sorted([i for i, _ in base] + [11, 13] + [22])
    assert list(got.image_id) == expected
    assert set(got.batch_id) == {0, 1, 2}
    from scraper_spark.operators.phash_dedup import N_BANDS

    assert bands_t.read(spark).count() == len(expected) * N_BANDS


def test_tailer_exactly_once_across_compaction(spark, tmp_path):
    """Log maintenance must be invisible to the tailer: rows arrive
    exactly once from the append (s-prefix) snapshot that first carried
    them — compact_appends merging streamed rounds into a c-dir,
    expire_snapshots deleting the replaced append dirs, and later
    appends must neither re-deliver nor drop anything, while batch
    reads keep seeing the full table via the compact pile."""
    from scraper_spark.plans.frontier import LOG_SCHEMA
    from scraper_spark.sources.tableio import TableIO

    work = tmp_path / "w"
    t = TableIO(str(work / "crawl_log"))

    def rows(r, n=3):
        data = [
            (r * 100 + i, r, f"http://h{i}.example/{r}", f"h{i}.example",
             i, 0, r, 200, i)
            for i in range(n)
        ]
        return spark.createDataFrame(data, LOG_SCHEMA)

    for r in range(4):
        t.append(rows(r))
    q = ST.run_to_memory(
        ST.tail_crawl_log(spark, str(work)).select("seq"), "tail_x1",
        output_mode="append",
    )
    try:
        first = {r.seq for r in spark.sql("SELECT seq FROM tail_x1").collect()}
        assert first == {r * 100 + i for r in range(4) for i in range(3)}
        # maintenance: merge the four appends, expire the originals
        cid = t.compact_appends(spark)
        assert cid is not None
        t.expire_snapshots(cid)
        t.append(rows(4))
        q.processAllAvailable()
        got = [r.seq for r in spark.sql("SELECT seq FROM tail_x1").collect()]
        expected = sorted(r * 100 + i for r in range(5) for i in range(3))
        assert sorted(got) == expected          # nothing re-delivered
        assert len(got) == len(set(got))        # ...and nothing twice
    finally:
        q.stop()
    # batch readers still see everything (via the compact pile)
    assert t.read(spark).count() == 15


def test_round_metrics_exactly_once_dedups_torn_round_redelivery(spark, tmp_path):
    """tail_crawl_log is at-least-once across a torn-round resume: the
    rollback deletes a consumed append dir and the deterministic re-run
    re-appends bit-identical rows under fresh part filenames, which the
    file source delivers again. round_metrics_stream(exactly_once=True)
    dedups on the globally unique seq, so metrics cannot double-count
    the torn round."""
    from scraper_spark.plans.frontier import LOG_SCHEMA

    log_data = tmp_path / "w" / "crawl_log" / "data"

    def append_round0(tag):
        data = [
            (i, 0, f"http://h{i}.example/", f"h{i}.example", i, 0, 0, 200, i)
            for i in range(3)
        ]
        spark.createDataFrame(data, LOG_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(log_data / tag))

    append_round0("s000001")
    q = ST.run_to_memory(
        ST.round_metrics_stream(spark, str(tmp_path / "w"), exactly_once=True),
        "rm_eo",
    )
    try:
        assert [
            r.n for r in spark.sql("SELECT n FROM rm_eo WHERE status=200").collect()
        ] == [3]
        # torn-round re-delivery: same rows (same seq), new s-dir +
        # fresh part filenames — exactly what a resume re-run produces
        append_round0("s000002")
        q.processAllAvailable()
        assert [
            r.n for r in spark.sql("SELECT n FROM rm_eo WHERE status=200").collect()
        ] == [3]  # not 6
    finally:
        q.stop()
