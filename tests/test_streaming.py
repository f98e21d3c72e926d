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
