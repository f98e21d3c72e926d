"""Structured Streaming veneer over the engine's tables.

The reference is batch-sequential; its loops define stateful semantics
(SURVEY §2.11) that the engine reproduces round-synchronously for
determinism. Streaming enters in two places where order is NOT
observable, so micro-batching is free:

- ``tail_crawl_log`` — a live tailer over the crawl_log table's data
  directories (metrics/monitoring): every committed round's parquet
  files become a micro-batch. This is the streaming analog of the
  reference's per-run log rows (handlers/db.py:205-209, K7).
- ``windowed_event_metrics`` — watermarked tumbling-window aggregation
  over an event stream (late data tolerated up to the watermark), the
  Structured-Streaming twin of the batch ``t2_window_agg`` query.
- ``stateful_host_counters`` — applyInPandasWithState running per-host
  fetch counters across micro-batches: the streaming form of the
  reference's run counters (handlers/scrapers.py:100,144, A7).

All three are smoke-tested with the memory sink +
``processAllAvailable()`` (no always-on cluster in the sandbox).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from scraper_spark.plans.frontier import LOG_SCHEMA


def tail_crawl_log(spark: SparkSession, work_dir: str) -> DataFrame:
    """Streaming source over committed crawl_log snapshots.

    New snapshot dirs appear atomically (TableIO manifest commit), so a
    file-based stream sees only whole rounds. maxFilesPerTrigger keeps
    micro-batches bounded when catching up. recursiveFileLookup
    descends the hive ``url_bucket=N`` layout but deliberately skips
    partition inference, so the tailed ``url_bucket`` column is null —
    the monitoring consumers here key on round/status/seq only; a
    consumer needing the bucket recomputes it from canon_url
    (one md5, the same expression the writer used)."""
    path = os.path.join(work_dir, "crawl_log", "data")
    return (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def round_metrics_stream(spark: SparkSession, work_dir: str) -> DataFrame:
    """Per-round live metrics from the log tail: fetch counts by status."""
    return (
        tail_crawl_log(spark, work_dir)
        .groupBy("round", "status")
        .agg(F.count("*").alias("n"), F.max("seq").alias("max_seq"))
    )


def windowed_event_metrics(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums over a (streaming) event
    frame with an event-time ``ts`` column."""
    return (
        events.withColumn("ts_t", F.col("ts").cast("timestamp"))
        .withWatermark("ts_t", watermark)
        .groupBy(F.window("ts_t", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_COUNTER_OUT = "host string, total_fetched long, batches int"
_COUNTER_STATE = "total long, batches int"


def _update_host_counter(key, pdfs, state: GroupState):
    total, batches = state.get if state.exists else (0, 0)
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    total += n
    batches += 1
    state.update((total, batches))
    yield pd.DataFrame(
        {"host": [key[0]], "total_fetched": [total], "batches": [batches]}
    )


def stateful_host_counters(log_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: cumulative per-host fetch
    counters maintained in the state store across micro-batches."""
    return (
        log_stream.groupBy("host")
        .applyInPandasWithState(
            _update_host_counter,
            outputStructType=_COUNTER_OUT,
            stateStructType=_COUNTER_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming frame to completion against the memory sink
    (test harness; production would use a real sink + trigger)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
