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
- ``streaming_ingest_dedup`` — dedup-at-ingest over a document stream:
  each micro-batch is near-dup-checked against the STORED MinHash/LSH
  index (batch-vs-corpus banded equi-join, scans pruned to the touched
  buckets), survivors are folded into the index with O(batch) work,
  and the index grows with the stream — the training-data pipeline
  shape where the corpus must never be re-indexed per arrival.
- ``streaming_image_ingest_dedup`` — the image twin: each micro-batch
  of (image_id, phash, ...) rows is Hamming-checked against the STORED
  pHash band index (operators/phash_dedup.py), survivors append + fold
  in with O(batch) work — dedup-at-ingest for the crawl's image stage.

All are smoke-tested with the memory sink / file-source micro-batches
+ ``processAllAvailable()`` (no always-on cluster in the sandbox).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from scraper_spark.plans.frontier import LOG_SCHEMA


def tail_crawl_log(spark: SparkSession, work_dir: str) -> DataFrame:
    """Streaming source over committed crawl_log APPEND snapshots.

    New snapshot dirs appear atomically (TableIO manifest commit), so a
    file-based stream sees only whole rounds. The path globs ``s*``
    dirs only — TableIO prefixes append dirs ``s``, compact piles ``c``
    and overwrites ``o`` — so log maintenance (compact_appends merging
    already-streamed rounds, or the size-parity promote-overwrite)
    rewrites rows WITHOUT the tailer re-delivering them: across log
    MAINTENANCE every row is delivered exactly once, from the append
    snapshot that first carried it. Across a torn-round crash-resume
    the tail is AT-LEAST-ONCE: a round's log append can be
    manifest-committed (and consumed by the tailer) before the round's
    state commit; the resume rollback then deletes that dir and the
    deterministic re-run re-appends bit-identical rows under fresh
    part filenames, which the file source delivers again. No
    writer-side scheme can close that window for an already-consumed
    batch, so the contract is the industry one: rows carry a globally
    unique deterministic ``seq``, and consumers needing exact counts
    dedup on it (``round_metrics_stream(exactly_once=True)``) or write
    idempotently. ``ignoreMissingFiles`` covers the complementary
    hazard — expire_snapshots physically dropping a compacted append
    dir mid-stream would otherwise fail the micro-batch. Caveat: a
    tailer that starts (or lags) more than a compaction window behind
    the crawl can therefore miss rows whose append dirs were already
    expired — historical rows belong to batch reads of the table
    (which see the compact piles); the tailer contract is the LIVE
    tail. maxFilesPerTrigger keeps micro-batches
    bounded when catching up. recursiveFileLookup descends the hive
    ``url_bucket=N`` layout but deliberately skips partition inference,
    so the tailed ``url_bucket`` column is null — the monitoring
    consumers here key on round/status/seq only; a consumer needing the
    bucket recomputes it from canon_url (one md5, the same expression
    the writer used)."""
    path = os.path.join(work_dir, "crawl_log", "data", "s*")
    return (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .option("recursiveFileLookup", "true")
        .option("ignoreMissingFiles", "true")
        .parquet(path)
    )


def round_metrics_stream(
    spark: SparkSession, work_dir: str, exactly_once: bool = False
) -> DataFrame:
    """Per-round live metrics from the log tail: fetch counts by status.

    ``exactly_once=True`` inserts a streaming dropDuplicates on ``seq``
    (globally unique + deterministic per log row) ahead of the
    aggregation, so the torn-round resume window — where
    :func:`tail_crawl_log` is at-least-once — cannot double-count a
    round. Costs one seq of streaming state per delivered row for the
    life of the query: fine for a monitoring tail restarted alongside
    the crawl (the usual deployment); an always-on tail over a
    10^10-row log should instead dedup in an idempotent sink."""
    tail = tail_crawl_log(spark, work_dir)
    if exactly_once:
        tail = tail.dropDuplicates(["seq"])
    return (
        tail.groupBy("round", "status")
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


def streaming_ingest_dedup(
    stream_docs: DataFrame,
    bands_table,
    sigs_table,
    accepted_table,
    checkpoint: str | None = None,
    min_jaccard: float | None = None,
):
    """Dedup-at-ingest: drive a streaming ``(doc_id, text, ...)`` frame
    through per-micro-batch near-dup rejection against the stored
    MinHash band/signature index, folding every ACCEPTED doc into the
    index so later batches dedup against earlier ones.

    Per micro-batch (foreachBatch — all inner ops are ordinary batch
    dataflow):

    1. intra-batch: ``lsh_candidate_pairs`` on the batch; any doc
       near-dup of a lower-id batch doc is dropped (greedy first-wins,
       the stream analog of the a5 batch rule);
    2. cross-corpus: ``lsh_dedup_table`` probes the stored index with
       one banded equi-join + one signature verify, both scans pruned
       to the buckets the batch touches — O(batch), never O(corpus);
    3. survivors append to ``accepted_table`` (tagged ``batch_id``) and
       ``minhash_index_append`` folds them into the index.

    First batch (no index yet) skips 2 and BUILDS the index. TableIO
    commits are atomic per table but the three writes are not one
    transaction: a crash between them can replay a batch on restart —
    exactly-once needs the sink to dedup on ``batch_id`` (the Iceberg
    deployment keys its overwrite-by-filter on it); the sandbox test
    drives a single run where replay cannot occur.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from scraper_spark.operators import dedup as D

    mj = D.MIN_JACCARD if min_jaccard is None else min_jaccard

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.persist()
        # the signature aggregate (explode+md5 — the dominant dedup
        # cost) is computed ONCE per micro-batch and shared by all
        # three consumers via their signatures= parameter: intra-batch
        # pairs, the cross-corpus probe, and the index fold
        sig = D.minhash_signatures(batch).persist()
        try:
            if batch.isEmpty():
                return
            intra = D.lsh_candidate_pairs(batch, min_jaccard=mj, signatures=sig)
            drop_intra = intra.select(F.col("doc_b").alias("doc_id")).distinct()
            survivors = batch.join(drop_intra, "doc_id", "left_anti")
            surv_sig = sig.join(survivors.select("doc_id"), "doc_id", "left_semi")
            if bands_table.exists():
                hits = D.lsh_dedup_table(
                    spark, bands_table, sigs_table, survivors,
                    min_jaccard=mj, signatures=surv_sig,
                )
                drop_corpus = hits.select(F.col("doc_b").alias("doc_id")).distinct()
                accepted = survivors.join(drop_corpus, "doc_id", "left_anti").persist()
                accepted_table.append(
                    accepted.withColumn("batch_id", F.lit(batch_id))
                )
                D.minhash_index_append(
                    accepted, bands_table, sigs_table,
                    signatures=sig.join(
                        accepted.select("doc_id"), "doc_id", "left_semi"
                    ),
                )
                accepted.unpersist()
            else:
                accepted = survivors.persist()
                accepted_table.append(
                    accepted.withColumn("batch_id", F.lit(batch_id))
                )
                D.minhash_build_index(
                    accepted, bands_table, sigs_table, signatures=surv_sig
                )
                accepted.unpersist()
        finally:
            D.release_signature_cache()
            sig.unpersist()
            batch.unpersist()

    writer = stream_docs.writeStream.foreachBatch(_process)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def streaming_image_ingest_dedup(
    stream_images: DataFrame,
    bands_table,
    accepted_table,
    checkpoint: str | None = None,
    max_hamming: int | None = None,
    id_col: str = "image_id",
    phash_col: str = "phash",
):
    """Image dedup-at-ingest: drive a streaming ``(image_id, phash,
    ...)`` frame through per-micro-batch near-dup rejection against the
    stored pHash band index, folding every ACCEPTED image in so later
    batches dedup against earlier ones — the image twin of
    :func:`streaming_ingest_dedup`, with the same per-batch dataflow:

    1. intra-batch: ``phash_near_dup_pairs`` on the batch; any image
       within Hamming ≤ ``max_hamming`` of a lower-id batch image is
       dropped (the same deterministic drop-the-higher-id rule);
    2. cross-corpus: ``phash_dedup_table`` probes the stored index with
       one band equi-join pruned to the batch's touched buckets —
       O(batch), never O(corpus);
    3. survivors append to ``accepted_table`` (tagged ``batch_id``) and
       ``phash_index_append`` folds them into the index.

    First batch (no index yet) skips 2 and BUILDS the index. Same
    exactly-once caveat as the text twin: the two table writes are
    atomic each but not one transaction — a crash between them can
    replay a batch, which an idempotent sink dedups on ``batch_id``.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from scraper_spark.operators import phash_dedup as P

    mh = (P.N_BANDS - 1) if max_hamming is None else max_hamming

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.persist()
        survivors = None
        try:
            if batch.isEmpty():
                return
            intra = P.phash_near_dup_pairs(
                batch, max_hamming=mh, id_col=id_col, phash_col=phash_col
            )
            drop_intra = intra.select(F.col("id_b").alias(id_col)).distinct()
            # persist: survivors feeds the touched-bucket collect, the
            # corpus-probe join, and the accepted anti-join — without a
            # pin each action re-runs the intra-batch band self-join
            survivors = batch.join(drop_intra, id_col, "left_anti").persist()
            if bands_table.exists():
                hits = P.phash_dedup_table(
                    spark, bands_table, survivors,
                    max_hamming=mh, id_col=id_col, phash_col=phash_col,
                )
                drop_corpus = hits.select(F.col("id_b").alias(id_col)).distinct()
                accepted = survivors.join(
                    drop_corpus, id_col, "left_anti"
                ).persist()
                accepted_table.append(
                    accepted.withColumn("batch_id", F.lit(batch_id))
                )
                P.phash_index_append(
                    accepted, bands_table, id_col=id_col, phash_col=phash_col
                )
                accepted.unpersist()
            else:
                accepted = survivors  # already persisted above
                accepted_table.append(
                    accepted.withColumn("batch_id", F.lit(batch_id))
                )
                P.phash_build_index(
                    accepted, bands_table, id_col=id_col, phash_col=phash_col
                )
        finally:
            if survivors is not None:
                survivors.unpersist()
            batch.unpersist()

    writer = stream_images.writeStream.foreachBatch(_process)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


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
