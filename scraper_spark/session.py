"""SparkSession factory with the engine's standard configuration.

Local mode is the test substrate; the configs are chosen so the same
plan shapes survive on a multi-executor cluster:

- AQE on (runtime coalesce + skew-join splitting — the hot-host skew
  defense of SURVEY §4.2.1 beyond explicit salting),
- shuffle partitions sized to cores (not the 200 default),
- Arrow enabled (every Python-side operator is a pandas/Arrow UDF),
- UTC session timezone (oracle comparison — DuckDB timestamps are
  UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scraper_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cores=None`` → ``local[*]``; pass ``master`` explicitly for
    multi-JVM emulation (``local-cluster[N,C,M]`` — N separate executor
    JVMs, the sandbox stand-in for N executors). On a real cluster the
    master comes from spark-submit and this builder only contributes
    conf.
    """
    # numpy/BLAS must be single-threaded inside Spark python workers:
    # with W workers × default BLAS threads (= all cores) the tiny
    # per-batch matmuls (DCT/phash) drown in thread contention — the
    # classic anti-scaling bug for numpy-in-Spark
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
    ):
        os.environ.setdefault(var, "1")
    if master is not None:
        n = cores or (os.cpu_count() or 8)
    elif cores is None:
        master = "local[*]"
        n = os.cpu_count() or 8
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep Arrow batches bounded BY BYTES in binary-heavy stages: at
        # 10k rows × ~60 KB image payloads a batch is ~0.5 GB and W
        # concurrent workers evict the page cache (anti-scaling); 1024
        # rows is still fully vectorized for string/hash stages
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # smaller splits → binary-heavy scans parallelize across all
        # cores even with few large files
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
    ):
        b = b.config(f"spark.executorEnv.{var}", "1")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
