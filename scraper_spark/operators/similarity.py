"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline, and a
sign-LSH-bucketed variant as the scale path: bucket = the sign bits of
the first B coordinates (coordinate hyperplanes — deterministic, so
the DuckDB oracle reproduces it; a seeded random rotation would be the
production choice but adds no Spark semantics).

Spark side stays JVM-vectorized: dot products via
``F.aggregate(F.zip_with(...))`` — no Python UDF. Everything is cast
to double before arithmetic so float32 summation-order differences
can't flip the oracle's value hash; outputs round to 4 decimals.

At 10^9 vectors: brute force is one broadcast of the query + a full
scan (embarrassingly parallel, no shuffle except the final top-k);
the LSH variant prunes the scan to matching buckets via partition
pruning when the table is written partitioned by ``bucket``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_SIGN_BITS = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against the embedding of ``query_vec_id``.

    The 1-row query side is broadcast (cross join of 1×N) — the scan
    side never shuffles; only the global top-k does."""
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("qvec"))),
                4,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    # element-wise ops spelled out (no list_cosine_similarity — its
    # internal float handling need not match Spark's double math)
    dot = (
        "list_aggregate(list_transform(range(1, len(e.embedding) + 1), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)), 'sum')"
    )
    norm_e = (
        "sqrt(list_aggregate(list_transform(e.embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    norm_q = (
        "sqrt(list_aggregate(list_transform(q.qvec, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    return f"""
        WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label,
               round({dot} / ({norm_e} * {norm_q}), 4) AS cosine
        FROM embeddings e, q
        WHERE e.vec_id != {query_vec_id}
        ORDER BY cosine DESC, e.vec_id
        LIMIT {k}
    """


def sign_bucket_col(vec: Column, n_bits: int = N_SIGN_BITS) -> Column:
    """LSH bucket from the sign bits of the first n_bits coordinates."""
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(vec, i + 1).cast("double") > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket.cast("int")


def sign_bucket_sql(expr: str, n_bits: int = N_SIGN_BITS) -> str:
    terms = " + ".join(
        f"CASE WHEN CAST({expr}[{i + 1}] AS DOUBLE) > 0 THEN {1 << i} ELSE 0 END"
        for i in range(n_bits)
    )
    return f"CAST({terms} AS INT)"


def lsh_bucketed_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """ANN: search only the query's sign-LSH bucket. With the table
    partitioned by bucket, Catalyst prunes the scan to one partition —
    the 1000-executor plan reads 1/2^B of the data."""
    with_b = embeddings.withColumn("bucket", sign_bucket_col(F.col("embedding")))
    q = with_b.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    scored = (
        with_b.where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            "label",
            "bucket",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("qvec"))),
                4,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def neardup_pairs(embeddings: DataFrame, threshold: float = 0.2) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucket-pruned: only pairs
    sharing the sign-LSH bucket are scored (the O(n²) cross join
    becomes a per-bucket self-join — at 10^9 vectors with B sign bits
    the candidate set shrinks ~2^B-fold; raise B for density)."""
    with_b = embeddings.select(
        "vec_id",
        "embedding",
        sign_bucket_col(F.col("embedding")).alias("bucket"),
    )
    a = with_b.alias("a")
    b = with_b.alias("b")
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        _norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def neardup_pairs_sql(threshold: float = 0.2) -> str:
    dot = (
        "list_aggregate(list_transform(range(1, len(a.embedding) + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')"
    )
    norm_a = (
        "sqrt(list_aggregate(list_transform(a.embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    norm_b = (
        "sqrt(list_aggregate(list_transform(b.embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    ba = sign_bucket_sql("a.embedding")
    bb = sign_bucket_sql("b.embedding")
    return f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({dot} / ({norm_a} * {norm_b}), 4) AS cosine
        FROM embeddings a JOIN embeddings b
          ON {ba} = {bb} AND a.vec_id < b.vec_id
        WHERE round({dot} / ({norm_a} * {norm_b}), 4) >= {threshold}
    """


def lsh_bucketed_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    dot = (
        "list_aggregate(list_transform(range(1, len(e.embedding) + 1), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)), 'sum')"
    )
    norm_e = (
        "sqrt(list_aggregate(list_transform(e.embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    norm_q = (
        "sqrt(list_aggregate(list_transform(q.qvec, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    be = sign_bucket_sql("e.embedding")
    bq = sign_bucket_sql("q.qvec")
    return f"""
        WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label, {be} AS bucket,
               round({dot} / ({norm_e} * {norm_q}), 4) AS cosine
        FROM embeddings e, q
        WHERE e.vec_id != {query_vec_id} AND {be} = {bq}
        ORDER BY cosine DESC, e.vec_id
        LIMIT {k}
    """
