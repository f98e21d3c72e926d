"""Correlated paginated enrichment — the reusable S3/J5 operator.

The reference enriches each input row by calling a paged API in a loop
— page += 1 until the response goes invalid/empty — carrying selected
``ref_*`` input columns onto every result row (reference:
handlers/default_api.py:59-114; the pagination latch :83-89, the ref_
carry :96-103). SURVEY §2.2 S3 mapped this to "explode_outer + bounded
page rounds"; round 1 shipped only the explode — this module adds the
page loop as a first-class operator.

Shape (round-synchronous, like the crawl loop in plans/frontier.py):

    active := requests
    for page in 0..max_pages:
        results_p := fetch_page(active, page)      # one Spark dataflow
        active    := requests whose page was FULL  # semi join on key
    out := union(results_p) ∪ (requests with no results → null payload)

``fetch_page`` is the client seam: any (DataFrame, page) → DataFrame
of (key, payload...) rows — a broadcast-joined lookup table in tests,
an Arrow-batched HTTP pandas stage in production. Each page round is
lazy; the only actions are the per-round ``isEmpty`` liveness checks
(bounded by max_pages, and by the longest per-key result list —
ceil(max_results/page_size) rounds in practice).

At scale: the loop runs ceil(N_max/page_size) rounds TOTAL, not per
row — all keys advance in lock-step, so row-count per round shrinks
monotonically and the shuffle is one equi-join per round on the
request key. The reference's per-row while-loop is O(rows) sequential
round-trips; this is O(max_pages) distributed ones.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, functions as F


def enrich_paginated(
    requests: DataFrame,
    fetch_page: Callable[[DataFrame, int], DataFrame],
    key: str,
    page_size: int,
    max_pages: int = 50,
    outer: bool = True,
) -> DataFrame:
    """Enrich ``requests`` through ``fetch_page`` until exhaustion.

    Every result row carries a ``page`` int column; with ``outer=True``
    request rows that produced no result at all emit one row with null
    payload columns (explode_outer semantics, default_api.py:96-103).
    """
    pages: list[DataFrame] = []
    cached: list[DataFrame] = []
    active = requests
    for page in range(max_pages):
        if active.isEmpty():
            break
        # persist each page: active's lineage chains through every
        # earlier page's fetch, so without the cache the per-round
        # liveness check and the final union would re-execute
        # fetch_page for all prior pages — O(pages²) recompute, and
        # re-FIRED requests against a remote client
        res = fetch_page(active, page).persist()
        cached.append(res)
        pages.append(res.withColumn("page", F.lit(page).cast("int")))
        # a request stays active only while its last page came back full
        full = (
            res.groupBy(key)
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") >= page_size)
            .select(key)
        )
        active = active.join(full, key, "left_semi")
    if not pages:
        got = None
    else:
        got = reduce(lambda a, b: a.unionByName(b), pages)
    if not outer:
        if got is None:
            raise ValueError("no pages fetched and outer=False")
        return got
    if got is None:
        return requests.withColumn("page", F.lit(None).cast("int"))
    missed = requests.join(got.select(key).distinct(), key, "left_anti")
    return got.unionByName(missed, allowMissingColumns=True)
