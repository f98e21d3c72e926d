"""Fetch stage — HTTP-shaped, Arrow-batched, network-free in-sandbox.

The reference fetches one page per ``requests`` GET with a shared
session and infinite retry (reference: handlers/scrapers.py:26-52,
SURVEY §2.1 S1). The engine's fetch is a ``mapInPandas`` operator:
one *client* per executor process serves every Arrow batch (the
session-reuse semantics of ``self.session``), rows go through in
batches, and the retry budget is data (an ``attempt`` column), not a
loop.

In this sandbox there is no network, so the client is a
``ParquetPageStoreClient``: a per-process cached lookup into the
synthetic page_store parquet. The seam is the point — a real
``requests.Session``-backed client drops in with the same
``lookup_batch`` signature and nothing upstream changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from pyspark.sql import DataFrame

from scraper_spark.plans.spec import (
    STATUS_MISSING,
    STATUS_TRANSIENT,
    effective_status,
)

# per-executor-process cache: one loaded store per path (session reuse)
_STORE_CACHE: dict[str, dict] = {}


class _ArrowStore:
    """Index dict (url → row) over Arrow columns; cell values are
    materialized per hit (``.as_py()``) instead of converting the whole
    table to Python objects — keeps the per-worker cache at roughly the
    Arrow data size even for 10^5+-row stores."""

    def __init__(self, path: str):
        cols = ["canon_url", "status", "links", "image_id", "caption"]
        have = set(pq.read_schema(path).names)
        # attrs (open KV bag, JSON text) is optional — older corpora
        # predate it; readers see null attrs then
        with_attrs = "attrs" in have
        if with_attrs:
            cols.append("attrs")
        t = pq.read_table(path, columns=cols).combine_chunks()
        if t.num_rows == 0:
            # zero-row store: combine_chunks() yields zero chunks, so
            # chunk(0) would raise; an empty index means the column
            # handles are never dereferenced — every lookup is a clean
            # STATUS_MISSING
            self.status = self.links = self.image_id = None
            self.caption = self.attrs = None
            self.index: dict = {}
            return
        self.status = t.column("status").chunk(0)
        self.links = t.column("links").chunk(0)
        self.image_id = t.column("image_id").chunk(0)
        self.caption = t.column("caption").chunk(0)
        self.attrs = t.column("attrs").chunk(0) if with_attrs else None
        urls = t.column("canon_url").chunk(0)
        self.index = {urls[i].as_py(): i for i in range(len(urls))}


def _load_store(path: str) -> "_ArrowStore":
    store = _STORE_CACHE.get(path)
    if store is None:
        store = _ArrowStore(path)
        _STORE_CACHE[path] = store
    return store


class ParquetPageStoreClient:
    """The sandbox 'HTTP client': canon_url batch → page rows."""

    def __init__(self, store_path: str):
        self.store_path = store_path

    def lookup_batch(self, urls: pd.Series, attempts: pd.Series) -> pd.DataFrame:
        store = _load_store(self.store_path)
        status = np.empty(len(urls), dtype=np.int64)
        links: list[list[str] | None] = []
        image_id: list[str | None] = []
        caption: list[str | None] = []
        attrs: list[str | None] = []
        idx = store.index
        for i, (u, att) in enumerate(zip(urls, attempts)):
            j = idx.get(u)
            if j is None:
                status[i] = STATUS_MISSING
                links.append(None)
                image_id.append(None)
                caption.append(None)
                attrs.append(None)
                continue
            # the transient-retry rule comes from plans/spec.py — the
            # single source of crawl semantics (CLAUDE.md invariant);
            # hand-rolling the branch here would silently desync the
            # engine's fetch from the oracle on any future model change
            eff = effective_status(store.status[j].as_py(), int(att))
            if eff == STATUS_TRANSIENT:
                status[i] = STATUS_TRANSIENT
                links.append(None)
                image_id.append(None)
                caption.append(None)
                attrs.append(None)
                continue
            status[i] = eff
            lv = store.links[j].as_py()
            links.append(lv if lv is not None else None)
            image_id.append(store.image_id[j].as_py())
            caption.append(store.caption[j].as_py())
            a = store.attrs[j].as_py() if store.attrs is not None else None
            attrs.append(a if isinstance(a, str) else None)
        return pd.DataFrame(
            {
                "status": status,
                "links": links,
                "image_id": image_id,
                "caption": caption,
                "attrs": attrs,
            }
        )


_FETCH_EXTRA_SCHEMA = (
    "status int, links array<string>, image_id string, caption string, "
    "attrs string"
)


def fetch(scheduled: DataFrame, store_path: str) -> DataFrame:
    """mapInPandas fetch: input must carry canon_url + attempt columns.

    Output = input columns + (status, links, image_id, caption) with
    ``effective_status`` semantics (503 transient succeeds on retry —
    plans/spec.py) applied client-side.
    """
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in scheduled.schema.fields)
    out_schema = f"{in_schema}, {_FETCH_EXTRA_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = ParquetPageStoreClient(store_path)  # one per task; store cached per process
        for pdf in batches:
            if len(pdf) == 0:
                continue
            extra = client.lookup_batch(pdf["canon_url"], pdf["attempt"])
            yield pd.concat(
                [pdf.reset_index(drop=True), extra.reset_index(drop=True)], axis=1
            )

    return scheduled.mapInPandas(run, out_schema)
