"""Single-process oracle crawler — the golden-output generator.

A plain-Python, dict-and-list reimplementation of the crawl semantics
in plans/spec.py, faithful to the reference's sequential loop shape
(reference: handlers/scrapers.py:84-150 — entity → page → item order;
stop at first empty page :97; sink dedup handlers/db.py:38-54). The
Spark engine must match this oracle's crawl log EXACTLY (every row,
in order) and its final URL-seen set EXACTLY (north rule).

No Spark, no numpy randomness, no wall clock — pure deterministic
Python over the fixture parquet files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd

from scraper_spark.functions.canon import canonicalize_url, host_of
from scraper_spark.plans.spec import (
    STATUS_OK,
    STATUS_TRANSIENT,
    PolitenessConfig,
    effective_status,
    host_bucket,
    schedule_round,
)


@dataclass
class FrontierEntry:
    canon_url: str
    host: str
    depth: int
    discovery_time: int  # round of first enqueue
    attempt: int = 0


@dataclass
class CrawlResult:
    log: pd.DataFrame  # seq, round, canon_url, host, host_bucket, depth, discovery_time, status
    seen: set[str] = field(default_factory=set)
    errors: list[str] = field(default_factory=list)
    images: pd.DataFrame | None = None  # image_id, canon_url, caption
    rounds: int = 0
    # rnd of the last loop iteration entered (break round, or
    # max_rounds-1 on bound exit) — the round whose TTL expiry the
    # final ``seen`` reflects; engines compare via seen_df(rnd=this)
    final_round: int = 0


def crawl(
    fixture_dir: str,
    max_rounds: int = 10_000,
) -> CrawlResult:
    """Run the oracle crawl over a fixture dir (page_store.parquet,
    seeds.parquet, politeness.json)."""
    store_df = pd.read_parquet(
        os.path.join(fixture_dir, "page_store.parquet"),
        # only the columns the oracle consumes: requiring extras (e.g.
        # 'kind') would crash on corpora that predate them while the
        # engine's store reader treats optional columns as optional
        columns=["canon_url", "status", "links", "image_id", "caption"],
    )
    store = {
        r.canon_url: r for r in store_df.itertuples(index=False)
    }
    seeds = pd.read_parquet(os.path.join(fixture_dir, "seeds.parquet"))
    pol = PolitenessConfig.load(os.path.join(fixture_dir, "politeness.json"))

    frontier: dict[str, FrontierEntry] = {}
    for u in seeds["url"]:
        c = canonicalize_url(u)
        if c not in frontier:
            frontier[c] = FrontierEntry(c, host_of(c), 0, 0)

    seen: set[str] = set()
    errors: list[str] = []
    log_rows: list[tuple] = []
    image_rows: list[tuple] = []
    seq = 0
    ttl = pol.recrawl_after_rounds
    terminal_round: dict[str, int] = {}  # url -> round of last 200/404
    final_round = 0

    for rnd in range(max_rounds):
        final_round = rnd
        # -- re-crawl TTL (spec.py): a terminal fetch at round r is
        # seen only while r > rnd - ttl; at r + ttl it expires and a
        # rediscovering link re-enqueues it like a fresh URL.
        # Retry-exhausted URLs never expire (not in terminal_round).
        if ttl is not None:
            for u in [u for u, r in terminal_round.items() if r + ttl <= rnd]:
                seen.discard(u)
                del terminal_round[u]

        # -- robots filter + per-host budgeted top-k: THE shared kernel
        # (spec.schedule_round — also the engine's tiny-frontier path)
        scheduled: list[FrontierEntry] = schedule_round(
            list(frontier.values()), pol
        )
        if not scheduled:
            break

        # -- fetch + log in total order ---------------------------------
        scheduled.sort(
            key=lambda e: (host_bucket(e.host), e.depth, e.discovery_time, e.canon_url)
        )
        new_links: dict[str, int] = {}  # canon_url -> min depth
        for e in scheduled:
            row = store.get(e.canon_url)
            status = effective_status(
                None if row is None else int(row.status), e.attempt
            )
            log_rows.append(
                (seq, rnd, e.canon_url, e.host, host_bucket(e.host),
                 e.depth, e.discovery_time, status)
            )
            seq += 1
            if status == STATUS_TRANSIENT:
                e.attempt += 1
                if e.attempt >= pol.max_attempts:
                    errors.append(e.canon_url)
                    seen.add(e.canon_url)
                    del frontier[e.canon_url]
                continue  # stays in frontier for retry
            # terminal fetch (200 or 404)
            seen.add(e.canon_url)
            if ttl is not None:
                terminal_round[e.canon_url] = rnd
            del frontier[e.canon_url]
            if status == STATUS_OK and row is not None:
                if row.image_id is not None and not (
                    isinstance(row.image_id, float)
                ):
                    image_rows.append((row.image_id, e.canon_url, row.caption))
                for link in row.links if row.links is not None else []:
                    c = canonicalize_url(link)
                    nd = e.depth + 1
                    if c in new_links:
                        new_links[c] = min(new_links[c], nd)
                    else:
                        new_links[c] = nd

        # -- enqueue first-discoveries ----------------------------------
        for c, nd in new_links.items():
            if c in seen or c in frontier:
                continue
            frontier[c] = FrontierEntry(c, host_of(c), nd, rnd + 1)

    log = pd.DataFrame(
        log_rows,
        columns=["seq", "round", "canon_url", "host", "host_bucket",
                 "depth", "discovery_time", "status"],
    )
    images = pd.DataFrame(
        image_rows, columns=["image_id", "canon_url", "caption"]
    )
    return CrawlResult(log=log, seen=seen, errors=errors, images=images,
                       rounds=int(log["round"].max()) + 1 if len(log) else 0,
                       final_round=final_round)
