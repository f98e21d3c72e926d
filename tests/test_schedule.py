"""Scheduler unit tests: the salted two-phase top-k (big-frontier path)
must select EXACTLY the same rows as the plain per-host window — the
salting is a partition-size bound, never a semantics change."""

import pandas as pd
import pytest

from scraper_spark.plans.frontier import CrawlEngine
from scraper_spark.functions.hashes import bucket
from scraper_spark.plans.spec import N_HOST_BUCKETS


@pytest.fixture(scope="module")
def engine(spark, fixture_dir, tmp_path_factory):
    return CrawlEngine(
        spark, fixture_dir, str(tmp_path_factory.mktemp("sched_work"))
    )


def _frontier_df(spark, n_hosts=5, per_host=200, host_offset=0):
    rows = []
    for h in range(host_offset, host_offset + n_hosts):
        host = f"h{h}.example"
        for k in range(per_host):
            rows.append(
                (
                    f"http://{host}/d/{k}",
                    host,
                    bucket(host, N_HOST_BUCKETS),
                    k % 4,          # depths interleaved
                    k % 3,          # discovery times interleaved
                    0,
                )
            )
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "canon_url", "host", "host_bucket", "depth",
                "discovery_time", "attempt",
            ],
        )
    )


def test_salted_two_phase_equals_plain_topk(spark, engine):
    frontier = _frontier_df(spark)
    # frontier_rows=None forces the salted phase-1; small number skips it
    big = engine._schedule(frontier, None).toPandas()
    small = engine._schedule(frontier, 10).toPandas()
    key = ["canon_url"]
    assert sorted(big.canon_url) == sorted(small.canon_url)
    assert len(big) > 0


def test_budget_respected_per_host(spark, engine):
    frontier = _frontier_df(spark)
    out = engine._schedule(frontier, None).toPandas()
    budgets = out.groupby("host").size()
    for host, n in budgets.items():
        assert n <= max(
            engine.pol.tokens(host), engine.pol.default_tokens
        ), f"{host} over budget"


def test_schedule_prefers_low_depth(spark, engine):
    # hosts ≥10: outside the fixture's robots rules and hot-host budgets,
    # so every frontier row is schedulable and dominance must be strict
    frontier = _frontier_df(spark, host_offset=10)
    out = engine._schedule(frontier, None).toPandas()
    # per spec order (depth, discovery_time, canon_url): any selected row
    # must dominate every unselected row of the same host
    full = frontier.toPandas()
    for host, sel in out.groupby("host"):
        pool = full[full.host == host]
        unsel = pool[~pool.canon_url.isin(sel.canon_url)]
        if unsel.empty:
            continue
        sel_keys = sorted(
            zip(sel.depth, sel.discovery_time, sel.canon_url)
        )
        unsel_keys = sorted(
            zip(unsel.depth, unsel.discovery_time, unsel.canon_url)
        )
        assert sel_keys[-1] <= unsel_keys[0], f"{host}: non-greedy selection"


def test_robots_blocked_never_scheduled(spark, engine):
    # fixture politeness blocks /d/1* on h0 and /d/2* on h1
    frontier = _frontier_df(spark, n_hosts=2, per_host=30)
    out = engine._schedule(frontier, None).toPandas()
    for u in out[out.host == "h0.example"].canon_url:
        assert not u.split("h0.example")[1].startswith("/d/1")
    for u in out[out.host == "h1.example"].canon_url:
        assert not u.split("h1.example")[1].startswith("/d/2")
