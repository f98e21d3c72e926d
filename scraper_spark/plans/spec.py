"""The shared crawl-semantics spec — single source of truth.

Both the single-process oracle (plans/oracle.py) and the distributed
Spark engine (plans/frontier.py) import these constants and pure
functions, so their equivalence is by construction, not coincidence.

Semantics distilled from the reference loop (SURVEY §2.11):

- Round-synchronous BFS over the frontier — the reference's nested
  entity → page → item loops (reference: handlers/scrapers.py:84-150)
  become rounds; its insertion-order determinism (scrapers.py:103,
  146-149) becomes the TOTAL ORDER below.
- Politeness: per-host token budget per round (the reference throttles
  with per-item sleeps, handlers/haozu.py:41 — budgets replace sleeps).
- Robots: per-host disallowed path prefixes (north-rule addition; the
  reference has none).
- Retry: transient failures (HTTP 503) retry on later rounds up to
  MAX_ATTEMPTS, mirroring the reference's retry-once-after-renewal
  latch (handlers/scrapers.py:37-69) with a bounded budget.
- First discovery wins: a URL's (depth, discovery_time) are fixed at
  first enqueue (reference analog: first-seen dedup at the sink,
  handlers/db.py:38-54). Conflicts inside one round resolve to
  MIN(depth) — an order-free rule a distributed engine can reproduce.
- Re-crawl TTL (``recrawl_after_rounds`` = N, default off): a terminal
  fetch at round r counts as SEEN only for rounds rnd with r > rnd - N
  — at round r + N it expires, and a link rediscovering the URL
  re-enqueues it like a fresh discovery (depth = link depth + 1,
  discovery_time = rnd + 1, attempt reset). Retry-exhausted URLs
  (fetch_errors) never expire — errors don't re-crawl. Reference
  analog: the delete-today's-rows-and-redo full refresh
  (jobs/job_invoice.py:37-41). The rule is a pure function of the
  crawl log, so the engine derives it by filtering the log to the
  window (no stored seen-set surgery) and, with the cuckoo seen
  filter, mirrors it in the prefilter via kind='del' rows.
"""

from __future__ import annotations

from scraper_spark.functions.hashes import bucket

# Total order of every order-observable output (crawl log):
ORDER_KEYS = ("round", "host_bucket", "depth", "discovery_time", "canon_url")

N_HOST_BUCKETS = 64  # host → bucket for scheduling fairness + partitioning
N_URL_BUCKETS = 64  # canon_url → bucket: the crawl-log/seen-set hive
# partition key, so the per-round dedup anti-join scans only the url
# buckets the round's candidate links actually touch (VERDICT r02 #2)

STATUS_OK = 200
STATUS_MISSING = 404
STATUS_TRANSIENT = 503


def host_bucket(host: str) -> int:
    """md5-derived bucket — identical in Python/Spark/DuckDB (hashes.py)."""
    return bucket(host, N_HOST_BUCKETS)


def robots_blocked(path_and_query: str, rules: list[tuple[str, bool]]) -> bool:
    """REP rule evaluation (RFC 9309 §2.2.2) over prefix rules
    ``(path, allow)``: the LONGEST matching rule decides; Allow wins a
    length tie; no match = allowed. A disallow-only rule list degrades
    to the plain any-prefix block. Mirrored column-side in
    frontier._schedule — keep the two in lockstep."""
    best_len, best_allow = -1, True
    for p, allow in rules:
        if path_and_query.startswith(p):
            n = len(p)
            if n > best_len or (n == best_len and allow):
                best_len, best_allow = n, allow
    return best_len >= 0 and not best_allow


def path_query(canon_url: str) -> str:
    from urllib.parse import urlsplit

    p = urlsplit(canon_url)
    return p.path + (f"?{p.query}" if p.query else "")


def schedule_round(entries: list, pol: "PolitenessConfig") -> list:
    """One round's politeness schedule over frontier entries (objects
    with ``canon_url/host/depth/discovery_time`` attributes): robots
    prefix filter, then per-host top-k by (depth, discovery_time,
    canon_url) with k = pol.tokens(host). Returns the scheduled
    entries (order NOT significant — the crawl log's total order is
    applied downstream). This is THE schedule semantics, shared
    verbatim by the oracle and the engine's tiny-frontier driver-side
    fast path; the engine's distributed ``_schedule`` mirrors it in
    DataFrame ops (equivalence: test_scale_paths_invariant +
    test_schedule)."""
    by_host: dict[str, list] = {}
    for e in entries:
        if robots_blocked(
            path_query(e.canon_url), pol.robots_rules.get(e.host, [])
        ):
            continue
        by_host.setdefault(e.host, []).append(e)
    out: list = []
    for host, es in by_host.items():
        es.sort(key=lambda e: (e.depth, e.discovery_time, e.canon_url))
        out.extend(es[: pol.tokens(host)])
    return out


def effective_status(store_status: int | None, attempt: int) -> int:
    """Fetch outcome for a URL given the page_store row status and the
    0-based attempt counter. Missing page → 404. A 503 page succeeds
    from the second attempt on (transient failure model)."""
    if store_status is None:
        return STATUS_MISSING
    if store_status == STATUS_TRANSIENT and attempt == 0:
        return STATUS_TRANSIENT
    if store_status == STATUS_TRANSIENT:
        return STATUS_OK
    return store_status


class PolitenessConfig:
    """Parsed politeness.json — budgets, robots, retry cap."""

    def __init__(self, raw: dict):
        self.default_tokens: int = raw.get("default_tokens", 2)
        self.host_tokens: dict[str, int] = dict(raw.get("hosts", {}))
        self.robots_disallow: dict[str, list[str]] = {
            h: list(v) for h, v in raw.get("robots_disallow", {}).items()
        }
        # effective per-host REP rules [(path, allow)]: the legacy
        # disallow-prefix config plus, when ``robots_txt`` carries real
        # robots.txt bodies per host, the parsed group for
        # ``user_agent`` (functions/robots.py). A host's crawl-delay
        # maps onto the round-token budget — tokens =
        # max(1, round_seconds // delay) — unless ``hosts`` overrides
        # it explicitly.
        self.user_agent: str = raw.get("user_agent", "*")
        self.round_seconds: float = float(raw.get("round_seconds", 10))
        self.robots_rules: dict[str, list[tuple[str, bool]]] = {
            h: [(p, False) for p in ps] for h, ps in self.robots_disallow.items()
        }
        for host, txt in raw.get("robots_txt", {}).items():
            from scraper_spark.functions.robots import parse_robots

            parsed = parse_robots(txt, self.user_agent)
            self.robots_rules.setdefault(host, []).extend(parsed.rules)
            if parsed.crawl_delay and host not in self.host_tokens:
                # min() before int(): a tiny positive delay (1e-320 —
                # untrusted remote input the parser's finite-positive
                # guard can't bound) makes the float quotient overflow
                # to inf, and int(inf) raises; any cap above real
                # budgets preserves semantics (delay ≈ 0 → unbounded
                # tokens → the cap)
                self.host_tokens[host] = max(
                    1,
                    int(
                        min(self.round_seconds // parsed.crawl_delay, 2**31 - 1)
                    ),
                )
        self.max_attempts: int = raw.get("max_attempts", 3)
        # re-crawl TTL in rounds (None = off): a terminal fetch at
        # round r is seen only while r > rnd - N (module docstring)
        self.recrawl_after_rounds: int | None = raw.get("recrawl_after_rounds")

    def tokens(self, host: str) -> int:
        return self.host_tokens.get(host, self.default_tokens)

    @classmethod
    def load(cls, path: str) -> "PolitenessConfig":
        import json

        with open(path) as f:
            return cls(json.load(f))
