"""robots.txt parsing — RFC 9309 subset feeding the schedule dims.

The crawl engine's robots model is a per-host rule list
``[(path_prefix, allow)]`` evaluated with REP precedence
(longest-matching rule wins, Allow wins a length tie — spec.py
``robots_blocked``). This module turns real robots.txt TEXT into that
rule list plus the group's crawl-delay, so a production deployment
feeds the same dim tables from fetched /robots.txt bodies.

Implemented per RFC 9309 (+ the de-facto crawl-delay extension):

- line syntax ``field: value`` with ``#`` comments, fields
  case-insensitive;
- groups: consecutive ``User-agent`` lines open a group, the rules
  that follow belong to every named agent;
- group selection: the group(s) whose user-agent token is the most
  specific match for the client product token — matching is
  case-insensitive substring, ``*`` matches everything at specificity
  0, longest matching token wins, all groups tied on the winning token
  MERGE;
- ``Disallow:`` with an empty value is "allow all" (rule dropped);
- rules whose path uses the ``*``/``$`` wildcard forms are OUTSIDE the
  prefix-only engine subset and are skipped (counted in
  ``skipped_wildcards`` so callers can audit).

The reference scraper has no robots handling (the north rule adds it);
its per-site constants (reference: handlers/haozu.py:19-23) are the
analog of the per-host dim rows this feeds.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    """Effective rules for one (robots.txt, user-agent) pair."""

    rules: list[tuple[str, bool]] = field(default_factory=list)  # (path, allow)
    crawl_delay: float | None = None
    skipped_wildcards: int = 0
    matched_token: str | None = None  # which UA token won group selection


def _parse_lines(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        f, v = line.split(":", 1)
        out.append((f.strip().lower(), v.strip()))
    return out


def parse_robots(text: str, user_agent: str = "*") -> RobotsRules:
    """Parse robots.txt ``text`` for ``user_agent`` (a product token,
    e.g. ``"scraper-spark"``)."""
    ua = user_agent.lower()
    # group assembly: [(tokens, rules, crawl_delay)]
    groups: list[dict] = []
    cur: dict | None = None
    collecting_agents = False
    for fld, val in _parse_lines(text):
        if fld == "user-agent":
            if not collecting_agents:
                cur = {"tokens": [], "rules": [], "delay": None, "skipped": 0}
                groups.append(cur)
                collecting_agents = True
            cur["tokens"].append(val.lower())
            continue
        if fld not in ("allow", "disallow", "crawl-delay"):
            # RFC 9309 §2.2.4: records outside the group structure
            # (Sitemap:, unknown fields) MUST NOT interfere with group
            # parsing — they neither join the group nor split a run of
            # User-agent lines (a Sitemap between two User-agent lines
            # leaves them ONE group, matching Google's reference
            # matcher; test_sitemap_between_user_agent_lines)
            continue
        collecting_agents = False
        if cur is None:
            continue  # rules before any user-agent line: no group
        if fld in ("allow", "disallow"):
            if fld == "disallow" and val == "":
                continue  # empty Disallow = allow all
            if "*" in val or val.endswith("$"):
                cur["skipped"] += 1
                continue
            cur["rules"].append((val, fld == "allow"))
        else:  # crawl-delay
            try:
                d = float(val)
            except ValueError:
                continue
            # robots.txt is untrusted remote input: float() accepts
            # 'nan'/'inf', nan is truthy, and the token computation
            # int(round_seconds // nan) downstream raises — only a
            # finite positive delay is a delay
            if math.isfinite(d) and d > 0:
                cur["delay"] = d

    # group selection: most specific matching token; '*' at 0
    def specificity(tok: str) -> int:
        if tok == "*":
            return 0
        return len(tok) if tok in ua else -1

    best = -1
    for g in groups:
        for t in g["tokens"]:
            best = max(best, specificity(t))
    out = RobotsRules()
    if best < 0:
        return out  # no group applies: everything allowed
    for g in groups:
        specs = [specificity(t) for t in g["tokens"]]
        if max(specs, default=-1) != best:
            continue
        out.rules.extend(g["rules"])
        out.skipped_wildcards += g["skipped"]
        if out.crawl_delay is None:
            out.crawl_delay = g["delay"]
        if out.matched_token is None:
            out.matched_token = g["tokens"][specs.index(best)]
    return out
