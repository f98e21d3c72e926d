"""robots.txt parser (functions/robots.py) + REP rule evaluation
(spec.robots_blocked): group selection, Allow/Disallow precedence,
crawl-delay extraction, and the crawl-delay → token-budget mapping."""

import json

from scraper_spark.functions.robots import parse_robots
from scraper_spark.plans.spec import PolitenessConfig, robots_blocked

SAMPLE = """
# demo robots
User-agent: *
Disallow: /private
Crawl-delay: 5

User-agent: scraper-spark
User-agent: otherbot
Allow: /private/open
Disallow: /private
Disallow: /tmp
Crawl-delay: 2

User-agent: megacrawler
Disallow: /
"""


def test_group_selection_most_specific_token():
    r = parse_robots(SAMPLE, "scraper-spark/1.0")
    assert r.matched_token == "scraper-spark"
    assert ("/private/open", True) in r.rules
    assert ("/tmp", False) in r.rules
    assert r.crawl_delay == 2.0
    # unknown agent falls back to the * group
    r2 = parse_robots(SAMPLE, "nobody")
    assert r2.matched_token == "*"
    assert r2.rules == [("/private", False)]
    assert r2.crawl_delay == 5.0


def test_tied_groups_merge():
    txt = "User-agent: a\nDisallow: /x\n\nUser-agent: a\nDisallow: /y\n"
    r = parse_robots(txt, "a-bot")
    assert sorted(r.rules) == [("/x", False), ("/y", False)]


def test_empty_disallow_and_wildcards_skipped():
    txt = (
        "User-agent: *\nDisallow:\nDisallow: /a*b\nAllow: /c$\n"
        "Disallow: /real\n"
    )
    r = parse_robots(txt, "anything")
    assert r.rules == [("/real", False)]
    assert r.skipped_wildcards == 2


def test_no_matching_group_allows_everything():
    txt = "User-agent: onlybot\nDisallow: /\n"
    r = parse_robots(txt, "someone-else")
    assert r.rules == [] and r.crawl_delay is None


def test_rep_precedence_longest_match_allow_wins_tie():
    rules = [("/private", False), ("/private/open", True)]
    assert robots_blocked("/private/secret", rules)
    assert not robots_blocked("/private/open/x", rules)
    assert not robots_blocked("/public", rules)
    # length tie: allow wins
    tie = [("/a", False), ("/a", True)]
    assert not robots_blocked("/a/x", tie)
    # disallow-only degrades to any-prefix blocking
    assert robots_blocked("/d/1?x=1", [("/d/1", False)])
    assert not robots_blocked("/d/2", [("/d/1", False)])


def test_politeness_config_merges_robots_txt(tmp_path):
    cfg = {
        "default_tokens": 3,
        "hosts": {"h9.example": 7},
        "robots_disallow": {"h0.example": ["/d/1"]},
        "robots_txt": {
            "h0.example": "User-agent: *\nAllow: /d/1/ok\n",
            "h2.example": SAMPLE,
            "h9.example": "User-agent: *\nCrawl-delay: 5\n",
        },
        "user_agent": "scraper-spark",
        "round_seconds": 10,
    }
    p = tmp_path / "politeness.json"
    p.write_text(json.dumps(cfg))
    pol = PolitenessConfig.load(str(p))
    # legacy prefixes + parsed rules merge per host
    assert ("/d/1", False) in pol.robots_rules["h0.example"]
    assert ("/d/1/ok", True) in pol.robots_rules["h0.example"]
    assert not robots_blocked("/d/1/ok/x", pol.robots_rules["h0.example"])
    assert robots_blocked("/d/1/no", pol.robots_rules["h0.example"])
    # crawl-delay 2s at 10s rounds → 5 tokens
    assert pol.tokens("h2.example") == 5
    # explicit hosts{} override beats the crawl-delay mapping
    assert pol.tokens("h9.example") == 7
    assert pol.tokens("unlisted.example") == 3


def test_crawl_delay_nonfinite_and_nonpositive_ignored():
    """robots.txt is untrusted remote input: float() accepts nan/inf,
    nan is truthy, and int(round_seconds // nan) downstream raises —
    only a finite positive value is a delay."""
    for bad in ("nan", "inf", "-inf", "-2", "0", "soon"):
        r = parse_robots(f"User-agent: *\nCrawl-delay: {bad}\n", "x")
        assert r.crawl_delay is None, bad
    assert parse_robots("User-agent: *\nCrawl-delay: 2.5\n", "x").crawl_delay == 2.5


def test_politeness_config_survives_garbage_crawl_delay(tmp_path):
    """'Crawl-delay: nan' used to crash PolitenessConfig (and thus
    engine AND oracle construction) with ValueError from
    int(round_seconds // nan)."""
    cfg = {
        "round_seconds": 10,
        "robots_txt": {"h.example": "User-agent: *\nCrawl-delay: nan\n"},
    }
    p = tmp_path / "politeness.json"
    p.write_text(json.dumps(cfg))
    pol = PolitenessConfig.load(str(p))
    assert pol.tokens("h.example") == pol.default_tokens


def test_sitemap_between_user_agent_lines_does_not_split_group():
    """RFC 9309 §2.2.4: records outside the group structure (Sitemap:,
    unknown fields) MUST NOT interfere with group parsing — agents a
    and b share ONE group despite the Sitemap line between them, so
    both inherit the Disallow (Google's reference matcher agrees)."""
    txt = (
        "User-agent: a\nSitemap: http://x/s.xml\n"
        "User-agent: b\nDisallow: /priv\n"
    )
    for agent in ("a", "b"):
        assert parse_robots(txt, agent).rules == [("/priv", False)], agent
    # ...but a real rule still closes agent collection: c is its own group
    txt2 = "User-agent: a\nDisallow: /a\nUser-agent: c\nDisallow: /c\n"
    assert parse_robots(txt2, "a").rules == [("/a", False)]
    assert parse_robots(txt2, "c").rules == [("/c", False)]


def test_politeness_config_survives_tiny_crawl_delay(tmp_path):
    """'Crawl-delay: 1e-320' is finite and positive yet used to crash
    PolitenessConfig with OverflowError: the float quotient
    round_seconds // delay overflows to inf before int(). The token
    budget clamps instead."""
    cfg = {
        "round_seconds": 10,
        "robots_txt": {"h.example": "User-agent: *\nCrawl-delay: 1e-320\n"},
    }
    p = tmp_path / "politeness.json"
    p.write_text(json.dumps(cfg))
    pol = PolitenessConfig.load(str(p))
    assert pol.tokens("h.example") == 2**31 - 1
