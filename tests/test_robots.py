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


# --------------------------- property tests (hypothesis) ---------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_group_line = st.one_of(
    st.builds(
        "User-agent: {}".format,
        st.sampled_from(["*", "bot", "scraper-spark", "spark", "mega"]),
    ),
    st.builds(
        "Disallow: {}".format,
        st.sampled_from(["", "/a", "/ab", "/b/c", "/*x", "/y$", "/"]),
    ),
    st.builds("Allow: {}".format, st.sampled_from(["/a", "/abc", "/", "/b"])),
    st.builds(
        "Crawl-delay: {}".format,
        st.sampled_from(["1", "2.5", "nan", "-1", "abc", "1e-320"]),
    ),
)
_noise_line = st.sampled_from(
    [
        "Sitemap: https://x.example/s.xml",
        "Host: x.example",
        "# just a comment",
        "",
        "Unknown-field: v",
        "no-colon-line",
    ]
)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(_group_line, max_size=20),
    st.lists(st.tuples(st.integers(0, 30), _noise_line), max_size=8),
    st.sampled_from(["*", "scraper-spark", "bot"]),
)
def test_noise_lines_never_change_parse(lines, noises, ua):
    """RFC 9309 §2.2.4 as a metamorphic property: inserting non-group
    records (Sitemap:, unknown fields, comments, blanks, colon-less
    junk) at ANY positions never changes the parse — rules,
    crawl-delay, wildcard count, or which UA token won. The pre-fix
    parser violated this (noise split User-agent runs into separate
    groups, silently dropping rules)."""
    base = parse_robots("\n".join(lines), ua)
    noisy = list(lines)
    for pos, n in noises:
        noisy.insert(min(pos, len(noisy)), n)
    got = parse_robots("\n".join(noisy), ua)
    assert (base.rules, base.crawl_delay, base.skipped_wildcards,
            base.matched_token) == (
        got.rules, got.crawl_delay, got.skipped_wildcards,
        got.matched_token,
    )


_rules_st = st.lists(
    st.tuples(
        st.sampled_from(["/", "/a", "/ab", "/abc", "/a/b", "/b", "/b/c"]),
        st.booleans(),
    ),
    max_size=8,
)
_pq_st = st.sampled_from(
    ["/", "/a", "/ab", "/abc", "/abcd", "/a/b", "/a/bx", "/b", "/b/c", "/zz"]
)


@settings(max_examples=300, deadline=None)
@given(_rules_st, _pq_st, st.randoms(use_true_random=False))
def test_robots_blocked_rule_order_invariant(rules, pq, rnd):
    """REP longest-match + allow-wins-tie is a pure function of the
    rule SET: permuting the rule list never changes the decision
    (duplicate paths with conflicting allow included)."""
    shuffled = list(rules)
    rnd.shuffle(shuffled)
    assert robots_blocked(pq, rules) == robots_blocked(pq, shuffled)


@settings(max_examples=300, deadline=None)
@given(_rules_st, _pq_st, st.booleans())
def test_robots_blocked_nonmatching_rule_irrelevant(rules, pq, allow):
    """Adding a rule whose path is NOT a prefix of the query path
    never changes the decision, whatever its allow bit."""
    extra = ("/zzz-never-a-prefix", allow)
    assert robots_blocked(pq, rules) == robots_blocked(pq, rules + [extra])
