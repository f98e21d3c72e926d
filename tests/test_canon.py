"""Canonicalization unit + property tests (SURVEY §5.2 items 1-2)."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from scraper_spark.functions.canon import canonicalize_url, host_of


def test_lowercase_host_and_scheme():
    assert canonicalize_url("HTTP://H0.Example/d/1") == "http://h0.example/d/1"


def test_strip_default_port():
    assert canonicalize_url("http://a.example:80/x") == "http://a.example/x"
    assert canonicalize_url("https://a.example:443/x") == "https://a.example/x"
    assert canonicalize_url("http://a.example:8080/x") == "http://a.example:8080/x"
    # https on 80 is NOT default
    assert canonicalize_url("https://a.example:80/x") == "https://a.example:80/x"


def test_strip_fragment():
    assert canonicalize_url("http://a.example/x#frag") == "http://a.example/x"


def test_sort_query_params():
    assert (
        canonicalize_url("http://a.example/x?b=2&a=1")
        == canonicalize_url("http://a.example/x?a=1&b=2")
        == "http://a.example/x?a=1&b=2"
    )


def test_empty_path():
    assert canonicalize_url("http://a.example") == "http://a.example/"


_url_st = st.builds(
    lambda host, port, path, qkeys, frag: (
        f"http://{host}{port}/{path}"
        + ("?" + "&".join(f"{k}={i}" for i, k in enumerate(qkeys)) if qkeys else "")
        + frag
    ),
    host=st.from_regex(r"[A-Za-z][A-Za-z0-9.\-]{0,20}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"[a-z0-9/_\-]{0,30}", fullmatch=True),
    qkeys=st.lists(st.from_regex(r"[a-z]{1,5}", fullmatch=True), max_size=4),
    frag=st.sampled_from(["", "#x", "#frag1"]),
)


@given(_url_st)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    c = canonicalize_url(url)
    assert canonicalize_url(c) == c


@given(_url_st)
@settings(max_examples=100, deadline=None)
def test_canonical_has_no_fragment_and_lower_host(url):
    c = canonicalize_url(url)
    assert "#" not in c
    assert host_of(c) == host_of(c).lower()


def test_vectorized_matches_scalar(spark):
    from pyspark.sql import functions as F
    from scraper_spark.functions.canon import canonicalize_udf

    urls = [
        "HTTP://A.EXAMPLE:80/x?b=2&a=1#f",
        "https://b.example:443/",
        "http://c.example/p?z=9&z=1",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got = [r[0] for r in df.select(canonicalize_udf("url")).collect()]
    assert got == [canonicalize_url(u) for u in urls]


def test_ipv6_host_keeps_brackets():
    """urlsplit strips IPv6 brackets from .hostname; the rebuilt netloc
    must restore them or host identity collapses to the text before the
    first colon (politeness/robots/host_bucket all key on the host)."""
    c = canonicalize_url("http://[2001:DB8::1]:8080/path")
    assert c == "http://[2001:db8::1]:8080/path"
    assert host_of(c) == "2001:db8::1"
    assert canonicalize_url(c) == c
    c2 = canonicalize_url("http://[2001:DB8::1]/path")
    assert c2 == "http://[2001:db8::1]/path" and canonicalize_url(c2) == c2


def test_malformed_port_userinfo_not_duplicated():
    """The malformed-port fallback keeps the raw lowercased netloc,
    which already holds any userinfo — re-prepending credentials would
    double them on every pass and break idempotence."""
    c = canonicalize_url("http://Alice@H.example:99999/p")
    assert c == "http://alice@h.example:99999/p"
    assert canonicalize_url(c) == c


def test_userinfo_preserved_once():
    c = canonicalize_url("http://Alice:pw@H.example/p?b=2&a=1#f")
    assert c == "http://Alice:pw@h.example/p?a=1&b=2"
    assert canonicalize_url(c) == c
