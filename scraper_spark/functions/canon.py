"""URL canonicalization — the engine's identity function for URLs.

The reference builds URLs from templates but never canonicalizes them
(reference: handlers/haozu.py:23,28-29, handlers/default_api.py:59-64 —
SURVEY §2.2 P17); the north rule fixes the spec for the new engine:

- lowercase scheme and host,
- strip the fragment,
- strip default ports (http:80, https:443),
- sort query parameters (stable: by key, then by value),
- normalize an empty path to "/".

``canonicalize_url`` is the pure single-URL function (shared with the
single-process oracle so both sides agree by construction);
``canonicalize_udf`` is the Arrow-batched vectorized form used in every
Spark plan. Per input_hint, no row-at-a-time ``@udf`` anywhere.
"""

from __future__ import annotations

import pandas as pd
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize_url(url: str) -> str:
    """Canonicalize one URL per the north-rule spec. Idempotent."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return ""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    # urlsplit strips IPv6 brackets from .hostname; restore them, else
    # the rebuilt netloc is invalid and host identity collapses to the
    # text before the first colon
    host_part = f"[{host}]" if ":" in host else host
    netloc = host_part
    port = None
    malformed_port = False
    try:
        port = parts.port
    except ValueError:
        # malformed port — keep the raw netloc lowercased. It already
        # contains any userinfo, so the username branch below must NOT
        # run (prepending credentials again would double them on every
        # pass and break idempotence).
        netloc = parts.netloc.lower()
        malformed_port = True
        port = None
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host_part}:{port}"
    if parts.username and not malformed_port:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = parts.path or "/"
    query = parts.query
    if query:
        pairs = sorted(parse_qsl(query, keep_blank_values=True))
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    """Lowercased hostname of a URL ('' if unparseable)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


@F.pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_url)


@F.pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of)
