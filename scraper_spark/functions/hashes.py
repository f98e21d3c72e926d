"""Engine-parity hash helpers (Python / Spark column / DuckDB SQL).

The reference signs API calls with md5 over urlencoded params
(reference: handlers/default_api.py:127-129, SURVEY §2.2 P16); the new
engine additionally needs *cross-engine reproducible* hashes: the
single-process oracle crawler (plans/oracle.py), the Spark engine, and
the DuckDB correctness oracle must all derive identical host buckets /
minhash values. md5 is the one hash all three share bit-for-bit, so
every parity-critical derivation is md5-based:

- ``md5_hex(s)``           — hex digest (Python)
- ``md5_long(s)``          — first 15 hex digits as int (60 bits, fits
                             a signed 64-bit everywhere)
- ``bucket(s, n)``         — md5_long % n  (host_bucket, salting)
- ``*_col`` / ``*_sql``    — the same derivations as a Spark Column and
                             as a DuckDB SQL fragment

Spark-internal keys that never cross engines (shuffle salts, bloom
probes) are free to use ``F.xxhash64`` — faster, JVM-side.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

HEX_DIGITS = 15  # 60 bits < 63 → no sign trouble in any engine


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_long(s: str) -> int:
    return int(md5_hex(s)[:HEX_DIGITS], 16)


def bucket(s: str, n: int) -> int:
    return md5_long(s) % n


def md5_long_col(c: Column) -> Column:
    """Spark column: first 15 md5 hex digits as bigint."""
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("long")


def bucket_col(c: Column, n: int) -> Column:
    return md5_long_col(c) % F.lit(n)


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL fragment mirroring ``md5_long_col``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {HEX_DIGITS})) AS BIGINT)"


# -- digest-slice helpers -------------------------------------------------
# An md5 digest carries 128 bits; consumers needing TWO independent
# hash values per input (minhash's affine double-hash family) slice
# disjoint hex ranges of ONE digest instead of paying a second md5 —
# the digest is the dominant cost at 10^9 shingles.
def hex_long(hex_digest: str, start: int, n: int) -> int:
    """Python: hex digits [start, start+n) (1-based) as int."""
    return int(hex_digest[start - 1 : start - 1 + n], 16)


def hex_long_col(dg: Column, start: int, n: int) -> Column:
    """Spark: same slice of a hex-digest column as bigint (n ≤ 15)."""
    return F.conv(F.substring(dg, start, n), 16, 10).cast("long")


def hex_long_sql(expr: str, start: int, n: int) -> str:
    """DuckDB fragment mirroring ``hex_long_col``."""
    return f"CAST(('0x' || substr({expr}, {start}, {n})) AS BIGINT)"


def bucket_sql(expr: str, n: int) -> str:
    return f"({md5_long_sql(expr)} % {n})"
