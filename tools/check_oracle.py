"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count + column names + order-insensitive values
(sorted by all columns, floats to 4dp)."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from scraper_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _cell(v):
    """Canonical string for one cell, mirroring the driver's value-hash:
    NO dtype coercion across engines — int64 57 and float64 57.0 must
    stringify differently so type drift is caught locally, not by the
    driver."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "∅"
    if isinstance(v, (list, np.ndarray, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, (float, np.floating)):
        return repr(round(float(v), 4))
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        df[c] = df[c].map(_cell)
    key = df.columns.tolist()
    return df.sort_values(key, na_position="first").reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, osql = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:200]}")
            failures.append(name)
            continue
        if name not in osql:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {str(ex)[:200]}")
            failures.append(name)
            continue
        a, b = normalize(sdf), normalize(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures.append(name)
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures.append(name)
            continue
        if a.equals(b):
            print(f"OK   {name}: {len(a)} rows")
        else:
            neq = (a != b).any()
            bad = [c for c in a.columns if neq.get(c, False)]
            samp = ""
            if bad:
                c = bad[0]
                i = (a[c] != b[c]).idxmax()
                samp = f" e.g. {c}[{i}]: {a[c][i]!r} vs {b[c][i]!r}"
            print(f"FAIL {name}: values differ in {bad}{samp}")
            failures.append(name)
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return failures


if __name__ == "__main__":
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    sys.exit(1 if main(only=only) else 0)
