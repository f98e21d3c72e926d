"""Driver-contract gate run locally: every queries() entry vs its
DuckDB oracle twin at sf0.001 (driver runs sf0.01 — same semantics,
smaller data for test speed), plus the entry() smoke check."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.count()
    assert rows > 0
    assert len(df.schema.fields) >= 4


def test_queries_have_oracles():
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    missing = set(osql) - set(qs)
    assert not missing, f"oracle entries without queries: {missing}"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _pairs():
    import __spark_entry__ as E

    return sorted(E.queries().keys())


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as E

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import normalize

    import pandas as pd

    sdf = normalize(E.queries()[name](spark, SF_DIR).toPandas())
    osql = E.oracle_sql()
    if name not in osql:
        return  # rows-only operator
    ddf = normalize(duck.sql(osql[name]).df())
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf), f"{len(sdf)} vs {len(ddf)} rows"
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False, check_exact=False, atol=1e-4)
