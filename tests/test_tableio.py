"""TableIO snapshot semantics: atomic append/overwrite, time travel,
rollback, footer row counts."""

import pandas as pd

from scraper_spark.sources.tableio import TableIO


def _df(spark, vals):
    return spark.createDataFrame(pd.DataFrame({"x": vals}))


def test_append_and_read(spark, tmp_path):
    t = TableIO(str(tmp_path / "t1"))
    assert not t.exists()
    s1 = t.append(_df(spark, [1, 2]))
    s2 = t.append(_df(spark, [3]))
    assert (s1, s2) == (1, 2)
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 3]
    assert t.rows() == 3


def test_overwrite_resets(spark, tmp_path):
    t = TableIO(str(tmp_path / "t2"))
    t.append(_df(spark, [1, 2]))
    t.overwrite(_df(spark, [9]))
    assert [r.x for r in t.read(spark).collect()] == [9]
    t.append(_df(spark, [10]))
    assert sorted(r.x for r in t.read(spark).collect()) == [9, 10]


def test_time_travel(spark, tmp_path):
    t = TableIO(str(tmp_path / "t3"))
    s1 = t.append(_df(spark, [1]))
    t.append(_df(spark, [2]))
    assert [r.x for r in t.read(spark, as_of=s1).collect()] == [1]


def test_rollback(spark, tmp_path):
    t = TableIO(str(tmp_path / "t4"))
    s1 = t.append(_df(spark, [1]))
    t.append(_df(spark, [2]))
    t.rollback(s1)
    assert [r.x for r in t.read(spark).collect()] == [1]
    assert t.current_snapshot_id() == s1


def test_empty_read_with_schema(spark, tmp_path):
    import pytest
    from pyspark.sql.types import LongType, StructField, StructType

    t = TableIO(str(tmp_path / "t6"))
    df = t.read(spark, schema=StructType([StructField("x", LongType())]))
    assert df.count() == 0
    with pytest.raises(ValueError):
        TableIO(str(tmp_path / "t7")).read(spark)


def test_empty_partitioned_overwrite_readable(spark, tmp_path):
    """A zero-row dynamic-partition overwrite writes NO parquet files
    (just _SUCCESS); reads must fall back to the manifest schema
    instead of failing parquet schema inference — the empty-frontier
    compaction path (code-review r02 finding)."""
    from scraper_spark.sources.tableio import TableIO

    t = TableIO(str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a")], "b int, s string")
    t.overwrite(df, partition_by=["b"])
    t.overwrite(df.where("b < 0"), partition_by=["b"])  # zero rows
    out = t.read(spark)
    assert out.count() == 0
    assert set(out.columns) == {"b", "s"}


def test_multi_root_hive_reads_one_scan(spark, tmp_path):
    """Multiple appends hive-partitioned by the same int key read back
    as ONE scan relation over the leaf dirs (not a per-snapshot
    unionByName chain — ADVICE r03): values + rebuilt partition column
    correct, plan free of Union nodes, and `partitions=` prunes which
    leaf dirs are even listed (manifest-level file pruning)."""
    import contextlib
    import io

    t = TableIO(str(tmp_path / "mr"))
    for vals, buckets in [([1, 2], [0, 1]), ([3, 4], [1, 2]), ([5], [0])]:
        df = spark.createDataFrame(
            pd.DataFrame({"x": vals, "b": buckets})
        )
        t.append(df, partition_by=["b"])
    out = t.read(spark)
    got = sorted((r.x, r.b) for r in out.collect())
    assert got == [(1, 0), (2, 1), (3, 1), (4, 2), (5, 0)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    assert "Union" not in buf.getvalue()
    # partitions= prunes the listed leaves: only b∈{0} files appear
    pruned = t.read(spark, partitions={"b": {0}})
    assert sorted((r.x, r.b) for r in pruned.collect()) == [(1, 0), (5, 0)]
    assert all("b=0" in f for f in pruned.inputFiles())
    # pruning everything away yields an empty frame with the schema
    none = t.read(spark, partitions={"b": {99}})
    assert none.count() == 0 and set(none.columns) == {"x", "b"}


def test_store_bucket_count_meta_inference(tmp_path):
    import json as _json
    import os as _os

    from scraper_spark.sources.fixtures import store_bucket_count

    # 1) meta wins
    d = tmp_path / "withmeta"; d.mkdir()
    (d / "_store_meta.json").write_text(_json.dumps({"n_buckets": 256}))
    assert store_bucket_count(str(d)) == 256
    # 2) dense hive layout infers the modulus
    d2 = tmp_path / "dense"; d2.mkdir()
    for i in range(128):
        _os.makedirs(d2 / f"pbucket={i}")
    assert store_bucket_count(str(d2)) == 128
    # 3) sparse meta-less layout falls back to the historical 64
    d3 = tmp_path / "sparse"; d3.mkdir()
    for i in (0, 3, 9):
        _os.makedirs(d3 / f"pbucket={i}")
    assert store_bucket_count(str(d3)) == 64


def test_named_query_registry(spark):
    """S7 stored-proc analog: named parameterized SQL templates bound
    to views at call time; parameter values are whitelist-validated."""
    import pytest

    from scraper_spark.sources.named_queries import expand, run_named

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "c_custkey": [1, 2, 3, 4],
                "c_name": ["a", "b", "c", "d"],
                "c_acctbal": [10.0, 40.0, 30.0, 20.0],
                "c_mktsegment": ["X", "X", "X", "Y"],
            }
        )
    )
    df.createOrReplaceTempView("nq_customer")
    out = run_named(
        spark,
        "top_customers_by_balance",
        {"customer": "nq_customer"},
        segment="X",
        k=2,
    ).toPandas()
    assert list(out.c_custkey) == [2, 3]  # top-2 by balance, ordered
    assert list(out.columns) == ["c_custkey", "c_name", "bal"]
    # injection-shaped parameter values are rejected before expansion
    with pytest.raises(ValueError):
        expand(
            "top_customers_by_balance",
            {"customer": "nq_customer"},
            {"segment": "X' OR '1'='1", "k": 2},
        )
    with pytest.raises(ValueError):
        expand(
            "top_customers_by_balance",
            {"customer": "nq_customer; DROP"},
            {"segment": "X", "k": 2},
        )
    # unquoted slots take real numbers only: a whitelist-clean STRING
    # would expand to extra SQL tokens ("LIMIT 5 OFFSET 3")
    with pytest.raises(ValueError):
        expand(
            "top_customers_by_balance",
            {"customer": "nq_customer"},
            {"segment": "X", "k": "5 OFFSET 3"},
        )
    # slot classification is per OCCURRENCE: a param used both quoted
    # and unquoted is numeric-only, and a partial slot ('%{p}%') is
    # not a string slot
    from scraper_spark.sources.named_queries import _string_slot_params

    assert _string_slot_params("WHERE a = '{x}' LIMIT {x}") == set()
    assert _string_slot_params("LIKE '%{x}%' AND b = '{y}'") == {"y"}


def test_notify_sink_gates_and_audits(spark, tmp_path):
    """K8 conditional notify: fires only when the gate trips; each
    firing appends one auditable row to the notifications table."""
    from scraper_spark.sources.notify import (
        notify_if,
        notify_on_threshold,
        table_transport,
    )

    t = TableIO(str(tmp_path / "notifications"))
    send = table_transport(t)
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["a", "b", "c"], "errors": [0.0, 5.0, 12.0]})
    )
    # below min_rows → no fire, no table
    assert not notify_if(df.where("errors > 100"), "err_gate", "r1", send)
    assert not t.exists()
    # threshold gate fires with the filtered sample
    assert notify_on_threshold(df, "err_gate", "r2", send, "errors", 10.0)
    rows = t.read(spark).toPandas()
    assert len(rows) == 1
    assert rows.iloc[0]["n_rows"] == 1 and rows.iloc[0]["gate"] == "err_gate"
    assert "url=c" in rows.iloc[0]["sample"]
    # plain row-count gate
    assert notify_if(df, "any_rows", "r3", send)
    assert len(t.read(spark).toPandas()) == 2


def _live_data_dirs(t):
    import os

    return sorted(os.listdir(os.path.join(t.root, "data")))


def test_compact_appends_two_phase(spark, tmp_path):
    """compact_appends merges the pending delta snapshots into one
    op='compact' entry that REPLACES them for readers at/after it,
    while rollback to an earlier id resurfaces the originals — the
    crash-safe two-phase shape (VERDICT r04 #2)."""
    t = TableIO(str(tmp_path / "tc"))
    t.overwrite(_df(spark, [0]))              # base (id 1)
    for v in (1, 2, 3):
        t.append(_df(spark, [v]))             # ids 2..4
    pre = t.current_snapshot_id()
    cid = t.compact_appends(spark, upto_id=pre)
    assert cid == 5
    assert sorted(r.x for r in t.read(spark).collect()) == [0, 1, 2, 3]
    # time travel to a mid-pile id still resolves the originals
    assert sorted(r.x for r in t.read(spark, as_of=3).collect()) == [0, 1, 2]
    # live view = base + the one compact pile
    assert [s["op"] for s in t._entries_as_of(None)] == ["overwrite", "compact"]
    # a second window re-compacts the pile together with new appends
    t.append(_df(spark, [4]))
    t.append(_df(spark, [5]))
    cid2 = t.compact_appends(spark, upto_id=t.current_snapshot_id())
    assert sorted(r.x for r in t.read(spark).collect()) == [0, 1, 2, 3, 4, 5]
    assert [s["op"] for s in t._entries_as_of(None)] == ["overwrite", "compact"]
    # rollback across the compaction boundary: compact entries drop,
    # originals resurface, content identical
    t.rollback(pre)
    assert sorted(r.x for r in t.read(spark).collect()) == [0, 1, 2, 3]
    assert len(t.pending_appends(pre)) == 3


def test_expire_snapshots_drops_covered_dirs(spark, tmp_path):
    """expire_snapshots physically drops replaced/pre-overwrite entries
    once the keep-from id covers them — and never before."""
    t = TableIO(str(tmp_path / "te"))
    t.append(_df(spark, [1]))                  # id 1
    t.overwrite(_df(spark, [0]))               # id 2: pre-overwrite junk above
    for v in (1, 2):
        t.append(_df(spark, [v]))              # ids 3, 4
    cid = t.compact_appends(spark, upto_id=4)  # id 5 replaces 3, 4
    # keep-from BEFORE the compact: replaced entries must survive
    assert t.expire_snapshots(4) == 1          # only the pre-overwrite id 1
    assert {s["id"] for s in t.snapshots()} == {2, 3, 4, 5}
    # keep-from covering the compact: replaced dirs go
    assert t.expire_snapshots(cid) == 2
    assert {s["id"] for s in t.snapshots()} == {2, 5}
    assert sorted(r.x for r in t.read(spark).collect()) == [0, 1, 2]
    assert len(_live_data_dirs(t)) == 2  # disk matches the manifest
