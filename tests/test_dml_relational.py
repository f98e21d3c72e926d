"""TableIO row-level DML (K4/K5/T7) + schema-intersection helpers (J7)."""

import pandas as pd

from pyspark.sql import functions as F

from scraper_spark.functions.relational import align_to, common_columns, union_common
from scraper_spark.sources.tableio import TableIO


def _t(spark, tmp_path, name, rows, schema):
    t = TableIO(str(tmp_path / name))
    t.append(spark.createDataFrame(rows, schema))
    return t


def test_delete_where(spark, tmp_path):
    t = _t(spark, tmp_path, "d", [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    t.delete_where(spark, F.col("k") == 2)
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 3]
    # time travel still sees the pre-delete snapshot
    assert t.read(spark, as_of=1).count() == 3


def test_update_set(spark, tmp_path):
    t = _t(spark, tmp_path, "u", [(1, "a"), (2, "b")], "k int, v string")
    t.update_set(spark, F.col("k") == 2, {"v": F.lit("B")})
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B"}


def test_delete_where_null_condition_keeps_row(spark, tmp_path):
    """SQL DELETE semantics: only TRUE conditions delete — a NULL
    condition (NULL column under `<`) keeps the row, matching the
    DuckDB twin (a bare `~cond` filter would silently drop it)."""
    t = _t(
        spark, tmp_path, "dn",
        [(1, -5.0), (2, None), (3, 7.0)], "k int, bal double",
    )
    t.delete_where(spark, F.col("bal") < 0)
    assert sorted(r.k for r in t.read(spark).collect()) == [2, 3]


def test_update_set_evaluates_against_pre_update_row(spark, tmp_path):
    """SQL UPDATE semantics: all assignments and the condition read the
    PRE-update row, so SET a=b, b=a swaps (sequential column rewrites
    would yield a=b=old_b)."""
    t = _t(spark, tmp_path, "us", [(1, 2, 1), (2, 5, 9)], "k int, a int, b int")
    t.update_set(
        spark, F.col("a") > F.col("b"), {"a": F.col("b"), "b": F.col("a")}
    )
    got = {r.k: (r.a, r.b) for r in t.read(spark).collect()}
    assert got == {1: (1, 2), 2: (5, 9)}


def test_merge_upsert_last_wins(spark, tmp_path):
    t = _t(spark, tmp_path, "m", [(1, "old"), (2, "keep")], "k int, v string")
    incoming = spark.createDataFrame([(1, "new"), (3, "ins")], "k int, v string")
    t.merge_upsert(spark, incoming, "k")
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_common_columns_case_insensitive(spark):
    a = spark.createDataFrame([(1, "x", 2.0)], "K int, V string, extra double")
    b = spark.createDataFrame([("y", 9)], "v string, k int")
    assert common_columns(a, b) == ["K", "V"]


def test_union_common(spark):
    a = spark.createDataFrame([(1, "x", 2.0)], "k int, v string, extra double")
    b = spark.createDataFrame([("y", 9, True)], "V string, K int, flag boolean")
    out = union_common(a, b)
    assert sorted(out.columns) == ["k", "v"]
    assert out.count() == 2


def test_align_to_fills_missing_and_casts(spark):
    target = spark.createDataFrame([(1, "a", 0.5)], "k int, v string, w double")
    incoming = spark.createDataFrame([("9", "z")], "K string, v string")
    out = align_to(incoming, target)
    assert out.columns == ["k", "v", "w"]
    row = out.collect()[0]
    assert row.k == 9 and row.v == "z" and row.w is None
