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
