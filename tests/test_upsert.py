"""Key-based parquet upsert (sources/upsert.py)."""

from __future__ import annotations

import os

from node_etl_spark.sources.upsert import last_write_wins, upsert_parquet


def _rows(spark, data):
    return spark.createDataFrame(data, "k long, v string, ver long")


def _read(spark, path):
    return {
        (r["k"]): (r["v"], r["ver"])
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_creates_then_merges(spark, tmp_path):
    path = str(tmp_path / "t")
    upsert_parquet(spark, path, _rows(spark, [(1, "a", 1), (2, "b", 1)]), ["k"])
    upsert_parquet(spark, path, _rows(spark, [(2, "B", 2), (3, "c", 1)]), ["k"])
    assert _read(spark, path) == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}


def test_order_col_keeps_newer_existing(spark, tmp_path):
    # without order_col, updates always win; with it, version decides
    path = str(tmp_path / "t")
    upsert_parquet(spark, path, _rows(spark, [(1, "new", 5)]), ["k"])
    merged = last_write_wins(
        spark.read.parquet(path),
        _rows(spark, [(1, "stale", 3)]),
        ["k"],
        order_col=None,
    )
    assert merged.first()["v"] == "stale"  # updates-beat-existing default
    merged2 = last_write_wins(
        _rows(spark, [(1, "new", 5), (1, "stale", 3)]),
        spark.createDataFrame([], "k long, v string, ver long"),
        ["k"],
        order_col="ver",
    )
    assert merged2.first()["v"] == "new"


def test_partitioned_upsert_touches_only_affected(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")], "k long, v string, p string"
    )
    upsert_parquet(spark, path, base, ["k"], partition_by=["p"])
    p2_files = sorted(os.listdir(os.path.join(path, "p=p2")))
    p2_mtime = os.path.getmtime(os.path.join(path, "p=p2"))

    upd = spark.createDataFrame([(2, "B", "p1"), (4, "d", "p1")], "k long, v string, p string")
    n = upsert_parquet(spark, path, upd, ["k"], partition_by=["p"])
    assert n == 3  # p1 now holds keys 1, 2, 4

    got = {r["k"]: (r["v"], r["p"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", "p1"), 2: ("B", "p1"), 3: ("c", "p2"), 4: ("d", "p1")}
    # untouched partition's files were not rewritten
    assert sorted(os.listdir(os.path.join(path, "p=p2"))) == p2_files
    assert os.path.getmtime(os.path.join(path, "p=p2")) == p2_mtime


def test_empty_updates_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", "p1")], "k long, v string, p string")
    upsert_parquet(spark, path, base, ["k"], partition_by=["p"])
    empty = spark.createDataFrame([], "k long, v string, p string")
    assert upsert_parquet(spark, path, empty, ["k"], partition_by=["p"]) == 0
    assert spark.read.parquet(path).count() == 1
