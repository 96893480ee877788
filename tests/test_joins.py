import datetime as dt

from pyspark.sql import functions as F

from node_etl_spark.context import Context
from node_etl_spark.operators import (
    AntiJoin,
    AsofJoin,
    JoinDetail,
    Joiner,
    RangeJoin,
    SemiJoin,
    Vocab,
)

CTX = Context()


def test_joiner_left_broadcast(spark):
    # reference job-joiner.js: left-outer vocab enrichment; miss -> null
    probe = spark.createDataFrame([(1, "k1"), (2, "k2"), (3, "kX")], "id int, k string")
    vocab = spark.createDataFrame([("k1", "v1"), ("k2", "v2")], "k string, label string")
    out = Joiner([Vocab(vocab, on="k", select={"lbl": "label"})]).apply(probe, CTX)
    got = {(r.id, r.lbl) for r in out.collect()}
    assert got == {(1, "v1"), (2, "v2"), (3, None)}


def test_joiner_prefix(spark):
    probe = spark.createDataFrame([(1, "k1")], "id int, k string")
    vocab = spark.createDataFrame([("k1", "x")], "k string, val string")
    out = Joiner([Vocab(vocab, on="k", prefix="voc_")]).apply(probe, CTX)
    assert out.columns == ["k", "id", "voc_val"]


def test_join_detail_aggs_and_nest(spark):
    master = spark.createDataFrame([(1, "m1"), (2, "m2"), (3, "m3")], "mk int, name string")
    detail = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "mk int, amount double"
    )
    out = JoinDetail(
        detail, on="mk", aggs={"n": F.count(F.lit(1)), "total": F.sum("amount")},
        nest_as="details",
    ).apply(master, CTX)
    rows = {r.mk: r for r in out.collect()}
    assert rows[1].n == 2 and rows[1].total == 30.0
    assert sorted(d.amount for d in rows[1].details) == [10.0, 20.0]
    assert rows[3].n is None and rows[3].details is None  # master survives (left)


def test_semi_anti(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    right = spark.createDataFrame([(2,), (3,), (3,)], "k int")
    assert {r.k for r in SemiJoin(right, on="k").apply(left, CTX).collect()} == {2, 3}
    assert {r.k for r in AntiJoin(right, on="k").apply(left, CTX).collect()} == {1}


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_backward(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(10)), (3, "u", _ts(1)), (4, "v", _ts(5))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(2), 20.0), ("u", _ts(5), 50.0), ("u", _ts(9), 90.0)],
        "k string, ts timestamp, val double",
    )
    out = AsofJoin(
        right, on="k", left_ts="ts", right_ts="ts", payload={"v": "val"}
    ).apply(left, CTX)
    got = {r.id: r.v for r in out.collect()}
    # id=1: right@5 matches at equal ts (>= semantics); id=3: nothing before
    assert got == {1: 50.0, 2: 90.0, 3: None, 4: None}


def test_asof_dedups_equal_ts_right_rows(spark):
    left = spark.createDataFrame([(1, "u", _ts(5))], "id int, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _ts(3), 1, 10.0), ("u", _ts(3), 2, 30.0)],
        "k string, ts timestamp, rid int, val double",
    )
    out = AsofJoin(
        right, on="k", left_ts="ts", right_ts="ts",
        payload={"v": "val"}, right_id="rid",
    ).apply(left, CTX)
    assert out.collect()[0].v == 30.0  # highest rid wins at equal ts


def test_range_join_bucketed_half_open(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 9.9), (3, 10.0), (4, 25.0), (5, 99.0)], "id int, x double"
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 30.0)], "band string, lo double, hi double"
    )
    out = RangeJoin(bands, point="x", bucket_width=7.0).apply(points, CTX)
    got = {(r.id, r.band) for r in out.collect()}
    # boundary 10.0 -> band b only (half-open); 99.0 matches nothing
    assert got == {(1, "a"), (2, "a"), (3, "b"), (4, "b")}


def test_range_join_broadcast_matches_bucketed(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(50)], "id int, x double")
    bands = spark.createDataFrame(
        [("a", 0.0, 20.0), ("b", 15.0, 40.0)], "band string, lo double, hi double"
    )
    bucketed = RangeJoin(bands, point="x", bucket_width=10.0).apply(points, CTX)
    bcast = RangeJoin(bands, point="x", bucket_width=None).apply(points, CTX)
    assert {(r.id, r.band) for r in bucketed.collect()} == {
        (r.id, r.band) for r in bcast.collect()
    }


def test_joiner_uses_broadcast_plan(spark):
    probe = spark.range(1000).withColumn("k", (F.col("id") % 10).cast("string"))
    vocab = spark.createDataFrame([(str(i), f"v{i}") for i in range(10)], "k string, v string")
    out = Joiner([Vocab(vocab, on="k")]).apply(probe, CTX)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_join_matches_plain(spark):
    # one hot key (90% of rows) — salted output must equal the plain join
    left = spark.range(2000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 50) END AS k"
    )
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"v{i}") for i in range(50)], "k string, v string"
    )
    from node_etl_spark.operators import salted_join

    plain = {(r.id, r.v) for r in left.join(right, "k").collect()}
    salted = {(r.id, r.v) for r in salted_join(left, right, on="k", salt=8).collect()}
    assert salted == plain and len(plain) == 2000
