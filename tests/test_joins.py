from pyspark.sql import functions as F

from node_etl_spark.context import Context
from node_etl_spark.operators import AntiJoin, JoinDetail, Joiner, SemiJoin, Vocab

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


def test_joiner_uses_broadcast_plan(spark):
    probe = spark.range(1000).withColumn("k", (F.col("id") % 10).cast("string"))
    vocab = spark.createDataFrame([(str(i), f"v{i}") for i in range(10)], "k string, v string")
    out = Joiner([Vocab(vocab, on="k")]).apply(probe, CTX)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
