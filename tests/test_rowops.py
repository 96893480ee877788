from pyspark.sql import functions as F

from node_etl_spark.context import Context
from node_etl_spark.operators import (
    Array2Map,
    Filter,
    Map2Array,
    Mapper,
    Reducer,
    Sorter,
    Thru,
    Uniquer,
)

CTX = Context()


def test_filter_and_mapper(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id int, tag string")
    out = Filter("tag = 'a'").apply(df, CTX)
    out = Mapper({"id2": "id * 2"}, keep=["tag"]).apply(out, CTX)
    rows = {(r.tag, r.id2) for r in out.collect()}
    assert rows == {("a", 2), ("a", 6)}


def test_sorter_limit(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "v int")
    out = Sorter(by=["v"], ascending=[False], limit=3).apply(df, CTX)
    assert [r.v for r in out.collect()] == [19, 18, 17]


def test_reducer(spark):
    df = spark.createDataFrame([("x", 1.0), ("x", 2.0), ("y", 5.0)], "k string, v double")
    out = Reducer(keys=["k"], aggs={"n": F.count(F.lit(1)), "s": F.sum("v")}).apply(df, CTX)
    assert {(r.k, r.n, r.s) for r in out.collect()} == {("x", 2, 3.0), ("y", 1, 5.0)}


def test_uniquer_first_wins(spark):
    # reference job-uniquer.js keeps the *first* occurrence; we model
    # arrival order with an explicit order column
    df = spark.createDataFrame(
        [(1, "k1", "first"), (2, "k1", "second"), (3, "k2", "only")],
        "seq int, k string, val string",
    )
    out = Uniquer(keys=["k"], order_by=["seq"]).apply(df, CTX)
    assert {(r.k, r.val) for r in out.collect()} == {("k1", "first"), ("k2", "only")}


def test_uniquer_unordered(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id int, t string")
    assert Uniquer(keys=["id"]).apply(df, CTX).count() == 2


def test_thru_explode(spark):
    df = spark.createDataFrame([(1, [10, 20]), (2, [30])], "id int, xs array<int>")
    out = Thru(explode="xs", explode_as=["x"], keep=["id"]).apply(df, CTX)
    assert {(r.id, r.x) for r in out.collect()} == {(1, 10), (1, 20), (2, 30)}


def test_thru_unpivot(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0)], "id int, a double, b double")
    out = Thru(unpivot=(["id"], ["a", "b"], "m", "v")).apply(df, CTX)
    assert {(r.id, r.m, r.v) for r in out.collect()} == {(1, "a", 10.0), (1, "b", 20.0)}


def test_thru_pandas_fn(spark):
    def double_it(batches):
        for pdf in batches:
            pdf["v"] = pdf["v"] * 2
            yield pdf

    df = spark.createDataFrame([(1,), (2,)], "v int")
    out = Thru(pandas_fn=double_it, schema="v int").apply(df, CTX)
    assert {r.v for r in out.collect()} == {2, 4}


def test_array2map_map2array_roundtrip(spark):
    # reference job-array2map.js:25-50 / job-map2array.js:26-42
    df = spark.createDataFrame(
        [(1, [{"id": "a", "value": 10}, {"id": "b", "value": 20}])],
        "row_id int, entries array<struct<id:string,value:int>>",
    )
    mapped = Array2Map(fields=["entries"], id_key="id", value_field="value").apply(df, CTX)
    m = mapped.collect()[0].entries
    assert m == {"a": 10, "b": 20}
    back = Map2Array(fields=["entries"], explode=True).apply(mapped, CTX)
    assert {(r.row_id, r.entries.id, r.entries.value) for r in back.collect()} == {
        (1, "a", 10),
        (1, "b", 20),
    }


def test_approx_distinct_within_rsd(spark, sf_dir):
    # HLL++ at rsd=0.02 must land within ~3 sigma of exact
    from pyspark.sql import functions as F

    from node_etl_spark.tables import table

    orders = table(spark, sf_dir, "orders")
    got = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .collect()
    )
    for r in got:
        assert abs(r.approx - r.exact) <= max(3, 0.06 * r.exact)


def test_approx_percentiles_accuracy(spark, sf_dir):
    # q101 (self-validating since r7): the hashed exact discrete
    # percentiles must agree with a direct exact computation, and the
    # in-plan rank check of the GK sketch must hold on every segment
    from node_etl_spark.plans import QUERIES
    from node_etl_spark.tables import table

    rows = QUERIES["q101_approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows and all(r.approx_rank_ok for r in rows)
    import pyspark.sql.functions as F

    # the exact side: value at rank ceil(p*n) over integer cents
    want = {
        r.c_mktsegment: (r.p50, r.p90, r.p99)
        for r in table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("c"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.expr(
                "sort_array(collect_list(c))[CAST((count(c) + 1) div 2"
                " AS INT) - 1]"
            ).alias("p50"),
            F.expr(
                "sort_array(collect_list(c))[CAST((9 * count(c) + 9)"
                " div 10 AS INT) - 1]"
            ).alias("p90"),
            F.expr(
                "sort_array(collect_list(c))[CAST((99 * count(c) + 99)"
                " div 100 AS INT) - 1]"
            ).alias("p99"),
        )
        .collect()
    }
    got = {r.c_mktsegment: (r.p50_cents, r.p90_cents, r.p99_cents) for r in rows}
    assert got == want


def test_spread_skips_derived_frames(spark, sf_dir):
    # spread() must return a post-shuffle frame UNCHANGED: probing
    # df.rdd there would execute upstream stages under AQE
    from node_etl_spark.tables import table
    from node_etl_spark.util import spread

    base = table(spark, sf_dir, "orders")
    derived = base.groupBy("o_orderstatus").count()
    assert spread(derived) is derived
    # scan-bottom frames are probed (and spread when under-split)
    out = spread(base.select("o_orderkey"))
    assert out.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 8
    )


def test_spread_logical_guard_classifies_plans(spark, sf_dir):
    # the scan-bottom test reads the logical plan: narrow chains probe,
    # anything with a join/agg/window/sort/repartition upstream is
    # derived and must be returned untouched
    from node_etl_spark.tables import table
    from node_etl_spark.util import _is_scan_bottom

    base = table(spark, sf_dir, "orders")
    assert _is_scan_bottom(base.select("o_orderkey").filter("o_orderkey > 0"))
    import pyspark.sql.functions as F

    assert not _is_scan_bottom(base.groupBy("o_orderstatus").count())
    assert not _is_scan_bottom(base.join(base.select("o_orderkey"), "o_orderkey"))
    assert not _is_scan_bottom(base.orderBy("o_orderkey"))
    assert not _is_scan_bottom(base.repartition(4))
    # expression text must not fool the matcher: sort_array is narrow
    assert _is_scan_bottom(
        base.select(F.sort_array(F.array("o_orderkey")).alias("a"))
    )
