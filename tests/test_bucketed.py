import pytest

from node_etl_spark.sources.bucketed import read_bucketed, write_bucketed
from node_etl_spark.tables import table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    write_bucketed(
        table(spark, sf_dir, "orders"),
        "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    o = read_bucketed(spark, "b_orders")
    li = read_bucketed(spark, "b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, on="o_orderkey").select("o_orderkey", "l_quantity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    # the whole point of co-bucketing: bucket-to-bucket join, no shuffle
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    o = read_bucketed(spark, "b_orders")
    li = read_bucketed(spark, "b_lineitem")
    bucketed_count = o.join(li, on="o_orderkey").count()
    plain = table(spark, sf_dir, "orders").join(
        table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        on="o_orderkey",
    ).count()
    assert bucketed_count == plain


def test_groupby_on_bucket_key_skips_shuffle(spark, bucketed_tables):
    li = read_bucketed(spark, "b_lineitem")
    agg = li.groupBy("o_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_compact_small_files(spark, sf_dir, tmp_path):
    import glob

    from node_etl_spark.sources.bucketed import compact

    path = str(tmp_path / "shattered")
    df = table(spark, sf_dir, "orders")
    df.repartition(40).write.parquet(path)  # simulate streaming debris
    before = len(glob.glob(f"{path}/part-*"))
    n_rows = df.count()
    n_out = compact(spark, path, target_file_mb=256)
    after = len(glob.glob(f"{path}/part-*"))
    assert before == 40 and after == n_out == 1
    assert spark.read.parquet(path).count() == n_rows
