from pyspark.sql import functions as F

from node_etl_spark.context import Context
from node_etl_spark.functions import scalars
from node_etl_spark.operators import Filter, Limit, Mapper, Spy, pipeline_dag
from node_etl_spark.pipeline import Pipeline
from node_etl_spark.sources import FrameSource


def test_spy_metrics(spark):
    # reference per-job spy tap (jobs/job.js:202-210) as observe() metrics
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id int, v double")
    spy = Spy({"n": F.count(F.lit(1)), "total": F.sum("v")})
    pipe = Pipeline([FrameSource(df), Filter("id >= 5"), spy])
    out = pipe.run(spark)
    out.collect()
    got = spy.get()
    assert got == {"n": 5, "total": 35.0}


def test_limit(spark):
    df = spark.range(1000).toDF("v")
    assert Limit(7).apply(df, Context()).count() == 7


def test_pipeline_dag_export(spark):
    # getLinkedJobs {nodes, links} export (job-pipeline.js:108-151)
    df = spark.createDataFrame([(1,)], "v int")
    inner = Pipeline([Mapper({"v": "v + 1"})], name="inner")
    pipe = Pipeline([FrameSource(df, name="src"), Filter("v > 0", name="flt"), inner])
    dag = pipeline_dag(pipe)
    names = [n["name"] for n in dag["nodes"]]
    assert names == ["src", "flt", "Mapper"]
    assert dag["links"] == [
        {"source": 0, "target": 1, "value": 1},
        {"source": 1, "target": 2, "value": 1},
    ]
    assert dag["nodes"][0]["isWriteable"] is False


def test_quarter_scalars(spark):
    df = spark.createDataFrame([(2016, 2)], "y int, q int")
    row = df.select(
        F.date_format(scalars.start_quarter_date("y", "q"), "yyyy-MM-dd").alias("s"),
        F.date_format(scalars.end_quarter_date("y", "q"), "yyyy-MM-dd").alias("e"),
    ).collect()[0]
    assert row.s == "2016-04-01"
    assert row.e == "2016-06-30"


def test_quarter_bucket(spark):
    df = spark.createDataFrame([("2020-11-15",)], "d string")
    got = df.select(scalars.quarter_bucket(F.to_timestamp("d")).alias("b")).collect()[0].b
    assert got == "2020-Q4"
