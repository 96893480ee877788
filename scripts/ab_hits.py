"""Interleaved A/B: old hits (single cached edge copy, per-half-round
edge shuffles) vs new hits (two pre-partitioned cached copies).
Alternating runs in one session cancel box-speed drift."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from node_etl_spark.session import get_spark  # noqa: E402
from node_etl_spark.tables import table  # noqa: E402
from node_etl_spark.functions.graph import hits as hits_new  # noqa: E402


def hits_old(edges: DataFrame, rounds: int = 4) -> DataFrame:
    e = edges.select(F.col("src").alias("s"), F.col("dst").alias("d"))
    e = e.distinct().persist()
    hubs = e.select("s").distinct().select(
        "s", F.lit(1_000_000).cast("bigint").alias("h")
    ).localCheckpoint(eager=True)

    def renorm(df: DataFrame, col: str) -> DataFrame:
        m = df.agg(F.max(F.col(col).cast("double")).alias("m"))
        return df.crossJoin(F.broadcast(m)).select(
            df.columns[0],
            F.floor(
                F.col(col).cast("double") / F.col("m") * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias(col),
        )

    auth = None
    for _ in range(rounds):
        raw_a = e.join(hubs, "s").groupBy("d").agg(F.sum("h").alias("a"))
        auth = renorm(raw_a, "a").localCheckpoint(eager=True)
        raw_h = e.join(auth, "d").groupBy("s").agg(F.sum("a").alias("h"))
        hubs = renorm(raw_h, "h").localCheckpoint(eager=True)
    out = hubs.select(
        F.col("s").cast("string").alias("node"),
        F.lit("hub").alias("role"),
        F.col("h").alias("score"),
    ).unionAll(
        auth.select(
            F.col("d").cast("string").alias("node"),
            F.lit("authority").alias("role"),
            F.col("a").alias("score"),
        )
    )
    e.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-hits")
    spark.range(1).count()
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def edges():
        return orders.join(li, li.l_orderkey == orders.o_orderkey).select(
            F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
        )

    def clear() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    # warm both paths once
    for fn in (hits_old, hits_new):
        fn(edges(), rounds=4).write.format("noop").mode("overwrite").save()
        clear()

    times = {"old": [], "new": []}
    for _ in range(3):
        for name, fn in (("old", hits_old), ("new", hits_new)):
            t0 = time.time()
            fn(edges(), rounds=4).write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
            clear()
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.2f} all=" + ",".join(f"{t:.2f}" for t in ts))

    # result equality (order-insensitive)
    a = sorted(map(tuple, hits_old(edges(), rounds=4).collect()))
    clear()
    b = sorted(map(tuple, hits_new(edges(), rounds=4).collect()))
    print("identical:", a == b, "rows:", len(a))


if __name__ == "__main__":
    main()
