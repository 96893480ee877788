"""Count-Min sketch unit tests (KMV/bloom live in test_plans)."""


def test_cm_sketch_mergeable_and_upper_bound(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sketch import (
        cm_point_estimates,
        cm_sketch,
    )

    a = spark.createDataFrame(
        [(k,) for k in [1, 1, 2, 3, 3, 3]], "k long"
    )
    b = spark.createDataFrame([(k,) for k in [1, 4, 4]], "k long")
    # mergeability: sketch(A union B) == resum(sketch(A) union sketch(B))
    direct = {
        (r.r, r.c): r.cnt
        for r in cm_sketch(a.unionAll(b), "k", depth=3, width=8).collect()
    }
    merged_df = (
        cm_sketch(a, "k", depth=3, width=8)
        .unionAll(cm_sketch(b, "k", depth=3, width=8))
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    merged = {(r.r, r.c): r.cnt for r in merged_df.collect()}
    assert direct == merged
    # point estimates: always >= true count
    truth = (
        a.unionAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    est = {
        r.k: (r.true_cnt, r.cm_est)
        for r in cm_point_estimates(
            truth, "k", merged_df, depth=3, width=8
        ).collect()
    }
    assert set(est) == {1, 2, 3, 4}
    for k, (t, e) in est.items():
        assert e >= t, (k, t, e)
    # total inserted mass per row is preserved
    per_row = {}
    for (r, _c), cnt in merged.items():
        per_row[r] = per_row.get(r, 0) + cnt
    assert all(v == 9 for v in per_row.values())
