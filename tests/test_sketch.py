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


def test_hll_accuracy_and_small_range(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sketch import hll_distinct

    n = 5000
    df = spark.range(n).select(
        F.lit("big").alias("g"), F.col("id").alias("e")
    ).union(
        spark.range(10).select(
            F.lit("small").alias("g"), F.col("id").alias("e")
        )
    )
    rows = {r.g: r for r in hll_distinct(df, "g", "e", p=10).collect()}
    # 1024 registers -> ~1.04/sqrt(1024) = 3.3% std error; 10% bound
    assert abs(rows["big"].est_distinct - n) / n < 0.10
    # small group lands in the linear-counting branch and is near-exact
    assert rows["small"].zeros > 0
    assert abs(rows["small"].est_distinct - 10) < 0.5
    # merged row covers the union (5000 + 10 overlapping ids)
    assert abs(rows["*"].est_distinct - n) / n < 0.10


def test_hll_merged_row_equals_union_sketch(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sketch import hll_distinct

    # max-merging per-group register state must give EXACTLY the
    # estimate of sketching the union directly — the mergeability
    # contract (register max is associative), not an approximation
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").alias("e"),
    )
    merged = {
        r.g: r.est_distinct for r in hll_distinct(df, "g", "e").collect()
    }["*"]
    direct = {
        r.g: r.est_distinct
        for r in hll_distinct(
            df.select(F.lit("all").alias("g"), "e"), "g", "e"
        ).collect()
    }["all"]
    assert merged == direct


def test_hll_set_algebra_identical_sets(spark):
    from node_etl_spark.functions.sketch import hll_set_algebra

    a = spark.range(1000).selectExpr("id AS e")
    (r,) = hll_set_algebra(a, a, "e").collect()
    # A == B: union estimate equals both marginals -> intersection
    # estimate equals them too, jaccard 1, exact overlap 1000
    assert r.n_a == r.n_b == r.union_est
    assert abs(r.inter_est - r.n_a) < 1e-6
    assert r.jaccard_est == 1.0
    assert r.inter_exact == 1000


def test_hll_set_algebra_disjoint_and_overlap_accuracy(spark):
    from node_etl_spark.functions.sketch import hll_set_algebra

    a = spark.range(0, 20000).selectExpr("id AS e")
    b = spark.range(10000, 30000).selectExpr("id AS e")
    (r,) = hll_set_algebra(a, b, "e").collect()
    assert r.inter_exact == 10000
    # p=10 registers: ~3% standard error on the marginals; the
    # intersection differences compound — allow 15%
    assert abs(r.err_pct) < 15.0
    assert 0.1 < r.jaccard_est < 0.6


def test_tdigest_accuracy_merge_and_determinism():
    import numpy as np

    from node_etl_spark.functions.sketch import (
        _td_compress,
        tdigest_merge,
        tdigest_quantile,
    )

    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [rng.lognormal(3, 1.5, 100000), rng.uniform(0, 5, 25000)]
    )
    parts = np.array_split(vals, 16)
    partials = []
    for p in parts:
        partials += _td_compress([(float(v), 1.0) for v in sorted(p)], 100)
    digest = tdigest_merge(partials, 100)

    # mass conservation + bounded state
    assert abs(sum(w for _, w in digest) - len(vals)) < 1e-6
    assert len(digest) < 1500  # O(delta) centroids for 125k values

    # rank error at every grid point well inside the q326 audit eps
    sv = np.sort(vals)
    for q in [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]:
        est = tdigest_quantile(digest, q)
        rank = np.searchsorted(sv, est) / len(sv)
        assert abs(rank - q) < 0.005, (q, rank)

    # deterministic: same inputs -> identical centroids (no RNG)
    digest2 = tdigest_merge(partials, 100)
    assert digest == digest2

    # merging two digests == digesting the union, up to re-compression:
    # quantile estimates from the two routes stay within the audit eps
    a = _td_compress([(float(v), 1.0) for v in sorted(vals[:60000])], 100)
    b = _td_compress([(float(v), 1.0) for v in sorted(vals[60000:])], 100)
    merged = tdigest_merge(a + b, 100)
    for q in [0.1, 0.5, 0.9]:
        est = tdigest_quantile(merged, q)
        rank = np.searchsorted(sv, est) / len(sv)
        assert abs(rank - q) < 0.005

    # edge cases: empty and single-value digests
    assert tdigest_merge([], 100) == []
    one = _td_compress([(7.0, 1.0)], 100)
    assert tdigest_quantile(one, 0.5) == 7.0


def test_tdigest_group_quantiles_distributed_merge(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sketch import tdigest_group_quantiles

    rng = np.random.default_rng(7)
    rows = []
    for g, (mu, n) in {"a": (10.0, 4000), "b": (100.0, 2500)}.items():
        for v in rng.lognormal(np.log(mu), 0.6, n):
            rows.append((g, float(v)))
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    out = tdigest_group_quantiles(df, "g", "v", [0.1, 0.5, 0.9])
    got = {(r["g"], r["q"]): r["est"] for r in out.collect()}
    assert len(got) == 6
    vals = {g: sorted(v for gg, v in rows if gg == g) for g in ("a", "b")}
    for (g, q), est in got.items():
        sv = vals[g]
        rank = sum(1 for v in sv if v <= est) / len(sv)
        assert abs(rank - q) < 0.01, (g, q, rank)
    # groups are genuinely separated (the digest is per-group state)
    assert got[("b", 0.5)] > 5 * got[("a", 0.5)]
