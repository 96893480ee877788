"""Data-quality suite, PSI drift, sketch accuracy, compaction."""

import pyspark.sql.functions as F

from node_etl_spark.functions import dq
from node_etl_spark.functions.profile import psi_drift
from node_etl_spark.sources import compact_parquet
from node_etl_spark.tables import table


def test_dq_suite_counts_seeded_violations(spark):
    rows = [
        # (id, val, flag, fk)
        (1, 5.0, "A", 10),
        (2, 5.0, "B", 10),
        (3, 99.0, "A", 10),   # val out of range
        (3, 5.0, "Z", 11),    # dup id + bad flag + orphan fk
        (None, 5.0, "A", 10), # null id
    ]
    df = spark.createDataFrame(rows, "id int, val double, flag string, fk int")
    dim = spark.createDataFrame([(10,)], "k int")
    out = {
        r["check"]: (r["n_violations"], r["n_rows"], r["passed"])
        for r in dq.dq_suite(
            df,
            checks=[
                dq.not_null("id"),
                dq.in_range("val", 0.0, 10.0),
                dq.accepted_values("flag", ["A", "B"]),
            ],
            unique=[["id"]],
            references=[("fk", dim, "k")],
        ).collect()
    }
    assert out["not_null(id)"] == (1, 5, False)
    assert out["in_range(val)"] == (1, 5, False)
    assert out["accepted_values(flag)"] == (1, 5, False)
    assert out["unique(id)"] == (2, 5, False)  # both rows of the dup pair
    assert out["referential(fk)"] == (1, 5, False)


def test_dq_suite_passes_clean_table(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id int, flag string")
    out = dq.dq_suite(
        df, checks=[dq.not_null("id")], unique=[["id"]]
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_dq_row_checks_single_scan(spark):
    # all row-level checks must collapse into ONE aggregate over ONE scan
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    plan = (
        dq.row_checks(df, [dq.not_null("id"), dq.in_range("v", 0, 50)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Range (0, 100") == 1


def test_psi_zero_on_homogeneous_split(spark, sf_dir):
    # an orderkey-parity split draws both cohorts from the same
    # distribution -> PSI far below the 0.1 "stable" threshold
    out = psi_drift(
        table(spark, sf_dir, "orders"),
        "o_totalprice",
        F.col("o_orderkey") % 2 == 0,
        bins=10,
    ).collect()
    assert len(out) == 10
    assert abs(out[0]["total_psi"]) < 0.05


def test_psi_large_on_disjoint_ranges(spark):
    df = spark.range(2000).select(
        (F.col("id") % 2 == 0).alias("ref"),
        # ref cohort ~ [0, 1000); cur cohort ~ [5000, 6000)
        F.when(F.col("id") % 2 == 0, F.col("id") / 2)
        .otherwise(5000 + F.col("id") / 2)
        .alias("x"),
    )
    out = psi_drift(df, "x", F.col("ref"), bins=10).collect()
    assert out[0]["total_psi"] > 1.0  # way past the 0.25 drift bar


def test_hll_weekly_estimates_match_exact(spark, sf_dir):
    # q118 (self-validating since r7): the hashed exact columns must
    # agree with a direct computation and both in-plan sketch-accuracy
    # booleans must hold on every week
    from node_etl_spark.plans import QUERIES

    rows = QUERIES["q118_sketch_rollup"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["users_ok"] for r in rows)
    assert all(r["p50_rank_ok"] for r in rows)
    exact = {
        r["week"]: (r["exact_users"], r["n_events"])
        for r in (
            table(spark, sf_dir, "events")
            .groupBy(F.weekofyear(F.col("ts").cast("date")).alias("week"))
            .agg(
                F.countDistinct("user_id").alias("exact_users"),
                F.count(F.lit(1)).alias("n_events"),
            )
        ).collect()
    }
    got = {r["week"]: (r["exact_users"], r["n_events"]) for r in rows}
    assert got == exact


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob

    path = str(tmp_path / "frag")
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(20).write.parquet(path)
    before = len(glob.glob(path + "/*.parquet"))
    assert before == 20
    checksum_before = spark.read.parquet(path).agg(F.sum("id"), F.count("*")).first()

    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    after = len(glob.glob(path + "/*.parquet"))
    assert after == 1
    assert spark.read.parquet(path).agg(F.sum("id"), F.count("*")).first() == checksum_before
    # no leftover staging dirs
    assert glob.glob(str(tmp_path / "frag__*")) == []


# ------------------------------------------------ OLS trend fit


def test_ols_trend_exact_line(spark):
    from node_etl_spark.functions.profile import ols_trend

    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 200), ("a", 3, 300),
         ("b", 1, 50), ("b", 2, 40), ("b", 3, 30)],
        "g string, x long, y long",
    )
    got = {r.g: (r.slope, r.intercept, r.n_points)
           for r in ols_trend(df, ["g"], "x", "y").collect()}
    assert got["a"] == (100.0, 0.0, 3)
    assert got["b"] == (-10.0, 60.0, 3)


def test_ols_trend_drops_degenerate_groups(spark):
    from node_etl_spark.functions.profile import ols_trend

    df = spark.createDataFrame(
        [("one", 5, 7),               # single point
         ("flat", 2, 1), ("flat", 2, 9),  # zero x-variance
         ("ok", 0, 0), ("ok", 1, 2)],
        "g string, x long, y long",
    )
    got = {r.g for r in ols_trend(df, ["g"], "x", "y").collect()}
    assert got == {"ok"}


# ------------------------------------------------ Benford profile


def test_benford_profile_counts_and_terms(spark):
    import math

    from node_etl_spark.functions.dq import benford_profile

    # amounts 1.00..9.00 once each -> each digit observed exactly once
    df = spark.createDataFrame(
        [(float(d),) for d in range(1, 10)], "amt double"
    )
    rows = {r.digit: r for r in benford_profile(df, "amt").collect()}
    assert set(rows) == set(range(1, 10))
    for d in range(1, 10):
        assert rows[d].observed == 1
        p = math.log10(1 + 1 / d)
        assert abs(rows[d].expected_p - p) < 1e-15
        assert abs(rows[d].chi2_term - (1 - 9 * p) ** 2 / (9 * p)) < 1e-9


def test_benford_profile_ignores_nonpositive_and_fills_zero_digits(spark):
    from node_etl_spark.functions.dq import benford_profile

    df = spark.createDataFrame(
        [(123.0,), (19.99,), (-5.0,), (0.0,)], "amt double"
    )
    rows = {r.digit: r.observed for r in benford_profile(df, "amt").collect()}
    assert rows[1] == 2  # 123.00 and 19.99 both lead with 1
    assert sum(rows.values()) == 2 and len(rows) == 9  # zeros present


# ------------------------------------------------ CUSUM drift


def test_cusum_matches_textbook_recursion(spark):
    from node_etl_spark.functions.dq import cusum_shift

    # hand series with a level shift at t=5: 10,10,10,10,10,30,30,30
    vals = [10, 10, 10, 10, 10, 30, 30, 30]
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(vals)], "g string, t long, value long"
    )
    got = {r.t: (r.s_pos, r.s_neg, r.alarm)
           for r in cusum_shift(df, ["g"], "t", "value", threshold=20).collect()}
    # reference recursion with ref = mean DIV = 140//8 = 17
    ref, sp, sn = 17, 0, 0
    for t, v in enumerate(vals):
        sp = max(0, sp + (v - ref))
        sn = max(0, sn - (v - ref))
        assert got[t] == (sp, sn, sp > 20 or sn > 20), f"t={t}"


def test_cusum_explicit_ref_col(spark):
    from node_etl_spark.functions.dq import cusum_shift

    df = spark.createDataFrame(
        [("g", 0, 5, 0), ("g", 1, 5, 0), ("g", 2, 5, 0)],
        "g string, t long, value long, baseline long",
    )
    rows = cusum_shift(df, ["g"], "t", "value", threshold=11,
                       ref_col="baseline").collect()
    by_t = {r.t: r.s_pos for r in rows}
    assert by_t == {0: 5, 1: 10, 2: 15}
    assert [r.alarm for r in sorted(rows, key=lambda r: r.t)] == [False, False, True]


# ------------------------------------------------ Gini concentration


def test_gini_uniform_is_zero_and_extreme_near_one(spark):
    from node_etl_spark.functions.profile import gini_concentration

    even = spark.createDataFrame(
        [(f"g{i}", 1, 100) for i in range(10)], "g string, row int, v long"
    )
    r = gini_concentration(even, "g", "v").first()
    assert r.n_groups == 10 and r.total == 1000
    assert abs(r.gini) < 1e-12

    skewed = spark.createDataFrame(
        [("whale", 1, 10_000)] + [(f"g{i}", 1, 1) for i in range(9)],
        "g string, row int, v long",
    )
    r2 = gini_concentration(skewed, "g", "v").first()
    assert r2.gini > 0.85


def test_gini_known_value(spark):
    from node_etl_spark.functions.profile import gini_concentration

    # x = [1,2,3,4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)], "g string, v long"
    )
    assert gini_concentration(df, "g", "v").first().gini == 0.25


# ------------------------------------------------ KS drift


def test_ks_statistic_known_value(spark):
    from node_etl_spark.functions.profile import ks_statistic

    # g1 = {1,2,3,4}, g2 = {3,4,5,6}: D = 1/2 at value 2
    rows = [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [3, 4, 5, 6]]
    df = spark.createDataFrame(rows, "g string, value long")
    r = ks_statistic(df, "g", "value", "a", "b").first()
    assert (r.n1, r.n2) == (4, 4)
    assert r.ks == 0.5 and r.d_num == 8


def test_ks_statistic_identical_and_disjoint(spark):
    from node_etl_spark.functions.profile import ks_statistic

    same = spark.createDataFrame(
        [("a", v) for v in [1, 2, 2, 9]] + [("b", v) for v in [1, 2, 2, 9]],
        "g string, value long",
    )
    assert ks_statistic(same, "g", "value", "a", "b").first().ks == 0.0

    disj = spark.createDataFrame(
        [("a", v) for v in [1, 2]] + [("b", v) for v in [10, 11]],
        "g string, value long",
    )
    assert ks_statistic(disj, "g", "value", "a", "b").first().ks == 1.0


def test_ks_statistic_scipy_crosscheck(spark):
    import random

    from node_etl_spark.functions.profile import ks_statistic

    rng = random.Random(7)
    a = [rng.randint(0, 60) for _ in range(150)]
    b = [rng.randint(10, 90) for _ in range(120)]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, value long"
    )
    got = ks_statistic(df, "g", "value", "a", "b").first().ks

    # reference: brute-force two-sample KS with ties
    def ecdf(xs, v):
        return sum(1 for x in xs if x <= v) / len(xs)

    want = max(abs(ecdf(a, v) - ecdf(b, v)) for v in set(a) | set(b))
    assert abs(got - want) < 1e-12


# ------------------------------------------------ Mann-Whitney U


def test_mannwhitney_scipy_style_crosscheck(spark):
    import random

    from node_etl_spark.functions.profile import mannwhitney_u

    rng = random.Random(11)
    a = [rng.randint(0, 50) for _ in range(80)]
    b = [rng.randint(20, 70) for _ in range(60)]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, value long"
    )
    r = mannwhitney_u(df, "g", "value", "a", "b").first()

    # brute-force U1 = #(x > y) + 0.5 * #(x == y) over all pairs
    wins = sum(1 for x in a for y in b if x > y)
    ties = sum(1 for x in a for y in b if x == y)
    assert r.u1_x2 == 2 * wins + ties
    assert abs(r.auc - (wins + 0.5 * ties) / (len(a) * len(b))) < 1e-12


def test_mannwhitney_extremes(spark):
    from node_etl_spark.functions.profile import mannwhitney_u

    # all of g1 strictly above g2 -> AUC 1; identical -> AUC 0.5
    hi = spark.createDataFrame(
        [("a", v) for v in [10, 11]] + [("b", v) for v in [1, 2]],
        "g string, value long",
    )
    assert mannwhitney_u(hi, "g", "value", "a", "b").first().auc == 1.0
    same = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 5), ("b", 7)], "g string, value long"
    )
    assert mannwhitney_u(same, "g", "value", "a", "b").first().auc == 0.5


def test_snapshot_diff_classifies(spark):
    from node_etl_spark.functions.dq import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 21.0), (3, "c", None), (5, "e", 50.0)],
        "id bigint, s string, v double",
    )
    out = {r.id: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert out[1].status == "unchanged" and out[1].changed_cols == ""
    assert out[2].status == "changed" and out[2].changed_cols == "s,v"
    assert out[3].status == "unchanged"  # NULL <-> NULL is no change
    assert out[4].status == "removed"
    assert out[5].status == "added"


def test_snapshot_diff_null_transitions_are_changes(spark):
    from node_etl_spark.functions.dq import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id bigint, v double")
    new = spark.createDataFrame([(1, 5.0)], "id bigint, v double")
    r = snapshot_diff(old, new, ["id"]).collect()[0]
    assert r.status == "changed" and r.changed_cols == "v"


def test_fd_audit_detects_violations(spark):
    from node_etl_spark.functions.profile import fd_audit

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "x"), (4, "b", "y"), (None, "c", "z")],
        "k bigint, g string, v string",
    )
    out = {(r.lhs_col, r.rhs_col): r for r in fd_audit(
        df, [("k", "g"), ("g", "v")]
    ).collect()}
    kg = out[("k", "g")]
    assert kg.holds and kg.n_groups == 4  # null lhs excluded
    gv = out[("g", "v")]
    assert not gv.holds and gv.n_violating == 1 and gv.max_fanout == 2
