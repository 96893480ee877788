

def test_decayed_trending_hand_weights(spark):
    from datetime import datetime

    from node_etl_spark.functions.profile import decayed_trending

    # newest day weighs 1, one day old 1/2, two days old 1/4
    rows = [
        ("a", datetime(2024, 1, 3, 10), 8.0),   # w=1
        ("a", datetime(2024, 1, 2, 9), 8.0),    # w=.5
        ("b", datetime(2024, 1, 1, 23), 4.0),   # w=.25
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.event_type: r for r in decayed_trending(df).collect()}
    assert out["a"].n_events == 2
    assert abs(out["a"].decayed_count - 1.5) < 1e-9
    assert abs(out["a"].decayed_value - 12.0) < 1e-9
    assert abs(out["b"].decayed_count - 0.25) < 1e-9
    assert abs(out["b"].decayed_value - 1.0) < 1e-9


def test_decayed_trending_clamps_ancient_events(spark):
    from datetime import datetime

    from node_etl_spark.functions.profile import decayed_trending

    rows = [
        ("a", datetime(2024, 1, 1), 1.0),
        ("a", datetime(1824, 1, 1), 1e6),  # ~73k days old: weight 0
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    (r,) = decayed_trending(df).collect()
    # the ancient event contributes 2^-62 ~ 2e-19, below the decimal
    # grid -> exactly the fresh event's weight survives
    assert r.n_events == 2
    assert abs(r.decayed_count - 1.0) < 1e-11


def test_target_encode_loo_hand_example(spark):
    from node_etl_spark.functions.profile import target_encode_loo

    # cat "a": y = [100, 300] cents; global mean = (100+300+500)/3
    # enc(id=1) = (300 - ... ) LOO: (400-100 + 10*300) / (2-1+10)
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 300), (3, "b", 500)],
        "id bigint, cat string, y bigint",
    )
    out = {r.id: r.enc for r in target_encode_loo(df, "cat", "y", "id").collect()}
    # exact fraction form: ((cs - y) * N + m * total) / ((cn-1+m) * N)
    assert out[1] == ((400 - 100) * 3 + 10 * 900) / (11 * 3)
    assert out[2] == ((400 - 300) * 3 + 10 * 900) / (11 * 3)
    # singleton category: pure prior = total/N scaled
    assert out[3] == (0 * 3 + 10 * 900) / (10 * 3)


def test_target_encode_loo_leaves_own_target_out(spark):
    from node_etl_spark.functions.profile import target_encode_loo

    # two rows, same cat, very different targets: each row's encoding
    # must move TOWARD the other row's value, not its own
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 1000)], "id bigint, cat string, y bigint"
    )
    out = {r.id: r.enc for r in target_encode_loo(df, "cat", "y", "id", smoothing=0).collect()}
    assert out[1] == 1000.0 and out[2] == 0.0


def test_wilson_rank_sample_size_awareness(spark):
    from node_etl_spark.functions.profile import wilson_rank

    # 2/2 perfect vs 98/100: the raw rate prefers the tiny sample,
    # the Wilson lower bound must NOT
    rows = [("tiny", 1)] * 2 + [("big", 1)] * 98 + [("big", 0)] * 2
    df = spark.createDataFrame(rows, "k string, s int")
    out = {r.k: r for r in wilson_rank(df, "k", "s").collect()}
    assert out["tiny"].rate == 1.0 and out["big"].rate == 0.98
    assert out["big"].wilson_lb > out["tiny"].wilson_lb
    # closed form at z=1.96, 98/100
    import math as m

    z, n, p = 1.96, 100.0, 0.98
    lb = (
        p + z * z / (2 * n)
        - z * m.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    ) / (1 + z * z / n)
    assert abs(out["big"].wilson_lb - round(lb, 6)) < 1e-9


def test_wilson_rank_min_trials_filter(spark):
    from node_etl_spark.functions.profile import wilson_rank

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 1)], "k string, s int"
    )
    out = wilson_rank(df, "k", "s", min_trials=2).collect()
    assert [r.k for r in out] == ["a"]


def test_theil_sen_resists_outlier(spark):
    from node_etl_spark.functions.profile import theil_sen_trend

    # perfect slope 2 line with one wild outlier: Theil-Sen must
    # still report slope 2 (OLS would not)
    pts = [("g", x, 2 * x) for x in range(10)]
    pts[5] = ("g", 5, 1_000_000)
    df = spark.createDataFrame(pts, "g string, x bigint, y bigint")
    (r,) = theil_sen_trend(df, ["g"], "x", "y").collect()
    assert r.slope == 2.0
    assert r.n_pairs == 45


def test_theil_sen_lower_median_deterministic(spark):
    from node_etl_spark.functions.profile import theil_sen_trend

    # 3 points -> 3 pairwise slopes 1.0, 3.0, 2.0; lower median of
    # even/odd counts: n=3 -> rank 2 -> slope 2
    df = spark.createDataFrame(
        [("g", 0, 0), ("g", 1, 1), ("g", 2, 4)], "g string, x bigint, y bigint"
    )
    (r,) = theil_sen_trend(df, ["g"], "x", "y").collect()
    assert r.slope == 2.0 and r.dy == 4 and r.dx == 2


def test_lead_lag_corr_finds_planted_lag(spark):
    from node_etl_spark.functions.profile import lead_lag_corr

    # b is exactly a shifted by +3 days: corr at lag 3 must be 1.0
    # and strictly higher than every other lag
    import random

    rng = random.Random(5)
    vals = [rng.randrange(100, 10_000) for _ in range(60)]
    a = spark.createDataFrame(
        [(t, v) for t, v in enumerate(vals)], "t bigint, v bigint"
    )
    b = spark.createDataFrame(
        [(t + 3, v) for t, v in enumerate(vals)], "t bigint, v bigint"
    )
    out = {r.lag: r.corr for r in lead_lag_corr(a, b, max_lag=5).collect()}
    assert out[3] == 1.0
    assert all(v < 1.0 for k, v in out.items() if k != 3)


def test_lead_lag_corr_skips_degenerate_lags(spark):
    from node_etl_spark.functions.profile import lead_lag_corr

    # constant series -> zero variance -> no corr rows emitted
    a = spark.createDataFrame([(t, 5) for t in range(10)], "t bigint, v bigint")
    b = spark.createDataFrame([(t, t) for t in range(10)], "t bigint, v bigint")
    assert lead_lag_corr(a, b, max_lag=2).count() == 0


def test_attribution_models_and_conservation(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from node_etl_spark.functions.profile import attribution

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    touches = spark.createDataFrame(
        [
            (1, ts(-30), 10, "view"),    # in window
            (1, ts(-20), 11, "click"),   # in window
            (1, ts(-10), 12, "view"),    # in window (last)
            (2, ts(-200), 20, "view"),   # 200h > 7d -> outside window
            (3, ts(5), 30, "view"),      # AFTER purchase -> excluded
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    purchases = spark.createDataFrame(
        [(1, t0, 100, 1000), (2, t0, 101, 7), (3, t0, 102, 500)],
        "user_id long, ts timestamp, event_id long, cents long",
    )
    rows = {
        r.event_type: r
        for r in attribution(purchases, touches, lookback_days=7).collect()
    }
    # u1: 3 touches (view,click,view); u2/u3: nothing attributed
    # first model: u1's first touch is a view (+1000)
    assert rows["view"].first_cents == 1000
    assert rows["click"].first_cents == 0
    # last model: u1's last touch is the view at -10h
    assert rows["view"].last_cents == 1000
    assert rows["click"].last_cents == 0
    # linear: 1000 DIV 3 = 333 each, remainder 1 to first (view):
    # views get 334 + 333, click 333
    assert rows["click"].linear_cents == 333
    assert rows["view"].linear_cents == 334 + 333
    # conservation: every model distributes the same attributed total
    tot = 1000
    for col in ("first_cents", "last_cents", "linear_cents"):
        assert sum(getattr(r, col) for r in rows.values()) == tot


def test_spearman_monotone_invariance_and_ties(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.profile import spearman_corr

    # y = x^3 is a perfect monotone relation -> rho exactly 1;
    # z = -x -> rho exactly -1; Pearson on raw x^3 would be < 1
    rows = [("x", t, t) for t in range(1, 21)]
    rows += [("y", t, t**3) for t in range(1, 21)]
    rows += [("z", t, -t) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "metric string, t long, v long")
    out = {
        (r.m_a, r.m_b): r.rho for r in spearman_corr(df).collect()
    }
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0


def test_spearman_average_tie_ranks(spark):
    from node_etl_spark.functions.profile import spearman_corr

    # a: [1,2,2,3] vs b: [1,2,3,4] — tied middle pair takes the
    # average rank 2.5; closed form rho = 3*sqrt(10)/10
    rows = [("a", t, v) for t, v in enumerate([1, 2, 2, 3])]
    rows += [("b", t, v) for t, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "metric string, t long, v long")
    (r,) = spearman_corr(df).collect()
    import math

    assert abs(r.rho - 3 * math.sqrt(10) / 10) < 1e-6


def test_spearman_constant_series_null_rho(spark):
    from node_etl_spark.functions.profile import spearman_corr

    rows = [("a", t, 5) for t in range(4)]
    rows += [("b", t, v) for t, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "metric string, t long, v long")
    (r,) = spearman_corr(df).collect()
    assert r.rho is None  # zero rank variance -> undefined, not NaN


def test_sequence_mining_bounds_reduction_edge_cases(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import sequence_mining

    t0 = dt.datetime(2024, 1, 1)

    def row(u, i, et):
        return (u, et, t0 + dt.timedelta(minutes=i), i)

    # u1 timeline: b a b   -> supports a>b, b>a, b>b, b>a>b ...
    #                         but NOT a>a, NOT a>b>a
    # u2 timeline: b a c   -> b-event precedes a, so a>b>c must NOT
    #                         fire (the strictly-between check)
    rows = [row(1, 1, "b"), row(1, 2, "a"), row(1, 3, "b"),
            row(2, 1, "b"), row(2, 2, "a"), row(2, 3, "c")]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    sup = {
        r.pattern: r.support
        for r in sequence_mining(df, min_support=1).collect()
    }
    assert sup["a>b"] == 1 and sup["b>a"] == 2 and sup["b>b"] == 1
    assert "a>a" not in sup
    assert sup["b>a>b"] == 1
    assert "a>b>a" not in sup
    assert "a>b>c" not in sup          # b is BEFORE a for u2
    assert sup["b>a>c"] == 1


def test_isotonic_fit_pools_violators(spark):
    from node_etl_spark.functions.profile import isotonic_fit

    # rates [0.2, 0.5, 0.3]: bins 1,2 violate monotonicity and pool
    # to their weighted mean 0.4 -> iso = [0.2, 0.4, 0.4]
    bins = spark.createDataFrame(
        [(0, 2, 10), (1, 5, 10), (2, 3, 10)], "bin long, y long, c long"
    )
    out = {r.bin: r for r in isotonic_fit(bins).collect()}
    assert out[0].iso_rate == 0.2
    assert out[1].iso_rate == 0.4
    assert out[2].iso_rate == 0.4


def test_isotonic_fit_monotone_and_mass_conserving(spark):
    from node_etl_spark.functions.profile import isotonic_fit

    rows = [
        (b, y, c)
        for b, (y, c) in enumerate(
            [(1, 10), (5, 10), (2, 10), (9, 10), (4, 10), (10, 10)]
        )
    ]
    bins = spark.createDataFrame(rows, "bin long, y long, c long")
    out = sorted(isotonic_fit(bins).collect(), key=lambda r: r.bin)
    isos = [r.iso_rate for r in out]
    assert isos == sorted(isos)  # non-decreasing
    # PAV conserves total successes: sum(iso * c) == sum(y)
    assert abs(sum(r.iso_rate * r.c for r in out) - sum(r.y for r in out)) < 1e-6
    # already-monotone prefix is untouched
    assert out[0].iso_rate == 0.1


def test_isotonic_fit_monotone_input_identity(spark):
    from node_etl_spark.functions.profile import isotonic_fit

    bins = spark.createDataFrame(
        [(0, 1, 10), (1, 3, 10), (2, 7, 10)], "bin long, y long, c long"
    )
    out = {r.bin: r for r in isotonic_fit(bins).collect()}
    for b, want in [(0, 0.1), (1, 0.3), (2, 0.7)]:
        assert out[b].iso_rate == want


def test_coec_separates_position_bias(spark):
    from datetime import datetime, timedelta

    from node_etl_spark.functions.profile import coec_ctr

    # Two items with IDENTICAL naive CTR (0.75): item 100 always at
    # pos 1, item 200 always at pos 2.  A filler item (999) breaks
    # the prior symmetry — it is clicked 4x when shown at pos 1 and
    # 0x at pos 2, so prior(pos1)=10/16 > prior(pos2)=6/16, and the
    # same clicks earned at the worse position must score higher.
    t0 = datetime(2024, 1, 1, 8, 0)
    views, clicks = [], []
    eid = 0
    # 8 user-days; each user sees filler at pos1, then item at pos2
    # "top": shown at pos 1 (before filler) for users 0-7, clicked 6x
    for u in range(8):
        views.append((f"u{u}", 100, t0 + timedelta(days=u), eid)); eid += 1
        views.append((f"u{u}", 999, t0 + timedelta(days=u, minutes=1), eid)); eid += 1
        if u < 6:
            clicks.append((f"u{u}", 100, t0 + timedelta(days=u, minutes=5)))
    # "deep": shown at pos 2 (after filler 999) for users 8-15, clicked 6x
    for u in range(8, 16):
        views.append((f"u{u}", 999, t0 + timedelta(days=u), eid)); eid += 1
        views.append((f"u{u}", 200, t0 + timedelta(days=u, minutes=1), eid)); eid += 1
        if u < 14:
            clicks.append((f"u{u}", 200, t0 + timedelta(days=u, minutes=5)))
        if u < 12:
            clicks.append((f"u{u}", 999, t0 + timedelta(days=u, minutes=6)))
    v = spark.createDataFrame(
        views, "user_id string, item long, ts timestamp, event_id long"
    )
    c = spark.createDataFrame(clicks, "user_id string, item long, ts timestamp")
    out = {r.item: r for r in coec_ctr(v, c, min_views=8).collect()}
    # priors: pos1 = (6 + 4clicks on 999@pos1)/16, pos2 = (6 + 0... )
    # rather than hand-derive, assert the structural property: both
    # real items have ctr 0.75, but the pos-1 item is NOT favoured
    # over the pos-2 item once position is corrected
    assert out[100].ctr == out[200].ctr == 0.75
    # item 200 earned its clicks from a worse position -> higher COEC
    assert out[200].coec > out[100].coec
    assert out[100].views == out[200].views == 8


def test_coec_click_window_excludes_late_clicks(spark):
    from datetime import datetime, timedelta

    from node_etl_spark.functions.profile import coec_ctr

    t0 = datetime(2024, 1, 1, 8, 0)
    views = [(f"u{i}", 1, t0 + timedelta(days=i), i) for i in range(4)]
    clicks = [
        ("u0", 1, t0 + timedelta(minutes=29)),          # inside
        ("u1", 1, t0 + timedelta(days=1, minutes=31)),  # outside
        ("u2", 1, t0 + timedelta(days=2)),              # ts == view ts: excluded
    ]
    v = spark.createDataFrame(
        views, "user_id string, item long, ts timestamp, event_id long"
    )
    c = spark.createDataFrame(clicks, "user_id string, item long, ts timestamp")
    (r,) = coec_ctr(v, c, min_views=1).collect()
    assert r.views == 4 and r.clicks == 1
    # all views at pos 1 -> expected = 4 * (1/4) = 1 -> coec == 1.0
    assert r.coec == 1.0


def test_conformal_threshold_is_exact_order_statistic(spark):
    from node_etl_spark.functions.profile import conformal_coverage

    # single group; choose ids so the md5 split is what it is, then
    # verify the reported q_hat equals the ceil((n+1)*0.9)-th
    # smallest calibration score recomputed by hand
    rows = [("g", float(i % 37), i) for i in range(4000)]
    df = spark.createDataFrame(rows, "event_type string, value double, event_id long")
    out = conformal_coverage(df).collect()
    assert len(out) == 1
    r = out[0]
    # recompute: replicate the split and scores in python
    import hashlib
    import math

    def bkt(i):
        return int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:8], 16) % 10

    train = [v for (_, v, i) in rows if bkt(i) < 8]
    yhat = round(sum(v for v in train) / len(train), 6)
    calib = sorted(
        (round(abs(v - yhat), 6), i) for (_, v, i) in rows if bkt(i) == 8
    )
    k = math.ceil((len(calib) + 1) * 0.9)
    assert r.n_calib == len(calib)
    assert abs(r.q_hat - calib[k - 1][0]) < 1e-12
    # coverage should be near 0.9 (exact value data-dependent)
    assert 0.8 <= r.coverage <= 1.0


def test_conformal_band_path_matches_brute_force(spark):
    # round-8 scale fix: groups with n_calib >= 2000 take the
    # percentile_approx-banded path (exact order statistic inside a
    # rank-bracketing band + count-below offset) instead of ranking
    # the whole calibration slice. The value-37 modulus makes heavy
    # TIES, so band-edge tie handling (>=/<= keeps whole tie runs)
    # is exercised; the result must equal the brute-force order
    # statistic exactly.
    from node_etl_spark.functions.profile import conformal_coverage

    rows = [("g", float(i % 37), i) for i in range(26000)]
    df = spark.createDataFrame(
        rows, "event_type string, value double, event_id long"
    )
    out = conformal_coverage(df).collect()
    assert len(out) == 1
    r = out[0]
    import hashlib
    import math

    def bkt(i):
        return int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:8], 16) % 10

    train = [v for (_, v, i) in rows if bkt(i) < 8]
    yhat = round(sum(train) / len(train), 6)
    calib = sorted(
        (round(abs(v - yhat), 6), i) for (_, v, i) in rows if bkt(i) == 8
    )
    assert len(calib) >= 2000, "fixture must trigger the banded path"
    k = math.ceil((len(calib) + 1) * 0.9)
    assert r.n_calib == len(calib)
    assert abs(r.q_hat - calib[k - 1][0]) < 1e-12


def test_dp_histogram_reproducible_and_clamped(spark):
    from node_etl_spark.functions.profile import dp_histogram

    rows = [("a", 1)] * 5 + [("b", 1)]
    df = spark.createDataFrame(rows, "k string, one int")
    out1 = {r.k: r for r in dp_histogram(df, ["k"], epsilon=1.0).collect()}
    out2 = {r.k: r for r in dp_histogram(df, ["k"], epsilon=1.0).collect()}
    # seeded noise: identical across runs, nonzero somewhere
    assert {k: v.noise for k, v in out1.items()} == {
        k: v.noise for k, v in out2.items()
    }
    assert any(v.noise != 0 for v in out1.values())
    for v in out1.values():
        assert v.n_released >= 0.0
        assert abs((v.n_raw + v.noise) - v.n_released) < 1e-9 or (
            v.n_raw + v.noise < 0 and v.n_released == 0.0
        )
    # a tighter epsilon means larger noise scale: |noise| grows
    wide = {r.k: r for r in dp_histogram(df, ["k"], epsilon=0.1).collect()}
    assert all(
        abs(wide[k].noise) >= abs(out1[k].noise) for k in out1
    )


def test_offpolicy_uniform_logging_equals_naive(spark):
    from datetime import datetime, timedelta

    from node_etl_spark.functions.profile import offpolicy_eval

    # behavior ALREADY uniform over 2 items at pos 1 -> pi/mu = 1,
    # IPS == SNIPS == naive CTR, nothing clipped
    t0 = datetime(2024, 1, 1, 8, 0)
    views, clicks = [], []
    for u in range(8):
        item = 1 + (u % 2)
        views.append((f"u{u}", item, t0 + timedelta(days=u), u))
        if u < 4:
            clicks.append((f"u{u}", item, t0 + timedelta(days=u, minutes=3)))
    v = spark.createDataFrame(
        views, "user_id string, item long, ts timestamp, event_id long"
    )
    c = spark.createDataFrame(clicks, "user_id string, item long, ts timestamp")
    (r,) = offpolicy_eval(v, c).collect()
    assert r.pos == 1 and r.n == 8
    assert r.naive_ctr == r.ips_ctr == r.snips_ctr == 0.5
    assert r.clip_frac == 0.0


def test_offpolicy_upweights_rare_item(spark):
    from datetime import datetime, timedelta

    from node_etl_spark.functions.profile import offpolicy_eval

    # item 2 shown once (clicked), item 1 shown 9x (never clicked):
    # uniform target halves item 1's weight and boosts item 2 by
    # 5x -> IPS = 5/10 = 0.5 vs naive 0.1
    t0 = datetime(2024, 1, 1, 8, 0)
    views = [(f"u{u}", 1, t0 + timedelta(days=u), u) for u in range(9)]
    views.append(("u9", 2, t0 + timedelta(days=9), 9))
    clicks = [("u9", 2, t0 + timedelta(days=9, minutes=1))]
    v = spark.createDataFrame(
        views, "user_id string, item long, ts timestamp, event_id long"
    )
    c = spark.createDataFrame(clicks, "user_id string, item long, ts timestamp")
    (r,) = offpolicy_eval(v, c).collect()
    # mu(2|pos1) = 0.1, pi = 0.5 -> w = 5; ips = 5*1/10
    assert r.naive_ctr == 0.1
    assert r.ips_ctr == 0.5
    # w(item1) = 0.5/0.9 = 5/9: sum(w) = 9*(5/9) + 5 = 10 -> 0.5
    assert abs(r.snips_ctr - 0.5) < 1e-6


def test_ridge_cv_recovers_planted_coefficients(spark):
    from node_etl_spark.functions.profile import ridge_cv

    # y = 3 + 2*x1 - 5*x2 exactly, lam=0 -> every fold recovers the
    # plane to rounding
    rows = [
        (i, float(i % 17), float((i * 7) % 13), 3.0 + 2 * (i % 17) - 5.0 * ((i * 7) % 13))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "rid long, x1 double, x2 double, y double")
    out = ridge_cv(df, "x1", "x2", "y", "rid", k=5, lam=0.0).collect()
    assert len(out) == 5
    for r in out:
        assert abs(r.b0 - 3.0) < 1e-5
        assert abs(r.b1 - 2.0) < 1e-5
        assert abs(r.b2 + 5.0) < 1e-5
        assert r.mse < 1e-6
        assert r.n_train + r.n_test == 2000


def test_ridge_cv_lambda_shrinks_coefficients(spark):
    from node_etl_spark.functions.profile import ridge_cv

    rows = [
        (i, float(i % 11), float((i * 3) % 7), 10.0 * (i % 11))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "rid long, x1 double, x2 double, y double")
    free = {r.fold: r for r in ridge_cv(df, "x1", "x2", "y", "rid", lam=0.0).collect()}
    tight = {r.fold: r for r in ridge_cv(df, "x1", "x2", "y", "rid", lam=1e6).collect()}
    # heavy penalty pulls the slope toward zero on every fold
    assert all(abs(tight[f].b1) < abs(free[f].b1) for f in free)


def test_bh_fdr_step_up_hand_example(spark):
    from node_etl_spark.functions.profile import bh_fdr

    # classic BH: m=5, q=0.25; sorted p = .01 .02 .04 .2 .9
    # lines: .05 .10 .15 .20 .25 -> k*=4 (p4=.2 <= .2); note p3=.04
    # clears easily, and rank 4 is included even though p4/m line
    # would fail a naive per-test cutoff
    rows = [("a", 0.02), ("b", 0.9), ("c", 0.01), ("d", 0.2), ("e", 0.04)]
    df = spark.createDataFrame(rows, "key string, p double")
    out = {r.key: r for r in bh_fdr(df, "key", "p", q=0.25).collect()}
    rej = {k for k, r in out.items() if r.rejected == 1}
    assert rej == {"c", "a", "e", "d"}
    assert out["b"].rejected == 0
    assert out["d"].rank == 4 and out["d"].m == 5


def test_bh_fdr_no_rejections_when_uniform(spark):
    from node_etl_spark.functions.profile import bh_fdr

    rows = [(f"k{i}", 0.5 + 0.01 * i) for i in range(20)]
    df = spark.createDataFrame(rows, "key string, p double")
    out = bh_fdr(df, "key", "p", q=0.05).collect()
    assert all(r.rejected == 0 for r in out)


def test_mahalanobis_catches_off_ridge_point(spark):
    from node_etl_spark.functions.profile import mahalanobis_outliers

    # tight ridge y ~= 2x plus one point ON-axis-ordinary but far
    # off the ridge: (5, -10) has unremarkable x and |y| yet must
    # rank first; the Euclidean-farthest point (9, 18.4) must not
    rows = [("g", float(x), 2.0 * x + (0.4 if x == 9 else 0.0), x)
            for x in range(10)]
    rows.append(("g", 5.0, -10.0, 99))
    df = spark.createDataFrame(rows, "grp string, x1 double, x2 double, rid long")
    out = mahalanobis_outliers(df, "grp", "x1", "x2", "rid", top_k=2).collect()
    assert out[0].rid == 99 or max(out, key=lambda r: r.d2).rid == 99


def test_mahalanobis_drops_singular_groups(spark):
    from node_etl_spark.functions.profile import mahalanobis_outliers

    # constant x2 -> zero variance -> singular covariance -> no rows
    rows = [("g", float(i), 7.0, i) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, x1 double, x2 double, rid long")
    assert mahalanobis_outliers(df, "grp", "x1", "x2", "rid").count() == 0


def test_sprt_decides_h1_on_hot_run(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import sprt_monitor

    # 15% conversion over 1000/day: the walk climbs past the upper
    # boundary within the month
    rows = [("exp", dt.date(2024, 1, d + 1), 1000, 150) for d in range(30)]
    df = spark.createDataFrame(rows, "grp string, day date, n long, x long")
    (r,) = sprt_monitor(df, "grp", "day", "n", "x").collect()
    assert r.decision == "accept_h1"
    assert r.decided_day is not None and r.decided_day <= dt.date(2024, 1, 5)


def test_sprt_decides_h0_on_cold_run_and_continues_when_ambiguous(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import sprt_monitor

    cold = [("c", dt.date(2024, 1, d + 1), 1000, 100) for d in range(30)]
    # 11% sits between p0 and p1 -> small daily drift; 3 days is not
    # enough evidence either way
    amb = [("a", dt.date(2024, 1, d + 1), 100, 11) for d in range(3)]
    df = spark.createDataFrame(
        cold + amb, "grp string, day date, n long, x long"
    )
    out = {r.grp: r for r in sprt_monitor(df, "grp", "day", "n", "x").collect()}
    assert out["c"].decision == "accept_h0"
    assert out["a"].decision == "continue"
    assert out["a"].decided_day is None


def test_seasonal_decompose_flat_series_unit_indices(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import seasonal_decompose

    # constant daily value -> every dow index 1.0, slope 0
    rows = [("g", dt.datetime(2024, 1, 1 + d, 12), 10.0) for d in range(28)]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = seasonal_decompose(df, "grp", "ts", "v").collect()
    assert len(out) == 7
    assert all(r.s_index == 1.0 for r in out)
    assert all(r.trend_slope == 0.0 for r in out)


def test_seasonal_decompose_separates_weekday_dip_from_trend(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import seasonal_decompose

    # value = (100 + 2*day) halved on Sundays: the deseasonalized
    # slope must recover ~2/day and Sunday's index must sit near 0.5
    rows = []
    base = dt.date(2024, 1, 1)
    for d in range(56):
        day = base + dt.timedelta(days=d)
        v = 100.0 + 2.0 * d
        if day.isoweekday() == 7:  # Sunday
            v *= 0.5
        rows.append(("g", dt.datetime(day.year, day.month, day.day, 9), v))
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = {r.dow: r for r in seasonal_decompose(df, "grp", "ts", "v").collect()}
    # Spark dayofweek: Sunday = 1
    assert out[1].s_index < 0.62
    assert all(out[d].s_index > 0.95 for d in range(2, 8))
    assert abs(out[3].trend_slope - 2.0) < 0.35


def test_ewma_walk_hand_computed(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import ewma_anomalies

    # days: 4, 4, 16 (spike), 4 (crash) in value units
    rows = [
        ("g", dt.datetime(2024, 1, 1, 9), 4.0),
        ("g", dt.datetime(2024, 1, 2, 9), 4.0),
        ("g", dt.datetime(2024, 1, 3, 9), 16.0),
        ("g", dt.datetime(2024, 1, 4, 9), 4.0),
    ]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    (r,) = ewma_anomalies(df, "grp", "ts", "v").collect()
    # micros: s0=4e6; d2: v=4e6 not anomalous, s=(4+12+eps)/4=4e6
    # d3: 16e6 > 2*4e6 -> anomaly; s=(16e6+12e6+2)/4=7e6
    # d4: 2*4e6=8e6 > 7e6? crash rule is 2v < s: 8e6 < 7e6 false;
    # spike: 4e6 > 14e6 false -> not anomalous; s=(4e6+21e6+2)/4
    assert r.n_days == 4
    assert r.n_anomalies == 1
    assert abs(r.final_ewma - (4e6 + 21e6 + 2) // 4 / 1e6) < 1e-9


def test_ewma_multiple_days_in_one_day_aggregate_first(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import ewma_anomalies

    # two events same day sum to the daily total before the walk
    rows = [
        ("g", dt.datetime(2024, 1, 1, 9), 2.0),
        ("g", dt.datetime(2024, 1, 1, 15), 2.0),
        ("g", dt.datetime(2024, 1, 2, 9), 4.0),
    ]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    (r,) = ewma_anomalies(df, "grp", "ts", "v").collect()
    assert r.n_days == 2 and r.n_anomalies == 0
    assert r.final_ewma == 4.0


def test_ewma_single_day_group(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import ewma_anomalies

    df = spark.createDataFrame(
        [("g", dt.datetime(2024, 1, 1, 9), 7.5)],
        "grp string, ts timestamp, v double",
    )
    (r,) = ewma_anomalies(df, "grp", "ts", "v").collect()
    assert (r.n_days, r.n_anomalies, r.final_ewma) == (1, 0, 7.5)


def test_hill_recovers_pareto_alpha(spark):
    from node_etl_spark.functions.profile import hill_tail_index

    # exact Pareto(alpha=2) quantile grid: x_i = (1 - i/n)^(-1/2);
    # Hill on the top-k of a Pareto sample estimates ~alpha
    n = 5000
    rows = [("g", (1.0 - i / n) ** -0.5) for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, x double")
    (r,) = hill_tail_index(df, "grp", "x", k=500).collect()
    assert r.k_used == 500
    assert 1.7 < r.alpha < 2.3


def test_hill_skips_small_groups(spark):
    from node_etl_spark.functions.profile import hill_tail_index

    rows = [("small", float(i + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, x double")
    assert hill_tail_index(df, "grp", "x", k=200).count() == 0


def test_matched_att_hand_example(spark):
    from node_etl_spark.functions.profile import matched_att

    # treated u1 (score 10, y 100) -> nearest control c1 (score 9,
    # y 40); treated u2 (score 3, y 50) -> exact-score control c2
    # (score 3, y 30); att = ((100-40) + (50-30))/2 = 40
    rows = [
        (1, 10, 100, 1),
        (2, 3, 50, 1),
        (101, 9, 40, 0),
        (102, 3, 30, 0),
        (103, 30, 999, 0),
    ]
    df = spark.createDataFrame(rows, "uid long, score long, y long, treated int")
    (r,) = matched_att(df).collect()
    assert r.n_treated == 2 and r.n_matched == 2
    assert r.att == 40.0
    assert r.mean_y_treated == 75.0 and r.mean_y_control == 35.0


def test_matched_att_equidistant_breaks_to_smaller_uid(spark):
    from node_etl_spark.functions.profile import matched_att

    # controls at scores 4 and 6 equidistant from treated score 5:
    # pick uid-smaller control (uid 50, y 7)
    rows = [
        (1, 5, 10, 1),
        (50, 4, 7, 0),
        (60, 6, 100, 0),
    ]
    df = spark.createDataFrame(rows, "uid long, score long, y long, treated int")
    (r,) = matched_att(df).collect()
    assert r.att == 3.0


def test_matched_att_no_controls_empty_mean(spark):
    from node_etl_spark.functions.profile import matched_att

    df = spark.createDataFrame(
        [(1, 5, 10, 1)], "uid long, score long, y long, treated int"
    )
    (r,) = matched_att(df).collect()
    assert r.n_treated == 0  # no matched rows -> empty aggregate


def test_diff_in_diff_hand_cells(spark):
    from node_etl_spark.functions.profile import diff_in_diff

    # T: pre means 10, post 30 (delta 20); C: pre 5, post 10 (5)
    rows = [
        ("t1", 1, 0, 10), ("t1", 1, 1, 30),
        ("c1", 0, 0, 5), ("c1", 0, 1, 10),
    ]
    df = spark.createDataFrame(rows, "u string, treated int, post int, v long")
    (r,) = diff_in_diff(df, "u", "treated", "post", "v").collect()
    assert (r.mean_t_pre, r.mean_t_post) == (10.0, 30.0)
    assert (r.mean_c_pre, r.mean_c_post) == (5.0, 10.0)
    assert r.did == 15.0


def test_diff_in_diff_sums_within_unit_period(spark):
    from node_etl_spark.functions.profile import diff_in_diff

    # two treated units with multiple rows per period aggregate
    # before averaging: T pre means = (4, 6) -> 5
    rows = [
        ("a", 1, 0, 2), ("a", 1, 0, 2), ("b", 1, 0, 6),
        ("a", 1, 1, 9), ("b", 1, 1, 11),
        ("c", 0, 0, 1), ("c", 0, 1, 1),
    ]
    df = spark.createDataFrame(rows, "u string, treated int, post int, v long")
    (r,) = diff_in_diff(df, "u", "treated", "post", "v").collect()
    assert r.mean_t_pre == 5.0 and r.mean_t_post == 10.0
    assert r.did == 5.0


def test_bootstrap_ci_brackets_the_mean(spark):
    from node_etl_spark.functions.profile import poisson_bootstrap_ci

    rows = [("g", float(10 + (i % 21)), i) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, v double, rid long")
    (r,) = poisson_bootstrap_ci(df, "grp", "v", "rid").collect()
    assert r.n == 2000
    # mean of 10..30 uniform-ish grid = 20; CI must bracket the
    # full-sample mean and be tight at n=2000
    assert r.ci_lo <= r.mean_full <= r.ci_hi
    assert r.ci_hi - r.ci_lo < 2.0
    assert abs(r.mean_full - 20.0) < 0.5


def test_bootstrap_ci_deterministic_across_runs(spark):
    from node_etl_spark.functions.profile import poisson_bootstrap_ci

    rows = [("g", float(i), i) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, v double, rid long")
    a = poisson_bootstrap_ci(df, "grp", "v", "rid", b=50).collect()[0]
    b_ = poisson_bootstrap_ci(df, "grp", "v", "rid", b=50).collect()[0]
    assert (a.ci_lo, a.ci_hi) == (b_.ci_lo, b_.ci_hi)


def test_poisson_thresholds_are_poisson1(spark):
    import math

    from node_etl_spark.functions.profile import _poisson1_thresholds

    th = _poisson1_thresholds()
    # P(X<=0) = e^-1, P(X<=1) = 2e^-1; k<=7 covers all but ~1e-5
    assert abs(th[0] - math.exp(-1)) < 1e-9
    assert abs(th[1] - 2 * math.exp(-1)) < 1e-9
    assert th[-1] > 0.99998


def test_uplift_concentrates_in_top_decile(spark):
    from node_etl_spark.functions.profile import uplift_deciles

    # scores 100..1: top-20 scores treated with y=100, control y=0;
    # deeper deciles all y=0 -> uplift at decile 2 = 100, decays as
    # zero-effect depth is added
    rows = []
    for i in range(100):
        score = 100 - i
        treated = 1 if i % 2 == 0 else 0
        y = 100 if (i < 20 and treated) else 0
        rows.append((i, score, y, treated))
    df = spark.createDataFrame(rows, "uid long, score long, y long, treated int")
    out = {r.decile: r for r in uplift_deciles(df).collect()}
    assert out[2].uplift == 100.0
    assert out[10].uplift == 20.0  # 10 of 50 treated carry 100
    # n_t/n_c are per-decile; cumulative counts are the rate bases
    assert sum(r.n_t for r in out.values()) == 50
    assert sum(r.n_c for r in out.values()) == 50


def test_uplift_score_ties_share_decile(spark):
    from node_etl_spark.functions.profile import uplift_deciles

    # all units share one score -> single decile row at bucket 10
    rows = [(i, 5, i % 2, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "uid long, score long, y long, treated int")
    out = uplift_deciles(df).collect()
    assert len(out) == 1 and out[0].decile == 10


def test_ece_perfect_calibration_is_zero(spark):
    from node_etl_spark.functions.profile import expected_calibration_error

    # bin 0.5: half positive; bin 0.75: three-quarters positive ->
    # per-bin acc == conf -> ece 0
    rows = [(0.5, i % 2) for i in range(40)]
    rows += [(0.75, 0 if i % 4 == 0 else 1) for i in range(40)]
    df = spark.createDataFrame(rows, "conf double, label int")
    out = expected_calibration_error(df, "conf", "label").collect()
    assert all(r.ece == 0.0 for r in out)
    assert all(r.gap == 0.0 for r in out)


def test_ece_detects_overconfidence(spark):
    from node_etl_spark.functions.profile import expected_calibration_error

    # model says 0.95 but accuracy is 0.5 -> ece = 0.45
    rows = [(0.95, i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "conf double, label int")
    (r,) = expected_calibration_error(df, "conf", "label").collect()
    assert r.bin == 9 and r.gap == 0.45 and r.ece == 0.45


def test_cuped_reduction_matches_rho_squared(spark):
    from node_etl_spark.functions.profile import cuped_adjust

    # y = 2x + noise-free => rho = 1 -> ~100% reduction, theta = 2
    rows = [(i, float(i % 50), 2.0 * (i % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "u long, x double, y double")
    (r,) = cuped_adjust(df, "u", "x", "y").collect()
    assert r.theta == 2.0
    assert r.var_adj == 0.0 and r.reduction_pct == 100.0


def test_cuped_uncorrelated_covariate_no_reduction(spark):
    from node_etl_spark.functions.profile import cuped_adjust

    # x cycles 0/1 independent of y pattern by construction
    rows = [(i, float(i % 2), float((i // 2) % 7)) for i in range(700)]
    df = spark.createDataFrame(rows, "u long, x double, y double")
    (r,) = cuped_adjust(df, "u", "x", "y").collect()
    assert abs(r.reduction_pct) < 1.0


def test_median_of_means_shrugs_off_outlier(spark):
    from node_etl_spark.functions.profile import median_of_means

    rows = [("g", 10.0, i) for i in range(3200)]
    rows.append(("g", 1e9, 99999))  # one wild row
    df = spark.createDataFrame(rows, "grp string, v double, rid long")
    (r,) = median_of_means(df, "grp", "v", "rid").collect()
    # plain mean is dragged ~312k up; MoM stays at 10 (the outlier
    # poisons exactly one of 32 buckets)
    assert r.mean_plain > 1000.0
    assert r.mom == 10.0


def test_balance_smd_detects_imbalance(spark):
    from node_etl_spark.functions.profile import balance_smd

    # cov a: treated mean 10 vs control 0 (imbalanced); cov b: both
    # arms identical distribution (balanced, smd 0)
    rows = [(1, 10.0 + (i % 3), 5.0 + (i % 2)) for i in range(60)]
    rows += [(0, 0.0 + (i % 3), 5.0 + (i % 2)) for i in range(60)]
    df = spark.createDataFrame(rows, "treated int, a double, b double")
    out = {r.cov: r for r in balance_smd(df, "treated", ["a", "b"]).collect()}
    assert out["a"].balanced == 0 and abs(out["a"].smd) > 2
    assert out["b"].balanced == 1 and out["b"].smd == 0.0
    assert out["a"].mean_t == 11.0 and out["a"].mean_c == 1.0


def test_rfm_scores_direction(spark):
    import datetime as dt

    from node_etl_spark.functions.profile import rfm_segments

    # whale: recent, frequent, big spend -> (5,5,5);
    # ghost: old single tiny event -> (1,1,1)
    rows = []
    for d in range(10):  # whale: 10 events late in the month
        rows.append((1, dt.datetime(2024, 1, 20 + d % 10, 9), 100.0))
    rows.append((2, dt.datetime(2024, 1, 1, 9), 1.0))  # ghost
    for u in range(3, 8):  # mid users
        rows.append((u, dt.datetime(2024, 1, 10, 9), 10.0))
        rows.append((u, dt.datetime(2024, 1, 11, 9), 10.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.r_score, r.f_score, r.m_score): r
        for r in rfm_segments(df, "user_id", "ts", "value", "2024-01-31").collect()
    }
    assert (5, 5, 5) in out and out[(5, 5, 5)].n_users == 1
    assert (1, 1, 1) in out and out[(1, 1, 1)].n_users == 1


def test_within_estimator_kills_unit_confounder(spark):
    from node_etl_spark.functions.profile import within_estimator

    # within every unit y = 3x; units have wildly different
    # intercepts correlated with their x levels, so pooled OLS is
    # biased upward while within recovers exactly 3
    rows = []
    for u in range(10):
        alpha = 1000 * u     # confounder
        for t in range(20):
            x = u * 10 + t   # x level rises with the confounder
            rows.append((u, x, alpha + 3 * x))
    df = spark.createDataFrame(rows, "u long, x long, y long")
    (r,) = within_estimator(df, "u", "x", "y").collect()
    assert r.beta_within == 3.0
    assert r.beta_pooled > 3.5
    assert r.n_units == 10 and r.n_obs == 200


def test_logrank_identical_curves_zero_statistic(spark):
    from node_etl_spark.functions.profile import logrank_test

    # both groups identical event times -> O == E -> chi2 == 0
    rows = [(g, t, 1) for g in (0, 1) for t in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "grp int, t long, e int")
    (r,) = logrank_test(df).collect()
    assert r.o_minus_e == 0.0 and r.chi2 == 0.0
    assert r.n1 == 5 and r.n2 == 5


def test_logrank_detects_separated_curves(spark):
    from node_etl_spark.functions.profile import logrank_test

    # group 1 all fails early, group 0 all late -> big chi2
    rows = [(1, t, 1) for t in range(1, 21)]
    rows += [(0, t + 100, 1) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "grp int, t long, e int")
    (r,) = logrank_test(df).collect()
    assert r.chi2 > 10.0
    assert r.d1 == 20 and r.d2 == 20


def test_logrank_censoring_shrinks_risk_sets(spark):
    from node_etl_spark.functions.profile import logrank_test

    # censored rows join risk sets but never the death counts
    rows = [(1, 5, 1), (1, 9, 0), (0, 5, 1), (0, 9, 0)]
    df = spark.createDataFrame(rows, "grp int, t long, e int")
    (r,) = logrank_test(df).collect()
    assert r.d1 == 1 and r.d2 == 1
    assert r.chi2 == 0.0  # symmetric


def test_quantile_effects_planted_tail_shift(spark):
    from node_etl_spark.functions.profile import quantile_effects

    # same median, treated upper tail shifted +100
    control = [(0, y) for y in range(1, 101)]
    treated = [(1, y) for y in range(1, 76)] + [
        (1, y + 100) for y in range(76, 101)
    ]
    df = spark.createDataFrame(control + treated, "treated int, y long")
    out = {r.pct: r for r in quantile_effects(df).collect()}
    assert out[50].qte == 0
    assert out[90].qte == 100
    assert out[10].qte == 0


def test_mann_kendall_perfect_trend(spark):
    from node_etl_spark.functions.profile import mann_kendall

    # strictly increasing series: S = C(n,2) = 45, z > 0 and large
    rows = [("g", t, 10 * t) for t in range(10)]
    df = spark.createDataFrame(rows, "grp string, t long, y long")
    (r,) = mann_kendall(df, "grp", "t", "y").collect()
    assert r.s_stat == 45
    assert r.z > 3.0
    # no ties: var = n(n-1)(2n+5)/18 = 10*9*25/18 = 125
    assert r.var_s == 125.0


def test_mann_kendall_ties_shrink_variance(spark):
    from node_etl_spark.functions.profile import mann_kendall

    rows = [("g", t, 5) for t in range(10)]  # all tied -> S=0, var 0
    df = spark.createDataFrame(rows, "grp string, t long, y long")
    (r,) = mann_kendall(df, "grp", "t", "y").collect()
    assert r.s_stat == 0 and r.var_s == 0.0 and r.z == 0.0


def test_dp_histogram_null_group_key_matches_oracle(spark):
    # regression (r7 ADVICE): a NULL group key must draw the SAME
    # seeded noise on both engines — concat_ws silently skips NULLs
    # while SQL || propagates them, so both sides now coalesce to a
    # sentinel before hashing
    import duckdb

    from node_etl_spark.functions.profile import (
        dp_histogram,
        dp_histogram_oracle_sql,
    )

    rows = [("a",)] * 3 + [(None,)] * 4 + [("b",)]
    df = spark.createDataFrame(rows, "k string")
    got = {
        r.k: (r.n_raw, r.noise, r.n_released)
        for r in dp_histogram(df, ["k"], epsilon=1.0).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('a'), ('a'), ('a'), "
        "(NULL), (NULL), (NULL), (NULL), ('b')) AS v(k)"
    )
    sql = dp_histogram_oracle_sql("SELECT k FROM t", ["k"], epsilon=1.0)
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == want
    assert None in got  # the NULL cell itself is released, identically


def test_offpolicy_position_ties_break_on_event_id(spark):
    # regression (r7 ADVICE): two impressions with identical
    # (user, day, ts, item) must get deterministic feed positions via
    # the event_id tiebreaker — run twice with shuffled input order
    # and demand identical per-position output
    import datetime as dt

    from node_etl_spark.functions.profile import offpolicy_eval

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    views = [
        (7, 100, t0, 1),
        (7, 100, t0, 2),  # exact (user, ts, item) tie with event 1
        (7, 200, t0, 3),
        (8, 100, t0, 4),
    ]
    schema = "user_id long, item long, ts timestamp, event_id long"
    clicks = spark.createDataFrame(
        [(7, 100, t0 + dt.timedelta(minutes=5))],
        "user_id long, item long, ts timestamp",
    )
    a = offpolicy_eval(spark.createDataFrame(views, schema), clicks)
    b = offpolicy_eval(
        spark.createDataFrame(list(reversed(views)), schema), clicks
    )
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a == rows_b and rows_a
