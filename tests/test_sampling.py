"""Deterministic splits / stratified sampling (functions/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from node_etl_spark.functions.sampling import (
    BUCKETS,
    hash_bucket,
    hash_split,
    stratified_sample,
)
from node_etl_spark.tables import table

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_hash_bucket_range_and_determinism(spark):
    df = spark.range(1000).select(hash_bucket(F.col("id")).alias("b"))
    stats = df.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"), F.count("*").alias("n")
    ).first()
    assert 0 <= stats["lo"] and stats["hi"] < BUCKETS
    a = df.collect()
    b = spark.range(1000).select(hash_bucket(F.col("id")).alias("b")).collect()
    assert a == b


def test_hash_split_total_and_rough_proportions(spark):
    df = hash_split(spark.range(10_000), "id", SPLITS)
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.02
    assert abs(counts["test"] / 10_000 - 0.1) < 0.02


def test_hash_split_stable_under_append(spark):
    # assignment of an id never changes when the table grows
    small = {r["id"]: r["split"] for r in hash_split(spark.range(100), "id", SPLITS).collect()}
    big = {r["id"]: r["split"] for r in hash_split(spark.range(1000), "id", SPLITS).collect()}
    assert all(big[i] == s for i, s in small.items())


def test_hash_split_bad_weights(spark):
    with pytest.raises(ValueError):
        hash_split(spark.range(10), "id", {"a": 0.5, "b": 0.6})


def test_stratified_sample_exact_counts(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = stratified_sample(docs, ["lang"], 3, "doc_id")
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(3, sizes[lang])
    # membership is deterministic
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, ["lang"], 3, "doc_id").select("doc_id").collect()
    )
    assert ids1 == ids2


# ------------------------------------------------ dataset mixing


def test_mix_sources_rates_and_determinism(spark):
    from node_etl_spark.functions.sampling import mix_sources

    rows = [(i, "big" if i < 800 else "small", 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # budget = 50% of total; small source targets 40% of the budget =
    # 200 docs worth but only has 200 -> keeps everything (rate capped
    # at 1); big targets 60% of 500 = 300 of its 800 -> rate 0.375
    out = mix_sources(
        df, {"big": 0.6, "small": 0.4}, budget_frac=0.5
    ).collect()
    rates = {r.source: r.keep_rate for r in out}
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 0.375) < 1e-12
    n_big = sum(1 for r in out if r.source == "big")
    assert 240 <= n_big <= 360  # hash thresholding ~ rate * 800
    # deterministic: same call, same rows
    again = {r.doc_id for r in mix_sources(df, {"big": 0.6, "small": 0.4}, budget_frac=0.5).collect()}
    assert again == {r.doc_id for r in out}


def test_mix_sources_validates_proportions(spark):
    import pytest

    from node_etl_spark.functions.sampling import mix_sources

    df = spark.createDataFrame([(1, "a", 10)], "doc_id long, source string, n_chars long")
    with pytest.raises(ValueError):
        mix_sources(df, {"a": 0.5})


# ------------------------------------------------ KMV sketches


def test_kmv_bottomk_caps_and_orders(spark):
    from node_etl_spark.functions.sketch import kmv_bottomk

    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", 5)], "g string, e long"
    )
    bk = kmv_bottomk(df, "g", "e", k=10).collect()
    by_g = {}
    for r in bk:
        by_g.setdefault(r.g, []).append(r.h)
    assert len(by_g["a"]) == 10 and len(by_g["b"]) == 1
    # kept hashes are the smallest of the group's full hash set
    from node_etl_spark.functions.sketch import _h60
    import pyspark.sql.functions as F

    full = sorted(
        r.h
        for r in spark.createDataFrame([(i,) for i in range(100)], "e long")
        .select(_h60(F.col("e"), 7).alias("h"))
        .collect()
    )
    assert sorted(by_g["a"]) == full[:10]


def test_kmv_jaccard_estimates_true_overlap(spark):
    from node_etl_spark.functions.sketch import kmv_jaccard

    # |A|=|B|=600, |A∩B|=300 -> true J = 300/900 = 1/3
    rows = [("a", i) for i in range(600)] + [("b", i) for i in range(300, 900)]
    df = spark.createDataFrame(rows, "g string, e long")
    got = kmv_jaccard(df, "g", "e", k=256).collect()
    assert len(got) == 1
    est = got[0].est_jaccard
    assert got[0].k_used == 256
    assert abs(est - 1 / 3) < 0.08  # within a few standard errors


def test_kmv_jaccard_disjoint_and_identical(spark):
    from node_etl_spark.functions.sketch import kmv_jaccard

    rows = (
        [("x", i) for i in range(200)]
        + [("y", i) for i in range(200)]          # identical to x
        + [("z", i + 10_000) for i in range(200)] # disjoint
    )
    df = spark.createDataFrame(rows, "g string, e long")
    got = {(r.g1, r.g2): r.est_jaccard for r in kmv_jaccard(df, "g", "e", k=64).collect()}
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == 0.0 and got[("y", "z")] == 0.0


def test_resample_sources_repeats_under_share(spark):
    from node_etl_spark.functions.sampling import resample_sources

    # big: 900 chars, small: 100. Target 50/50 at budget 1.0:
    # f_small = 1000*0.5/100 = 5.0 -> every small row exactly 5 copies
    # f_big = 1000*0.5/900 = 0.5555... -> rows get 0 or 1 copies
    rows = [(i, "big", 1) for i in range(900)] + [
        (1000 + i, "small", 1) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = resample_sources(df, {"big": 0.5, "small": 0.5}, budget_frac=1.0).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append((r.doc_id, r.copy))
    small = by_src["small"]
    assert len(small) == 500  # 100 docs x exactly 5 copies
    assert {c for _, c in small} == {1, 2, 3, 4, 5}
    n_big = len(by_src["big"])
    assert 400 <= n_big <= 600  # ~0.556 * 900, hash-thresholded
    assert all(c == 1 for _, c in by_src["big"])


def test_resample_sources_is_deterministic(spark):
    from node_etl_spark.functions.sampling import resample_sources

    rows = [(i, "s", 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    a = sorted((r.doc_id, r.copy) for r in resample_sources(df, {"s": 1.0}, 0.3).collect())
    b = sorted((r.doc_id, r.copy) for r in resample_sources(df, {"s": 1.0}, 0.3).collect())
    assert a == b


# ------------------------------------------------ negative sampling


def test_negative_samples_never_self_and_exact_k(spark):
    from node_etl_spark.functions.sampling import negative_samples

    df = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    out = negative_samples(df, k=3).collect()
    assert len(out) == 90
    by_anchor = {}
    for r in out:
        assert r.neg_id != r.anchor_id
        by_anchor.setdefault(r.anchor_id, []).append(r.neg_rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_anchor.values())


def test_negative_samples_deterministic_and_seeded(spark):
    from node_etl_spark.functions.sampling import negative_samples

    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    a = sorted((r.anchor_id, r.neg_rank, r.neg_id) for r in negative_samples(df, k=2).collect())
    b = sorted((r.anchor_id, r.neg_rank, r.neg_id) for r in negative_samples(df, k=2).collect())
    c = sorted((r.anchor_id, r.neg_rank, r.neg_id) for r in negative_samples(df, k=2, seed=99).collect())
    assert a == b
    assert a != c  # different seed, different picks


def test_negative_samples_requires_two_rows(spark):
    import pytest

    from node_etl_spark.functions.sampling import negative_samples

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        negative_samples(df)


def test_kmv_distinct_exact_below_k_and_bracket_above(spark):
    from node_etl_spark.functions.sketch import kmv_distinct

    rows = [("small", i) for i in range(40)] + [("big", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, e long")
    got = {r.g: (r.n_sketch, r.est_distinct) for r in kmv_distinct(df, "g", "e", k=128).collect()}
    assert got["small"] == (40, 40.0)  # exact below k
    n, est = got["big"]
    assert n == 128
    assert abs(est - 5000) / 5000 < 0.30  # ~1/sqrt(126) rel error, 3 sigma


def test_heavy_hitters_exact_above_threshold(spark):
    from node_etl_spark.functions.sketch import heavy_hitters

    # 60 'a', 30 'b', 110 singletons -> N=200; k=4 -> keep cnt*5 > 200
    rows = (
        [("a",)] * 60 + [("b",)] * 30 + [(f"t{i}",) for i in range(110)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = {(r.item, r.cnt, r.n) for r in heavy_hitters(df, "item", k=4).collect()}
    assert got == {("a", 60, 200)}  # b: 30*5=150 <= 200 -> excluded


def test_heavy_hitters_candidate_superset_small_k(spark):
    from node_etl_spark.functions.sketch import heavy_hitters

    # adversarial interleaving across partitions must never lose a
    # true heavy hitter (per-partition MG union is a guaranteed
    # superset of items with cnt > N/(k+1))
    rows = [(f"x{i % 7}",) for i in range(70)] + [("hot",)] * 30
    df = spark.createDataFrame(rows, "item string").repartition(16)
    got = {r.item: r.cnt for r in heavy_hitters(df, "item", k=2).collect()}
    # N=100, threshold cnt > 33.3: only 'hot' (30) misses, x* have 10
    assert got == {}
    got4 = {r.item: r.cnt for r in heavy_hitters(df, "item", k=4).collect()}
    # threshold cnt > 20: only 'hot'
    assert got4 == {"hot": 30}


def test_chisq_independent_uniform_is_zero(spark):
    from node_etl_spark.functions.profile import chisq_independence

    # perfectly independent 2x2 with equal margins -> chi2 = 0
    rows = [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")] * 25
    df = spark.createDataFrame(rows, "a string, b string")
    r = chisq_independence(df, "a", "b").collect()[0]
    assert r.n == 100 and r.dof == 1
    assert r.chi2 == 0.0 and r.cramers_v == 0.0


def test_chisq_perfect_dependence_equals_n(spark):
    from node_etl_spark.functions.profile import chisq_independence

    # a determines b exactly -> chi2 = n * min(r-1, c-1); V = 1
    rows = [("x", "u")] * 30 + [("y", "v")] * 20
    df = spark.createDataFrame(rows, "a string, b string")
    r = chisq_independence(df, "a", "b").collect()[0]
    assert r.chi2 == 50.0 and r.cramers_v == 1.0


def test_mutual_information_matches_closed_form(spark):
    from node_etl_spark.functions.profile import mutual_information

    # perfect dependence with equal halves: MI = H = 1 bit, NMI = 1
    rows = [("x", "u")] * 50 + [("y", "v")] * 50
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.mi_bits == 1.0 and r.h_a == 1.0 and r.h_b == 1.0
    assert r.nmi == 1.0


def test_mutual_information_independent_is_zero(spark):
    from node_etl_spark.functions.profile import mutual_information

    rows = [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.mi_bits == 0.0 and r.nmi == 0.0


def test_bloom_semi_join_is_exact(spark):
    from node_etl_spark.functions.sketch import bloom_semi_join

    big = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1000)], "k bigint, v string"
    )
    keys = spark.createDataFrame(
        [(i * 7,) for i in range(30)], "kk bigint"
    )
    got = {r.k for r in bloom_semi_join(big, keys, "k", "kk").collect()}
    want = {i * 7 for i in range(30) if i * 7 < 1000}
    assert got == want


def test_bloom_semi_join_empty_keys(spark):
    from node_etl_spark.functions.sketch import bloom_semi_join

    big = spark.createDataFrame([(1,), (2,)], "k bigint")
    keys = spark.createDataFrame([], "kk bigint")
    assert bloom_semi_join(big, keys, "k", "kk").count() == 0


def test_bloom_words_probe_agreement(spark):
    from node_etl_spark.functions.sketch import (
        bloom_might_contain,
        bloom_words,
    )
    from pyspark.sql import functions as F

    keys = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
    words = bloom_words(keys, "k", n_bits=100 * 12)
    # zero false negatives by construction
    hits = (
        keys.filter(bloom_might_contain(words, F.col("k"), 100 * 12))
        .count()
    )
    assert hits == 100


def test_temperature_mix_alpha_one_keeps_budget_everywhere(spark):
    from node_etl_spark.functions.sampling import temperature_mix

    rows = [(i, "big" if i < 80 else "small", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    # alpha=1: p_i proportional to n_i -> keep_rate = budget for all
    out = temperature_mix(df, alpha=1.0, budget_frac=0.5)
    rates = {r.source: r.keep_rate for r in out.collect()}
    assert rates == {"big": 0.5, "small": 0.5}


def test_temperature_mix_low_alpha_lifts_small_sources(spark):
    from node_etl_spark.functions.sampling import temperature_mix

    rows = [(i, "big" if i < 90 else "small", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    out = temperature_mix(df, alpha=0.3, budget_frac=0.5)
    rates = {}
    for r in out.collect():
        rates[r.source] = r.keep_rate
    assert rates["small"] > rates["big"]
    # small source's target share can exceed its size -> rate caps at 1
    out_uniform = temperature_mix(df, alpha=0.01, budget_frac=0.9)
    rs = {r.source: r.keep_rate for r in out_uniform.collect()}
    assert rs["small"] == 1.0


def test_join_size_estimate_bracket(spark):
    from node_etl_spark.functions.sketch import join_size_estimate

    # uniform fanout: 500 keys x (4 left, 3 right) -> true size 6000
    a = spark.createDataFrame(
        [(k,) for k in range(500) for _ in range(4)], "ka bigint"
    )
    b = spark.createDataFrame(
        [(k,) for k in range(500) for _ in range(3)], "kb bigint"
    )
    r = join_size_estimate(a, b, "ka", "kb", sample_frac=0.2).collect()[0]
    true = a.join(b, a.ka == b.kb).count()
    assert true == 6000
    assert 0.5 * true <= r.est_join_rows <= 1.5 * true
    assert r.n_sampled_keys > 0


def test_join_size_estimate_catches_skew(spark):
    from node_etl_spark.functions.sketch import join_size_estimate

    # one hot key with 200x200 fanout dominates; a sample that
    # includes it must scale its product mass
    a = spark.createDataFrame(
        [(0,)] * 200 + [(k,) for k in range(1, 100)], "ka bigint"
    )
    b = spark.createDataFrame(
        [(0,)] * 200 + [(k,) for k in range(1, 100)], "kb bigint"
    )
    # large frac -> hot key certainly sampled -> estimate >= its mass
    r = join_size_estimate(a, b, "ka", "kb", sample_frac=0.9).collect()[0]
    assert r.est_join_rows >= 200 * 200


def test_chisq_single_category_is_null_not_nan(spark):
    from node_etl_spark.functions.profile import chisq_independence

    df = spark.createDataFrame(
        [("only", "u"), ("only", "v")], "a string, b string"
    )
    r = chisq_independence(df, "a", "b").collect()[0]
    assert r.dof == 0 and r.cramers_v is None


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    from node_etl_spark.plans.queries import QUERIES

    out = QUERIES["q196_leakage_safe_split"].fn(spark, sf_dir).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.split_key, set()).add(r.split)
    # every split key (= dup cluster or singleton) maps to ONE split
    assert all(len(s) == 1 for s in by_key.values())
    # and at least one real cluster exists (key shared by >1 doc)
    from collections import Counter
    counts = Counter(r.split_key for r in out)
    assert max(counts.values()) > 1


def test_dsir_select_mirror_and_ranking(spark):
    import math
    from collections import Counter

    from node_etl_spark.functions.sampling import dsir_select

    # English-looking docs (target) share vocabulary; noise docs don't
    docs = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the rug", "en"),
        (3, "qq zz qq xx zz yy", "xx"),
        (4, "the cat and the dog sat", "xx"),  # en-like but not target
        (5, "zz yy xx qq", "xx"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r
        for r in dsir_select(df, "lang = 'en'", k=2).collect()
    }

    # plain-python mirror
    tf = {
        i: Counter(t.split(" ")) for i, t, _ in docs
    }
    cr = Counter()
    ct = Counter()
    for i, t, lg in docs:
        cr.update(tf[i])
        if lg == "en":
            ct.update(tf[i])
    nr, nt, v = sum(cr.values()), sum(ct.values()), len(cr)
    want = {}
    for i, _, _ in docs:
        n = sum(tf[i].values())
        s = sum(
            c * math.log(((ct[w] + 1) / (nt + v)) / ((cr[w] + 1) / (nr + v)))
            for w, c in tf[i].items()
        )
        want[i] = round(s / n, 6)
    for i in want:
        assert out[i].n_tokens == sum(tf[i].values())
        assert abs(out[i].log_ratio - want[i]) < 2e-6, (i, out[i], want[i])
    # the en-like doc 4 outranks the pure-noise docs
    assert out[4].log_ratio > out[3].log_ratio
    assert out[4].log_ratio > out[5].log_ratio
    # exactly k selected, and they are the top-ranked by (score, id)
    sel = {i for i, r in out.items() if r.selected}
    top2 = sorted(want, key=lambda i: (-want[i], i))[:2]
    assert sel == set(top2) and len(sel) == 2


def test_quantile_calibrate_hand_example(spark):
    from node_etl_spark.functions.sampling import quantile_calibrate

    # groups A=[10,20], B=[5,30,40]; global sorted = 5,10,20,30,40.
    # midrank mapping: A r1 -> ceil(1*5/4)=2 -> 10; A r2 -> ceil(3*5/4)=4
    # -> 30; B r1 -> 1 -> 5; B r2 -> ceil(15/6)=3 -> 20; B r3 -> 5 -> 40
    df = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20), (3, "B", 5), (4, "B", 30), (5, "B", 40)],
        "id bigint, grp string, score bigint",
    )
    out = {
        r.id: r.calibrated
        for r in quantile_calibrate(df, "score", "grp", "id").collect()
    }
    assert out == {1: 10, 2: 30, 3: 5, 4: 20, 5: 40}


def test_quantile_calibrate_identity_on_single_group(spark):
    from node_etl_spark.functions.sampling import quantile_calibrate

    # one group: every row calibrates to its own score (midrank of n
    # maps back into itself: g = ceil((2r-1)n/(2n)) = r)
    df = spark.createDataFrame(
        [(i, "X", i * 7 % 13) for i in range(1, 12)],
        "id bigint, grp string, score bigint",
    )
    rows = quantile_calibrate(df, "score", "grp", "id").collect()
    assert all(r.calibrated == r.score for r in rows)


def test_quantile_calibrate_distributed_branch_identical(spark):
    # round-8 window sweep: forcing group_rank_threshold=0 switches
    # the within-group rank to util.grouped_row_index (the scale path
    # for a corpus-sized source); results must be bit-identical to
    # the default window branch
    from node_etl_spark.functions.sampling import quantile_calibrate

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", (i * 37) % 101) for i in range(1, 601)],
        "id bigint, grp string, score bigint",
    ).repartition(8)
    base = {
        r.id: r.calibrated
        for r in quantile_calibrate(df, "score", "grp", "id").collect()
    }
    dist = {
        r.id: r.calibrated
        for r in quantile_calibrate(
            df, "score", "grp", "id", group_rank_threshold=0
        ).collect()
    }
    assert base == dist


def test_temporal_split_per_entity_tail(spark):
    from datetime import datetime

    from node_etl_spark.functions.sampling import temporal_split

    # user A: 5 events -> last 1 is test (r*100 > n*80 iff r=5);
    # user B: 2 events -> r=2: 200 > 160 -> test, r=1 train
    rows = [
        (i, datetime(2024, 1, 1 + i), "A") for i in range(5)
    ] + [(10, datetime(2024, 2, 1), "B"), (11, datetime(2024, 2, 2), "B")]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id string")
    out = {r.event_id: r.split for r in temporal_split(df).collect()}
    assert out[4] == "test" and all(out[i] == "train" for i in range(4))
    assert out[11] == "test" and out[10] == "train"


def test_temporal_split_never_trains_on_future(spark):
    from datetime import datetime, timedelta

    from node_etl_spark.functions.sampling import temporal_split

    rows = [
        (i, datetime(2024, 1, 1) + timedelta(hours=i), "u") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id string")
    rows_out = temporal_split(df, test_frac_pct=30).collect()
    max_train = max(r.ts for r in rows_out if r.split == "train")
    min_test = min(r.ts for r in rows_out if r.split == "test")
    assert max_train < min_test  # every test event is after all train


def test_skipgram_pairs_window_and_direction(spark):
    from datetime import datetime

    from node_etl_spark.functions.sampling import skipgram_pairs

    # one user, sequence a b c with window=2: center b pairs with a
    # (rel_pos -1); center c pairs with b (-1) and a (-2); plus the
    # mirrored forward pairs
    rows = [
        (1, datetime(2024, 1, 1), "u", "a"),
        (2, datetime(2024, 1, 2), "u", "b"),
        (3, datetime(2024, 1, 3), "u", "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id string, event_type string"
    )
    got = {
        (r.center, r.context, r.rel_pos)
        for r in skipgram_pairs(df, window=2).collect()
    }
    assert got == {
        ("b", "a", -1), ("a", "b", 1),
        ("c", "b", -1), ("b", "c", 1),
        ("c", "a", -2), ("a", "c", 2),
    }


def test_skipgram_pairs_never_cross_entities(spark):
    from datetime import datetime

    from node_etl_spark.functions.sampling import skipgram_pairs

    rows = [
        (1, datetime(2024, 1, 1), "u1", "a"),
        (2, datetime(2024, 1, 2), "u2", "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id string, event_type string"
    )
    assert skipgram_pairs(df, window=2).count() == 0


def test_funnel_dp_counts_subsequences(spark):
    # hand-verified: sequence v c v c p -> pairs (v1c1 v1c2 v2c2) each
    # completed by the final p = 3 funnels
    from datetime import datetime

    from node_etl_spark.plans.queries import QUERIES

    # drive through the registered query shape via a temp view-free
    # direct DP replication: use q239's callable against a fixture dir
    # is heavy; instead verify the DP expression inline
    from pyspark.sql import functions as F

    seq = ["view", "click", "view", "click", "purchase"]
    df = spark.createDataFrame([(seq,)], "seq array<string>")
    zero = F.struct(
        F.lit(0).cast("bigint").alias("c1"),
        F.lit(0).cast("bigint").alias("c2"),
        F.lit(0).cast("bigint").alias("c3"),
    )
    dp = F.aggregate(
        F.col("seq"),
        zero,
        lambda acc, e: F.struct(
            (acc["c1"] + F.when(e == "view", F.lit(1)).otherwise(F.lit(0))).alias("c1"),
            (acc["c2"] + F.when(e == "click", acc["c1"]).otherwise(F.lit(0))).alias("c2"),
            (acc["c3"] + F.when(e == "purchase", acc["c2"]).otherwise(F.lit(0))).alias("c3"),
        ),
    )
    (row,) = df.select(dp["c3"].alias("n")).collect()
    assert row.n == 3


def test_rendezvous_minimal_movement(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sampling import rendezvous_shard

    df = spark.range(2000).select(
        rendezvous_shard(F.col("id"), 8).alias("s8"),
        rendezvous_shard(F.col("id"), 9).alias("s9"),
    )
    rows = df.collect()
    moved = [r for r in rows if r.s8 != r.s9]
    # every moved key lands ON the added shard (HRW contract)
    assert all(r.s9 == 8 for r in moved)
    # expected movement 1/9 of keys; allow generous slack
    assert 0.05 < len(moved) / len(rows) < 0.20
    # shards stay roughly balanced (uniform hash): no shard holds
    # more than 2x its fair share
    from collections import Counter

    c = Counter(r.s8 for r in rows)
    assert set(c) == set(range(8))
    assert max(c.values()) < 2 * (len(rows) / 8)


def test_rendezvous_shrink_moves_only_orphans(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sampling import rendezvous_shard

    # removing the top shard relocates exactly its keys; everyone
    # else keeps their assignment (the symmetric HRW property)
    df = spark.range(1000).select(
        rendezvous_shard(F.col("id"), 9).alias("s9"),
        rendezvous_shard(F.col("id"), 8).alias("s8"),
    )
    for r in df.collect():
        if r.s9 != 8:
            assert r.s8 == r.s9


def test_quota_sample_exact_budget_and_proportionality(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sampling import quota_sample

    # 70/20/10 strata; budget 10 -> exact quotas 7/2/1
    df = spark.range(100).select(
        F.when(F.col("id") < 70, "a")
        .when(F.col("id") < 90, "b")
        .otherwise("c")
        .alias("s"),
        F.col("id"),
    )
    out = quota_sample(df, ["s"], "id", budget=10).collect()
    from collections import Counter

    c = Counter(r.s for r in out)
    assert len(out) == 10
    assert c == {"a": 7, "b": 2, "c": 1}


def test_quota_sample_gate_identical_and_underflow_raises(spark):
    # round-8 hash gate: with the gate ACTIVE (force threshold 0 so
    # every stratum keeps only ~2*alloc+64 of thousands) the selected
    # ids must equal the ungated default; a stratum whose gate
    # underflows (slack shrunk so kept < alloc, but > 0) must raise
    # the loud guard error, never return a short sample
    import pytest
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sampling import quota_sample

    df = spark.range(12000).select(
        F.when(F.col("id") % 10 < 8, "big")
        .when(F.col("id") % 10 < 9, "mid")
        .otherwise("small")
        .alias("s"),
        F.col("id"),
    )

    def ids(**kw):
        return sorted(
            (r.s, r.id) for r in quota_sample(df, ["s"], "id", 12, **kw).collect()
        )

    gated = ids()  # default: gate on, sliver-sized window input
    ungated = ids(gate_threshold=10**12)  # escape hatch: plain window
    assert gated == ungated
    assert len(gated) == 12
    # slack tuned from the actual hash values so the big stratum
    # keeps EXACTLY 3 rows (> 0, < alloc=9) -> the in-window guard
    # must raise, never return a short sample
    import hashlib

    def u(i):
        return int(
            hashlib.md5(f"{i}:23".encode()).hexdigest()[:15], 16
        ) / float(1 << 60)

    big = sorted(u(i) for i in range(12000) if i % 10 < 8)
    slack = (big[2] + big[3]) / 2.0 * len(big)
    with pytest.raises(Exception, match="underflow"):
        ids(gate_threshold=0, gate_factor=0.0, gate_slack=slack)


def test_quota_sample_largest_remainder_tiebreak(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sampling import quota_sample

    # three equal strata of 5, budget 7: floors are 2 each (6), one
    # leftover; remainders tie so the leftover goes to the first
    # stratum key in ascending order ("x")
    df = spark.range(15).select(
        F.element_at(
            F.array(F.lit("x"), F.lit("y"), F.lit("z")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("s"),
        F.col("id"),
    )
    out = quota_sample(df, ["s"], "id", budget=7).collect()
    from collections import Counter

    c = Counter(r.s for r in out)
    assert len(out) == 7
    assert c == {"x": 3, "y": 2, "z": 2}


def test_quota_sample_stable_under_repartition(spark):
    from pyspark.sql import functions as F

    from node_etl_spark.functions.sampling import quota_sample

    df = spark.range(200).select(
        (F.col("id") % 4).cast("string").alias("s"), F.col("id")
    )
    a = sorted(r.id for r in quota_sample(df, ["s"], "id", 20).collect())
    b = sorted(
        r.id
        for r in quota_sample(df.repartition(13), ["s"], "id", 20).collect()
    )
    assert a == b


def test_waterfill_level_hand_computed(spark):
    from node_etl_spark.functions.sampling import waterfill_budget

    # caps 10, 20, 70 -> total 100, budget 50; level L solves
    # min(10,L) + min(20,L) + min(70,L) = 50 -> 10 + 20 + L = 50
    # -> L = 20?  no: if L >= 20 then 10 + 20 + L = 50 -> L = 20,
    # consistent (L == 20 keeps cap 20 whole)
    rows = [("s1", 10), ("s2", 20), ("s3", 70)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r.grp: r for r in waterfill_budget(df, budget_frac=0.5).collect()}
    assert out["s1"].alloc == 10.0
    assert out["s2"].alloc == 20.0
    assert out["s3"].alloc == 20.0
    assert out["s3"].level == 20.0
    assert abs(sum(r.alloc for r in out.values()) - 50.0) < 1e-6
    assert out["s1"].kept_frac == 1.0


def test_waterfill_full_budget_keeps_everything(spark):
    from node_etl_spark.functions.sampling import waterfill_budget

    rows = [("a", 5), ("b", 500)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r.grp: r for r in waterfill_budget(df, budget_frac=1.0).collect()}
    assert out["a"].alloc == 5.0 and out["b"].alloc == 500.0
    assert all(r.kept_frac == 1.0 for r in out.values())


def test_source_ablation_subtraction_math(spark):
    from node_etl_spark.functions.sampling import source_ablation

    rows = [("a", 10)] * 4 + [("b", 100)] * 1
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r.grp: r for r in source_ablation(df).collect()}
    # corpus mean = 140/5 = 28; without a: 100/1; without b: 40/4
    assert out["a"].loo_mean == 100.0 and out["a"].delta == 72.0
    assert out["b"].loo_mean == 10.0 and out["b"].delta == -18.0
    assert out["a"].share == 0.8


def test_source_ablation_single_source_null_loo(spark):
    from node_etl_spark.functions.sampling import source_ablation

    df = spark.createDataFrame([("only", 5)], "source string, n_chars long")
    (r,) = source_ablation(df).collect()
    assert r.loo_mean is None and r.delta is None


def test_shapley_efficiency_and_dummy_player(spark):
    from node_etl_spark.functions.sampling import shapley_vocab_coverage

    # s1 brings {a b}, s2 brings {b c}, s3 brings nothing new ({a})
    rows = [
        (1, "s1", "a b"),
        (2, "s2", "b c"),
        (3, "s3", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.player: r for r in shapley_vocab_coverage(df, players=4).collect()}
    # efficiency: total vocab = 3 = sum of phi
    assert abs(sum(r.phi for r in out.values()) - 3.0) < 1e-6
    # c is s2's alone -> phi(s2) strictly largest
    assert out["s2"].phi == max(r.phi for r in out.values())
    # symmetry sanity: every player covering a shared word gets
    # a positive share (a appears in s1 and s3)
    assert all(r.phi > 0 for r in out.values())


def test_shapley_unique_coverage_dominates(spark):
    from node_etl_spark.functions.sampling import shapley_vocab_coverage

    # u has 5 unique words; v and w duplicate each other's 2 words:
    # phi(u) = 5, phi(v) = phi(w) = 1
    rows = [
        (1, "u", "q w e r t"),
        (2, "v", "x y"),
        (3, "w", "x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.player: r.phi for r in shapley_vocab_coverage(df, players=4).collect()}
    assert out["u"] == 5.0
    assert out["v"] == out["w"] == 1.0


def test_rendezvous_null_key_matches_oracle(spark):
    # regression (r7 ADVICE class): NULL keys shard identically on
    # both engines via the shared sentinel (concat_ws skips NULLs,
    # SQL || propagates — unguarded, the oracle's hash would be NULL)
    import duckdb

    from pyspark.sql import functions as F

    from node_etl_spark.functions.sampling import (
        rendezvous_shard,
        rendezvous_shard_sql,
    )

    df = spark.createDataFrame([("x",), (None,), ("y",)], "k string")
    got = {
        r.k: r.shard
        for r in df.select(
            "k", rendezvous_shard(F.col("k"), 8).alias("shard")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('x'), (NULL), ('y')) "
        "AS v(k)"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT k, {rendezvous_shard_sql('k', 8)} AS s FROM t"
        ).fetchall()
    }
    assert got == want
    assert got[None] is not None  # NULL key gets a real, stable shard
