"""Discrete-Laplace release mechanism + k-anonymity suppression."""

from fractions import Fraction

from pyspark.sql import functions as F

from node_etl_spark.functions.privacy import (
    discrete_laplace_thresholds,
    dlap_noise,
    dp_release_counts,
)


def test_thresholds_are_exact_and_cover_the_hash_space():
    pairs = discrete_laplace_thresholds()
    zs = [z for _, z in pairs]
    assert zs == list(range(-16, 17))
    thrs = [t for t, _ in pairs]
    assert thrs == sorted(thrs)
    assert thrs[-1] == 1 << 60  # every hash value lands somewhere
    # symmetry: P(Z=-z) == P(Z=z) -> threshold gaps mirror
    gaps = [b - a for a, b in zip([0] + thrs[:-1], thrs)]
    for i in range(16):
        assert abs(gaps[i] - gaps[-(i + 1)]) <= 1  # floor() rounding only
    # mode at zero
    assert max(gaps) == gaps[16]

    # alpha parameter actually shapes the distribution
    tight = discrete_laplace_thresholds(alpha=Fraction(1, 2), k_max=16)
    tgaps = [b - a for (a, _), (b, _) in zip([(0, 0)] + tight[:-1], tight)]
    assert tgaps[16] > gaps[16]  # smaller alpha -> more mass at 0


def test_noise_distribution_and_determinism(spark):
    df = spark.range(0, 20000).select(
        F.col("id").cast("string").alias("g")
    )
    noised = df.select(dlap_noise(F.col("g"), "seed-a").alias("z"))
    rows = [r["z"] for r in noised.collect()]
    assert all(-16 <= z <= 16 for z in rows)
    n = len(rows)
    p0 = sum(1 for z in rows if z == 0) / n
    # P(Z=0) = (1-a)/(1+a) = 1/7 ~ 0.1429 under alpha=3/4
    assert abs(p0 - 1 / 7) < 0.02
    mean = sum(rows) / n
    assert abs(mean) < 0.2  # symmetric around 0
    # deterministic per (group, seed); different seed -> different draw
    again = [r["z"] for r in noised.collect()]
    assert rows == again
    other = [
        r["z"]
        for r in df.select(dlap_noise(F.col("g"), "seed-b").alias("z"))
        .collect()
    ]
    assert rows != other


def test_dp_release_counts_suppression_and_clamp(spark):
    # group sizes: a=50, b=3 (suppressed), c=1 (suppressed)
    data = [("a",)] * 50 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(data, schema="g string")
    out = dp_release_counts(df, ["g"], seed="s", k_anon=5)
    rows = {r["g"]: r["n_noisy"] for r in out.collect()}
    assert set(rows) == {"a"}  # small cells never released
    assert abs(rows["a"] - 50) <= 16  # truncated noise support
    assert rows["a"] >= 0
