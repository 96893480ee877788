"""Deterministic sampling / dataset-split operators for training-data
pipelines.

A 100 TB corpus becomes train/val/test by *hashing*, never by
`rand()`: a hash split is reproducible across runs, stable under
re-partitioning, and adding documents never moves an existing document
between splits. All hashes here are md5 hex strings, which Spark and
DuckDB compute identically, so every operator is oracle-checkable.

The reference has no sampling surface at all (rows pass through its
convertors unsampled); this module is net-new scale machinery, a
sibling of dedup.py/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int = 42, buckets: int = BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from an id.

    md5 of ``"<id>:<seed>"``; the first 8 hex chars (32 uniform bits)
    are exact in a double, so the modulo is portable everywhere.
    Narrow expression — no shuffle, codegen-friendly.
    """
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets).cast("int")


def hash_bucket_sql(id_expr: str, seed: int = 42, buckets: int = BUCKETS) -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    return (
        f"CAST(CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR) || ':{seed}'), 1, 8)) "
        f"AS BIGINT) % {buckets} AS INTEGER)"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Assign every row to a named split by hash of its id.

    ``splits`` maps name -> weight (must sum to ~1.0); iteration order
    fixes the bucket ranges, so pass an ordered dict. Adds a
    ``split`` column; no shuffle, no sampling pass — the assignment is
    a pure row-local expression, which is the only design that holds
    at 100 TB (a global `sampleBy` would need a second pass and is
    not stable under appends).
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = hash_bucket(F.col(id_col), seed=seed)
    expr: Column | None = None
    hi = 0.0
    for name, w in splits.items():
        hi += w
        bound = int(round(hi * BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def hash_split_case_sql(id_expr: str, splits: dict[str, float], seed: int = 42) -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`."""
    b = hash_bucket_sql(id_expr, seed=seed)
    out = "CASE"
    hi = 0.0
    for name, w in splits.items():
        hi += w
        out += f" WHEN {b} < {int(round(hi * BUCKETS))} THEN '{name}'"
    return out + " END"


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample.

    Rank rows inside each stratum by hash(id) and keep the first n —
    a uniform sample whose membership is a pure function of
    (id, seed). One shuffle (the window partition); per-stratum state
    is a single counter, so skewed strata cost I/O, not memory. For
    approximate fractions at extreme scale prefer
    ``hash_bucket(id) < f * BUCKETS`` (shuffle-free); this operator is
    for exact-count needs (eval sets, per-language quotas).
    """
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
        id_col,
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def stratified_sample_sql(
    table: str,
    strata: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    part = ", ".join(strata)
    proj = "*" if cols == "*" else f"{cols}, sample_rank"
    return f"""
    SELECT {proj} FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {part}
            ORDER BY md5(CAST({id_col} AS VARCHAR) || ':{seed}'), {id_col}
        ) AS sample_rank
        FROM {table})
    WHERE sample_rank <= {n_per_stratum}
    """
