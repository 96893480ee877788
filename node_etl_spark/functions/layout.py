"""Data-layout optimization helpers (the write-side half of scan
performance at 100 TB).

Partition pruning (q176) and range boundaries (q194) optimize ONE sort
dimension; real fact tables get filtered on several. Z-ordering
(Morton-curve interleaving) is the standard multi-dimensional answer
— Delta Lake OPTIMIZE ZORDER BY, Iceberg sort orders, and the classic
UB-tree literature (Bayer 1997) all use it: interleave the bits of k
quantized key columns so lexicographic order on the combined value
preserves locality in EVERY dimension, then range-partition files by
that value. Each file's min/max on each original column becomes tight,
so a predicate on ANY of the z-columns prunes most files.

Everything here is integer bit arithmetic — identical in Spark and
DuckDB, so layout decisions sit on the exact value gate like the rest
of the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-curve) interleave of two non-negative integer columns
    quantized to ``bits`` bits each: result bit 2i is x's bit i,
    bit 2i+1 is y's bit i. Pure shift/and/or expression — whole-stage
    codegen, no UDF; mirrored in SQL by :func:`morton_sql`."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xs = x.cast("bigint")
    ys = y.cast("bigint")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out + (
            F.shiftright(xs, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        ) + (
            F.shiftright(ys, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return out


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB/ANSI mirror of :func:`morton_interleave`."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-z-bucket statistics proving the pruning property: rows are
    range-partitioned into ``n_buckets`` equal-width z-value ranges
    (the file/task grain a writer would use; width derives from the
    observed max z, so the grain is meaningful at every scale
    factor), and for each bucket we report row count plus min/max of
    BOTH source columns. Under z-order both ranges are tight
    simultaneously — the reason a filter on either column can skip
    most buckets — whereas a single-column sort makes only its own
    column's range tight. Output: (bucket, n_rows, x_min, x_max,
    y_min, y_max), the exact min/max a parquet writer would put in
    file footers for skipping. Bucketing uses integer floor division
    only, so both engines agree bit-for-bit."""
    z = morton_interleave(F.col(x_col), F.col(y_col), bits).alias("z")
    zed = df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"), z)
    zmax = zed.agg(F.max("z").alias("__zmax"))
    return (
        zed.crossJoin(F.broadcast(zmax))
        .groupBy(
            F.expr(f"z * {n_buckets} div (__zmax + 1)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").cast("bigint").alias("x_min"),
            F.max("x").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
    )


def zorder_stats_sql(
    table: str,
    x: str,
    y: str,
    bits: int = 16,
    n_buckets: int = 256,
) -> str:
    """DuckDB mirror of :func:`zorder_bucket_stats`."""
    m = morton_sql(x, y, bits)
    return f"""
    WITH zed AS (
        SELECT {x} AS x, {y} AS y, {m} AS z FROM {table}),
    zmax AS (SELECT MAX(z) AS zm FROM zed)
    SELECT (z * {n_buckets} // (zm + 1)) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS x_min,
           CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min,
           CAST(MAX(y) AS BIGINT) AS y_max
    FROM zed, zmax
    GROUP BY 1
    """
