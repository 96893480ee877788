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

Quantization first, always: raw interleaving of columns with unequal
ranges is one-sided — a 10-value column against a 200k-value column
contributes only its few low bits, so the curve degenerates into a
plain sort on the wide column (measured: per-file span on the narrow
column stayed at the global span). Min-max scaling each dimension to
the full bit width is what the production implementations do, and it
is pure integer arithmetic here: exact in both engines, so layout
decisions sit on the value gate like the rest of the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-curve) interleave of two non-negative integer columns
    already quantized to ``bits`` bits each: result bit 2i is x's bit
    i, bit 2i+1 is y's bit i. Pure shift/and/multiply expression —
    whole-stage codegen, no UDF; mirrored in SQL by
    :func:`morton_sql`."""
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


def _quantize(col: str, lo: str, hi: str, bits: int) -> Column:
    """Min-max scale an integer column to [0, 2^bits - 1] with exact
    integer arithmetic (floor division; degenerate span -> 0)."""
    maxq = (1 << bits) - 1
    return F.expr(
        f"(({col} - {lo}) * {maxq}) div greatest(1, {hi} - {lo})"
    )


def _quantize_sql(col: str, lo: str, hi: str, bits: int) -> str:
    maxq = (1 << bits) - 1
    return f"((({col} - {lo}) * {maxq}) // greatest(1, {hi} - {lo}))"


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-z-bucket statistics proving the pruning property: each
    dimension min-max quantizes to ``bits`` bits, the quantized pair
    Morton-interleaves, and rows range-partition into ``n_buckets``
    equal-width z ranges (the file/task grain a writer would use).
    For each bucket we report row count plus min/max of BOTH source
    columns — under z-order both ranges are tight simultaneously,
    which is why a filter on either column can skip most buckets,
    whereas a single-column sort makes only its own column's range
    tight. Output: (bucket, n_rows, x_min, x_max, y_min, y_max), the
    exact min/max a parquet writer would put in file footers. All
    bucketing is integer arithmetic over one broadcast stats row, so
    both engines agree bit-for-bit."""
    stats = df.agg(
        F.min(x_col).cast("bigint").alias("__xlo"),
        F.max(x_col).cast("bigint").alias("__xhi"),
        F.min(y_col).cast("bigint").alias("__ylo"),
        F.max(y_col).cast("bigint").alias("__yhi"),
    )
    zed = (
        df.select(
            F.col(x_col).cast("bigint").alias("x"),
            F.col(y_col).cast("bigint").alias("y"),
        )
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "z",
            morton_interleave(
                _quantize("x", "__xlo", "__xhi", bits),
                _quantize("y", "__ylo", "__yhi", bits),
                bits,
            ),
        )
    )
    # z is bounded by construction (quantized dims), so bucket width
    # is the static 2^(2*bits) / n_buckets — one integer expression,
    # one shuffle
    return (
        zed.groupBy(
            F.expr(f"z * {n_buckets} div {1 << (2 * bits)}").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
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
    xq = _quantize_sql("x", "xlo", "xhi", bits)
    yq = _quantize_sql("y", "ylo", "yhi", bits)
    m = morton_sql(xq, yq, bits)
    return f"""
    WITH stats AS (
        SELECT CAST(MIN({x}) AS BIGINT) AS xlo,
               CAST(MAX({x}) AS BIGINT) AS xhi,
               CAST(MIN({y}) AS BIGINT) AS ylo,
               CAST(MAX({y}) AS BIGINT) AS yhi
        FROM {table}),
    zed AS (
        SELECT CAST({x} AS BIGINT) AS x, CAST({y} AS BIGINT) AS y,
               {m} AS z
        FROM {table}, stats)
    SELECT (z * {n_buckets} // {1 << (2 * bits)}) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM zed
    GROUP BY 1
    """


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 8,
    file_format: str = "parquet",
) -> None:
    """Write ``df`` clustered by the z-order of (x_col, y_col): each
    dimension min-max quantizes to ``bits`` bits (one tiny stats agg),
    rows range-partition into ``n_files`` contiguous z ranges and
    sort by z within each task, so every output file covers a tight
    min/max box in BOTH dimensions — the write-side move that makes
    :func:`zorder_bucket_stats`'s skipping numbers real on disk
    (Delta/Iceberg OPTIMIZE ZORDER BY, expressed as plain
    repartitionByRange + sortWithinPartitions; parquet footer min/max
    then do the pruning on read). ``n_files`` is the file grain: at
    cluster scale set it to data_size / target_file_size."""
    lo_hi = df.agg(
        F.min(x_col).cast("bigint").alias("xlo"),
        F.max(x_col).cast("bigint").alias("xhi"),
        F.min(y_col).cast("bigint").alias("ylo"),
        F.max(y_col).cast("bigint").alias("yhi"),
    ).first()
    maxq = (1 << bits) - 1
    xq = F.expr(
        f"(({x_col} - {lo_hi.xlo}) * {maxq})"
        f" div greatest(1, {lo_hi.xhi - lo_hi.xlo})"
    )
    yq = F.expr(
        f"(({y_col} - {lo_hi.ylo}) * {maxq})"
        f" div greatest(1, {lo_hi.yhi - lo_hi.ylo})"
    )
    (
        df.withColumn("__z", morton_interleave(xq, yq, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(file_format)
        .save(path)
    )
