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

Everything here is k-dimensional (Delta/Iceberg users routinely
z-order 3-4 columns); the 2-column calls read the same as before
because the column list is a vararg. Column j's bit i lands at
position ``i*k + j``, and ``k * bits`` must fit in the 63 usable bits
of a BIGINT — pass a smaller ``bits`` for more columns (16 covers
k=2, 10 covers k=3..6 comfortably; quantization makes extra depth
worthless once 2^bits exceeds the file count anyway).

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


def _check_bits(k: int, bits: int) -> None:
    if k < 1:
        raise ValueError("need at least one column")
    if not 1 <= bits or k * bits > 63:
        raise ValueError(
            f"k*bits must be in [1, 63]; got {k} cols x {bits} bits"
        )


def morton_interleave(*cols: Column, bits: int = 16) -> Column:
    """Morton (Z-curve) interleave of k non-negative integer columns
    already quantized to ``bits`` bits each: column j's bit i lands at
    result position ``i*k + j`` (for two columns: x bits on even
    positions, y on odd — unchanged from the 2-D form). Pure
    shift/and/multiply expression — whole-stage codegen, no UDF;
    mirrored in SQL by :func:`morton_sql`."""
    k = len(cols)
    _check_bits(k, bits)
    out = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cj = c.cast("bigint")
        for i in range(bits):
            out = out + (
                F.shiftright(cj, i).bitwiseAND(F.lit(1))
                * F.lit(1 << (i * k + j))
            )
    return out


def morton_sql(*cols: str, bits: int = 16) -> str:
    """DuckDB/ANSI mirror of :func:`morton_interleave`."""
    k = len(cols)
    _check_bits(k, bits)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) * {1 << (i * k + j)})")
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
    *cols: str,
    bits: int = 16,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-z-bucket statistics proving the pruning property in k
    dimensions: each listed column min-max quantizes to ``bits`` bits,
    the quantized tuple Morton-interleaves, and rows range-partition
    into ``n_buckets`` equal-width z ranges (the file/task grain a
    writer would use). For each bucket we report row count plus
    min/max of EVERY source column — under z-order all k ranges are
    tight simultaneously, which is why a filter on ANY z-column can
    skip most files, whereas a single-column sort makes only its own
    column's range tight. Output: (bucket, n_rows, <col>_min,
    <col>_max ...), the exact min/max a parquet writer would put in
    file footers. All bucketing is integer arithmetic over one
    broadcast stats row, so both engines agree bit-for-bit."""
    k = len(cols)
    _check_bits(k, bits)
    stats = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(c).cast("bigint").alias(f"__lo_{c}"),
                F.max(c).cast("bigint").alias(f"__hi_{c}"),
            )
        ]
    )
    zed = (
        df.select(*[F.col(c).cast("bigint").alias(c) for c in cols])
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "z",
            morton_interleave(
                *[
                    _quantize(c, f"__lo_{c}", f"__hi_{c}", bits)
                    for c in cols
                ],
                bits=bits,
            ),
        )
    )
    # z is bounded by construction (quantized dims), so bucket width
    # is the static 2^(k*bits) / n_buckets — one integer expression,
    # one shuffle
    return (
        zed.groupBy(
            F.expr(f"z * {n_buckets} div {1 << (k * bits)}").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            *[
                a
                for c in cols
                for a in (
                    F.min(c).alias(f"{c}_min"),
                    F.max(c).alias(f"{c}_max"),
                )
            ],
        )
    )


def zorder_stats_sql(
    table: str,
    *cols: str,
    bits: int = 16,
    n_buckets: int = 256,
) -> str:
    """DuckDB mirror of :func:`zorder_bucket_stats`."""
    k = len(cols)
    _check_bits(k, bits)
    stat_items = ", ".join(
        f"CAST(MIN({c}) AS BIGINT) AS lo_{c}, "
        f"CAST(MAX({c}) AS BIGINT) AS hi_{c}"
        for c in cols
    )
    quantized = [
        _quantize_sql(f"c_{j}", f"lo_{c}", f"hi_{c}", bits)
        for j, c in enumerate(cols)
    ]
    m = morton_sql(*quantized, bits=bits)
    casts = ", ".join(
        f"CAST({c} AS BIGINT) AS c_{j}" for j, c in enumerate(cols)
    )
    minmax = ", ".join(
        f"MIN(c_{j}) AS {c}_min, MAX(c_{j}) AS {c}_max"
        for j, c in enumerate(cols)
    )
    return f"""
    WITH stats AS (
        SELECT {stat_items}
        FROM {table}),
    zed AS (
        SELECT {casts},
               {m} AS z
        FROM {table}, stats)
    SELECT (z * {n_buckets} // {1 << (k * bits)}) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {minmax}
    FROM zed
    GROUP BY 1
    """


def zorder_write(
    df: DataFrame,
    path: str,
    *cols: str,
    bits: int = 16,
    n_files: int = 8,
    file_format: str = "parquet",
) -> None:
    """Write ``df`` clustered by the z-order of ``cols``: each
    dimension min-max quantizes to ``bits`` bits (one tiny stats agg),
    rows range-partition into ``n_files`` contiguous z ranges and
    sort by z within each task, so every output file covers a tight
    min/max box in EVERY listed dimension — the write-side move that
    makes :func:`zorder_bucket_stats`'s skipping numbers real on disk
    (Delta/Iceberg OPTIMIZE ZORDER BY, expressed as plain
    repartitionByRange + sortWithinPartitions; parquet footer min/max
    then do the pruning on read). ``n_files`` is the file grain: at
    cluster scale set it to data_size / target_file_size."""
    k = len(cols)
    _check_bits(k, bits)
    lo_hi = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(c).cast("bigint").alias(f"lo_{c}"),
                F.max(c).cast("bigint").alias(f"hi_{c}"),
            )
        ]
    ).first()
    maxq = (1 << bits) - 1
    quantized = [
        F.expr(
            f"(({c} - {lo_hi[f'lo_{c}']}) * {maxq})"
            f" div greatest(1, {lo_hi[f'hi_{c}'] - lo_hi[f'lo_{c}']})"
        )
        for c in cols
    ]
    (
        df.withColumn("__z", morton_interleave(*quantized, bits=bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(file_format)
        .save(path)
    )
