"""Data layout for scan pruning: Z-order (Morton) clustering.

Parquet pruning works at two levels — partition directories and
per-file/row-group min-max statistics. Partitioning handles one
low-cardinality column; Z-ordering handles the *multi-column numeric*
case: interleaving the bits of k normalized columns and range-sorting
by the interleaved value places rows that are close in ALL k
dimensions into the same files, so each file covers a narrow min-max
box in every Z-column and a filter on ANY of them prunes most files.
(The same idea Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is
a plain write-time utility over open parquet.)

Scale notes: normalization bounds come from one min/max aggregate
(cheap, exact); the Z-value is a pure JVM expression (no UDF); the
clustered write is one range shuffle — the same cost as any
repartitionByRange write. Re-run after large appends, like
compaction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16


def _normalize(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits)."""
    span = hi - lo
    frac = F.when(span <= 0, F.lit(0.0)).otherwise(
        (F.col(col).cast("double") - lo) / span
    )
    maxv = (1 << bits) - 1
    return F.least(
        F.lit(maxv).cast("long"),
        F.greatest(F.lit(0).cast("long"), (frac * maxv).cast("long")),
    )


def zorder_value(norm_cols: list[Column], bits: int = BITS) -> Column:
    """Morton interleave of pre-normalized integer columns (bit i of
    column j lands at position i*k + j)."""
    k = len(norm_cols)
    terms = []
    for j, c in enumerate(norm_cols):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + j))
    return reduce(lambda a, b: a + b, terms).alias("__z")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = BITS,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` Z-ordered by ``cols`` into ``n_files`` files whose
    per-file min-max boxes are narrow in every listed column."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    ).first()
    norm = [
        _normalize(c, F.lit(bounds[f"__lo_{c}"]), F.lit(bounds[f"__hi_{c}"]), bits)
        for c in cols
    ]
    (
        df.withColumn("__z", zorder_value(norm, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
