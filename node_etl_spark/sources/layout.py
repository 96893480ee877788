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


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Bin-pack a parquet dataset's files to ~``target_file_bytes``;
    returns the new file count.

    Small-file proliferation is the operational tax of incremental
    ingest (every micro-batch / upsert appends a few files; a year
    later every scan pays per-file open + footer-read + task-schedule
    cost for thousands of slivers). Compaction sizes the output from
    the dataset's actual on-disk bytes — ceil(bytes / target) — and
    rewrites with ``coalesce`` (narrow: merges input splits, no
    shuffle, preserves existing sort order within files).

    The swap is rename-based via the Hadoop FileSystem API, so it
    works on any supported filesystem; renames are atomic on HDFS /
    local posix, copy-based on object stores — run compaction in the
    same maintenance window as `upsert_parquet` there.
    """
    import math

    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    src = Path(path)
    fs = src.getFileSystem(conf)

    total = 0
    it = fs.listFiles(src, True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))

    tmp = Path(path.rstrip("/") + "__compacting")
    old = Path(path.rstrip("/") + "__precompact")
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(
        str(tmp)
    )
    if not fs.rename(src, old):
        raise IOError(f"compact_parquet: could not stage {path}")
    if not fs.rename(tmp, src):
        fs.rename(old, src)  # roll back
        raise IOError(f"compact_parquet: could not swap in compacted {path}")
    fs.delete(old, True)
    return n_files
