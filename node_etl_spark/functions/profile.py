"""Table profiling: one-pass column statistics for pipeline QA.

Before a 100 TB corpus is trained on, every ingestion step wants the
same cheap questions answered — row counts, null fractions,
cardinalities, top values. The reference's only observability is the
per-job ``spy`` tap (jobs/job.js:202-210); this is the columnar
equivalent, built as plain aggregates so it runs as one (or for
exact distincts, one-per-column expanded) pass and never collects
data rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Long-format column profile: (column, n_rows, n_nulls,
    n_distinct) per listed column.

    ``exact=False`` swaps COUNT(DISTINCT) for HyperLogLog++
    (``approx_count_distinct``) — the constant-memory path for wide
    tables at extreme scale, where k exact distincts cost a k-way
    row expansion.
    """
    cols = cols or df.columns
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(nd(c).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (column, n_nulls, n_distinct)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def histogram(
    df: DataFrame, col: str, bins: int = 20
) -> DataFrame:
    """Exact equi-width histogram of a numeric column:
    ``(bin, lo_edge, hi_edge, n)`` rows, empty bins omitted.

    Two aggregations over one scan: a single-row min/max pre-pass
    broadcasts back onto the scan (never collected to the driver) and
    the bin assignment is a row-local expression, so the only wide op
    is the final count-by-bin — ``bins`` groups regardless of input
    size. The max value clamps into the last bin.
    """
    bounds = df.agg(
        F.min(col).cast("double").alias("__lo"),
        F.max(col).cast("double").alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_ = F.least(
        F.floor((F.col(col).cast("double") - F.col("__lo")) / width),
        F.lit(bins - 1),
    ).cast("int")
    return (
        df.join(F.broadcast(bounds))
        .groupBy(bin_.alias("bin"), "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * width).alias("lo_edge"),
            (F.col("__lo") + (F.col("bin") + 1) * width).alias("hi_edge"),
            "n",
        )
    )


def histogram_oracle_sql(table: str, col: str, bins: int = 20) -> str:
    """DuckDB mirror of :func:`histogram`."""
    return f"""
    WITH b AS (SELECT CAST(MIN({col}) AS DOUBLE) AS lo,
                      CAST(MAX({col}) AS DOUBLE) AS hi
               FROM {table}),
    binned AS (
        SELECT CAST(least(floor((CAST({col} AS DOUBLE) - lo)
                                / ((hi - lo) / {bins}.0)),
                          {bins - 1}) AS INTEGER) AS bin, lo, hi
        FROM {table}, b)
    SELECT bin,
           lo + bin * ((hi - lo) / {bins}.0) AS lo_edge,
           lo + (bin + 1) * ((hi - lo) / {bins}.0) AS hi_edge,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY 1, lo, hi
    """
