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
