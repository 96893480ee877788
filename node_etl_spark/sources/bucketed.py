"""Bucketed tables: co-located, shuffle-free joins and aggregations.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Spark
bucketing pre-partitions a table on disk by ``hash(bucket_cols) %
n_buckets`` (optionally sorted within buckets); two tables bucketed
the same way join bucket-to-bucket with NO exchange on either side,
and groupBy on the bucket key skips its shuffle too. The reference has
no analogue (single process, no partitioning — SURVEY §4.2); this is
pure scale infrastructure.

Usage pattern: land big fact tables once via ``write_bucketed`` (e.g.
lineitem and orders bucketed by orderkey), then every subsequent join
between them is exchange-free — the classic "pay the shuffle once at
ingest" trade. Verified by plan assertion in tests/test_bucketed.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed managed table. ``n_buckets`` should
    be sized so one bucket of the largest co-bucketed table fits an
    executor's memory at target scale (buckets are the join-task unit).
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog,
    so joins/aggs on the bucket key skip their exchange)."""
    return spark.table(table_name)
