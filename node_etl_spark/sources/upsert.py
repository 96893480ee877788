"""Key-based upsert (last-write-wins merge) into a parquet dataset.

The reference's merge idiom is a Reducer whose processor keeps the
last row per key (examples/bor-dwc.js:600-608 — fact rows keyed by
month+org, later reads overwrite earlier ones in ``maps``). Here the
same contract is a *table maintenance* operation: merge an updates
DataFrame into an existing parquet dataset by key.

Scale design:

* **Partitioned datasets rewrite only affected partitions.** The
  updates' distinct partition values (collected — partition columns
  are low-cardinality by construction) prune the existing-side scan,
  and dynamic partition overwrite (`partitionOverwriteMode=dynamic`)
  replaces exactly those directories. A 100 TB table with daily
  partitions pays for the touched days, not the table.
* The merge itself is one shuffle: union + row_number over
  (keys, precedence) — updates outrank existing rows, ``order_col``
  breaks ties within each side.
* Unpartitioned datasets are a full rewrite via a temp sibling + swap
  (same pattern as ``compact``); correct, but at scale you partition.
* For concurrent writers / ACID you want a real table format
  (Delta/Iceberg) — this is the connector-free core semantic.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _exists(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    return any(not f.startswith(("_", ".")) for f in os.listdir(path))


def last_write_wins(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """One surviving row per key: updates beat existing; within a
    side, highest ``order_col`` wins (arrival order is meaningless in
    a distributed merge — an explicit version/timestamp column is the
    only scale-valid tiebreak)."""
    ex = existing.withColumn("__prec", F.lit(0))
    up = updates.withColumn("__prec", F.lit(1))
    both = ex.unionByName(up)
    order = [F.desc("__prec")]
    if order_col is not None:
        order.append(F.desc(order_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__prec", "__rn")
    )


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Merge ``updates`` into the parquet dataset at ``path`` by
    ``keys`` (insert new keys, replace matched ones). Returns the
    number of rows written (affected partitions only, when
    partitioned). Creates the dataset if absent."""
    if not _exists(path):
        # the dataset contract is one row per key from day one — an
        # updates batch may itself carry key duplicates
        first = last_write_wins(updates.limit(0), updates, keys, order_col)
        w = first.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return spark.read.parquet(path).count()

    if partition_by:
        # prune existing to the partitions the updates touch
        parts = updates.select(*partition_by).distinct().collect()
        if not parts:
            return 0
        pred = None
        for row in parts:
            clause = None
            for c in partition_by:
                eq = F.col(c) == F.lit(row[c])
                clause = eq if clause is None else (clause & eq)
            pred = clause if pred is None else (pred | clause)
        existing = spark.read.parquet(path).filter(pred)
        merged = last_write_wins(existing, updates, keys, order_col)
        # materialize before overwriting the directories being read
        merged = merged.localCheckpoint(eager=True)
        n = merged.count()
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return n

    existing = spark.read.parquet(path)
    merged = last_write_wins(existing, updates, keys, order_col)
    tmp = path.rstrip("/") + ".__upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n
