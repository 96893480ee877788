"""Execution-layout helpers shared across operators and catalog
queries.

``spread`` addresses the small-input parallelism gap: a parquet file
with one row group yields one (or very few) input splits, so any
CPU-heavy per-row stage sitting directly on the scan runs on a
handful of cores no matter how many the session has. At corpus scale
(the 100 TB target) scans naturally produce >= cores splits and
``spread`` is a no-op — it only pays a (cheap, narrow) round-robin
shuffle when the scan is too small to saturate the machine, which is
exactly the local/bench regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, minimum: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``minimum`` (default: cluster
    parallelism) partitions before a CPU-bound stage.

    Only scan-bottom (exchange-free) plans are probed and possibly
    repartitioned: once any shuffle sits upstream, partitioning is
    already >= ``spark.sql.shuffle.partitions`` and a probe would be
    pure waste — worse, with AQE enabled ``df.rdd`` *executes* every
    upstream query stage at plan-construction time, so probing a
    derived frame would silently run (and later re-run) cluster jobs.
    Narrow plans have no stages to materialize, making the probe free;
    big scans keep their native splits and pay nothing.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        return df
    sc = df.sparkSession.sparkContext
    target = minimum or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
