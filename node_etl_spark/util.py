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

import re

from pyspark.sql import DataFrame

# Logical operators that keep a plan scan-bottom: per-partition-only
# work with no grouping/join/ordering between the source and the
# consumer. Anything NOT on this list (Join, Aggregate, Window, Sort,
# Repartition, Deduplicate, ...) — or unrecognized — means the frame
# is derived, so spread() must not touch it. The whitelist direction
# is deliberate: a false "derived" merely skips a local-only
# optimization, while a false "scan-bottom" would execute upstream
# query stages through the rdd probe.
_NARROW_NODES = frozenset(
    {
        "Relation", "RelationV2", "InMemoryRelation", "Range",
        "LogicalRDD", "LocalRelation", "UnresolvedRelation",
        "View", "SubqueryAlias", "Project", "Filter", "Generate",
        "Union", "Sample", "MapInPandas", "SerializeFromObject",
        "DeserializeToObject", "MapElements", "TypedFilter",
    }
)
_NODE_NAME = re.compile(r"(?m)^[\s|:+\-]*'?([A-Za-z][A-Za-z0-9]*)")


def _is_scan_bottom(df: DataFrame) -> bool:
    """True when every operator in the OPTIMIZED LOGICAL plan is a
    narrow whitelisted node. The logical tree is used instead of the
    physical dump because logical node names are stable across Spark
    versions, while physical strings ("Exchange", AQE wrappers) are
    not — the round-2 review flagged the old string guard as brittle.
    Node names are matched per line-start so expression text (e.g.
    ``sort_array``) can't false-positive."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    names = _NODE_NAME.findall(plan)
    return bool(names) and all(n in _NARROW_NODES for n in names)


def spread(df: DataFrame, minimum: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``minimum`` (default: cluster
    parallelism) partitions before a CPU-bound stage.

    Only scan-bottom plans are probed and possibly repartitioned: once
    any shuffle sits upstream, partitioning is already >=
    ``spark.sql.shuffle.partitions`` and a probe would be pure waste —
    worse, with AQE enabled ``df.rdd`` *executes* every upstream query
    stage at plan-construction time, so probing a derived frame would
    silently run (and later re-run) cluster jobs. Narrow plans have no
    stages to materialize, making the probe free; big scans keep their
    native splits and pay nothing.
    """
    if not _is_scan_bottom(df):
        return df
    sc = df.sparkSession.sparkContext
    target = minimum or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
