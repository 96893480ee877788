"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()``   — every implemented query/operator from SURVEY.md §2,
                  (spark, sf_dir) -> DataFrame.
``oracle_sql()``— matching DuckDB SQL per query (correctness gate).

Implementations live in ``node_etl_spark.plans.queries``; this module
is a thin adapter so the engine is usable as a library independent of
the driver harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from node_etl_spark.plans import oracle_map, query_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from node_etl_spark.plans.queries import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_map()
