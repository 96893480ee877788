"""Skyline / Pareto frontier (functions/frontier.py)."""

from __future__ import annotations

import pytest

from node_etl_spark.functions.frontier import skyline


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_skyline_basic_max_max(spark):
    # (3,3) dominates (1,1) and (3,2); (2,4) and (4,1) survive
    rows = [(1, 1.0, 1.0), (2, 3.0, 3.0), (3, 3.0, 2.0), (4, 2.0, 4.0), (5, 4.0, 1.0)]
    got = {r.id for r in skyline(_pts(spark, rows), maximize=("x", "y")).collect()}
    assert got == {2, 4, 5}


def test_skyline_min_direction(spark):
    rows = [(1, 1.0, 5.0), (2, 2.0, 2.0), (3, 5.0, 1.0), (4, 4.0, 4.0)]
    got = {r.id for r in skyline(_pts(spark, rows), minimize=("x", "y")).collect()}
    assert got == {1, 2, 3}


def test_skyline_exact_ties_all_kept(spark):
    # identical criterion vectors do not dominate each other
    rows = [(1, 2.0, 2.0), (2, 2.0, 2.0), (3, 1.0, 1.0)]
    got = {r.id for r in skyline(_pts(spark, rows), maximize=("x", "y")).collect()}
    assert got == {1, 2}


def test_skyline_null_criterion_rows_excluded(spark):
    rows = [(1, 9.0, 9.0), (2, None, 1.0), (3, 1.0, None)]
    got = {r.id for r in skyline(_pts(spark, rows), maximize=("x", "y")).collect()}
    assert got == {1}


def test_skyline_cross_partition_domination(spark):
    # dominated rows sit in different partitions from their dominator;
    # the phase-2 reduce must remove them
    rows = [(i, float(i % 7), float(i % 5)) for i in range(1, 201)]
    rows.append((999, 10.0, 10.0))  # dominates everything
    df = _pts(spark, rows).repartition(16)
    got = [r.id for r in skyline(df, maximize=("x", "y")).collect()]
    assert got == [999]


def test_skyline_equal_on_one_dim_strict_on_other(spark):
    # (2,3) dominates (2,1): equal x, strictly better y
    rows = [(1, 2.0, 3.0), (2, 2.0, 1.0)]
    got = {r.id for r in skyline(_pts(spark, rows), maximize=("x", "y")).collect()}
    assert got == {1}


def test_skyline_three_criteria_mixed(spark):
    df = spark.createDataFrame(
        [
            (1, 1.0, 1.0, 1.0),
            (2, 2.0, 2.0, 0.5),  # dominates 1 (better x, y; better z=min)
            (3, 0.5, 3.0, 2.0),
        ],
        "id long, x double, y double, z double",
    )
    got = {r.id for r in skyline(df, maximize=("x", "y"), minimize=("z",)).collect()}
    assert got == {2, 3}


def test_skyline_requires_criteria(spark):
    with pytest.raises(ValueError):
        skyline(_pts(spark, [(1, 1.0, 1.0)]))
