"""Connected components / dedup clustering (functions/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from node_etl_spark.functions.graph import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4 chain plus isolated pair 10-11
    comp = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]))
    got = _labels(comp)
    assert got == {2: 1, 3: 1, 4: 1, 11: 10}


def test_cycle_and_reversed_edges(spark):
    # cycle 5-6-7-5 given in mixed direction, duplicate edges
    comp = connected_components(
        _edges(spark, [(6, 5), (6, 7), (5, 7), (7, 5), (5, 6)])
    )
    assert _labels(comp) == {6: 5, 7: 5}


def test_star_already_converged(spark):
    comp = connected_components(_edges(spark, [(1, 2), (1, 3), (1, 4)]))
    assert _labels(comp) == {2: 1, 3: 1, 4: 1}


def test_two_stars_bridge(spark):
    # two stars joined by one bridge edge -> single component
    edges = [(1, i) for i in range(2, 6)] + [(100, i) for i in range(101, 105)]
    edges.append((5, 104))
    comp = connected_components(_edges(spark, edges))
    got = _labels(comp)
    assert set(got.values()) == {1}
    assert set(got) == {2, 3, 4, 5, 100, 101, 102, 103, 104}


def test_empty_edges(spark):
    comp = connected_components(_edges(spark, []))
    assert comp.count() == 0
    assert comp.columns == ["id", "component"]


def test_dedup_clusters_canonical(spark):
    docs = spark.range(1, 9).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "d1 long, d2 long")
    out = dedup_clusters(docs, pairs).collect()
    by_doc = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out}
    assert by_doc == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        5: (5, True),
        6: (5, False),
    }
    # docs without a duplicate partner are absent (removal-list contract)
    assert 4 not in by_doc and 7 not in by_doc
