"""BM25 retrieval (functions/search.py): scores against a hand-rolled
reference implementation, posting-list index shape, and the
broadcast-not-shuffle plan contract for the dimension-sized sides."""

from __future__ import annotations

import math

from node_etl_spark.functions.search import bm25_topk, inverted_index, tokens

DOCS = [
    (1, "spark spark hash join"),
    (2, "hash table scan"),
    (3, "stream window stream stream"),
    (4, "vector scan"),
    (5, "the quick fox"),
]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    dl = {i: len(v) for i, v in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = {
        t: sum(1 for v in toks.values() if t in v)
        for t in terms
    }
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[i] / avgdl))
        if s:
            out[i] = s
    return out


def test_bm25_matches_reference_formula(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: r.bm25
        for r in bm25_topk(docs, ["hash", "stream", "vector"], k=10).collect()
    }
    want = _ref_bm25(DOCS, ["hash", "stream", "vector"])
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


def test_bm25_ranking_and_tiebreak(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(docs, ["hash", "stream", "vector"], k=2).collect()
    assert len(rows) == 2
    assert rows[0].bm25 >= rows[1].bm25


def test_inverted_index_postings(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = {r.term: r for r in inverted_index(docs).collect()}
    assert idx["hash"].df == 2
    assert [(p.doc_id, p.tf) for p in idx["hash"].postings] == [(1, 1), (2, 1)]
    assert [(p.doc_id, p.tf) for p in idx["stream"].postings] == [(3, 3)]
    assert "" not in idx


def test_tokens_drops_empties(spark):
    docs = spark.createDataFrame([(1, "a  b "), (2, "")], ["doc_id", "text"])
    got = [(r.doc_id, r.term) for r in tokens(docs).collect()]
    assert sorted(got) == [(1, "a"), (1, "b")]


def test_bm25_plan_broadcasts_dimension_sides(spark, sf_dir):
    # df/idf and corpus stats are dimension-sized: they must broadcast
    # into the probe side, never shuffle it
    from node_etl_spark.plans import QUERIES

    df = QUERIES["q119_bm25_search"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats side


def test_posting_store_prunes_to_query_buckets(spark, tmp_path):
    from node_etl_spark.functions.search import (
        load_postings,
        write_inverted_index,
    )

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    path = str(tmp_path / "postings")
    write_inverted_index(docs, path, n_buckets=16)

    got = load_postings(spark, path, ["hash", "stream"], n_buckets=16)
    rows = {r.term: r for r in got.collect()}
    assert set(rows) == {"hash", "stream"}
    assert [(p.doc_id, p.tf) for p in rows["hash"].postings] == [(1, 1), (2, 1)]

    # the probe must prune partition directories, not list all buckets
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket#" in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "bucket IN" in scan or "bucket#" in scan
