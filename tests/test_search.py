"""BM25 retrieval (functions/search.py): scores against a hand-rolled
reference implementation, posting-list index shape, and the
broadcast-not-shuffle plan contract for the dimension-sized sides."""

from __future__ import annotations

import math

from node_etl_spark.functions.search import bm25_topk, inverted_index, tokens
from pyspark.sql import functions as F

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


def test_retrieval_metrics_hand_computed(spark):
    # 1 query, k=3: ranked docs with grades (2, 0, 1); one more
    # grade-2 doc exists but was not retrieved
    from node_etl_spark.functions.search import (
        _cum_weights, _dcg_weights, retrieval_metrics,
    )

    m = spark.createDataFrame(
        [("q", 10, 9.0, 2), ("q", 11, 8.0, 0), ("q", 12, 7.0, 1),
         ("q", 13, 1.0, 2)],  # rank 4: outside the k=3 cut
        "query_id string, doc_id bigint, bm25 double, grade int",
    )
    out = retrieval_metrics(m, k=3, rel_min=2).collect()
    assert len(out) == 1
    r = out[0]
    w = _dcg_weights(3)
    dcg = 3 * w[0] + 0 * w[1] + 1 * w[2]
    # ideal grades within k=3: (2, 2, 1) -> gains (3, 3, 1)
    idcg = 3 * w[0] + 3 * w[1] + 1 * w[2]
    assert abs(r.ndcg - round(dcg / idcg, 6)) < 1e-9
    assert r.mrr == 1.0          # first relevant at rank 1
    assert abs(r.precision - round(1 / 3, 6)) < 1e-9
    assert r.recall == 0.5       # 1 of 2 grade>=2 docs retrieved
    assert r.n_relevant == 2
    # prefix sums consistent with the weights they accumulate
    cw = _cum_weights(3)
    assert abs(cw[3] - sum(w)) < 1e-12


def test_retrieval_metrics_no_relevant_docs(spark):
    m = spark.createDataFrame(
        [("q", 1, 2.0, 1), ("q", 2, 1.0, 1)],
        "query_id string, doc_id bigint, bm25 double, grade int",
    )
    r = retrieval_metrics_one(spark, m)
    assert r.mrr == 0.0 and r.recall == 0.0 and r.n_relevant == 0
    assert r.ndcg > 0.0  # graded gains still rank the grade-1 docs


def retrieval_metrics_one(spark, m):
    from node_etl_spark.functions.search import retrieval_metrics

    rows = retrieval_metrics(m, k=3, rel_min=2).collect()
    assert len(rows) == 1
    return rows[0]


def test_bm25_multi_matches_single_query(spark, sf_dir):
    # bm25_multi's per-query scores must equal bm25_topk's for the
    # same term bag (one scan for N queries is an optimization, not a
    # semantic change)
    from node_etl_spark.functions.search import bm25_multi
    from node_etl_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    terms = ["hash", "stream", "vector"]
    single = {r.doc_id: r.bm25 for r in bm25_topk(docs, terms, k=5).collect()}
    multi = bm25_multi(docs, {"q0": terms, "q1": ["join"]})
    got = {
        r.doc_id: r.bm25
        for r in multi.filter("query_id = 'q0'")
        .orderBy(F.desc("bm25"), F.asc("doc_id")).limit(5).collect()
    }
    assert got == single


def test_hard_negatives_excludes_relevant_and_ranks(spark):
    from node_etl_spark.functions.search import hard_negatives

    docs = spark.createDataFrame(
        [
            (1, "join filter sort extras"),   # all 3 terms: relevant
            (2, "join filter something"),     # 2 terms: hard negative
            (3, "join alone here"),           # 1 term: negative
            (4, "nothing matching at all"),   # no terms: absent
        ],
        "doc_id bigint, text string",
    )
    out = hard_negatives(
        docs, {"q": ["join", "filter", "sort"]}, k=5, rel_min=3
    ).collect()
    ids = {r.doc_id for r in out}
    assert 1 not in ids          # relevant doc never a negative
    assert 4 not in ids          # non-matching doc never a candidate
    assert ids == {2, 3}
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].rank < by_id[3].rank  # more terms -> higher bm25
    assert by_id[2].grade == 2 and by_id[3].grade == 1


def test_percolate_conjunction_and_dead_rules(spark):
    from node_etl_spark.functions.search import percolate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta"),
            (3, "beta gamma alpha alpha"),  # duplicates count once
            (4, "delta"),
        ],
        "doc_id long, text string",
    )
    rules = [
        ("both", ["alpha", "gamma"]),
        ("single", ["delta"]),
        ("dupe_terms", ["alpha", "alpha"]),  # de-duplicated -> 1 term
        ("dead", ["omega"]),
    ]
    out = {r.query_id: r for r in percolate(docs, rules).collect()}
    assert out["both"].n_docs == 2          # docs 1 and 3
    assert out["single"].n_docs == 1        # doc 4
    assert out["dupe_terms"].n_terms == 1
    assert out["dupe_terms"].n_docs == 3    # docs 1,2,3
    assert out["dead"].n_docs == 0          # kept, not dropped


def test_percolate_registry_is_broadcast(spark):
    from node_etl_spark.functions.search import percolate

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    plan = (
        percolate(docs, [("r", ["a"])])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
