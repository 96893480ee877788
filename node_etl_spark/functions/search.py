"""Full-text corpus search: inverted index + BM25 ranked retrieval.

Net-new vs the reference (adn-tm/node-etl has no search surface at
all — the closest thing is a user-coded `Filter` predicate over rows,
jobs/convertors/job-filter.js:10-16). For an LLM training-data
pipeline this is the retrieval half of corpus curation: find the
documents most relevant to a probe query (contamination audits,
targeted inspection, boosted sampling).

Scale design (100 TB):

* The **posting-list build** is one explode + two-phase groupBy —
  identical cost class to the token-frequency rollup. Postings are
  written once and reused by every query.
* **Query scoring never scans the corpus.** Query terms filter the
  token stream *before* the first shuffle (predicate pushdown to the
  scan when postings are stored term-partitioned), so only matching
  postings move. Document-frequency and corpus stats are
  dimension-sized and broadcast.
* All floating-point reductions follow the catalog determinism rules:
  per-term BM25 contributions are computed in identical double
  expression shapes on both engines, then summed order-independently
  via round -> DECIMAL -> exact sum -> double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "tokens",
    "inverted_index",
    "bm25_topk",
    "bm25_oracle_sql",
    "write_inverted_index",
    "load_postings",
    "sql_string_list",
]


def sql_string_list(terms: list[str]) -> str:
    """Render a SQL IN-list of string literals with single quotes
    doubled, so a term containing ``'`` can't break or inject into the
    generated oracle SQL."""
    return ", ".join("'" + t.replace("'", "''") + "'" for t in terms)


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Explode whitespace-delimited text into (id, term) postings."""
    return (
        docs.select(id_col, F.explode(F.split(text_col, " ")).alias("term"))
        .filter("term <> ''")
    )


def inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting lists: one row per term with df and sorted (doc, tf)
    postings. At scale, write this partitioned/bucketed by term so a
    query's term lookup prunes to its buckets."""
    tf = (
        tokens(docs, id_col, text_col)
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list(F.struct(id_col, "tf"))).alias("postings"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 for a bag of query terms.

    One corpus scan: doc lengths and query-term tfs come from the same
    token stream; the term filter runs *before* the tf shuffle so only
    matching postings are exchanged. df/idf and corpus stats (N,
    avgdl) are tiny and broadcast into the probe side.
    """
    toks = tokens(docs, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("tot_dl"),
    )
    tf = (
        toks.filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "s",
            F.expr(
                "ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)"
                " + 1.0)"
                f" * (CAST(tf AS DOUBLE) * ({k1} + 1.0))"
                f" / (CAST(tf AS DOUBLE) + {k1} * (1.0 - {b} + {b}"
                " * CAST(dl AS DOUBLE) / (CAST(tot_dl AS DOUBLE) / n_docs)))"
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum(F.round("s", 12).cast("decimal(24,12)"))
            .cast("double")
            .alias("bm25"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    table: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB mirror of :func:`bm25_topk` — same expression shapes so
    every double agrees bit-for-bit."""
    in_list = sql_string_list(query_terms)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}),
    toks2 AS (SELECT * FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks2 GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS tot_dl FROM dl),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks2 WHERE term IN ({in_list}) GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(tf AS DOUBLE) * ({k1} + 1.0))
               / (CAST(tf AS DOUBLE) + {k1} * (1.0 - {b} + {b}
                  * CAST(dl AS DOUBLE)
                  / (CAST(tot_dl AS DOUBLE) / n_docs))) AS s
        FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term), stats)
    SELECT doc_id,
           CAST(SUM(CAST(round(s, 12) AS DECIMAL(24,12))) AS DOUBLE) AS bm25,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {k}
    """


def write_inverted_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the posting lists term-bucketed on disk: the
    one-time corpus-cost build behind repeated cheap probes.

    Postings are partitioned by ``bucket = pmod(xxhash64(term), n)``
    so a probe for any term set prunes to |terms| partitions at the
    file listing — the 100 TB probe reads kilobytes of postings, not
    the index. (xxhash64 is fine here: the bucket never leaves Spark,
    so no cross-engine portability constraint.)"""
    idx = inverted_index(docs, id_col, text_col).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
    )
    idx.write.partitionBy("bucket").mode("overwrite").parquet(path)


def load_postings(
    spark, path: str, query_terms: list[str], n_buckets: int = 64
) -> DataFrame:
    """Read only the query terms' posting lists: the bucket IN-list
    prunes partition directories, the term IN-list prunes rows."""
    buckets = sorted(
        {
            # mirror pmod(xxhash64(term), n) driver-side
            row.b
            for row in spark.createDataFrame(
                [(t,) for t in query_terms], "term string"
            )
            .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b"))
            .collect()
        }
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(query_terms))
    )
