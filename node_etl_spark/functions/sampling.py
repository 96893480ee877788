"""Deterministic sampling / dataset-split operators for training-data
pipelines.

A 100 TB corpus becomes train/val/test by *hashing*, never by
`rand()`: a hash split is reproducible across runs, stable under
re-partitioning, and adding documents never moves an existing document
between splits. All hashes here are md5 hex strings, which Spark and
DuckDB compute identically, so every operator is oracle-checkable.

The reference has no sampling surface at all (rows pass through its
convertors unsampled); this module is net-new scale machinery, a
sibling of dedup.py/similarity.py.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified
# annotations against the defining module's globals

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int = 42, buckets: int = BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from an id.

    md5 of ``"<id>:<seed>"``; the first 8 hex chars (32 uniform bits)
    are exact in a double, so the modulo is portable everywhere.
    Narrow expression — no shuffle, codegen-friendly.
    """
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets).cast("int")


def hash_bucket_sql(id_expr: str, seed: int = 42, buckets: int = BUCKETS) -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    return (
        f"CAST(CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR) || ':{seed}'), 1, 8)) "
        f"AS BIGINT) % {buckets} AS INTEGER)"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Assign every row to a named split by hash of its id.

    ``splits`` maps name -> weight (must sum to ~1.0); iteration order
    fixes the bucket ranges, so pass an ordered dict. Adds a
    ``split`` column; no shuffle, no sampling pass — the assignment is
    a pure row-local expression, which is the only design that holds
    at 100 TB (a global `sampleBy` would need a second pass and is
    not stable under appends).
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = hash_bucket(F.col(id_col), seed=seed)
    expr: Column | None = None
    hi = 0.0
    for name, w in splits.items():
        hi += w
        bound = int(round(hi * BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def hash_split_case_sql(id_expr: str, splits: dict[str, float], seed: int = 42) -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`."""
    b = hash_bucket_sql(id_expr, seed=seed)
    out = "CASE"
    hi = 0.0
    for name, w in splits.items():
        hi += w
        out += f" WHEN {b} < {int(round(hi * BUCKETS))} THEN '{name}'"
    return out + " END"


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample.

    Rank rows inside each stratum by hash(id) and keep the first n —
    a uniform sample whose membership is a pure function of
    (id, seed). One shuffle (the window partition); per-stratum state
    is a single counter, so skewed strata cost I/O, not memory. For
    approximate fractions at extreme scale prefer
    ``hash_bucket(id) < f * BUCKETS`` (shuffle-free); this operator is
    for exact-count needs (eval sets, per-language quotas).
    """
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
        id_col,
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def stratified_sample_sql(
    table: str,
    strata: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    part = ", ".join(strata)
    proj = "*" if cols == "*" else f"{cols}, sample_rank"
    return f"""
    SELECT {proj} FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {part}
            ORDER BY md5(CAST({id_col} AS VARCHAR) || ':{seed}'), {id_col}
        ) AS sample_rank
        FROM {table})
    WHERE sample_rank <= {n_per_stratum}
    """


def mix_sources(
    df: DataFrame,
    proportions: dict[str, float],
    budget_frac: float = 0.4,
    source_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    seed: int = 42,
) -> DataFrame:
    """Deterministic dataset mixing (the LLM data-recipe sampler):
    downsample each source so the kept corpus approaches
    ``budget_frac`` of the total size distributed by ``proportions``
    (source -> target share of the budget).

    Per-source keep rate = ``min(1, budget * share / source_size)``
    — sources over their share shed rows, sources under it keep
    everything (no upsampling; repetition policy belongs to the epoch
    loader). Selection is the portable hash-bucket threshold, so it
    is row-local, append-stable, and reproducible across engines —
    the same contract as :func:`hash_split`. The only pre-pass is a
    per-source size aggregate (a handful of rows, broadcast back);
    the corpus itself is touched once. Rows keep (id, source) plus a
    ``keep_rate`` column for auditability.

    Sources present in ``df`` but absent from ``proportions`` are
    excluded from the mix AND from the budget base (``total`` sums
    only mixable sources), so the kept volume tracks ``budget_frac``
    of the data the recipe actually covers — an unlisted source
    never silently inflates every other source's keep rate.
    """
    total_w = sum(proportions.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"proportions must sum to 1.0, got {total_w}")
    sizes = df.groupBy(source_col).agg(
        F.sum(size_col).cast("bigint").alias("sz")
    )
    # budget_frac * prop is folded to a literal HERE (and likewise in
    # the SQL mirror): leaving the constant inside the column
    # expression lets Catalyst's ReorderAssociativeOperator regroup
    # the multiply tree, shifting the result a ulp away from the
    # oracle's left-associated form
    props = df.sparkSession.createDataFrame(
        [(s, budget_frac * p) for s, p in proportions.items()],
        f"{source_col} string, share double",
    )
    mixable = sizes.join(props, source_col)
    total = mixable.agg(F.sum("sz").cast("bigint").alias("tot"))
    rates = (
        mixable
        .crossJoin(F.broadcast(total))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                F.col("share")
                * F.col("tot").cast("double")
                / F.col("sz").cast("double"),
            ).alias("keep_rate"),
        )
    )
    bucket = hash_bucket(F.col(id_col), seed=seed)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(bucket.cast("double") < F.col("keep_rate") * F.lit(float(BUCKETS)))
        .select(id_col, source_col, "keep_rate")
    )


def mix_sources_sql(
    proportions: dict[str, float],
    budget_frac: float = 0.4,
    table: str = "documents",
    source_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`mix_sources` (same md5 bucket, same
    double rate arithmetic from identical integers)."""
    vals = ", ".join(
        f"('{s}', CAST({budget_frac * p!r} AS DOUBLE))"
        for s, p in proportions.items()
    )
    bucket = hash_bucket_sql(f"d.{id_col}", seed=seed)
    return f"""
    WITH sizes AS (
        SELECT {source_col}, CAST(SUM({size_col}) AS BIGINT) AS sz
        FROM {table} GROUP BY 1),
    props({source_col}, share) AS (VALUES {vals}),
    mixable AS (
        SELECT s.{source_col}, s.sz, p.share
        FROM sizes s JOIN props p USING ({source_col})),
    tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS tot FROM mixable),
    rates AS (
        SELECT m.{source_col},
               least(1.0, m.share * CAST(t.tot AS DOUBLE)
                          / CAST(m.sz AS DOUBLE)) AS keep_rate
        FROM mixable m, tot t)
    SELECT d.{id_col}, d.{source_col}, r.keep_rate
    FROM {table} d JOIN rates r USING ({source_col})
    WHERE CAST({bucket} AS DOUBLE) < r.keep_rate * {float(BUCKETS)!r}
    """


def resample_sources(
    df: DataFrame,
    proportions: dict[str, float],
    budget_frac: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    seed: int = 42,
) -> DataFrame:
    """Deterministic up/down-resampling to a data recipe — the epoch
    materializer that :func:`mix_sources` deliberately is not: a
    source UNDER its target share gets REPEATED (multiple epochs of
    its rows), one OVER it gets thinned, so the emitted stream hits
    ``budget_frac`` x total size at the target mix.

    Per source, the repeat factor ``f = budget * share / size``; each
    row emits ``floor(f)`` copies plus one more when its portable
    hash bucket falls under ``frac(f)`` — in expectation exactly
    ``f`` copies, deterministically (same rows always get the extra
    copy; append-stable like every sampler here). ``f < 1``
    degenerates to hash-threshold downsampling. Output rows carry a
    1-based ``copy`` index so epoch loaders can spread repeats.
    Row-local after a dimension-sized rate broadcast; the corpus is
    scanned once, and the explode is bounded by ceil(f).
    """
    total_w = sum(proportions.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"proportions must sum to 1.0, got {total_w}")
    sizes = df.groupBy(source_col).agg(
        F.sum(size_col).cast("bigint").alias("sz")
    )
    props = df.sparkSession.createDataFrame(
        [(s, budget_frac * p) for s, p in proportions.items()],
        f"{source_col} string, share double",
    )
    mixable = sizes.join(props, source_col)
    total = mixable.agg(F.sum("sz").cast("bigint").alias("tot"))
    rates = (
        mixable.crossJoin(F.broadcast(total))
        .select(
            source_col,
            (
                F.col("share")
                * F.col("tot").cast("double")
                / F.col("sz").cast("double")
            ).alias("f"),
        )
        .select(
            source_col,
            F.floor("f").cast("bigint").alias("whole"),
            (F.col("f") - F.floor("f")).alias("frac"),
        )
    )
    bucket = hash_bucket(F.col(id_col), seed=seed)
    return (
        df.join(F.broadcast(rates), source_col)
        .withColumn(
            "n_copies",
            F.col("whole")
            + F.when(
                bucket.cast("double") < F.col("frac") * F.lit(float(BUCKETS)),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
        .filter(F.col("n_copies") >= 1)
        .select(
            id_col,
            source_col,
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))).alias(
                "copy"
            ),
        )
    )


def resample_sources_sql(
    proportions: dict[str, float],
    budget_frac: float = 1.0,
    table: str = "documents",
    source_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`resample_sources`."""
    vals = ", ".join(
        f"('{s}', CAST({budget_frac * p!r} AS DOUBLE))"
        for s, p in proportions.items()
    )
    bucket = hash_bucket_sql(f"d.{id_col}", seed=seed)
    return f"""
    WITH sizes AS (
        SELECT {source_col}, CAST(SUM({size_col}) AS BIGINT) AS sz
        FROM {table} GROUP BY 1),
    props({source_col}, share) AS (VALUES {vals}),
    mixable AS (
        SELECT s.{source_col}, s.sz, p.share
        FROM sizes s JOIN props p USING ({source_col})),
    tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS tot FROM mixable),
    rates AS (
        SELECT m.{source_col},
               CAST(floor(f) AS BIGINT) AS whole, f - floor(f) AS frac
        FROM (SELECT m.{source_col},
                     m.share * CAST(t.tot AS DOUBLE) / CAST(m.sz AS DOUBLE) AS f
              FROM mixable m, tot t) m),
    expanded AS (
        SELECT d.{id_col}, d.{source_col},
               r.whole + CASE WHEN CAST({bucket} AS DOUBLE)
                                   < r.frac * {float(BUCKETS)!r}
                          THEN 1 ELSE 0 END AS n_copies
        FROM {table} d JOIN rates r USING ({source_col}))
    SELECT {id_col}, {source_col}, CAST(c AS BIGINT) AS copy
    FROM expanded, unnest(range(1, n_copies + 1)) AS u(c)
    WHERE n_copies >= 1
    """


def negative_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    seed: int = 13,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor row, ``k`` pseudo-uniform OTHER rows, reproducible
    across runs and engines (no ``rand()``).

    Anchors and candidates share one dense index
    (:func:`...util.global_row_index` over the id — range partition +
    offset pass, no single-partition window). Negative ``j`` of an
    anchor is ``r = H(id, j) mod (N - 1)`` bumped by one when
    ``r >= idx(anchor)`` — the classic shift that guarantees
    ``neg != anchor`` while staying uniform over the remaining
    ``N - 1`` rows. Resolution back to ids is an equi-join on the
    index: O(N x k) rows, shuffled on a dense integer key (no skew
    by construction). H is the portable 60-bit md5 hash, so the
    DuckDB oracle reproduces every pick exactly.

    Sampling is WITH replacement across ranks: the k draws hash
    independently, so an anchor can (rarely, ~C(k,2)/(N-1)) receive
    the same negative at two ranks — the standard negative-sampling
    trade; dedup downstream if your loss requires distinct negatives.
    """
    from ..util import global_row_index
    from .sketch import _h60

    idxed = global_row_index(
        df.select(F.col(id_col).alias("anchor_id")), ["anchor_id"]
    )
    n = idxed.count()
    if n < 2:
        raise ValueError("negative sampling needs at least 2 rows")
    probes = idxed.select(
        "anchor_id",
        "idx",
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
    )
    r = (
        _h60(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit(":"),
                F.col("j").cast("string"),
            ),
            seed,
        )
        % F.lit(n - 1)
    )
    probes = probes.withColumn(
        "neg_idx",
        r + F.when(r >= F.col("idx"), F.lit(1)).otherwise(F.lit(0)),
    )
    cands = idxed.select(
        F.col("idx").alias("neg_idx"), F.col("anchor_id").alias("neg_id")
    )
    return probes.join(cands, "neg_idx").select(
        "anchor_id", F.col("j").cast("int").alias("neg_rank"), "neg_id"
    )


def negative_samples_sql(
    table: str, id_col: str, k: int = 4, seed: int = 13
) -> str:
    """DuckDB mirror of :func:`negative_samples`."""
    h = (
        f"CAST(('0x' || substring(md5(CAST(anchor_id AS VARCHAR) || ':' ||"
        f" CAST(j AS VARCHAR) || ':{seed}'), 1, 15)) AS BIGINT)"
    )
    return f"""
    WITH idxed AS (
        SELECT {id_col} AS anchor_id,
               row_number() OVER (ORDER BY {id_col}) - 1 AS idx
        FROM {table}),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idxed),
    probes AS (
        SELECT anchor_id, idx, CAST(u.j AS BIGINT) AS j,
               {h} % (n.n - 1) AS r
        FROM idxed, n, unnest(range(1, {k + 1})) AS u(j)),
    resolved AS (
        SELECT p.anchor_id, p.j,
               p.r + CASE WHEN p.r >= p.idx THEN 1 ELSE 0 END AS neg_idx
        FROM probes p)
    SELECT r.anchor_id, CAST(r.j AS INTEGER) AS neg_rank,
           c.anchor_id AS neg_id
    FROM resolved r JOIN idxed c ON c.idx = r.neg_idx
    """


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    seed: int = 42,
) -> DataFrame:
    """Temperature-based source sampling (the multilingual /
    multi-source rebalancing rule of XLM-R, mT5, and the Pile-style
    recipes): target share of source i is
    ``p_i = n_i^alpha / SUM n_j^alpha`` — alpha = 1 keeps natural
    proportions, alpha -> 0 approaches uniform, in between it lifts
    small sources without letting the head dominate. Unlike
    :func:`mix_sources` (explicit per-source shares) the recipe here
    is one scalar.

    Same scale shape as mix_sources: a per-source size aggregate
    (dimension-sized, broadcast back) and a row-local portable
    hash-bucket keep test — the corpus is touched once, append-stably.
    Cross-engine exactness: the only non-rational step, ``n^alpha``,
    is quantized to DECIMAL(38,12) before the (exact) weight sum, and
    keep rates are rounded to 9 digits before the bucket compare, so
    sub-ulp libm pow differences cannot flip a row. Returns
    (id, source, keep_rate).
    """
    sizes = df.groupBy(source_col).agg(
        F.sum(size_col).cast("bigint").alias("sz")
    )
    w = sizes.select(
        source_col,
        "sz",
        F.expr(f"CAST(pow(CAST(sz AS DOUBLE), {alpha!r}) AS DECIMAL(38,12))")
        .alias("w"),
    )
    tot = w.agg(
        F.sum("sz").cast("bigint").alias("tot"),
        F.sum("w").alias("wsum"),
    )
    rates = w.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * (
                    F.col("w").cast("double")
                    / F.col("wsum").cast("double")
                )
                * F.col("tot").cast("double")
                / F.col("sz").cast("double"),
            ),
            9,
        ).alias("keep_rate"),
    )
    bucket = hash_bucket(F.col(id_col), seed=seed)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(
            bucket.cast("double") < F.col("keep_rate") * F.lit(float(BUCKETS))
        )
        .select(id_col, source_col, "keep_rate")
    )


def temperature_mix_sql(
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    table: str = "documents",
    source_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`temperature_mix`."""
    bucket = hash_bucket_sql(f"d.{id_col}", seed=seed)
    return f"""
    WITH sizes AS (
        SELECT {source_col}, CAST(SUM({size_col}) AS BIGINT) AS sz
        FROM {table} GROUP BY 1),
    w AS (
        SELECT {source_col}, sz,
               CAST(pow(CAST(sz AS DOUBLE), {alpha!r}) AS DECIMAL(38,12)) AS w
        FROM sizes),
    tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS tot, SUM(w) AS wsum FROM w),
    rates AS (
        SELECT w.{source_col},
               round(least(1.0,
                   {budget_frac!r} * (CAST(w.w AS DOUBLE) / CAST(t.wsum AS DOUBLE))
                   * CAST(t.tot AS DOUBLE) / CAST(w.sz AS DOUBLE)), 9)
                   AS keep_rate
        FROM w, tot t)
    SELECT d.{id_col}, d.{source_col}, r.keep_rate
    FROM {table} d JOIN rates r USING ({source_col})
    WHERE CAST({bucket} AS DOUBLE) < r.keep_rate * {float(BUCKETS)!r}
    """


def dsir_select(
    df: DataFrame,
    target_pred: str,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    NeurIPS 2023): score every document by how much more likely its
    tokens are under a unigram model of the TARGET distribution
    (rows satisfying ``target_pred``) than under the raw-corpus
    model, and select the top ``k``. The paper hashes n-grams into
    10k buckets; unigrams over the shared corpus vocabulary keep the
    estimator exact here — swap the token stream for hashed n-grams
    at production vocab sizes.

    ``log_ratio(d) = (1/|d|) * sum_w tf_w(d)
                     * ln(p_t(w) / p_r(w))``,
    with add-one smoothing over the raw-corpus vocabulary for both
    models (shared support, so unseen-in-target words contribute a
    finite negative ratio rather than -inf).

    Returns (doc_id, n_tokens, log_ratio, selected) for every doc
    with >=1 token; ``selected`` marks the top-k by (log_ratio desc,
    doc_id) — per-token normalization keeps long documents from
    dominating, the length-bias fix the paper applies.

    Scale shape: one shuffle to per-doc token tf (the exact-dedup
    shape); both unigram models are re-aggregations of that frame;
    scoring joins run on vocabulary keys; the top-k is one global
    sort of doc-level rows. Exactness: integer counts, identical
    IEEE trees, DECIMAL(28,12) terms, round(6) finish — ranks then
    agree engine-to-engine because the rounded scores do.
    """
    from ..util import spread
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _toks(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [[w for w in (t or "").split(" ") if w] for t in texts]
        )

    base = spread(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(target_pred).alias("is_t"),
            text_col,
        )
    ).select(
        "doc_id", "is_t", F.explode(_toks(F.col(text_col))).alias("w")
    )
    tf = base.groupBy("doc_id", "is_t", "w").agg(
        F.count(F.lit(1)).alias("tf")
    )
    tf = tf.persist()
    raw = tf.groupBy("w").agg(F.sum("tf").alias("cr"))
    tgt = (
        tf.filter("is_t")
        .groupBy("w")
        .agg(F.sum("tf").alias("ct"))
    )
    totals = tf.agg(
        F.sum("tf").alias("nr"),
        F.sum(F.when(F.col("is_t"), F.col("tf")).otherwise(F.lit(0))).alias("nt"),
        F.countDistinct("w").alias("v"),
    )
    pt = (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("nt") + F.col("v")
    ).cast("double")
    pr = (F.col("cr") + F.lit(1)).cast("double") / (
        F.col("nr") + F.col("v")
    ).cast("double")
    term = (
        tf.join(raw, "w")
        .join(tgt, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "tf",
            (F.col("tf") * F.log(pt / pr))
            .cast("decimal(28,12)")
            .alias("t"),
        )
    )
    scored = (
        term.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum("t").cast("double").alias("__tsum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("__tsum") / F.col("n_tokens").cast("double"), 6
            ).alias("log_ratio"),
        )
    )
    w = Window.orderBy(F.col("log_ratio").desc(), F.col("doc_id"))
    return scored.withColumn(
        "selected", (F.row_number().over(w) <= k).cast("boolean")
    )


def dsir_oracle_sql(
    target_pred: str,
    k: int = 100,
    table: str = "documents",
    text: str = "text",
    id_: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`dsir_select` (same smoothing, same
    expression tree, same quantization and tiebreak)."""
    return f"""
    WITH base AS (
        SELECT doc_id, is_t,
               unnest(list_filter(string_split(txt, ' '),
                                  x -> x <> '')) AS w
        FROM (SELECT {id_} AS doc_id, ({target_pred}) AS is_t,
                     {text} AS txt
              FROM {table})),
    tf AS (
        SELECT doc_id, is_t, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM base GROUP BY 1, 2, 3),
    raw AS (SELECT w, CAST(SUM(tf) AS BIGINT) AS cr FROM tf GROUP BY 1),
    tgt AS (SELECT w, CAST(SUM(tf) AS BIGINT) AS ct
            FROM tf WHERE is_t GROUP BY 1),
    totals AS (
        SELECT CAST(SUM(tf) AS BIGINT) AS nr,
               CAST(SUM(CASE WHEN is_t THEN tf ELSE 0 END) AS BIGINT)
                   AS nt,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS v
        FROM tf),
    term AS (
        SELECT tf.doc_id, tf.tf,
               CAST(tf.tf * ln(
                   (CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
                    / CAST(totals.nt + totals.v AS DOUBLE))
                   / (CAST(raw.cr + 1 AS DOUBLE)
                      / CAST(totals.nr + totals.v AS DOUBLE))
               ) AS DECIMAL(28,12)) AS t
        FROM tf JOIN raw USING (w) LEFT JOIN tgt USING (w), totals),
    scored AS (
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               round(CAST(SUM(t) AS DOUBLE)
                     / CAST(SUM(tf) AS DOUBLE), 6) AS log_ratio
        FROM term GROUP BY doc_id)
    SELECT doc_id, n_tokens, log_ratio,
           (row_number() OVER (ORDER BY log_ratio DESC, doc_id)
            <= {k}) AS selected
    FROM scored
    """


def quantile_calibrate(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
    group_rank_threshold: int = 2_000_000,
) -> DataFrame:
    """Quantile normalization of per-group scores onto the global
    score distribution (the microarray-normalization construct,
    applied to corpus curation: per-source quality scorers drift —
    a 0.8 from one scorer is not a 0.8 from another — so mixing on
    raw scores over/under-samples whole sources; calibrating each
    row to the GLOBAL score at its within-source quantile makes
    cross-source thresholds comparable).

    Math (exact integers end-to-end): within-group midrank
    percentile p = (2r-1)/(2n_s) maps to global rank
    g = ceil((2r-1)·N / (2n_s)) — computed in BIGINT floor-division
    form ((2r-1)·N + 2n_s - 1) div (2n_s), never a double — and the
    calibrated value is the g-th smallest global (score, id) pair.

    Scale shape: sources are LOW-cardinality, so a plain
    row_number() window would funnel each source's full corpus slice
    through one task's sort — at 100 TB a multi-TB single-task sort
    (the round-7 q254 hazard class). The within-group rank is
    therefore ADAPTIVE on the collected per-group counts (an
    AQE-style driver decision off a tiny #groups-row collect):
    groups all under ``group_rank_threshold`` rows use the window
    (cheapest locally, bounded sort), any bigger group switches the
    whole rank to util.grouped_row_index (range-partition two-pass —
    a big source spans many partitions). Both paths produce
    BIT-IDENTICAL ranks (the (score, id) order is total), so the
    choice is purely physical. The global rank is always
    util.global_row_index; the final lookup is one shuffle join on
    an integer rank. NULL scores are excluded (documented in
    global_row_index: Spark and DuckDB disagree on NULL rank order).

    Ties: (score_col, id_col) is the total order on both the group
    and global sides — id must be unique. Returns (id_col, group_col,
    score_col, calibrated).
    """
    from ..util import global_row_index, grouped_row_index

    base = df.filter(F.col(score_col).isNotNull()).select(
        id_col, group_col, score_col
    )
    sizes = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__ns")
    )
    # adaptive within-group rank (round-8 window sweep): decide off
    # UNFILTERED per-group counts — an upper bound on the filtered
    # sizes (conservative: can only switch to the distributed path
    # early), chosen because it scans ONLY the group column (the
    # score/not-null projection would drag the wide score source —
    # e.g. document text — into the decision job). #groups rows,
    # tiny by the low-cardinality contract.
    max_group = max(
        (
            r["__n"]
            for r in df.groupBy(F.col(group_col))
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        ),
        default=0,
    )
    if max_group > int(group_rank_threshold):
        ranked = grouped_row_index(
            base, [group_col], [score_col, id_col], "__r0"
        ).select(
            id_col,
            group_col,
            score_col,
            (F.col("__r0") + 1).cast("bigint").alias("__r"),
        )
    else:
        w = Window.partitionBy(group_col).orderBy(score_col, id_col)
        ranked = base.select(
            id_col,
            group_col,
            score_col,
            F.row_number().over(w).cast("bigint").alias("__r"),
        )
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    g = global_row_index(
        base.select(score_col, id_col), [score_col, id_col], "__gidx"
    ).select(
        (F.col("__gidx") + 1).alias("__grank"),
        F.col(score_col).alias("calibrated"),
    )
    return (
        ranked.join(F.broadcast(sizes), group_col)
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            group_col,
            score_col,
            F.expr(
                "((2 * __r - 1) * __n + 2 * __ns - 1) div (2 * __ns)"
            ).alias("__g"),
        )
        .join(g, F.col("__g") == F.col("__grank"))
        .select(id_col, group_col, score_col, "calibrated")
    )


def quantile_calibrate_sql(
    rows_sql: str,
    score: str = "score",
    group: str = "grp",
    id_: str = "id",
) -> str:
    """DuckDB mirror of :func:`quantile_calibrate`; ``rows_sql`` must
    yield (id_, group, score) with score NOT NULL filtered."""
    return f"""
    WITH qc_b AS ({rows_sql}),
    qc_r AS (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY {group} ORDER BY {score}, {id_})
               AS BIGINT) AS r
        FROM qc_b),
    qc_n AS (SELECT {group}, CAST(COUNT(*) AS BIGINT) AS ns
             FROM qc_b GROUP BY 1),
    qc_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM qc_b),
    qc_g AS (
        SELECT CAST(row_number() OVER (ORDER BY {score}, {id_})
               AS BIGINT) AS grank,
               {score} AS calibrated
        FROM qc_b)
    SELECT r.{id_}, r.{group}, r.{score},
           g.calibrated
    FROM qc_r r
    JOIN qc_n USING ({group}), qc_t t
    JOIN qc_g g
      ON g.grank = ((2 * r.r - 1) * t.n + 2 * qc_n.ns - 1)
                   // (2 * qc_n.ns)"""


def temporal_split(
    df: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
    test_frac_pct: int = 20,
) -> DataFrame:
    """Leakage-safe TEMPORAL train/test split: per entity, the most
    recent ``test_frac_pct`` percent of events (by event time) become
    test, the rest train — the split every forecasting / next-action
    / recommendation dataset needs. A hash split (q55) leaks future
    behavior into training for sequence models; splitting on each
    entity's own timeline does not, and per-entity (rather than one
    global cutoff) keeps sparse and dense entities both represented
    in test.

    Exact integer rule: event rank r (1-based, by ts then a unique
    tiebreak) out of n per entity is test iff r * 100 > n * (100 -
    test_frac_pct) — pure BIGINT, no percent float. One
    entity-partitioned window (parallel across entities, the q220
    domain-cap shape). Ties on ts break by the row's own id columns —
    callers must include a unique tiebreak in ``ts_col`` order via
    the DataFrame sort keys; here the event id column is appended
    automatically when present.

    Returns the input plus (split string 'train'|'test').
    """
    order = [F.col(ts_col)]
    if "event_id" in df.columns:
        order.append(F.col("event_id"))
    w = Window.partitionBy(entity_col).orderBy(*order)
    wn = Window.partitionBy(entity_col)
    return (
        df.withColumn("__r", F.row_number().over(w).cast("bigint"))
        .withColumn("__n", F.count(F.lit(1)).over(wn).cast("bigint"))
        .withColumn(
            "split",
            F.when(
                F.col("__r") * 100 > F.col("__n") * (100 - test_frac_pct),
                F.lit("test"),
            ).otherwise(F.lit("train")),
        )
        .drop("__r", "__n")
    )


def temporal_split_sql(
    table: str = "events",
    ts: str = "ts",
    entity: str = "user_id",
    test_frac_pct: int = 20,
    tiebreak: str = "event_id",
) -> str:
    """DuckDB mirror of :func:`temporal_split` (select-list form:
    yields entity, tiebreak, split)."""
    return f"""
    SELECT {entity}, {tiebreak},
           CASE WHEN CAST(row_number() OVER (PARTITION BY {entity}
                          ORDER BY {ts}, {tiebreak}) AS BIGINT) * 100
                     > CAST(COUNT(*) OVER (PARTITION BY {entity})
                            AS BIGINT) * {100 - test_frac_pct}
                THEN 'test' ELSE 'train' END AS split
    FROM {table}"""


def skipgram_pairs(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    window: int = 2,
    id_col: str = "event_id",
) -> DataFrame:
    """Skip-gram (center, context) pair extraction from per-entity
    event sequences — the training-data prep for item/prod2vec-style
    sequence embeddings (Mikolov 2013 applied to behavior logs,
    Grbovic KDD'15): each event pairs with its ``window`` predecessors
    in the entity's timeline, emitting both directions with the
    signed offset.

    Scale shape: ``window`` LAG columns over ONE entity-partitioned
    time-ordered window, then a row-local explode — never a
    collect_list (whose per-entity array would blow up on power
    users) and never a self-join (whose range condition would
    re-shuffle the sequence). Cost is exactly window×n rows out of
    one sort-shuffle — the minimal possible.

    Returns (entity, center, context, rel_pos) with rel_pos in
    ±1..window; pairs are integer/string ops only — gate-exact.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    lags = [
        F.lag(item_col, i).over(w).alias(f"__l{i}")
        for i in range(1, window + 1)
    ]
    pairs = F.array(
        *[
            F.struct(
                F.col(item_col).alias("center"),
                F.col(f"__l{i}").alias("context"),
                F.lit(-i).alias("rel_pos"),
            )
            for i in range(1, window + 1)
        ],
        *[
            F.struct(
                F.col(f"__l{i}").alias("center"),
                F.col(item_col).alias("context"),
                F.lit(i).alias("rel_pos"),
            )
            for i in range(1, window + 1)
        ],
    )
    return (
        df.select(F.col(entity_col).alias("entity"), item_col, *lags)
        .select("entity", F.explode(pairs).alias("p"))
        .select("entity", "p.center", "p.context", "p.rel_pos")
        .filter(F.col("center").isNotNull() & F.col("context").isNotNull())
    )


def skipgram_pairs_sql(
    table: str = "events",
    entity: str = "user_id",
    ts: str = "ts",
    item: str = "event_type",
    window: int = 2,
    id_: str = "event_id",
) -> str:
    """DuckDB mirror of :func:`skipgram_pairs`."""
    lag_cols = ", ".join(
        f"lag({item}, {i}) OVER (PARTITION BY {entity}"
        f" ORDER BY {ts}, {id_}) AS l{i}"
        for i in range(1, window + 1)
    )
    arms = []
    for i in range(1, window + 1):
        arms.append(f"SELECT entity, {item} AS center, l{i} AS context,"
                    f" CAST({-i} AS INTEGER) AS rel_pos FROM lagged")
        arms.append(f"SELECT entity, l{i} AS center, {item} AS context,"
                    f" CAST({i} AS INTEGER) AS rel_pos FROM lagged")
    union = "\n        UNION ALL ".join(arms)
    return f"""
    WITH lagged AS (
        SELECT {entity} AS entity, {item}, {lag_cols}
        FROM {table})
    SELECT entity, center, context, rel_pos FROM (
        {union})
    WHERE center IS NOT NULL AND context IS NOT NULL"""


# --------------------------------------------------------------------
# Rendezvous (highest-random-weight) sharding
# --------------------------------------------------------------------

def rendezvous_shard(
    key_col: Column, n_shards: int, seed: int = 17
) -> Column:
    """Stable shard assignment by rendezvous / HRW hashing (Thaler &
    Ravishankar 1998): shard = argmax over s of
    ``h(key, s)``, with h the portable md5-derived 60-bit hash.

    Why not ``hash % n``: modulo resharding moves ~(1 - 1/n') of ALL
    keys when the shard count changes; HRW moves exactly the keys
    whose new shard wins — an expected ``1/(n+1)`` fraction, and every
    moved key lands ON the added shard (no shuffling between
    survivors). That is the property a 100 TB ingest needs to grow
    its shard/bucket count without rewriting the corpus. The argmax
    is a single narrow projection (transform + array_max over
    (hash, shard) structs) — zero shuffle, zero state.

    Known sentinel collision (accepted trade-off): a REAL key equal
    to the string "\\x00null" hashes like a NULL key and therefore
    always co-shards with NULL rows. NUL bytes are vanishingly rare
    in shard keys and the worst case is one extra key on NULL's
    shard; a type-tagged encoding (separate literal branch for NULL)
    would remove the collision at the cost of a bulkier expression
    mirrored in every oracle.
    """
    cands = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_shards) - 1)),
        lambda s: F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            # NULL sentinel: concat_ws skips NULLs but
                            # SQL || NULL-propagates — coalesce on both
                            # sides so NULL keys shard identically
                            F.coalesce(
                                key_col.cast("string"),
                                F.lit("\x00null"),
                            ),
                            s.cast("string"),
                            F.lit(str(seed)),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
            s.alias("s"),
        ),
    )
    return F.array_max(cands)["s"].cast("int")


def rendezvous_shard_sql(
    key_expr: str, n_shards: int, seed: int = 17
) -> str:
    """DuckDB scalar mirror of :func:`rendezvous_shard` (arg_max over
    an unnested candidate list is expressed as list_transform +
    list_max over (h, s) structs, matching Spark's struct-max)."""
    return (
        "CAST(list_max(list_transform(range(0, "
        f"{int(n_shards)}), s -> {{'h': CAST(('0x' || "
        f"substring(md5(COALESCE(CAST({key_expr} AS VARCHAR), "
        "chr(0) || 'null') || ':' || "
        f"CAST(s AS VARCHAR) || ':{seed}'), 1, 15)) AS BIGINT), "
        "'s': s})).s AS INT)"
    )


# --------------------------------------------------------------------
# Largest-remainder (Hamilton) quota sampling
# --------------------------------------------------------------------

def quota_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    budget: int,
    seed: int = 23,
    gate_factor: float = 2.0,
    gate_slack: float = 64.0,
    gate_threshold: int = 0,
) -> DataFrame:
    """Exact-budget stratified sampling by largest-remainder
    (Hamilton) apportionment: every stratum gets
    ``floor(budget * n_g / N)`` slots, and the leftover slots go to
    the strata with the largest remainders (ties broken by stratum
    key) — so the sample size is EXACTLY ``budget`` whenever
    ``N >= budget``, unlike per-stratum rounding (q56's fractions)
    which drifts by up to one row per stratum. Within a stratum the
    winners are the ``alloc_g`` rows with the smallest md5 hash —
    deterministic, reproducible, stable under repartitioning.

    All apportionment arithmetic is integer (``(budget * n_g) DIV N``
    and its modulo) — no float quotas, so the whole allocation sits
    on the exact cross-engine gate.

    Scale shape: one count aggregate (map-side partials), the
    apportionment on the dimension-sized strata frame, a broadcast
    join of allocations back onto the stream, and one
    rank-within-stratum window ordered by hash — with the window's
    input PRE-GATED (round 8) by a row-local predicate on columns the
    plan already carries (no extra pass): a row passes when its
    top-60-bit hash fraction u is under
    ``(gate_factor*alloc_g + gate_slack)/n_g`` — an expected
    2*alloc_g + 64 rows per stratum — so even a stratum holding most
    of a 100 TB corpus feeds the sort a budget-sized sliver instead
    of its whole slice. Small strata neutralize automatically (the
    threshold fraction exceeds 1, keeping every row), so the gate is
    ON by default and measured FASTER already at the sf10 test scale;
    ``gate_threshold`` (per-stratum n_g floor for gating) remains as
    an escape hatch to force the plain ungated window.

    The gate keeps the sample EXACT: u-order is the prefix of the
    h-order (h lexicographic == 128-bit numeric; u is its top 60
    bits), so whenever the gate keeps >= alloc_g rows it provably
    contains all alloc_g winners. The kept count rides the same
    window stage (count over the rank's partition — no extra
    exchange) and an underflow raises a LOUD error instead of
    returning a short sample; with slack 64 the underflow draw has
    probability ~e^-(2*alloc+64) <= 2e-28 per stratum — the same
    beyond-cosmic class as the md5-no-collision assumption the
    deterministic hash idiom already rests on, and the one
    theoretical gap (a gated stratum where ZERO rows pass cannot
    raise) is bounded by the same number.

    Returns the sampled rows: (*strata_cols, id).
    """
    g = [F.col(c) for c in strata_cols]
    counts = df.groupBy(*g).agg(F.count(F.lit(1)).cast("bigint").alias("n_g"))
    tot = counts.agg(F.sum("n_g").cast("bigint").alias("n_tot"))
    alloc = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            *[F.col(c) for c in strata_cols],
            "n_g",
            F.expr(f"CAST({budget} * n_g AS BIGINT) DIV n_tot").alias(
                "fl"
            ),
            F.expr(f"CAST({budget} * n_g AS BIGINT) % n_tot").alias("rem"),
        )
    )
    leftover = F.lit(budget).cast("bigint") - F.sum("fl").over(
        Window.partitionBy()
    )
    wr = Window.partitionBy().orderBy(
        F.col("rem").desc(), *[F.col(c).asc() for c in strata_cols]
    )
    alloc = alloc.select(
        *[F.col(c) for c in strata_cols],
        "n_g",
        (
            F.col("fl")
            + F.when(F.row_number().over(wr) <= leftover, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    )
    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ).alias("h")
    rows = df.select(*g, F.col(id_col), h).join(
        F.broadcast(alloc), strata_cols
    )
    # exact-preserving hash gate (see docstring), decided PER STRATUM
    # inside the plan — small strata keep every row (identical to the
    # ungated shape), hot strata keep only the bottom-of-hash sliver
    u = F.conv(F.substring("h", 1, 15), 16, 10).cast("double") / F.lit(
        float(1 << 60)
    )
    active = F.col("n_g") > F.lit(int(gate_threshold))
    gate = (~active) | (
        u * F.col("n_g").cast("double")
        < F.lit(float(gate_factor)) * F.col("alloc").cast("double")
        + F.lit(float(gate_slack))
    )
    ws = Window.partitionBy(*g).orderBy("h")
    # same partition+order spec as the rank, full frame: both window
    # functions share ONE WindowExec (no second pass, no exchange)
    wn = ws.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        rows.filter(gate)
        .withColumn("rn", F.row_number().over(ws))
        .withColumn("__kn", F.count(F.lit(1)).over(wn))
    )
    # underflow guard rides the rank filter itself (same window
    # stage, zero extra passes; a guard column would risk pruning)
    keep = F.when(
        active & (F.col("__kn") < F.col("alloc")),
        F.raise_error(
            F.lit(
                "quota_sample gate underflow (beyond-cosmic draw or"
                " corrupted hash): rerun with a larger gate_slack"
            )
        ).isNotNull(),
    ).otherwise(F.col("rn") <= F.col("alloc"))
    return ranked.filter(keep).select(*strata_cols, id_col)


def quota_sample_sql(
    table_sql: str,
    strata_cols: list[str],
    id_col: str,
    budget: int,
    seed: int = 23,
) -> str:
    """DuckDB mirror of :func:`quota_sample`."""
    keys = ", ".join(strata_cols)
    order = ", ".join(f"{c} ASC" for c in strata_cols)
    return f"""
    WITH qs_src AS (SELECT * FROM {table_sql}),
    qs_n AS (
        SELECT {keys}, CAST(COUNT(*) AS BIGINT) AS n_g
        FROM qs_src GROUP BY {keys}),
    qs_t AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot FROM qs_n),
    qs_a0 AS (
        SELECT {keys}, n_g,
               CAST({budget} * n_g AS BIGINT) // n_tot AS fl,
               CAST({budget} * n_g AS BIGINT) % n_tot AS rem
        FROM qs_n CROSS JOIN qs_t),
    qs_a AS (
        SELECT {keys},
               CAST(fl + CASE WHEN row_number() OVER (
                        ORDER BY rem DESC, {order})
                    <= {budget} - (SELECT SUM(fl) FROM qs_a0)
                    THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM qs_a0),
    qs_h AS (
        SELECT s.*, md5(CAST({id_col} AS VARCHAR) || ':{seed}') AS hx
        FROM qs_src s),
    qs_r AS (
        SELECT qh.*, a.alloc,
               row_number() OVER (PARTITION BY {", ".join("qh." + c for c in strata_cols)}
                                  ORDER BY hx) AS rn
        FROM qs_h qh JOIN qs_a a USING ({keys}))
    SELECT {keys}, {id_col} FROM qs_r WHERE rn <= alloc"""


# --------------------------------------------------------------------
# Water-filling token-budget allocation across domains
# --------------------------------------------------------------------

def waterfill_budget(
    df: DataFrame,
    group_col: str = "source",
    size_col: str = "n_chars",
    budget_frac: float = 0.5,
) -> DataFrame:
    """Max-min fair (water-filling) allocation of a token budget
    across domains (the classic progressive-filling solution to
    max-min fairness — Bertsekas & Gallager 1992 §6.5.2; the same
    shape data teams use to cap dominant web domains while leaving
    small domains whole, cf. Dolma / FineWeb domain budgets).

    Each domain holds ``cap_i`` tokens (sum of ``size_col``); the
    global budget is ``budget_frac`` of the corpus total. Water
    level L solves ``sum_i min(cap_i, L) = B``: every domain keeps
    ``min(cap_i, L)`` — small domains survive intact, the level
    uniformly truncates the giants, and no domain that was cut
    would trade with a smaller one (max-min fairness).

    Closed form, no iteration: sort domains by cap ascending; with
    prefix sum ``P_i`` over smaller caps and ``r_i`` domains
    remaining (self included), the level lies in domain i's segment
    iff ``P_{i-1} + cap_i * r_i >= B`` and the previous segment
    exhausted (< B at i-1); then ``L = (B - P_{i-1}) / r_i``. One
    dimension-sized window over the DOMAIN aggregate (domains are
    few; the corpus-scale work is the one groupBy), integer until
    the final division. Returns (grp, cap, level, alloc,
    kept_frac) — level repeated for the audit trail.
    """
    caps = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(F.col(size_col).cast("bigint")).alias("cap")
    )
    w = Window.orderBy("cap", "grp")
    seg = caps.select(
        "grp",
        "cap",
        (F.sum("cap").over(w) - F.col("cap")).alias("p_prev"),
        (F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ) - F.row_number().over(w) + 1).alias("rem"),
        F.sum("cap").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    b = (F.col("total").cast("double") * F.lit(float(budget_frac)))
    # the first (cap asc) segment able to absorb the rest of the
    # budget holds the level; everything before it is kept whole
    lvl_seg = seg.filter(
        (F.col("p_prev").cast("double") + F.col("cap").cast("double") * F.col("rem") >= b)
    ).select(
        F.min(F.struct("cap", "grp", "p_prev", "rem", "total")).alias("s")
    ).select(
        F.round(
            (F.col("s.total").cast("double") * F.lit(float(budget_frac))
             - F.col("s.p_prev").cast("double"))
            / F.col("s.rem").cast("double"),
            6,
        ).alias("level")
    )
    return (
        seg.crossJoin(F.broadcast(lvl_seg))
        .select(
            "grp",
            "cap",
            "level",
            F.round(F.least(F.col("cap").cast("double"), F.col("level")), 6)
            .alias("alloc"),
        )
        .select(
            "grp",
            "cap",
            "level",
            "alloc",
            F.round(F.col("alloc") / F.col("cap").cast("double"), 6)
            .alias("kept_frac"),
        )
    )


def waterfill_oracle_sql(
    rows_sql: str,
    group: str = "source",
    size: str = "n_chars",
    budget_frac: float = 0.5,
) -> str:
    """DuckDB mirror of :func:`waterfill_budget`."""
    return f"""
    WITH wf_caps AS (
        SELECT {group} AS grp, CAST(SUM({size}) AS BIGINT) AS cap
        FROM ({rows_sql}) GROUP BY 1),
    wf_seg AS (
        SELECT grp, cap,
               SUM(cap) OVER (ORDER BY cap, grp) - cap AS p_prev,
               COUNT(*) OVER () - row_number() OVER (ORDER BY cap, grp)
                   + 1 AS rem,
               SUM(cap) OVER () AS total
        FROM wf_caps),
    wf_lvl AS (
        SELECT round((CAST(total AS DOUBLE) * {float(budget_frac)!r}
                      - CAST(p_prev AS DOUBLE))
                     / CAST(rem AS DOUBLE), 6) AS level
        FROM wf_seg
        WHERE CAST(p_prev AS DOUBLE)
              + CAST(cap AS DOUBLE) * rem
              >= CAST(total AS DOUBLE) * {float(budget_frac)!r}
        ORDER BY cap, grp LIMIT 1)
    SELECT s.grp, s.cap, l.level,
           round(least(CAST(s.cap AS DOUBLE), l.level), 6) AS alloc,
           round(round(least(CAST(s.cap AS DOUBLE), l.level), 6)
                 / CAST(s.cap AS DOUBLE), 6) AS kept_frac
    FROM wf_seg s CROSS JOIN wf_lvl l"""


# --------------------------------------------------------------------
# Leave-one-source-out ablation scorecard
# --------------------------------------------------------------------

def source_ablation(
    df: DataFrame,
    group_col: str = "source",
    metric_col: str = "n_chars",
) -> DataFrame:
    """Leave-one-out ablation over sources for ADDITIVE corpus
    metrics: for each source, what happens to the corpus mean when
    that source is removed — the cheap first answer to "which
    source is dragging us down", computed for every source at once
    from one aggregate via the subtraction trick (no k passes;
    same additivity as ridge_cv's fold moments).

    LOO mean_without_i = (total - part_i) / (n - n_i); delta =
    loo_mean - corpus_mean: a POSITIVE delta means removing the
    source RAISES the corpus mean (the source scored below
    average). All sums exact BIGINT; divisions are single double
    ops rounded 6. Sources covering the whole corpus (n == n_i)
    emit a null loo_mean by contract. Returns (grp, n_docs, share,
    mean_metric, loo_mean, delta).
    """
    parts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(metric_col).cast("bigint")).alias("s"),
    )
    tot = parts.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("s").cast("bigint").alias("ts"),
    )
    return parts.crossJoin(F.broadcast(tot)).select(
        "grp",
        F.col("n").alias("n_docs"),
        F.round(F.col("n").cast("double") / F.col("tn").cast("double"), 6)
        .alias("share"),
        F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6)
        .alias("mean_metric"),
        F.when(
            F.col("tn") > F.col("n"),
            F.round(
                (F.col("ts") - F.col("s")).cast("double")
                / (F.col("tn") - F.col("n")).cast("double"),
                6,
            ),
        ).alias("loo_mean"),
        F.when(
            F.col("tn") > F.col("n"),
            F.round(
                (F.col("ts") - F.col("s")).cast("double")
                / (F.col("tn") - F.col("n")).cast("double")
                - F.col("ts").cast("double") / F.col("tn").cast("double"),
                6,
            ),
        ).alias("delta"),
    )


def source_ablation_sql(
    rows_sql: str,
    group: str = "source",
    metric: str = "n_chars",
) -> str:
    """DuckDB mirror of :func:`source_ablation`."""
    return f"""
    WITH ab_p AS (
        SELECT {group} AS grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM({metric}) AS BIGINT) AS s
        FROM ({rows_sql}) GROUP BY 1),
    ab_t AS (
        SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts
        FROM ab_p)
    SELECT grp, n AS n_docs,
           round(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS share,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_metric,
           CASE WHEN tn > n
                THEN round(CAST(ts - s AS DOUBLE) / CAST(tn - n AS DOUBLE), 6)
           END AS loo_mean,
           CASE WHEN tn > n
                THEN round(CAST(ts - s AS DOUBLE) / CAST(tn - n AS DOUBLE)
                           - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE), 6)
           END AS delta
    FROM ab_p CROSS JOIN ab_t"""


# --------------------------------------------------------------------
# Exact Shapley valuation of sources on the vocabulary-coverage game
# --------------------------------------------------------------------

def shapley_vocab_coverage(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    players: int = 6,
) -> DataFrame:
    """EXACT Shapley data valuation (Shapley 1953; the data-
    valuation framing of Ghorbani & Zou ICML'19) of sources under
    the vocabulary-coverage game: ``v(S)`` = number of distinct
    tokens contributed by the sources in coalition ``S``. Coverage
    games make exact Shapley tractable at corpus scale: one scan
    reduces the corpus to a <= 2^k-row (token-membership-mask ->
    count) table, after which the whole 2^k-subset lattice is
    integer arithmetic on a dimension-sized frame — no sampling, no
    Monte Carlo, no k passes.

    The top ``players - 1`` sources by doc count (ties by name) play
    individually; the tail buckets into 'other' — the cap is the
    semantics, not a truncation, and it keeps the lattice at
    2^players. phi accumulates as ``s!(k-1-s)! * marginal`` exact
    BIGINTs divided ONCE by k! (factorials inlined from Python), so
    efficiency — sum(phi) = v(N) = total vocabulary — holds to the
    rounding grid and is unit-tested. Returns (player, phi,
    phi_share) ordered by phi desc.
    """
    import math as _math

    k = int(players)
    ranked = (
        df.groupBy(F.col(group_col).alias("src"))
        .agg(F.count(F.lit(1)).alias("nd"))
        .select(
            "src",
            F.row_number()
            .over(Window.orderBy(F.col("nd").desc(), F.col("src").asc()))
            .alias("rk"),
        )
        .select(
            "src",
            F.when(F.col("rk") < k, F.col("src"))
            .otherwise(F.lit("other"))
            .alias("player"),
            F.when(F.col("rk") < k, F.col("rk") - 1)
            .otherwise(F.lit(k - 1))
            .alias("bit"),
        )
    )
    toks = (
        df.select(
            F.col(group_col).alias("src"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("word"),
        )
        .join(F.broadcast(ranked), "src")
        .select("word", "bit")
        .distinct()
    )
    masks = toks.groupBy("word").agg(
        F.expr("sum(DISTINCT shiftleft(CAST(1 AS BIGINT), bit))").alias(
            "mask"
        )
    )
    mc = masks.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    subsets = df.sparkSession.range(1 << k).select(
        F.col("id").cast("bigint").alias("S")
    )
    v = (
        subsets.crossJoin(F.broadcast(mc))
        .groupBy("S")
        .agg(
            F.sum(
                F.when(
                    F.expr("(S & mask) != 0"), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("v")
        )
    )
    # marginal of player i over subset S (i not in S):
    # weight numerator = |S|! (k-1-|S|)!, one /k! at the end
    wnum = {s: _math.factorial(s) * _math.factorial(k - 1 - s) for s in range(k)}
    kfact = _math.factorial(k)
    wmap = F.expr(
        "map(" + ", ".join(f"{s}, CAST({w} AS BIGINT)" for s, w in wnum.items()) + ")"
    )
    players_df = ranked.select("player", "bit").distinct()
    va = v.select(F.col("S").alias("S0"), F.col("v").alias("v0"))
    vb = v.select(F.col("S").alias("S1"), F.col("v").alias("v1"))
    phi = (
        players_df.crossJoin(va)
        .filter(F.expr("(S0 & shiftleft(CAST(1 AS BIGINT), bit)) = 0"))
        .withColumn(
            "S1", F.expr("S0 | shiftleft(CAST(1 AS BIGINT), bit)")
        )
        .join(F.broadcast(vb), "S1")
        .select(
            "player",
            (
                wmap[F.expr("bit_count(S0)")]
                * (F.col("v1") - F.col("v0"))
            ).alias("term"),
        )
        .groupBy("player")
        .agg(F.sum("term").cast("bigint").alias("num"))
    )
    total = v.filter(F.col("S") == (1 << k) - 1).select(
        F.col("v").alias("vN")
    )
    return (
        phi.crossJoin(F.broadcast(total))
        .select(
            "player",
            F.round(
                F.col("num").cast("double") / F.lit(float(kfact)), 6
            ).alias("phi"),
            F.round(
                F.col("num").cast("double")
                / (F.lit(float(kfact)) * F.col("vN").cast("double")),
                6,
            ).alias("phi_share"),
        )
        .orderBy(F.col("phi").desc(), F.col("player").asc())
    )


def shapley_vocab_sql(
    table_sql: str,
    group: str = "source",
    text: str = "text",
    players: int = 6,
) -> str:
    """DuckDB mirror of :func:`shapley_vocab_coverage`."""
    import math as _math

    k = int(players)
    wnum = {s: _math.factorial(s) * _math.factorial(k - 1 - s) for s in range(k)}
    kfact = _math.factorial(k)
    wcase = " ".join(
        f"WHEN {s} THEN CAST({w} AS BIGINT)" for s, w in wnum.items()
    )
    return f"""
    WITH sh_r AS (
        SELECT {group} AS src,
               row_number() OVER (ORDER BY COUNT(*) DESC, {group} ASC)
                   AS rk
        FROM {table_sql} GROUP BY 1),
    sh_p AS (
        SELECT src,
               CASE WHEN rk < {k} THEN src ELSE 'other' END AS player,
               CASE WHEN rk < {k} THEN rk - 1 ELSE {k - 1} END AS bit
        FROM sh_r),
    sh_t AS (
        SELECT DISTINCT t.word, p.bit
        FROM {table_sql} d
        JOIN sh_p p ON p.src = d.{group},
        unnest(list_filter(string_split_regex(lower(d.{text}), '\\s+'),
                           w -> w <> '')) AS t(word)),
    sh_m AS (
        SELECT word, CAST(SUM(DISTINCT (1::BIGINT << bit)) AS BIGINT)
                   AS mask
        FROM sh_t GROUP BY 1),
    sh_mc AS (
        SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM sh_m GROUP BY 1),
    sh_s AS (SELECT CAST(i AS BIGINT) AS S
             FROM unnest(range({1 << k})) AS t(i)),
    sh_v AS (
        SELECT s.S,
               CAST(COALESCE(SUM(CASE WHEN (s.S & m.mask) <> 0
                                      THEN m.cnt ELSE 0 END), 0) AS BIGINT)
                   AS v
        FROM sh_s s CROSS JOIN sh_mc m
        GROUP BY 1),
    sh_pl AS (SELECT DISTINCT player, bit FROM sh_p),
    sh_phi AS (
        SELECT p.player,
               CAST(SUM((CASE bit_count(v0.S)
                         {wcase} END) * (v1.v - v0.v)) AS BIGINT) AS num
        FROM sh_pl p
        JOIN sh_v v0 ON (v0.S & (1::BIGINT << p.bit)) = 0
        JOIN sh_v v1 ON v1.S = (v0.S | (1::BIGINT << p.bit))
        GROUP BY 1),
    sh_tot AS (SELECT v AS vN FROM sh_v WHERE S = {(1 << k) - 1})
    SELECT player,
           round(CAST(num AS DOUBLE) / {float(kfact)!r}, 6) AS phi,
           round(CAST(num AS DOUBLE)
                 / ({float(kfact)!r} * CAST(vN AS DOUBLE)), 6) AS phi_share
    FROM sh_phi CROSS JOIN sh_tot
    ORDER BY phi DESC, player ASC"""
