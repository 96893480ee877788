"""Text-analysis operators for training-data pipelines.

All hot-path logic is Catalyst expressions (JVM-side, codegen'd) —
no Python UDFs. Every helper has a deliberately *portable* formula so
the DuckDB oracle can reproduce results bit-for-bit (see
plans/queries.py determinism rules).

Ops: tokenization, token counting, quality scoring
(length/punct/stopword ratios), n-gram-free language ID heuristic,
document fingerprinting (normalized md5).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified
# type hints (PEP 563 above) against module globals

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small per-language stopword marker sets for the heuristic language
# ID. Deliberately tiny: the point is a deterministic, cheap,
# vectorizable scoring pass, not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to", "is"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "es": ("el", "de", "que", "los", "una", "por"),
    "de": ("der", "die", "und", "das", "ein", "mit"),
}

STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is")


def tokens(text_col: str | Column) -> Column:
    """Whitespace tokenization (split on single spaces — the portable
    baseline; see ``tokens_regex`` for the BPE-ish variant)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def tokens_regex(text_col: str | Column) -> Column:
    """BPE-ish tokenizer: words, numbers, and single punctuation marks
    as separate tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))


def token_count(text_col: str | Column) -> Column:
    return F.size(tokens(text_col))


def stopword_ratio(text_col: str | Column, stopwords=STOPWORDS) -> Column:
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    return hits.cast("double") / F.size(toks)


def avg_token_len(text_col: str | Column) -> Column:
    toks = tokens(text_col)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / F.size(toks)


def quality_score(text_col: str | Column) -> Column:
    """Composite quality heuristic in [0, 1]: rewards mid-length docs
    and normal stopword density. Pure integer/double arithmetic on
    deterministic inputs -> portable."""
    n = token_count(text_col).cast("double")
    sw = stopword_ratio(text_col)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(sw * F.lit(4.0), F.lit(1.0))
    return F.round((len_score + sw_score) / 2.0, 6)


def lang_scores(text_col: str | Column) -> dict[str, Column]:
    toks = tokens(text_col)

    def marker_counter(markers: tuple[str, ...]):
        # single-arg lambda required: a 2-arg lambda would be treated
        # as (element, index) by F.filter
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))

    return {lang: marker_counter(markers) for lang, markers in LANG_MARKERS.items()}


def lang_guess(text_col: str | Column) -> Column:
    """Pick the language whose marker count is highest; ties resolve in
    fixed key order (en, fr, es, de); zero markers -> 'und'."""
    scores = lang_scores(text_col)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in ("de", "es", "fr", "en"):  # reversed so earlier keys win ties
        n = scores[lang]
        best = F.when(n >= F.greatest(best_n, F.lit(1)), F.lit(lang)).otherwise(best)
        best_n = F.greatest(best_n, n)
    return best


def normalize_text(text_col: str | Column) -> Column:
    """Lowercase + collapse whitespace runs + trim — the canonical form
    for fingerprinting/exact dedup."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def fingerprint(text_col: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text_col))


# Rolling-hash fingerprint parameters: Rabin-Karp base/modulus chosen
# so every intermediate fits a 64-bit signed int in BOTH engines
# (max accumulator = (2^32-1)*257 + cp < 2^41) — what makes the DuckDB
# oracle bit-exact without bigint tricks.
_RK_BASE = 257
_RK_MOD = 1 << 32


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprints (winnowing, Schleimer et al.
    SIGMOD'03 / MOSS): normalize, hash every character ``k``-gram with
    a Rabin-Karp rolling hash, then keep the distinct minima of each
    ``window`` of consecutive gram hashes.

    The selected set is position-robust: unlike the exact md5
    fingerprint, two documents sharing substrings share fingerprints
    regardless of where the substrings sit, which is what plagiarism /
    near-dup sweeps join on. One Arrow-batched pass, zero shuffles —
    the same scale shape as simhash32. Returns (id, fps array<bigint>
    sorted distinct, n_grams). Documents shorter than ``k`` after
    normalization drop out (they have no gram).
    """
    import numpy as np
    import pandas as pd

    norm = normalize_text(text_col)
    powers = np.array(
        [pow(_RK_BASE, k - 1 - j, _RK_MOD) for j in range(k)], dtype=np.uint64
    )

    def gen(batches):
        for pdf in batches:
            ids, fps, ngrams = [], [], []
            for doc_id, txt in zip(pdf["doc_id"], pdf["__norm"]):
                # null ids must drop WITH their row: Arrow hands a
                # nullable int64 id column to pandas as float64+NaN,
                # and a NaN id can't convert back to the declared
                # bigint output field
                if doc_id is None or (
                    isinstance(doc_id, float) and pd.isna(doc_id)
                ):
                    continue
                if txt is None or len(txt) < k:
                    continue
                # vectorized codepoint extraction (no per-char Python)
                cps = np.frombuffer(
                    txt.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                n = len(cps) - k + 1
                # windowed gather evaluation mod 2^32 == the sequential
                # rolling recurrence (mod arithmetic commutes); k is a
                # small constant so the (n, k) gather stays linear-ish,
                # and each product fits uint64 comfortably
                idx = np.arange(n)[:, None] + np.arange(k)[None, :]
                h = (cps[idx] * powers[None, :]).sum(axis=1) % _RK_MOD
                if n >= window:
                    wmin = np.lib.stride_tricks.sliding_window_view(
                        h, window
                    ).min(axis=1)
                else:
                    wmin = np.array([h.min()], dtype=h.dtype)
                ids.append(doc_id)
                fps.append(np.unique(wmin).astype(np.int64).tolist())
                ngrams.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=pdf["doc_id"].dtype),
                    "fps": pd.Series(fps, dtype="object"),
                    "n_grams": pd.Series(ngrams, dtype="int64"),
                }
            )

    from ..util import spread

    id_type = df.schema[id_col].dataType.simpleString()
    narrow = spread(
        df.select(F.col(id_col).alias("doc_id"), norm.alias("__norm"))
    )
    return narrow.mapInPandas(
        gen, f"doc_id {id_type}, fps array<bigint>, n_grams bigint"
    )


def winnow_oracle_sql(
    table: str = "documents",
    text: str = "text",
    id_: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> str:
    """DuckDB mirror of :func:`winnow_fingerprints`, aggregated to
    (doc_id, n_grams, n_selected, fp_digest): the same Rabin-Karp
    recurrence unrolled as a nested expression, window minima via a
    ROWS frame restricted to full windows."""
    h = f"ascii(substr(g, 1, 1))"
    for j in range(2, k + 1):
        h = f"(({h}) * {_RK_BASE} + ascii(substr(g, {j}, 1))) % {_RK_MOD}"
    return f"""
    WITH norm AS (
        SELECT {id_} AS doc_id,
               trim(regexp_replace(lower({text}), '\\s+', ' ', 'g')) AS t
        FROM {table}),
    grams AS (
        SELECT doc_id, i, substr(t, i, {k}) AS g, len(t) - {k} + 1 AS n
        FROM norm, unnest(range(1, len(t) - {k - 2})) AS u(i)
        WHERE len(t) >= {k}),
    hashed AS (SELECT doc_id, i, n, {h} AS h FROM grams),
    sel AS (
        SELECT doc_id, n,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {window - 1} FOLLOWING) AS wh
        FROM hashed
        QUALIFY i <= greatest(n - {window} + 1, 1)),
    dedup AS (SELECT DISTINCT doc_id, n, wh FROM sel)
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           md5(string_agg(CAST(wh AS VARCHAR), ',' ORDER BY wh)) AS fp_digest
    FROM dedup GROUP BY doc_id
    """


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pre-training chunking pass. One row per chunk:
    (doc_id, chunk_idx, n_tokens, chunk).

    Pure Catalyst: tokenize once, generate window starts with
    ``sequence`` (stride = chunk_tokens - overlap), slice + rejoin.
    Narrow op (explode only), no shuffle; at 100 TB it pipelines
    straight into the scan.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = tokens(text_col)
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.floor((n - 1) / stride).cast("int"), F.lit(0)),
    )
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("i"),
            F.array_join(
                F.slice(toks, i * stride + 1, chunk_tokens), " "
            ).alias("chunk"),
            F.least(n - i * stride, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            id_col,
            "chunk_idx",
            F.col("c.n_tokens").alias("n_tokens"),
            F.col("c.chunk").alias("chunk"),
        )
    )


def clean_text(text_col: str | Column) -> Column:
    """Boilerplate cleaning pass: mask digit runs (the portable stand-in
    for PII-ish scrubbing), strip non-ASCII, collapse whitespace."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.regexp_replace(c, "[0-9]+", "#")
    c = F.regexp_replace(c, "[^\\x20-\\x7e]", " ")
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def hashed_linear_score(
    text_col: str | Column,
    seed: int = 42,
    buckets: int = 1024,
    scale: int = 1000,
) -> Column:
    """Linear-classifier INFERENCE over hashing-trick features — the
    fastText-style quality/toxicity scorer every corpus pipeline runs
    over all data. Per token: bucket = portable md5 bucket
    (sampling.hash_bucket), weight = an integer derived from the
    bucket (Knuth multiplicative mix) standing in for a trained
    coefficient — swap the weight expression for a literal array
    lookup of real weights in production; the plan shape is
    identical. Score = sum of weights.

    The entire expression is JVM-side (split/filter/transform/
    aggregate higher-order functions — Catalyst evaluates them in the
    scan stage; HOF lambdas are CodegenFallback but never leave the
    JVM): no Python crossing, no vocabulary broadcast, no shuffle — at 100 TB
    inference rides the text scan for free, unlike the featurize-
    then-join shape (q129) which exists for TRAINING exports. Exact
    integer arithmetic end-to-end, so the oracle gate (q305) matches
    bit-for-bit.

    HOF-shadowing note (util.hof_shadow_risks): the lambdas below
    reference only their own lambda variables, never outer projection
    columns, so the r5 q206 rebind hazard cannot apply."""
    from .sampling import hash_bucket

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(c, " "), lambda t: t != "")
    mod = 2 * scale + 1

    def weight(t: Column) -> Column:
        b = hash_bucket(t, seed=seed, buckets=buckets).cast("long")
        return (b * F.lit(2654435761) + F.lit(seed)) % mod - scale

    return F.aggregate(
        F.transform(toks, weight),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hashed_linear_score_sql(
    text_expr: str = "text",
    seed: int = 42,
    buckets: int = 1024,
    scale: int = 1000,
) -> str:
    """DuckDB twin of :func:`hashed_linear_score` (scalar subquery).

    NULL text yields NULL (matching the Spark side, where
    ``split(NULL)`` propagates); the inner COALESCE only covers the
    empty-token-list case (empty/whitespace text scores 0 in both
    engines). Cross-engine NULL/empty/whitespace agreement is pinned
    by ``tests/test_text.py`` (ADVICE r8 item 1)."""
    from .sampling import hash_bucket_sql

    bucket = hash_bucket_sql("t", seed=seed, buckets=buckets)
    mod = 2 * scale + 1
    return f"""(
        CASE WHEN {text_expr} IS NULL THEN NULL ELSE (
        SELECT COALESCE(SUM(
            (CAST({bucket} AS BIGINT) * 2654435761 + {seed}) % {mod}
            - {scale}), 0)
        FROM unnest(string_split({text_expr}, ' ')) AS tt(t)
        WHERE t <> '') END)"""


def unicode_normalize(
    text_col: str | Column,
    form: str = "NFC",
    strip_accents: bool = False,
    casefold: bool = False,
) -> Column:
    """Unicode text canonicalization for multilingual corpora: apply a
    normalization form (NFC/NFD/NFKC/NFKD via the stdlib
    ``unicodedata`` — the same tables every tokenizer pipeline uses),
    optionally strip combining marks (NFD -> drop category Mn ->
    re-compose; matches DuckDB's ``strip_accents`` for Latin scripts,
    which is what keeps this on the exact oracle gate, q303), and
    optionally casefold. Web-crawled text mixes composed and
    decomposed forms of the SAME grapheme; dedup fingerprints, BPE
    merges and n-gram stats all silently fragment without this pass.

    Arrow-batched pandas_udf (one Python crossing per batch, no
    per-row overhead); NULL in -> NULL out. At 100 TB this rides the
    existing text scan — no shuffle, no extra pass."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            out = unicodedata.normalize(form, v)
            if strip_accents:
                out = "".join(
                    ch
                    for ch in unicodedata.normalize("NFD", out)
                    if unicodedata.category(ch) != "Mn"
                )
                out = unicodedata.normalize(form, out)
            return out.casefold() if casefold else out

        return s.map(one)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return norm(c)


# PII redaction patterns, ordered (emails first: an IP-shaped host
# inside an address should surface as a@<IP>, never eat the local
# part). Engine-portable by construction: no alternation, backrefs,
# or lookaround, so Java regex (Spark, leftmost backtracking) and RE2
# (DuckDB, leftmost-longest) produce identical matches — that is what
# lets the scrub run on the exact oracle gate.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
)


def redact_pii(
    text_col: str | Column, kinds: tuple[str, ...] | None = None
) -> Column:
    """Training-corpus PII scrub: replace emails, dotted-quad IPs, and
    +-prefixed phone numbers with typed placeholder tokens.

    A chain of ``regexp_replace`` expressions — pure JVM whole-stage
    codegen, zero shuffles, no Python crossing; at 100 TB this is a
    free rider on whatever scan already reads the text column.
    ``kinds`` selects a subset of :data:`PII_PATTERNS` by name.
    """
    _validate_pii_kinds(kinds)
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pat, token in PII_PATTERNS:
        if kinds is None or name in kinds:
            c = F.regexp_replace(c, pat, token)
    return c


def _validate_pii_kinds(kinds: tuple[str, ...] | None) -> None:
    """A typo'd or empty kind selection must fail loudly — a privacy
    scrub that silently redacts nothing is worse than an error."""
    if kinds is None:
        return
    known = {name for name, _, _ in PII_PATTERNS}
    if not kinds:
        raise ValueError("redact_pii: empty kinds selection")
    unknown = [k for k in kinds if k not in known]
    if unknown:
        raise ValueError(
            f"redact_pii: unknown kinds {unknown}; known: {sorted(known)}"
        )


def redact_pii_sql(expr: str, kinds: tuple[str, ...] | None = None) -> str:
    """DuckDB mirror of :func:`redact_pii` (same patterns, same order,
    global flag)."""
    _validate_pii_kinds(kinds)
    for name, pat, token in PII_PATTERNS:
        if kinds is None or name in kinds:
            pat_sql = pat.replace("'", "''")
            expr = f"regexp_replace({expr}, '{pat_sql}', '{token}', 'g')"
    return expr


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    budget: int = 2048,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing (the LLM pretraining
    loader layout): within each shard, documents in id order are laid
    into fixed ``budget``-token packs via an exclusive running token
    total. Adds ``n_tokens`` / ``pack_id`` / ``pack_offset``. One
    shuffle (window by shard); packing is per-shard by construction,
    so there is no global ordering bottleneck at corpus scale.

    Shared by the q131 catalog query and the ``pack_sequences`` spec
    op — the integer window shapes are load-bearing for oracle parity,
    so they live exactly once.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return (
        df.withColumn("n_tokens", token_count(text_col).cast("bigint"))
        .withColumn("__cum", cum)
        .withColumn("pack_id", F.expr(f"__cum DIV {int(budget)}"))
        .withColumn("pack_offset", F.col("__cum") % budget)
        .drop("__cum")
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    repetition/boilerplate quality signal. Returns (id, n_tokens,
    entropy) with H = log2(n) - (1/n) * SUM(tf * log2(tf)); the
    per-term double products are quantized to DECIMAL(28,12) and
    summed exactly, so the result is partition-order independent and
    a final round(6) absorbs sub-ulp libm differences across engines.

    Shared by the q132 catalog query and the ``token_entropy`` spec
    op (single source of the oracle-parity shapes).
    """
    from .search import tokens as token_rows

    tf = (
        token_rows(df, id_col=id_col, text_col=text_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(
                (F.col("tf") * F.log2(F.col("tf").cast("double")))
                .cast("decimal(28,12)")
            )
            .cast("double")
            .alias("__tlog"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.log2(F.col("n_tokens").cast("double"))
                - F.col("__tlog") / F.col("n_tokens").cast("double"),
                6,
            ).alias("entropy"),
        )
    )


def profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text profile: the columns a filtering pipeline keys on.

    The higher-order lambdas here (aggregate/filter over token arrays)
    are interpreted per element — CPU enough that an under-split local
    scan bottlenecks on one core, hence the spread (no-op at scale).
    """
    from ..util import spread

    df = spread(df)
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.round(avg_token_len(text_col), 6).alias("avg_token_len"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        quality_score(text_col).alias("quality"),
        lang_guess(text_col).alias("lang_guess"),
        fingerprint(text_col).alias("fp"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition/diversity signals per document:

    * ``top_word_ratio``    — share of tokens taken by the single most
      frequent token (boilerplate / keyword-stuffing detector),
    * ``unique_word_ratio`` — distinct tokens / total tokens,
    * ``dup_bigram_ratio``  — share of bigram occurrences that are
      repeats of an earlier bigram in the same document.

    One Arrow-batched pass, zero shuffles: every signal is a
    per-document counter, so a single Pandas UDF computes all three
    from each text batch (an earlier explode + (id, token) two-phase
    agg version was correct but paid two shuffles and a join; the
    interpreted-lambda array form for bigrams was the dominant cost —
    same tradeoff as dedup.shingle_rows). At 100 TB this stays
    embarrassingly parallel: narrow scan in, narrow columns out.

    Ratios divide exact integer counts in the same order as the SQL
    oracle's divisions, so results stay bit-identical cross-engine.

    (Net-new vs the reference, which has no text analytics —
    SURVEY.md §2.6; sibling of quality_score/lang_guess above.)
    """
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "n_tokens int, dup_bigram_ratio double, "
        "top_word_ratio double, unique_word_ratio double"
    )
    def _signals(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            toks = (t or "").split(" ")
            n = len(toks)
            counts = Counter(toks)
            n_bg = n - 1
            bg_distinct = (
                len({(toks[i], toks[i + 1]) for i in range(n_bg)})
                if n_bg > 0
                else None
            )
            rows.append(
                (
                    n,
                    1.0 - bg_distinct / n_bg if n_bg > 0 else None,
                    max(counts.values()) / n if n else None,
                    len(counts) / n if n else None,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "n_tokens",
                "dup_bigram_ratio",
                "top_word_ratio",
                "unique_word_ratio",
            ],
        )

    return df.select(
        F.col(id_col), _signals(F.col(text_col)).alias("__sig")
    ).select(id_col, "__sig.*")


def bigram_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All consecutive token pairs per document WITH multiplicity
    (unlike ``..dedup.shingle_rows``, which dedups — language-model
    counts need every occurrence).

    r11: pure JVM higher-order functions (split -> filter empties ->
    transform over an index sequence) replace the former Arrow
    pandas_udf — same tokens (split on single space, drop empty
    strings), zero Python boundary (guide §4.1: prefer built-ins;
    the ArrowEvalPython node disappears from every LM-score plan)."""
    from ..util import spread

    return (
        spread(df.select(F.col(id_col).alias("doc_id"), text_col))
        .select(
            "doc_id",
            F.expr(
                f"filter(split(coalesce({text_col}, '') , ' '), x -> x != '')"
            ).alias("__toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(__toks) >= 2 THEN "
                    "transform(sequence(0, size(__toks) - 2), "
                    "i -> struct(__toks[i] AS w1, __toks[i+1] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-style quality scoring: mean log-probability of each
    document under an add-one-smoothed bigram model trained on the
    corpus itself (the CCNet/Gopher-family LM filter, with the corpus
    standing in for the external LM — swap the stats frames to score
    against a reference corpus). Low score = improbable token
    sequences (spam/garbled text); high = natural.

    ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)``, V = distinct
    successor types. Scale shape: the corpus collapses to per-doc
    bigram term frequencies (one shuffle), corpus statistics are
    re-aggregations OF that frame (strictly smaller), and the scoring
    joins run on vocabulary-sized keys — no text ever re-scans.
    Cross-engine exactness: smoothed probabilities are ratios of
    identical integers, each ``tf * ln(p)`` term is quantized to
    DECIMAL(28,12) and summed exactly (order-independent), and a
    final round(6) absorbs sub-ulp libm differences — the q132
    token-entropy discipline.

    Storage contract: the per-doc tf frame is ``persist()``-ed (the
    stats side and the scoring side both read it) and the handle is
    owned by the returned plan — it cannot be released before the
    caller's final action. Library callers running many scores in one
    session should ``spark.catalog.clearCache()`` (or unpersist the
    session's RDD handles) between calls, as bench.py does.
    """
    bg = bigram_rows(df, text_col=text_col, id_col=id_col)
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.persist()
    cb = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    cc = tf.groupBy("w1").agg(F.sum("tf").alias("cc"))
    v = tf.agg(F.countDistinct("w2").alias("v"))
    # r11: stats fold into the (w1, w2) TYPE table first (same
    # type-space restructure as kn_trigram_score) — one ln(p) weight
    # per bigram type from the identical expression tree, so each
    # tf * ln(p) term stays bit-exact; the per-doc tf frame joins
    # once instead of riding both stat joins (guide §2.3).
    weight = (
        cb.join(cc, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("cb") + F.lit(1)).cast("double")
                / (F.col("cc") + F.col("v")).cast("double")
            ).alias("lp"),
        )
    )
    term = tf.join(weight, ["w1", "w2"]).select(
        "doc_id",
        "tf",
        (F.col("tf") * F.col("lp")).cast("decimal(28,12)").alias("t"),
    )
    return (
        term.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum("t").cast("double").alias("__tsum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("__tsum") / F.col("n_bigrams").cast("double"), 6
            ).alias("avg_logprob"),
        )
    )


def bigram_lm_oracle_sql(
    table: str = "documents", text: str = "text", id_: str = "doc_id"
) -> str:
    """DuckDB mirror of :func:`bigram_lm_score` (same smoothing, same
    DECIMAL(28,12) term quantization, same final rounding)."""
    return f"""
    WITH toks AS (
        SELECT {id_} AS doc_id, list_filter(string_split({text}, ' '),
               w -> w <> '') AS ts
        FROM {table}),
    bg AS (
        SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        FROM toks, unnest(range(1, len(ts))) AS t(i)),
    tf AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
        FROM bg GROUP BY 1, 2, 3),
    cb AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cb
           FROM tf GROUP BY 1, 2),
    cc AS (SELECT w1, CAST(SUM(tf) AS BIGINT) AS cc FROM tf GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM tf),
    term AS (
        SELECT tf.doc_id, tf.tf,
               CAST(tf.tf * ln(CAST(cb.cb + 1 AS DOUBLE)
                               / CAST(cc.cc + v.v AS DOUBLE))
                    AS DECIMAL(28,12)) AS t
        FROM tf JOIN cb USING (w1, w2) JOIN cc USING (w1), v)
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(t) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE), 6)
               AS avg_logprob
    FROM term GROUP BY doc_id
    """


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 10,
    sep: str = ". ",
) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet/C4 cleanup step):
    split each document into segments on ``sep``, drop every segment
    that occurs in at least ``min_df`` DISTINCT documents (footers,
    cookie banners, license blurbs — content no model should see
    thousands of times), and rejoin the survivors in order.

    Scale shape: one segment explode (narrow), one distinct-df
    aggregate keyed by segment text, an anti-join of the segment
    stream against the hot set, and an ordered re-assembly per
    document (sort_array over (pos, seg) structs — no window). The
    df aggregate's state is the distinct segment vocabulary, which
    boilerplate itself keeps small. Returns (id, text) with the
    cleaned text; documents that were ALL boilerplate come back as
    empty strings, ready for a length filter.
    """
    import re as _re

    seg = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep))
        ).alias("pos", "seg"),
    )
    hot = (
        seg.filter(F.col("seg") != "")
        .groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("seg")
    )
    kept = seg.join(hot, "seg", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, seg))),"
                " x -> x.seg)"
            ),
            sep,
        ).alias("text")
    )
    # docs whose every segment was boilerplate have no kept rows —
    # join back onto the id universe so they return as empty strings
    # (the documented contract), not silently vanish
    ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    return ids.join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )


def strip_boilerplate_sql(
    table_sql: str,
    id_: str = "doc_id",
    text: str = "text",
    min_df: int = 10,
    sep: str = ". ",
) -> str:
    """DuckDB mirror of :func:`strip_boilerplate`. ``table_sql``
    yields (doc_id, text)."""
    return f"""
    WITH src AS ({table_sql}),
    seg AS (
        SELECT {id_} AS doc_id, t.i AS pos, ss[t.i] AS seg
        FROM (SELECT {id_}, string_split({text}, '{sep}') AS ss FROM src),
             unnest(range(1, len(ss) + 1)) AS t(i)),
    hot AS (
        SELECT seg FROM (
            SELECT seg, COUNT(DISTINCT doc_id) AS df
            FROM seg WHERE seg <> '' GROUP BY 1)
        WHERE df >= {min_df}),
    kept AS (SELECT * FROM seg WHERE seg NOT IN (SELECT seg FROM hot)),
    rebuilt AS (
        SELECT doc_id, string_agg(seg, '{sep}' ORDER BY pos) AS text
        FROM kept GROUP BY doc_id)
    SELECT i.doc_id, COALESCE(r.text, '') AS text
    FROM (SELECT DISTINCT {id_} AS doc_id FROM src) i
    LEFT JOIN rebuilt r USING (doc_id)
    """


def canonicalize_url(col: Column) -> Column:
    """Canonical URL form for crawl-level dedup (the Common Crawl /
    C4 URL-normalization step): lowercase scheme+host, strip
    fragments, strip tracking query parameters (utm_*, fbclid,
    gclid, ref), drop an empty leftover '?', and remove a trailing
    slash from non-root paths. Pure Catalyst string/regexp
    expressions (codegen'd, shuffle-free); the regexes stay in the
    portable subset both Java regex and RE2 execute identically.
    """
    # scheme+host lowercased (case-insensitive match), rest untouched
    c = F.concat(
        F.lower(F.regexp_extract(col, "^(?i)(https?://[^/?#]*)", 1)),
        F.regexp_extract(col, "^(?i)https?://[^/?#]*(.*)$", 1),
    )
    c = F.regexp_replace(c, "#.*$", "")  # fragment
    # tracking params, wherever they sit in the query string
    c = F.regexp_replace(c, "([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*", "$1")
    c = F.regexp_replace(c, "[?&]+$", "")  # empty leftover separators
    # collapse doubled separators BEFORE the '?&' fix: stripping two
    # adjacent tracking params leaves '?&&id=..', and a '?&' pass run
    # first would only eat one '&' (replace does not rescan)
    c = F.regexp_replace(c, "&&+", "&")
    c = F.regexp_replace(c, "\\?&", "?")  # "?&x" -> "?x"
    c = F.regexp_replace(c, "(https?://[^/?#]+/[^?#]*?)/+(\\?|$)", "$1$2")
    # non-http(s) inputs (ftp:, protocol-relative, bare hosts) pass
    # through unchanged instead of collapsing to '' — a dedup group
    # keyed on '' would silently merge every such row
    return F.when(
        col.rlike("^(?i)https?://"), c
    ).otherwise(col)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB mirror of :func:`canonicalize_url` (same regex subset,
    same rule order)."""
    c = (
        f"lower(regexp_extract({expr}, '^(?i)(https?://[^/?#]*)', 1)) || "
        f"regexp_extract({expr}, '^(?i)https?://[^/?#]*(.*)$', 1)"
    )
    c = f"regexp_replace({c}, '#.*$', '')"
    c = (
        f"regexp_replace({c}, "
        f"'([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*', '\\1', 'g')"
    )
    c = f"regexp_replace({c}, '[?&]+$', '')"
    c = f"regexp_replace({c}, '&&+', '&', 'g')"
    c = f"regexp_replace({c}, '\\?&', '?', 'g')"
    c = f"regexp_replace({c}, '(https?://[^/?#]+/[^?#]*?)/+(\\?|$)', '\\1\\2')"
    return (
        f"CASE WHEN regexp_matches({expr}, '^(?i)https?://')"
        f" THEN {c} ELSE {expr} END"
    )


def span_corrupt(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_rate: float = 0.15,
    seed: int = 13,
) -> DataFrame:
    """Span-corruption masking (the T5/UL2 denoising objective's data
    prep, Raffel et al. JMLR'20): mask ~``mask_rate`` of token
    positions via the portable hash (deterministic, append-stable —
    the same document always yields the same corruption), collapse
    each maximal masked RUN into one numbered sentinel, and emit the
    corrupted input next to the target sequence (sentinels + masked
    spans), fingerprinted.

    Plan shape: one tokenize pass, one shuffle on the document key
    for the position windows (dense position, run grouping, sentinel
    numbering — all gaps-and-islands arithmetic, the q123 trick),
    one rollup back to document grain. Token state never collects to
    the driver. Returns (doc_id, corrupted_fp, target_fp, n_tokens,
    n_masked, n_spans).
    """
    from ..functions.sampling import BUCKETS, hash_bucket

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("p0", "tok"),
    ).filter(F.col("tok") != "")
    wdoc = Window.partitionBy("doc_id").orderBy("p0")
    t = toks.withColumn("pos", F.row_number().over(wdoc))
    cut = int(round(mask_rate * BUCKETS))
    t = t.withColumn(
        "masked",
        hash_bucket(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                     F.col("pos").cast("string")),
            seed=seed,
        )
        < F.lit(cut),
    )
    wmask = Window.partitionBy("doc_id", "masked").orderBy("pos")
    t = t.withColumn(
        "run_id",
        F.when(
            F.col("masked"), F.col("pos") - F.row_number().over(wmask)
        ),
    )
    wrun = Window.partitionBy("doc_id").orderBy("run_id")
    runs = (
        t.filter("masked")
        .groupBy("doc_id", "run_id")
        .agg(
            F.min("pos").alias("pos"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("span"),
        )
        .withColumn("k", F.row_number().over(wrun))
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("k").cast("string"),
                        F.lit(">"))
    pieces = (
        t.filter(~F.col("masked"))
        .select("doc_id", "pos", F.col("tok").alias("piece"))
        .unionByName(
            runs.select("doc_id", "pos", sentinel.alias("piece"))
        )
    )
    corrupted = pieces.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "piece"))),
                    lambda s: s["piece"],
                ),
            )
        ).alias("corrupted_fp")
    )
    targets = runs.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("k", "pos", "span"))),
                    lambda s: F.concat(
                        F.lit("<extra_id_"), s["k"].cast("string"),
                        F.lit("> "), s["span"],
                    ),
                ),
            )
        ).alias("target_fp"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    stats = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("masked").cast("int")).cast("bigint").alias("n_masked"),
    )
    return (
        stats.join(corrupted, "doc_id", "left")
        .join(targets, "doc_id", "left")
        .select(
            "doc_id",
            "corrupted_fp",
            F.coalesce("target_fp", F.md5(F.lit(""))).alias("target_fp"),
            "n_tokens",
            "n_masked",
            F.coalesce("n_spans", F.lit(0).cast("bigint")).alias("n_spans"),
        )
    )


def span_corrupt_sql(
    table: str = "documents",
    text: str = "text",
    id_: str = "doc_id",
    mask_rate: float = 0.15,
    seed: int = 13,
) -> str:
    """DuckDB mirror of :func:`span_corrupt` (same hash, same runs,
    same sentinel numbering and fingerprints)."""
    from ..functions.sampling import BUCKETS, hash_bucket_sql

    cut = int(round(mask_rate * BUCKETS))
    bucket = hash_bucket_sql(
        f"CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)", seed=seed
    )
    return f"""
    WITH raw AS (
        SELECT {id_} AS doc_id, unnest(string_split({text}, ' ')) AS tok,
               generate_subscripts(string_split({text}, ' '), 1) AS p0
        FROM {table}),
    toks AS (SELECT * FROM raw WHERE tok <> ''),
    t0 AS (
        SELECT doc_id, tok,
               row_number() OVER (PARTITION BY doc_id ORDER BY p0) AS pos
        FROM toks),
    t AS (
        SELECT doc_id, tok, pos,
               ({bucket}) < {cut} AS masked
        FROM t0),
    tr AS (
        SELECT doc_id, tok, pos, masked,
               CASE WHEN masked THEN pos - row_number() OVER (
                   PARTITION BY doc_id, masked ORDER BY pos) END AS run_id
        FROM t),
    runs AS (
        SELECT doc_id, run_id, MIN(pos) AS pos,
               string_agg(tok, ' ' ORDER BY pos) AS span
        FROM tr WHERE masked GROUP BY doc_id, run_id),
    runs_k AS (
        SELECT doc_id, pos, span,
               row_number() OVER (PARTITION BY doc_id ORDER BY run_id)
                   AS k
        FROM runs),
    pieces AS (
        SELECT doc_id, pos, tok AS piece FROM tr WHERE NOT masked
        UNION ALL
        SELECT doc_id, pos,
               '<extra_id_' || CAST(k AS VARCHAR) || '>' AS piece
        FROM runs_k),
    corrupted AS (
        SELECT doc_id,
               md5(string_agg(piece, ' ' ORDER BY pos)) AS corrupted_fp
        FROM pieces GROUP BY doc_id),
    targets AS (
        SELECT doc_id,
               md5(string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> '
                              || span, ' ' ORDER BY k)) AS target_fp,
               CAST(COUNT(*) AS BIGINT) AS n_spans
        FROM runs_k GROUP BY doc_id),
    stats AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_masked
        FROM t GROUP BY doc_id)
    SELECT s.doc_id, c.corrupted_fp,
           COALESCE(t2.target_fp, md5('')) AS target_fp,
           s.n_tokens, s.n_masked,
           COALESCE(t2.n_spans, 0) AS n_spans
    FROM stats s
    LEFT JOIN corrupted c ON s.doc_id = c.doc_id
    LEFT JOIN targets t2 ON s.doc_id = t2.doc_id
    """


def trigram_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All consecutive token triples per document WITH multiplicity
    (the trigram analogue of :func:`bigram_rows`). One output row per
    trigram occurrence.

    r11: pure JVM higher-order functions replace the former Arrow
    pandas_udf (same tokens: split on single space, drop empty
    strings) — zero Python boundary (guide §4.1)."""
    from ..util import spread

    return (
        spread(df.select(F.col(id_col).alias("doc_id"), text_col))
        .select(
            "doc_id",
            F.expr(
                f"filter(split(coalesce({text_col}, '') , ' '), x -> x != '')"
            ).alias("__toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(__toks) >= 3 THEN "
                    "transform(sequence(0, size(__toks) - 3), "
                    "i -> struct(__toks[i] AS w1, __toks[i+1] AS w2, "
                    "__toks[i+2] AS w3)) "
                    "ELSE array() END"
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
            F.col("g.w3").alias("w3"),
        )
    )


_KN_D = 0.75  # absolute discount (Kneser-Ney 1995 / Chen-Goodman 1999)


def kn_trigram_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Interpolated Kneser-Ney trigram scoring: mean log-probability
    of each document under a KN-smoothed trigram model trained on the
    corpus itself (the stronger cousin of :func:`bigram_lm_score`'s
    add-one model — KN is what CCNet-style perplexity filters actually
    train). Swap the stats frames to score against a reference corpus.

    Model (absolute discount D=0.75, continuation lower orders, all
    counts derived from the trigram stream so both engines agree on
    the event space):

    - ``p3(w3|w1,w2) = max(c3-D,0)/c2 + D*N1+(w1 w2 .)/c2 * p2``
    - ``p2(w3|w2)    = max(N1+(. w2 w3)-D,0)/N1+(. w2 .)
                       + D*N1+(w2 .)/N1+(. w2 .) * p1``
    - ``p1(w3)       = N1+(. w3)/|bigram types|`` (continuation
      unigram over the distinct-bigram table)

    Every scored trigram is in-corpus (self-trained), so all
    denominators are positive. Docs with <3 tokens have no trigrams
    and are absent from the output (length-filter them upstream).

    Scale shape: one Arrow pass to trigram occurrences, one shuffle
    to per-doc trigram term frequencies; every corpus statistic is a
    re-aggregation OF that frame (strictly smaller), and scoring
    joins run on type-space keys — raw text never re-scans. At
    100 TB the tf3 frame is the only text-sized shuffle, identical
    in shape to exact-dedup's.

    Cross-engine exactness (the q148 discipline): probabilities are
    pure IEEE double arithmetic over identical integers with an
    identical expression tree (deterministic in both engines); each
    ``tf * ln(p3)`` term is quantized to DECIMAL(28,12) and summed
    exactly; a final round(6) absorbs sub-ulp libm ln() differences.

    Storage contract: ``tf3`` and the trigram type table ``c3`` are
    ``persist()``-ed (every corpus statistic re-aggregates them) and
    the handles are owned by the returned plan — they cannot be
    released before the caller's final action. Library callers running
    many scores in one session should ``spark.catalog.clearCache()``
    (or unpersist the session's RDD handles) between calls, as
    bench.py does.
    """
    tg = trigram_rows(df, text_col=text_col, id_col=id_col)
    tf3 = tg.groupBy("doc_id", "w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("tf")
    )
    tf3 = tf3.persist()
    # trigram/bigram occurrence counts over the corpus.
    # r11: c3 (the trigram TYPE table) is persisted — every corpus
    # statistic below re-aggregates c3, and without the persist each
    # one re-ran the tf3->c3 groupBy from lineage (5x the dominant
    # shuffle; guide §5 caching-for-reuse).
    c3 = tf3.groupBy("w1", "w2", "w3").agg(F.sum("tf").alias("c3")).persist()
    c2 = c3.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c2"),
        F.count(F.lit(1)).alias("n3f"),  # N1+(w1 w2 .)
    )
    # continuation statistics over the trigram TYPE table
    cc2 = c3.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).alias("cc2")  # N1+(. w2 w3)
    )
    mid = cc2.groupBy("w2").agg(
        F.sum("cc2").alias("mid"),  # N1+(. w2 .)
        F.count(F.lit(1)).alias("n2f"),  # N1+(w2 .)
    )
    # continuation unigram over the distinct-bigram table of the
    # corpus (last two positions of each trigram type)
    big = cc2.select("w2", "w3")
    prec = big.groupBy("w3").agg(F.count(F.lit(1)).alias("prec"))
    bt = big.agg(F.count(F.lit(1)).alias("bt"))

    D = F.lit(_KN_D)
    p1 = F.col("prec").cast("double") / F.col("bt").cast("double")
    p2 = (
        F.greatest(F.col("cc2").cast("double") - D, F.lit(0.0))
        / F.col("mid").cast("double")
        + (
            D
            * F.col("n2f").cast("double")
            / F.col("mid").cast("double")
        )
        * p1
    )
    p3 = (
        F.greatest(F.col("c3").cast("double") - D, F.lit(0.0))
        / F.col("c2").cast("double")
        + (
            D
            * F.col("n3f").cast("double")
            / F.col("c2").cast("double")
        )
        * p2
    )
    # r11: attach every statistic in TYPE space first (c3 is the
    # smallest frame that still carries all join keys), producing one
    # (w1, w2, w3) -> ln(p3) weight table, and join the per-doc tf3
    # frame ONCE — the old chain dragged the biggest frame (tf3)
    # through all five stat joins (guide §2.3: shuffle the lightweight
    # proxy, not the payload). ln(p3) is computed per TYPE from the
    # identical expression tree over identical integers, then
    # multiplied by tf per doc row — bit-identical terms.
    weight = (
        c3.join(c2, ["w1", "w2"])
        .join(cc2, ["w2", "w3"])
        .join(mid, "w2")
        .join(prec, "w3")
        .crossJoin(F.broadcast(bt))
        .select("w1", "w2", "w3", F.log(p3).alias("lp3"))
    )
    term = tf3.join(weight, ["w1", "w2", "w3"]).select(
        "doc_id",
        "tf",
        (F.col("tf") * F.col("lp3")).cast("decimal(28,12)").alias("t"),
    )
    return (
        term.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_trigrams"),
            F.sum("t").cast("double").alias("__tsum"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            F.round(
                F.col("__tsum") / F.col("n_trigrams").cast("double"), 6
            ).alias("avg_logprob"),
        )
    )


def kn_trigram_oracle_sql(
    table: str = "documents", text: str = "text", id_: str = "doc_id"
) -> str:
    """DuckDB mirror of :func:`kn_trigram_score` — same counts, same
    IEEE expression tree (doubles forced via CAST/e-notation so DuckDB
    never falls into DECIMAL arithmetic), same DECIMAL(28,12) term
    quantization, same final rounding."""
    return f"""
    WITH toks AS (
        SELECT {id_} AS doc_id, list_filter(string_split({text}, ' '),
               w -> w <> '') AS ts
        FROM {table}),
    tg AS (
        SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2, ts[i+2] AS w3
        FROM toks, unnest(range(1, len(ts) - 1)) AS t(i)),
    tf3 AS (
        SELECT doc_id, w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tg GROUP BY 1, 2, 3, 4),
    c3 AS (SELECT w1, w2, w3, CAST(SUM(tf) AS BIGINT) AS c3
           FROM tf3 GROUP BY 1, 2, 3),
    c2 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2,
                  CAST(COUNT(*) AS BIGINT) AS n3f
           FROM c3 GROUP BY 1, 2),
    cc2 AS (SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS cc2
            FROM c3 GROUP BY 1, 2),
    mid AS (SELECT w2, CAST(SUM(cc2) AS BIGINT) AS mid,
                   CAST(COUNT(*) AS BIGINT) AS n2f
            FROM cc2 GROUP BY 1),
    prec AS (SELECT w3, CAST(COUNT(*) AS BIGINT) AS prec
             FROM (SELECT w2, w3 FROM cc2) GROUP BY 1),
    bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM cc2),
    term AS (
        SELECT tf3.doc_id, tf3.tf,
               CAST(tf3.tf * ln(
                   greatest(CAST(c3.c3 AS DOUBLE) - 0.75e0, 0e0)
                       / CAST(c2.c2 AS DOUBLE)
                   + (0.75e0 * CAST(c2.n3f AS DOUBLE)
                      / CAST(c2.c2 AS DOUBLE))
                   * (greatest(CAST(cc2.cc2 AS DOUBLE) - 0.75e0, 0e0)
                          / CAST(mid.mid AS DOUBLE)
                      + (0.75e0 * CAST(mid.n2f AS DOUBLE)
                         / CAST(mid.mid AS DOUBLE))
                      * (CAST(prec.prec AS DOUBLE)
                         / CAST(bt.bt AS DOUBLE)))
               ) AS DECIMAL(28,12)) AS t
        FROM tf3
        JOIN c3 USING (w1, w2, w3)
        JOIN c2 USING (w1, w2)
        JOIN cc2 USING (w2, w3)
        JOIN mid USING (w2)
        JOIN prec USING (w3), bt)
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_trigrams,
           round(CAST(SUM(t) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE), 6)
               AS avg_logprob
    FROM term GROUP BY doc_id
    """


def bpe_learn_merges(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    return_vocab: bool = False,
) -> DataFrame:
    """Learn the first ``k`` BPE merges from the corpus (Sennrich
    2016 / GPT-2 tokenizer training), distributed the way industrial
    trainers do it: collapse the corpus to a word-frequency
    dictionary ONCE (the only text-sized shuffle), then iterate on
    the vocabulary — count adjacent symbol pairs weighted by word
    frequency, pick the most frequent pair (count desc, then
    lexicographic — fully deterministic), merge all non-overlapping
    occurrences left-to-right, repeat. Merges never cross word
    boundaries.

    Symbol sequences are encoded as ``||``-delimited strings
    (``'||h||u||g||'``), so applying a merge is one engine-native
    ``replace(s, '|a||b|', '|ab|')`` — left-to-right non-overlapping
    in both Spark and DuckDB, and boundary-safe because every symbol
    is delimiter-wrapped on both sides (assumes no ``|`` in the
    corpus; filtered defensively). The best pair is joined back as a
    broadcast single row — no driver collect; the whole loop is a
    lazy plan over vocabulary-sized frames.

    Returns (step, w1, w2, merged, cnt): the merge table in learned
    order with each pair's frequency at selection time. Fewer than
    ``k`` rows iff the vocabulary runs out of pairs.

    Integer counts and string ops only — no floats anywhere, so the
    gate is exact by construction.

    With ``return_vocab=True`` returns the POST-merge vocabulary
    instead: (w, s, wc) — each distinct word, its ``||``-delimited
    symbol string after all ``k`` merges, and its corpus frequency.
    Carrying ``w`` through the rounds changes nothing about merge
    selection (pair counts read only (s, wc)); it is what a
    downstream fertility/compression audit joins on.
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter("w <> '' AND w NOT LIKE '%|%'")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    # Per-round localCheckpoint (the graph.py iteration idiom):
    # ``best`` derives FROM ``v``, so ``v x broadcast(best)`` doubles
    # the logical plan every round — 2^k copies by round k, and the
    # analyzer OOMs long before any data does. Eager checkpointing
    # keeps each round's plan constant-size.
    carry = [F.col("w")] if return_vocab else []
    v = words.select(
        *carry,
        F.concat(
            F.lit("|"),
            F.regexp_replace("w", "(.)", r"|$1|"),
            F.lit("|"),
        ).alias("s"),
        "wc",
    ).localCheckpoint(eager=True)

    merges = []
    for step in range(1, k + 1):
        arr = v.select(
            F.expr(r"filter(split(s, '\\|\\|'), x -> x <> '')").alias("a"),
            "wc",
        )
        pairs = arr.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(a) >= 2 THEN "
                    "transform(sequence(1, size(a)-1),"
                    " i -> struct(a[i-1] AS w1, a[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("p"),
            "wc",
        )
        pcnt = (
            pairs.select("p.w1", "p.w2", "wc")
            .groupBy("w1", "w2")
            .agg(F.sum("wc").alias("cnt"))
        )
        best = (
            pcnt.orderBy(F.col("cnt").desc(), "w1", "w2")
            .limit(1)
            .select(
                F.lit(step).cast("int").alias("step"),
                "w1",
                "w2",
                F.concat("w1", "w2").alias("merged"),
                F.col("cnt").cast("bigint").alias("cnt"),
            )
            .localCheckpoint(eager=True)
        )
        merges.append(best)
        v = (
            v.crossJoin(F.broadcast(best.select("w1", "w2", "merged")))
            .select(
                *carry,
                F.expr(
                    "replace(s, concat('|', w1, '||', w2, '|'),"
                    " concat('|', merged, '|'))"
                ).alias("s"),
                "wc",
            )
            .localCheckpoint(eager=True)
        )
    if return_vocab:
        return v
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def _bpe_chain_sql(
    k: int, table: str, text: str, carry_w: bool = False
) -> str:
    """Shared CTE chain for the BPE oracles: w0 (word counts), v0
    (char-split encoding), then k rounds of (p{i} pair-count, b{i}
    top-1 merge, v{i} replace). ``carry_w`` threads the original
    word through every v{i} for vocab-consuming finals."""
    wsel = "w, " if carry_w else ""
    parts = [
        f"""
    WITH w0 AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM (
            SELECT unnest(list_filter(string_split({text}, ' '),
                          x -> x <> '' AND x NOT LIKE '%|%')) AS w
            FROM {table}) GROUP BY 1),
    v0 AS (
        SELECT {wsel}concat('|', regexp_replace(w, '(.)', '|\\1|', 'g'),
                      '|') AS s, wc
        FROM w0)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
    p{i} AS (
        SELECT a[i] AS w1, a[i+1] AS w2,
               CAST(SUM(wc) AS BIGINT) AS cnt
        FROM (SELECT list_filter(string_split(s, '||'),
                                 x -> x <> '') AS a, wc
              FROM v{i - 1}),
             unnest(range(1, len(a))) AS t(i)
        GROUP BY 1, 2),
    b{i} AS (
        SELECT CAST({i} AS INT) AS step, w1, w2,
               concat(w1, w2) AS merged, cnt
        FROM p{i} ORDER BY cnt DESC, w1, w2 LIMIT 1),
    v{i} AS (
        SELECT {wsel}replace(s, concat('|', b.w1, '||', b.w2, '|'),
                       concat('|', b.merged, '|')) AS s, wc
        FROM v{i - 1}, b{i} b)"""
        )
    return "".join(parts)


def bpe_learn_oracle_sql(
    k: int = 8, table: str = "documents", text: str = "text"
) -> str:
    """DuckDB mirror of :func:`bpe_learn_merges`: the k greedy
    rounds unrolled as a CTE chain (pair-count -> top-1 -> replace),
    same encoding, same tiebreak."""
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM b{i}" for i in range(1, k + 1)
    )
    return _bpe_chain_sql(k, table, text) + f"\n    {union}"


# Default blocklist for the gate queries: drawn from the synthetic
# corpus vocabulary so matches actually occur, plus one absent phrase
# ("drop table") proving the non-match path. Real deployments pass the
# C4/CCNet bad-words list (~400 terms) — same plan shape.
DEFAULT_BLOCKLIST: tuple[str, ...] = (
    "slow join",
    "dup",
    "big data",
    "drop table",
)


def blocklist_matches(
    df: DataFrame,
    terms: tuple[str, ...] = DEFAULT_BLOCKLIST,
    text_col: str = "text",
) -> DataFrame:
    """C4-style blocklist filter: for every document, which blocked
    words/phrases occur on whitespace-token boundaries (C4 drops any
    page containing a "bad words" list entry; RefinedWeb keeps the
    doc but logs the hit for auditing — this returns the audit form,
    callers drop with ``.filter(~F.col("blocked"))``).

    Matching rule: the space-padded text contains ``' ' + term + ' '``
    — exact token-boundary phrase match, multi-word terms included,
    no regex (a 400-term regex alternation backtracks; 400 substring
    probes stay linear and engines disagree on regex dialects anyway).

    Scale shape: the term list compiles into ONE higher-order
    ``filter`` expression over an array literal — pure whole-stage
    codegen, zero shuffles, zero joins; at 100 TB it rides the scan
    that already reads the text column. This is the right plan while
    the list is bounded (C4's is ~400); for 100k+ term dictionaries
    switch to tokenize + broadcast semi-join on the term's rarest
    word, then verify the full phrase (the PPJoin-style prefix filter
    in dedup.py is that plan's blueprint).

    Returns (all input columns, matched array<string> in ``terms``
    order, n_blocked, blocked).
    """
    if not terms:
        raise ValueError("blocklist_matches: empty term list")
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    matched = F.filter(
        F.array(*[F.lit(t) for t in terms]),
        lambda t: padded.contains(F.concat(F.lit(" "), t, F.lit(" "))),
    )
    return df.select(
        *df.columns,
        matched.alias("matched"),
        F.size(matched).cast("int").alias("n_blocked"),
        (F.size(matched) > 0).alias("blocked"),
    )


def blocklist_matches_sql(
    text_expr: str, terms: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> str:
    """DuckDB mirror of :func:`blocklist_matches`'s ``matched`` array
    (same term order, same space-padded token-boundary contains)."""
    lits = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return (
        f"list_filter([{lits}], t -> contains(' ' || {text_expr} || ' ',"
        " ' ' || t || ' '))"
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_support: int = 5,
) -> DataFrame:
    """Collocation mining by pointwise mutual information over
    adjacent word pairs (Church-Hanks 1990; the phrase-detection
    statistic word2vec's phrase pass and every tokenizer-prep
    pipeline use): PMI(w1,w2) = log2( p(w1,w2) / (p(w1)·p(w2)) )
    with p(w1,w2) = c12/N_bigrams and p(w) = c(w)/N_unigrams.
    q128's basket pairs rank by raw support, which just surfaces
    frequent words; PMI normalizes by the marginals so "slow join"
    outranks "the the".

    Scale shape: bigrams come from a row-local ``arrays_zip`` of the
    token array against itself shifted by one — no self-join, no
    window; then ONE hash aggregate onto distinct-bigram cells
    (vocab², but Zipf-truncated by ``min_support``), and the unigram
    margins are vocab-sized broadcast joins. Total-count scalars ride
    a broadcast cross join. At 100 TB nothing here is corpus-sized
    after the first aggregate.

    Cross-engine exactness: counts are BIGINT; each PMI is one
    double log2 of a ratio of exact integers, quantized to
    DECIMAL(28,12) and rounded to 6 — the module-wide quantized-log
    rule (see mutual_information). Returns (w1, w2, c12, c1, c2,
    pmi) for pairs with ``c12 >= min_support``.
    """
    toks = df.select(
        F.expr(
            f"filter(split({text_col}, ' '), x -> x <> '')"
        ).alias("a")
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(a) >= 2 THEN "
                "transform(sequence(1, size(a)-1),"
                " i -> struct(a[i-1] AS w1, a[i] AS w2)) "
                "ELSE array() END"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cells = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .filter(F.col("c12") >= min_support)
    )
    uni = (
        toks.select(F.explode("a").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    nb = bigrams.agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    nu = uni.agg(F.sum("c").cast("bigint").alias("nu"))
    return (
        cells.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(
                F.expr(
                    "CAST(LOG2((CAST(c12 AS DOUBLE) / CAST(nb AS DOUBLE))"
                    " / ((CAST(c1 AS DOUBLE) / CAST(nu AS DOUBLE))"
                    "    * (CAST(c2 AS DOUBLE) / CAST(nu AS DOUBLE))))"
                    " AS DECIMAL(28,12))"
                ).cast("double"),
                6,
            ).alias("pmi"),
        )
    )


def pmi_collocations_sql(
    table: str = "documents",
    text_col: str = "text",
    min_support: int = 5,
) -> str:
    """DuckDB mirror of :func:`pmi_collocations`."""
    return f"""
    WITH toks AS (
        SELECT list_filter(string_split({text_col}, ' '),
                           x -> x <> '') AS a
        FROM {table}),
    bigrams AS (
        SELECT a[i] AS w1, a[i + 1] AS w2
        FROM toks, unnest(range(1, len(a))) AS t(i)),
    cells AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bigrams GROUP BY 1, 2
        HAVING COUNT(*) >= {min_support}),
    uni AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(a) AS w FROM toks) GROUP BY 1),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bigrams),
    nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uni)
    SELECT c.w1, c.w2, c.c12, u1.c AS c1, u2.c AS c2,
           round(CAST(CAST(
               log2((CAST(c.c12 AS DOUBLE) / CAST(nb.nb AS DOUBLE))
                    / ((CAST(u1.c AS DOUBLE) / CAST(nu.nu AS DOUBLE))
                       * (CAST(u2.c AS DOUBLE) / CAST(nu.nu AS DOUBLE))))
               AS DECIMAL(28,12)) AS DOUBLE), 6) AS pmi
    FROM cells c
    JOIN uni u1 ON u1.w = c.w1
    JOIN uni u2 ON u2.w = c.w2, nb, nu"""


def tokenizer_fertility(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility audit: train the first ``k`` BPE merges on
    the whole corpus (:func:`bpe_learn_merges`), then measure how the
    learned tokenizer compresses each language/group — fertility =
    tokens per word, plus chars per token. The standard multilingual-
    tokenizer health check (a language with fertility ≫ others is
    under-served by the merge table and will pay more sequence
    positions per sentence; cf. the fertility tables in the XLM-R /
    NLLB tokenizer analyses).

    Scale shape: the corpus collapses to per-(group, word) counts —
    the only text-sized shuffle; the trained vocabulary (w → symbol
    count after k merges) is vocab-sized and joins back as a
    BROADCAST. Integer sums per group; two double divisions at the
    end. Exact by construction.

    Returns (group, words, tokens, chars, fertility, chars_per_token).
    """
    vocab = bpe_learn_merges(
        df, k=k, text_col=text_col, return_vocab=True
    ).select(
        "w",
        F.expr(
            r"CAST(size(filter(split(s, '\\|\\|'), x -> x <> ''))"
            " AS BIGINT)"
        ).alias("n_tokens"),
        F.length("w").cast("bigint").alias("n_chars"),
    )
    wl = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .filter("w <> '' AND w NOT LIKE '%|%'")
        .groupBy("grp", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )
    return (
        wl.join(F.broadcast(vocab), "w")
        .groupBy("grp")
        .agg(
            F.sum("wc").cast("bigint").alias("words"),
            F.sum(F.col("wc") * F.col("n_tokens"))
            .cast("bigint")
            .alias("tokens"),
            F.sum(F.col("wc") * F.col("n_chars"))
            .cast("bigint")
            .alias("chars"),
        )
        .select(
            F.col("grp").alias(group_col),
            "words",
            "tokens",
            "chars",
            (F.col("tokens").cast("double") / F.col("words").cast("double"))
            .alias("fertility"),
            (F.col("chars").cast("double") / F.col("tokens").cast("double"))
            .alias("chars_per_token"),
        )
    )


def tokenizer_fertility_oracle_sql(
    k: int = 8,
    table: str = "documents",
    text: str = "text",
    group: str = "lang",
) -> str:
    """DuckDB mirror of :func:`tokenizer_fertility` (same merge
    chain via :func:`_bpe_chain_sql` with the word carried, same
    integer rollup)."""
    return (
        _bpe_chain_sql(k, table, text, carry_w=True)
        + f""",
    nt AS (
        SELECT w,
               CAST(len(list_filter(string_split(s, '||'),
                        x -> x <> '')) AS BIGINT) AS n_tokens,
               CAST(length(w) AS BIGINT) AS n_chars
        FROM v{k}),
    wl AS (
        SELECT grp, w, CAST(COUNT(*) AS BIGINT) AS wc FROM (
            SELECT {group} AS grp,
                   unnest(list_filter(string_split({text}, ' '),
                          x -> x <> '' AND x NOT LIKE '%|%')) AS w
            FROM {table}) GROUP BY 1, 2),
    agg AS (
        SELECT grp, CAST(SUM(wc) AS BIGINT) AS words,
               CAST(SUM(wc * n_tokens) AS BIGINT) AS tokens,
               CAST(SUM(wc * n_chars) AS BIGINT) AS chars
        FROM wl JOIN nt USING (w) GROUP BY 1)
    SELECT grp AS {group}, words, tokens, chars,
           CAST(tokens AS DOUBLE) / CAST(words AS DOUBLE) AS fertility,
           CAST(chars AS DOUBLE) / CAST(tokens AS DOUBLE)
               AS chars_per_token
    FROM agg"""
    )


def source_js_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k_tokens: int = 200,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between the unigram
    distributions of corpus groups — the "which sources are
    distributionally close" audit that drives mixing decisions
    (merging near-identical sources distorts q173/q185's balancing;
    JS is the symmetric, bounded [0,1] companion to q117's numeric
    PSI and q168's categorical MI). JS(A,B) = ½KL(A‖M) + ½KL(B‖M),
    M = (A+B)/2.

    Vocabulary is capped to the ``top_k_tokens`` tokens by GLOBAL
    document frequency (the standard estimator truncation): the
    (group × vocab) probability grid is then bounded — |groups|·k
    rows — whatever the corpus size, and missing cells densify to 0
    via the grid join (a token absent from one side still contributes
    ½·p·log2(2) mass through M, which an inner join would drop).

    Cross-engine exactness: probabilities are single divisions of
    exact BIGINT counts; each JS term quantizes to DECIMAL(28,12)
    before the exact sum (the module's quantized-log rule), final
    round(6). Returns (src_a, src_b, js_bits) for src_a < src_b.
    """
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(
            F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")
        ).alias("w"),
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(top_k_tokens)
        .select("w")
    )
    counts = (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    totals = counts.groupBy("g").agg(F.sum("c").cast("bigint").alias("n"))
    groups = totals.select("g")
    grid = (
        groups.crossJoin(F.broadcast(vocab))
        .join(counts, ["g", "w"], "left")
        .join(F.broadcast(totals), "g")
        .select(
            "g",
            "w",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("n").cast("double")
            ).alias("p"),
        )
    )
    a, b = grid.alias("a"), grid.alias("b")
    pairs = a.join(
        b,
        (F.col("a.w") == F.col("b.w")) & (F.col("a.g") < F.col("b.g")),
    ).select(
        F.col("a.g").alias("src_a"),
        F.col("b.g").alias("src_b"),
        F.col("a.p").alias("pa"),
        F.col("b.p").alias("pb"),
    )
    term = (
        F.when(
            F.col("pa") > 0,
            F.col("pa")
            * F.log2(F.col("pa") / ((F.col("pa") + F.col("pb")) / 2)),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("pb") > 0,
            F.col("pb")
            * F.log2(F.col("pb") / ((F.col("pa") + F.col("pb")) / 2)),
        ).otherwise(F.lit(0.0))
    ) / 2
    return (
        pairs.select(
            "src_a",
            "src_b",
            F.round(term, 12).cast("decimal(28,12)").alias("t"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.round(F.sum("t").cast("double"), 6).alias("js_bits"))
    )


def source_js_divergence_sql(
    table: str = "documents",
    group: str = "source",
    text: str = "text",
    top_k_tokens: int = 200,
) -> str:
    """DuckDB mirror of :func:`source_js_divergence`."""
    return f"""
    WITH js_toks AS (
        SELECT {group} AS g,
               unnest(list_filter(string_split({text}, ' '),
                      x -> x <> '')) AS w
        FROM {table}),
    js_vocab AS (
        SELECT w FROM (
            SELECT w, COUNT(*) AS c FROM js_toks GROUP BY 1
            ORDER BY c DESC, w LIMIT {top_k_tokens})),
    js_counts AS (
        SELECT g, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM js_toks JOIN js_vocab USING (w) GROUP BY 1, 2),
    js_totals AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n
                  FROM js_counts GROUP BY 1),
    js_grid AS (
        SELECT t.g, v.w,
               CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(t.n AS DOUBLE)
                   AS p
        FROM js_totals t CROSS JOIN js_vocab v
        LEFT JOIN js_counts c ON c.g = t.g AND c.w = v.w),
    js_pairs AS (
        SELECT a.g AS src_a, b.g AS src_b, a.p AS pa, b.p AS pb
        FROM js_grid a JOIN js_grid b
          ON a.w = b.w AND a.g < b.g)
    SELECT src_a, src_b,
           round(CAST(SUM(CAST(round(
               (CASE WHEN pa > 0
                     THEN pa * log2(pa / ((pa + pb) / 2)) ELSE 0.0 END
                + CASE WHEN pb > 0
                       THEN pb * log2(pb / ((pa + pb) / 2))
                       ELSE 0.0 END) / 2, 12)
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS js_bits
    FROM js_pairs GROUP BY 1, 2"""


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 3,
) -> DataFrame:
    """Corpus-level exact line deduplication, keep-first-occurrence
    (the RefinedWeb / Dolma "exact line dedup" pass — Penedo et al.
    2023 §3.3): split each document into fixed-width lines of
    ``words_per_line`` whitespace tokens, keep only the globally
    FIRST occurrence of every line (ordered by ``(doc_id, pos)``),
    drop later copies, and reassemble each document from its
    surviving lines in order.

    Complements :func:`strip_boilerplate` (q164), which removes hot
    segments from EVERY document including the first: line dedup
    preserves exactly one copy of each line in the corpus, the
    contract LLM dedup pipelines want (no content is lost, only
    repetition).

    Scale shape: one narrow line explode, then a ``groupBy(line) →
    min(struct(doc_id, pos))`` winner aggregate — partial (map-side)
    aggregation absorbs hot boilerplate lines before the shuffle,
    which is why this is written as an agg rather than a
    ``row_number`` window (a window partition on a line duplicated
    millions of times is a straggler at 100 TB; the min-struct agg
    reduces it map-side). The winner rows ARE the kept rows — the
    min-struct carries the surviving ``(doc_id, pos)`` with it — so
    there is no join back onto the line stream, per-doc totals come
    straight from the document frame, and the corpus is exploded
    exactly once. Reassembly is sort_array over (pos, line)
    structs — no window.

    Returns (doc_id, n_lines, n_kept, clean_text); documents whose
    every line first appeared elsewhere come back with ``n_kept = 0``
    and an empty ``clean_text``.
    """
    k = int(words_per_line)
    ws = F.split(F.col(text_col), " ")
    n_ln = (F.size(ws) + F.lit(k - 1)).cast("bigint") / F.lit(k)
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.floor(n_ln).cast("int") - 1),
                lambda i: F.array_join(
                    F.slice(ws, i * k + 1, k), " "
                ),
            )
        ).alias("pos", "line"),
    )
    kept = (
        lines.groupBy("line")
        .agg(F.min(F.struct("doc_id", "pos")).alias("w"))
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.pos").alias("pos"),
            "line",
        )
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.floor(n_ln).cast("bigint").alias("n_lines"),
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, line))),"
                " x -> x.line)"
            ),
            " ",
        ).alias("clean_text"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias(
            "n_kept"
        ),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def line_dedup_sql(
    table_sql: str,
    id_: str = "doc_id",
    text: str = "text",
    words_per_line: int = 3,
) -> str:
    """DuckDB mirror of :func:`line_dedup` (same fixed-width line
    split, same ``(doc_id, pos)`` first-occurrence rule, expressed as
    the equivalent ``row_number`` window — engine-shape independence
    is the point of the cross check)."""
    k = int(words_per_line)
    return f"""
    WITH ld_w AS (
        SELECT {id_} AS doc_id, string_split({text}, ' ') AS ws
        FROM {table_sql}),
    ld_lines AS (
        SELECT doc_id, CAST(t.i AS INT) AS pos,
               array_to_string(ws[(t.i*{k}+1):(t.i*{k}+{k})], ' ')
                   AS line
        FROM ld_w,
             unnest(range((len(ws) + {k - 1}) // {k})) AS t(i)),
    ld_rk AS (
        SELECT doc_id, pos, line,
               row_number() OVER (PARTITION BY line
                                  ORDER BY doc_id, pos) AS rn
        FROM ld_lines),
    ld_tot AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM ld_lines GROUP BY 1),
    ld_kept AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(line, ' ' ORDER BY pos) AS clean_text
        FROM ld_rk WHERE rn = 1 GROUP BY 1)
    SELECT t.doc_id, t.n_lines,
           COALESCE(kp.n_kept, 0) AS n_kept,
           COALESCE(kp.clean_text, '') AS clean_text
    FROM ld_tot t LEFT JOIN ld_kept kp USING (doc_id)"""


# --------------------------------------------------------------------
# Multinomial Naive Bayes text classifier (train + confusion matrix)
# --------------------------------------------------------------------

def naive_bayes_confusion(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_buckets: int = 8,
    buckets: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Train a multinomial Naive Bayes classifier (Laplace-smoothed;
    McCallum & Nigam 1998) on a deterministic hash split of the
    corpus and return the held-out confusion matrix.

    Split: md5 bucket of the doc id; buckets < ``train_buckets``
    train, the rest test (the repo-wide leakage-safe idiom). Model:
    ``logP(w|c) = ln((count_wc + 1) / (tokens_c + V))`` over
    lowercase whitespace tokens, priors ``ln(docs_c / docs)``.
    Scoring drops tokens outside the training vocabulary (standard
    multinomial NB practice) and argmaxes
    ``prior_c + sum_tokens logP(w|c)``.

    Determinism: every log term is ``round(ln(...), 12)`` summed as
    exact DECIMAL(38,12) — libm ULP differences sit ~1e-16, four
    decades below the grid, and decimal accumulation is
    order-independent. Argmax ties break on the smaller class name.

    Scale shape: the model is one (word, class)-keyed aggregate; the
    per-class score join fans each test token out |C| times (|C| =
    #labels, single digits) and reduces map-side; no window over the
    corpus, no driver-side loop. Returns
    (true_label, pred_label, n_docs).
    """
    from .sampling import hash_bucket

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        F.col(text_col).alias("text"),
        (hash_bucket(F.col(id_col), seed=seed, buckets=buckets)
         < train_buckets).alias("is_train"),
    )
    toks = base.select(
        "doc_id",
        "label",
        "is_train",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
            )
        ).alias("word"),
    )
    train = toks.filter("is_train")
    # class totals: token mass and doc counts
    cls = train.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("tok_c")
    )
    docs_c = (
        base.filter("is_train")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("docs_c"))
    )
    vocab_n = train.select("word").distinct().count()
    total_train_docs = base.filter("is_train").count()
    wc = train.groupBy("word", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # dense (word x class) log-prob grid: every train word gets a row
    # per class so absent (w, c) pairs still contribute the smoothed
    # ln(1 / (tok_c + V)) mass
    grid = (
        wc.select("word").distinct()
        .crossJoin(F.broadcast(cls))
        .join(wc, ["word", "label"], "left")
        .select(
            "word",
            "label",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                    / (F.col("tok_c") + F.lit(vocab_n)).cast("double")
                ),
                12,
            )
            .cast("decimal(38,12)")
            .alias("logp"),
        )
    )
    prior = docs_c.select(
        "label",
        F.round(
            F.log(
                F.col("docs_c").cast("double") / F.lit(float(total_train_docs))
            ),
            12,
        )
        .cast("decimal(38,12)")
        .alias("logprior"),
    )
    test_toks = toks.filter(~F.col("is_train")).select(
        "doc_id", F.col("label").alias("true_label"), "word"
    )
    scores = (
        test_toks.join(
            grid.withColumnRenamed("label", "cand"), "word"
        )
        .groupBy("doc_id", "true_label", "cand")
        .agg(F.sum("logp").alias("ll"))
        .join(F.broadcast(prior.withColumnRenamed("label", "cand")), "cand")
        .select(
            "doc_id",
            "true_label",
            "cand",
            (F.col("ll") + F.col("logprior")).alias("score"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), F.col("cand").asc()
        )
    )
    pred = (
        scores.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("true_label", F.col("cand").alias("pred_label"))
    )
    return pred.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def naive_bayes_oracle_sql(
    docs_sql: str,
    label: str = "lang",
    text: str = "text",
    id_: str = "doc_id",
    train_buckets: int = 8,
    buckets: int = 10,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`naive_bayes_confusion`."""
    from .sampling import hash_bucket_sql

    bkt = hash_bucket_sql(id_, seed=seed, buckets=buckets)
    return f"""
    WITH nb_base AS (
        SELECT {id_} AS doc_id, {label} AS label, {text} AS text,
               {bkt} < {int(train_buckets)} AS is_train
        FROM ({docs_sql})),
    nb_tok AS (
        SELECT doc_id, label, is_train, t.word
        FROM nb_base,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                w -> w <> '')) AS t(word)),
    nb_cls AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS tok_c
        FROM nb_tok WHERE is_train GROUP BY 1),
    nb_docs AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS docs_c
        FROM nb_base WHERE is_train GROUP BY 1),
    nb_v AS (
        SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v,
               (SELECT COUNT(*) FROM nb_base WHERE is_train) AS nd
        FROM nb_tok WHERE is_train),
    nb_wc AS (
        SELECT word, label, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM nb_tok WHERE is_train GROUP BY 1, 2),
    nb_grid AS (
        SELECT w.word, c.label,
               CAST(round(ln(CAST(COALESCE(wc.cnt, 0) + 1 AS DOUBLE)
                             / CAST(c.tok_c + nb_v.v AS DOUBLE)), 12)
                    AS DECIMAL(38,12)) AS logp
        FROM (SELECT DISTINCT word FROM nb_wc) w
        CROSS JOIN nb_cls c
        CROSS JOIN nb_v
        LEFT JOIN nb_wc wc ON wc.word = w.word AND wc.label = c.label),
    nb_prior AS (
        SELECT d.label,
               CAST(round(ln(CAST(d.docs_c AS DOUBLE)
                             / CAST(nb_v.nd AS DOUBLE)), 12)
                    AS DECIMAL(38,12)) AS logprior
        FROM nb_docs d CROSS JOIN nb_v),
    nb_sc AS (
        SELECT t.doc_id, t.label AS true_label, g.label AS cand,
               SUM(g.logp) + ANY_VALUE(p.logprior) AS score
        FROM nb_tok t
        JOIN nb_grid g ON g.word = t.word
        JOIN nb_prior p ON p.label = g.label
        WHERE NOT t.is_train
        GROUP BY 1, 2, 3),
    nb_pred AS (
        SELECT true_label, cand AS pred_label,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand ASC) AS rn
        FROM nb_sc)
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM nb_pred WHERE rn = 1
    GROUP BY 1, 2"""


# --------------------------------------------------------------------
# Topic segmentation: TextTiling-style block-similarity valleys
# --------------------------------------------------------------------

def topic_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_tokens: int = 30,
) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst CL 1997, the
    block-comparison variant): split each document into fixed
    ``block_tokens``-token blocks, measure the Jaccard similarity of
    adjacent blocks' token SETS, and call a block gap a topic
    boundary when its similarity falls more than one standard
    deviation below the document's mean gap similarity (Hearst's
    depth-score cutoff, simplified to the per-document z-rule so
    the whole pass stays closed-form).

    Determinism: Jaccard is an integer ratio rounded to 6; the
    mean/std gate uses exact decimal sums of the rounded sims
    (variance via (n*sumsq - sum^2), sqrt on identical doubles).
    Scale shape: one explode to (doc, block, token) distinct, one
    self-join shifted by block+1 keyed on (doc, token) — bounded by
    block vocabulary, never corpus^2 — then two doc-keyed
    aggregates. Docs with < 3 blocks emit no row (no gap
    statistics to speak of). Returns (doc_id, n_blocks, n_gaps,
    mean_sim, n_boundaries).
    """
    k = int(block_tokens)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("pos", "tok"),
    ).select(
        "doc_id", (F.col("pos") / k).cast("int").alias("blk"), "tok"
    ).distinct()
    sizes = toks.groupBy("doc_id", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    nblk = sizes.groupBy("doc_id").agg(
        F.max("blk").alias("max_blk"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.blk") == F.col("a.blk") + 1)
            & (F.col("a.tok") == F.col("b.tok")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"), F.col("a.blk").alias("blk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    sa = sizes.select("doc_id", "blk", F.col("sz").alias("sz_a"))
    sb = sizes.select(
        "doc_id", (F.col("blk") - 1).alias("blk"), F.col("sz").alias("sz_b")
    )
    gaps = (
        sa.join(sb, ["doc_id", "blk"])
        .join(inter, ["doc_id", "blk"], "left")
        .select(
            "doc_id",
            "blk",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (
                    F.col("sz_a") + F.col("sz_b")
                    - F.coalesce(F.col("inter"), F.lit(0))
                ).cast("double"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("sim"),
        )
    )
    stats = gaps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("sim").alias("ssum"),
        F.sum(F.expr("sim * sim")).alias("ssq"),
    ).filter(F.col("n_gaps") >= 2)
    gated = gaps.join(stats, "doc_id").select(
        "doc_id",
        "n_gaps",
        "ssum",
        (
            F.col("sim").cast("double")
            < F.col("ssum").cast("double") / F.col("n_gaps").cast("double")
            - F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    (
                        F.col("n_gaps").cast("double")
                        * F.col("ssq").cast("double")
                        - F.col("ssum").cast("double")
                        * F.col("ssum").cast("double")
                    )
                    / (
                        F.col("n_gaps").cast("double")
                        * (F.col("n_gaps") - 1).cast("double")
                    ),
                )
            )
        )
        .cast("int")
        .alias("is_b"),
    )
    # mean_sim on the exact integer micro-grid: ssum is an exact
    # 6-dp decimal, so round-half-up of ssum/n is pure BIGINT math —
    # a double round() here would split engines on .5-ULP ties
    agg = gated.groupBy("doc_id", "n_gaps").agg(
        (
            F.expr(
                "(2 * CAST(first(ssum) * 1000000 AS BIGINT) + n_gaps)"
                " DIV (2 * n_gaps)"
            ).cast("double")
            / F.lit(1e6)
        ).alias("mean_sim"),
        F.sum("is_b").cast("bigint").alias("n_boundaries"),
    )
    return (
        nblk.join(agg, "doc_id")
        .select(
            "doc_id",
            "n_blocks",
            "n_gaps",
            "mean_sim",
            "n_boundaries",
        )
    )


def topic_segments_sql(
    table_sql: str,
    id_: str = "doc_id",
    text: str = "text",
    block_tokens: int = 30,
) -> str:
    """DuckDB mirror of :func:`topic_segments`."""
    k = int(block_tokens)
    return f"""
    WITH tsg_l AS (
        SELECT {id_} AS doc_id,
               list_filter(string_split_regex(lower({text}), '\\s+'),
                           w -> w <> '') AS lst
        FROM {table_sql}),
    tsg_tok AS (
        SELECT DISTINCT doc_id,
               CAST(t.i // {k} AS INTEGER) AS blk,
               lst[CAST(t.i AS INTEGER) + 1] AS tok
        FROM tsg_l, unnest(range(len(lst))) AS t(i)),
    tsg_sz AS (
        SELECT doc_id, blk, CAST(COUNT(*) AS BIGINT) AS sz
        FROM tsg_tok GROUP BY 1, 2),
    tsg_nb AS (
        SELECT doc_id, MAX(blk) AS max_blk,
               CAST(COUNT(*) AS BIGINT) AS n_blocks
        FROM tsg_sz GROUP BY 1),
    tsg_i AS (
        SELECT a.doc_id, a.blk, CAST(COUNT(*) AS BIGINT) AS inter
        FROM tsg_tok a JOIN tsg_tok b
          ON b.doc_id = a.doc_id AND b.blk = a.blk + 1 AND b.tok = a.tok
        GROUP BY 1, 2),
    tsg_g AS (
        SELECT sa.doc_id, sa.blk,
               CAST(round(CAST(COALESCE(i.inter, 0) AS DOUBLE)
                          / CAST(sa.sz + sb.sz - COALESCE(i.inter, 0)
                                 AS DOUBLE), 6) AS DECIMAL(18,6)) AS sim
        FROM tsg_sz sa
        JOIN tsg_sz sb ON sb.doc_id = sa.doc_id AND sb.blk = sa.blk + 1
        LEFT JOIN tsg_i i ON i.doc_id = sa.doc_id AND i.blk = sa.blk),
    tsg_s AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               SUM(sim) AS ssum, SUM(sim * sim) AS ssq
        FROM tsg_g GROUP BY 1
        HAVING COUNT(*) >= 2),
    tsg_b AS (
        SELECT g.doc_id, s.n_gaps, s.ssum,
               CASE WHEN CAST(g.sim AS DOUBLE)
                         < CAST(s.ssum AS DOUBLE) / CAST(s.n_gaps AS DOUBLE)
                           - sqrt(greatest(0.0,
                               (CAST(s.n_gaps AS DOUBLE)
                                * CAST(s.ssq AS DOUBLE)
                                - CAST(s.ssum AS DOUBLE)
                                * CAST(s.ssum AS DOUBLE))
                               / (CAST(s.n_gaps AS DOUBLE)
                                  * CAST(s.n_gaps - 1 AS DOUBLE))))
                    THEN 1 ELSE 0 END AS is_b
        FROM tsg_g g JOIN tsg_s s USING (doc_id)),
    tsg_a AS (
        SELECT doc_id, n_gaps,
               CAST((2 * CAST(ANY_VALUE(ssum) * 1000000 AS BIGINT) + n_gaps)
                    // (2 * n_gaps) AS DOUBLE) / 1000000.0 AS mean_sim,
               CAST(SUM(is_b) AS BIGINT) AS n_boundaries
        FROM tsg_b GROUP BY 1, 2)
    SELECT nb.doc_id, nb.n_blocks, a.n_gaps, a.mean_sim, a.n_boundaries
    FROM tsg_nb nb JOIN tsg_a a USING (doc_id)"""


# --------------------------------------------------------------------
# Vocabulary coverage: Chao1 richness from frequency-of-frequencies
# --------------------------------------------------------------------

def chao1_vocab(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = "lang",
) -> DataFrame:
    """Chao1 species-richness estimate of the UNSEEN vocabulary
    (Chao 1984; the capture-recapture bound ecologists use, applied
    to tokens): from the frequency-of-frequencies alone —
    ``F1`` singletons, ``F2`` doubletons, ``V`` observed types —
    the total vocabulary is at least ``V + F1^2 / (2 F2)``
    (``V + F1(F1-1)/2`` when F2 = 0, the bias-corrected form). The
    sampling-adequacy number a corpus team reads before claiming
    "we've seen the language": coverage = V / chao1.

    Two narrow aggregates — token counts, then counts-of-counts —
    and a 4-value closed form per group; the integer moments make
    the estimate portable (one divide, round 2; coverage round 6).
    Returns (grp, n_tokens, vocab, f1, f2, chao1, coverage).
    """
    toks = df.select(
        (F.col(group_col) if group_col else F.lit("all")).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("word"),
    )
    wc = toks.groupBy("grp", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    fof = wc.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    chao = F.when(
        F.col("f2") > 0,
        F.col("vocab").cast("double")
        + F.col("f1").cast("double") * F.col("f1").cast("double")
        / (F.lit(2.0) * F.col("f2").cast("double")),
    ).otherwise(
        F.col("vocab").cast("double")
        + F.col("f1").cast("double") * (F.col("f1") - 1).cast("double")
        / F.lit(2.0)
    )
    return fof.select(
        "grp",
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        F.round(chao, 2).alias("chao1"),
        F.round(F.col("vocab").cast("double") / chao, 6).alias("coverage"),
    )


def chao1_vocab_sql(
    table_sql: str,
    text: str = "text",
    group: str | None = "lang",
) -> str:
    """DuckDB mirror of :func:`chao1_vocab`."""
    g = group if group else "'all'"
    return f"""
    WITH c1_t AS (
        SELECT {g} AS grp, t.word
        FROM {table_sql},
             unnest(list_filter(string_split_regex(lower({text}), '\\s+'),
                                w -> w <> '')) AS t(word)),
    c1_w AS (
        SELECT grp, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM c1_t GROUP BY 1, 2),
    c1_f AS (
        SELECT grp, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM c1_w GROUP BY 1),
    c1_c AS (
        SELECT *,
               CASE WHEN f2 > 0
                    THEN CAST(vocab AS DOUBLE)
                         + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
                           / (2.0 * CAST(f2 AS DOUBLE))
                    ELSE CAST(vocab AS DOUBLE)
                         + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE) / 2.0
               END AS ch
        FROM c1_f)
    SELECT grp, n_tokens, vocab, f1, f2,
           round(ch, 2) AS chao1,
           round(CAST(vocab AS DOUBLE) / ch, 6) AS coverage
    FROM c1_c"""


# --------------------------------------------------------------------
# RAKE keyphrase extraction (corpus-level)
# --------------------------------------------------------------------

RAKE_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "with", "is", "are", "was", "be", "by", "at", "as", "it", "that",
    "this", "from", "but", "not", "have", "has",
)


def rake_keyphrases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 50,
    max_phrase_words: int = 4,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010 "Automatic
    keyword extraction from individual documents"): candidate
    phrases are maximal stopword-free token runs; every content
    word scores ``degree/frequency`` (degree = summed lengths of
    the phrases it appears in), and a phrase scores the sum of its
    words' scores — multi-word phrases float up, which is exactly
    what the unigram TF-IDF pass (q126) cannot surface.

    Scale shape: phrase ids come from a cumulative stopword-break
    window PARTITIONED BY DOC (document-sized frames); word stats
    and phrase aggregation are two hash aggregates. Scores are
    exact integer ratios: phrase score = sum over member words of
    deg_w/freq_w — accumulated as round-9 decimals of per-word
    integer ratios. Phrases longer than ``max_phrase_words`` drop
    (RAKE's standard guard against run-on garbage). Returns the
    corpus top ``top_n``: (phrase, n_occur, score).
    """
    sw = F.array(*[F.lit(s) for s in RAKE_STOPWORDS])
    # punctuation BREAKS phrases (Rose 2010 splits candidates at
    # punctuation AND stopwords): segment on non-alnum runs first,
    # then break segments at stopwords
    segs = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9\s]+")
        ).alias("seg", "stext"),
    )
    toks = segs.select(
        "doc_id",
        "seg",
        F.posexplode(
            F.filter(F.split(F.col("stext"), r"\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    ).select(
        "doc_id",
        "seg",
        "pos",
        "tok",
        F.array_contains(sw, F.col("tok")).cast("int").alias("brk"),
    )
    wp = Window.partitionBy("doc_id", "seg").orderBy("pos")
    phrased = toks.select(
        "doc_id",
        F.col("seg"),
        "pos",
        "tok",
        "brk",
        F.sum("brk").over(
            wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("pid0"),
    ).filter(F.col("brk") == 0).select(
        "doc_id",
        "pos",
        "tok",
        F.concat_ws("_", F.col("seg"), F.col("pid0")).alias("pid"),
    )
    # collect_list gives no ordering guarantee — sort by pos structs
    # before joining tokens into the phrase (the q242 idiom)
    phrases = (
        phrased.groupBy("doc_id", "pid")
        .agg(
            F.count(F.lit(1)).cast("int").alias("plen"),
            F.array_join(
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, tok))),"
                    " x -> x.tok)"
                ),
                " ",
            ).alias("phrase"),
        )
        .filter(F.col("plen") <= max_phrase_words)
    )
    member = phrased.join(
        phrases.select("doc_id", "pid", "plen"), ["doc_id", "pid"]
    ).select("tok", "plen")
    wstats = member.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    wscore = wstats.select(
        "tok",
        F.round(
            F.col("deg").cast("double") / F.col("freq").cast("double"), 9
        )
        .cast("decimal(28,9)")
        .alias("ws"),
    )
    pscore = (
        phrased.join(phrases.select("doc_id", "pid"), ["doc_id", "pid"])
        .join(wscore, "tok")
        .groupBy("doc_id", "pid")
        .agg(F.sum("ws").alias("score"))
    )
    final = (
        phrases.join(pscore.select("doc_id", "pid", "score"), ["doc_id", "pid"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occur"),
            F.max(F.col("score").cast("double")).alias("score"),
        )
    )
    return (
        final.select(
            "phrase", "n_occur", F.round("score", 6).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("phrase").asc())
        .limit(int(top_n))
    )


def rake_oracle_sql(
    table_sql: str,
    id_: str = "doc_id",
    text: str = "text",
    top_n: int = 50,
    max_phrase_words: int = 4,
) -> str:
    """DuckDB mirror of :func:`rake_keyphrases`."""
    sw = ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)
    return f"""
    WITH rk_sg AS (
        SELECT {id_} AS doc_id, CAST(s.i AS INTEGER) AS seg,
               sl[CAST(s.i AS INTEGER) + 1] AS stext
        FROM (SELECT {id_}, string_split_regex(lower({text}),
                         '[^a-z0-9\\s]+') AS sl
              FROM {table_sql}) b,
             unnest(range(len(sl))) AS s(i)),
    rk_l AS (
        SELECT doc_id, seg,
               list_filter(string_split_regex(stext, '\\s+'),
                           w -> w <> '') AS lst
        FROM rk_sg),
    rk_t AS (
        SELECT doc_id, seg, CAST(t.i AS INTEGER) AS pos,
               lst[CAST(t.i AS INTEGER) + 1] AS tok,
               CASE WHEN lst[CAST(t.i AS INTEGER) + 1] IN ({sw})
                    THEN 1 ELSE 0 END AS brk
        FROM rk_l, unnest(range(len(lst))) AS t(i)),
    rk_p AS (
        SELECT doc_id, seg, tok, brk,
               SUM(brk) OVER (PARTITION BY doc_id, seg ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pid0,
               pos
        FROM rk_t),
    rk_c AS (
        SELECT doc_id, tok,
               CAST(seg AS VARCHAR) || '_' || CAST(pid0 AS VARCHAR) AS pid,
               pos
        FROM rk_p WHERE brk = 0),
    rk_ph AS (
        SELECT doc_id, pid, CAST(COUNT(*) AS INTEGER) AS plen,
               string_agg(tok, ' ' ORDER BY pos) AS phrase
        FROM rk_c GROUP BY 1, 2
        HAVING COUNT(*) <= {int(max_phrase_words)}),
    rk_m AS (
        SELECT c.tok, p.plen
        FROM rk_c c JOIN rk_ph p USING (doc_id, pid)),
    rk_w AS (
        SELECT tok,
               CAST(round(CAST(SUM(plen) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE), 9)
                    AS DECIMAL(28,9)) AS ws
        FROM rk_m GROUP BY 1),
    rk_ps AS (
        SELECT c.doc_id, c.pid, SUM(w.ws) AS score
        FROM rk_c c
        JOIN rk_ph p USING (doc_id, pid)
        JOIN rk_w w ON w.tok = c.tok
        GROUP BY 1, 2),
    rk_f AS (
        SELECT p.phrase, CAST(COUNT(*) AS BIGINT) AS n_occur,
               MAX(CAST(s.score AS DOUBLE)) AS score
        FROM rk_ph p JOIN rk_ps s USING (doc_id, pid)
        GROUP BY 1)
    SELECT phrase, n_occur, round(score, 6) AS score
    FROM rk_f
    ORDER BY score DESC, phrase ASC
    LIMIT {int(top_n)}"""


# --------------------------------------------------------------------
# Moore-Lewis cross-entropy data selection
# --------------------------------------------------------------------

def moore_lewis_select(
    df: DataFrame,
    in_domain_col,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 200,
) -> DataFrame:
    """Moore-Lewis intelligent data selection (Moore & Lewis ACL
    2010, the classic before DSIR): score every document by the
    per-token log-likelihood RATIO between an in-domain unigram LM
    and the out-of-domain complement model (the H_out - H_in
    cross-entropy difference in Moore-Lewis terms) and keep the top
    scorers: documents the in-domain model finds easy but the rest
    of the corpus finds surprising are the most in-domain-like.
    q219's DSIR resamples by hashed-ngram importance; this is the
    likelihood-ratio original.

    ``in_domain_col`` is a boolean Column marking the seed slice.
    Both LMs are Laplace-smoothed unigram counts over a SHARED
    vocabulary (all tokens), so the score is a sum of
    ``round(ln(p_in / p_gen), 12)`` per token — exact decimal
    accumulation; the (word -> log-ratio) model BROADCASTS back
    onto the token stream (vocab-sized by the unigram assumption;
    for a vocabulary too large to broadcast, drop the hint and the
    join falls back to shuffle), so the score pass never shuffles
    the corpus. Docs with no tokens drop. Returns the top
    ``top_n``: (doc_id, n_toks, ml_score) by (score desc, id).
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        in_domain_col.cast("int").alias("ind"),
    )
    toks = base.select(
        "doc_id",
        "ind",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
            )
        ).alias("word"),
    )
    # vocab-sized; checkpointed so the scalar-count action and the
    # log-ratio join both read state instead of re-exploding the
    # corpus (three scans -> two, measured 2x at the sf10 leg)
    wc = toks.groupBy("word").agg(
        F.sum("ind").cast("bigint").alias("c_in"),
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
    ).localCheckpoint(eager=True)
    tot = wc.agg(
        F.sum("c_in").cast("bigint").alias("t_in"),
        F.sum("c_all").cast("bigint").alias("t_all"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    ).collect()[0]
    t_in, t_all, v = tot["t_in"], tot["t_all"], tot["v"]
    lr = wc.select(
        "word",
        F.round(
            F.log(
                (F.col("c_in") + 1).cast("double") / F.lit(float(t_in + v))
            )
            - F.log(
                (F.col("c_all") - F.col("c_in") + 1).cast("double")
                / F.lit(float(t_all - t_in + v))
            ),
            12,
        )
        .cast("decimal(38,12)")
        .alias("llr"),
    )
    scored = (
        toks.join(F.broadcast(lr), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.sum("llr").alias("sllr"),
        )
        .select(
            "doc_id",
            "n_toks",
            F.round(
                F.col("sllr").cast("double") / F.col("n_toks").cast("double"),
                6,
            ).alias("ml_score"),
        )
    )
    return (
        scored.orderBy(F.col("ml_score").desc(), F.col("doc_id").asc())
        .limit(int(top_n))
    )


def moore_lewis_sql(
    table_sql: str,
    in_domain_pred: str,
    id_: str = "doc_id",
    text: str = "text",
    top_n: int = 200,
) -> str:
    """DuckDB mirror of :func:`moore_lewis_select`.
    ``in_domain_pred`` is a boolean SQL expression over the table's
    columns."""
    return f"""
    WITH ml_b AS (
        SELECT {id_} AS doc_id, {text} AS text,
               CASE WHEN {in_domain_pred} THEN 1 ELSE 0 END AS ind
        FROM {table_sql}),
    ml_t AS (
        SELECT doc_id, ind, t.word
        FROM ml_b,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                w -> w <> '')) AS t(word)),
    ml_w AS (
        SELECT word, CAST(SUM(ind) AS BIGINT) AS c_in,
               CAST(COUNT(*) AS BIGINT) AS c_all
        FROM ml_t GROUP BY 1),
    ml_g AS (
        SELECT CAST(SUM(c_in) AS BIGINT) AS t_in,
               CAST(SUM(c_all) AS BIGINT) AS t_all,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM ml_w),
    ml_lr AS (
        SELECT w.word,
               CAST(round(ln(CAST(w.c_in + 1 AS DOUBLE)
                             / CAST(g.t_in + g.v AS DOUBLE))
                          - ln(CAST(w.c_all - w.c_in + 1 AS DOUBLE)
                               / CAST(g.t_all - g.t_in + g.v AS DOUBLE)),
                          12) AS DECIMAL(38,12)) AS llr
        FROM ml_w w CROSS JOIN ml_g g),
    ml_s AS (
        SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
               SUM(l.llr) AS sllr
        FROM ml_t t JOIN ml_lr l USING (word)
        GROUP BY 1)
    SELECT doc_id, n_toks,
           round(CAST(sllr AS DOUBLE) / CAST(n_toks AS DOUBLE), 6)
               AS ml_score
    FROM ml_s
    ORDER BY ml_score DESC, doc_id ASC
    LIMIT {int(top_n)}"""
