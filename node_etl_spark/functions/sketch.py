"""KMV (k-minimum-values / bottom-k) set sketches.

Estimate distinct-set overlap between groups — "audience overlap"
(users shared by two event types, documents shared by two shingle
sources, ...) — without ever intersecting the full sets. Each group
keeps only its k smallest element hashes (Bar-Yossef et al. 2002;
Beyer et al. SIGMOD'07 for the unioned-sketch Jaccard estimator):

* building the sketch is one aggregation over (group, element) —
  at 100 TB a group's sketch is k rows regardless of its audience
  size, and sketches are mergeable (bottom-k of a union = bottom-k
  of merged bottom-k lists), so they roll up across partitions,
  days, or shards like q118's HLL state;
* a pairwise estimate touches only 2k sketch rows per pair:
  rank the union's hashes, keep the k smallest, and the fraction
  present in BOTH sketches estimates Jaccard.

Unlike the DataSketches HLL path (q118, rows-only check), the KMV
sketch is a pure deterministic function of the data — md5-derived
60-bit hashes, rank, count — so the whole estimator sits on the
EXACT cross-engine oracle gate; accuracy vs true Jaccard is pinned
separately in unit tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h60(col, seed: int):
    """Portable uniform 60-bit hash: first 15 hex chars of
    md5("<val>:<seed>") — identical in Spark and DuckDB."""
    h = F.md5(F.concat(col.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def _h60_sql(expr: str, seed: int) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR) || ':{seed}'),"
        f" 1, 15)) AS BIGINT)"
    )


def kmv_bottomk(
    df: DataFrame,
    group_col: str,
    element_col: str,
    k: int = 256,
    seed: int = 7,
) -> DataFrame:
    """Per-group bottom-k element-hash sketch: (group, h) rows, at
    most ``k`` per group — the mergeable KMV state."""
    hashed = df.select(
        F.col(group_col).alias("g"),
        _h60(F.col(element_col), seed).alias("h"),
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "h")
    )


def kmv_jaccard(
    df: DataFrame,
    group_col: str,
    element_col: str,
    k: int = 256,
    seed: int = 7,
) -> DataFrame:
    """Estimated Jaccard overlap for every group pair (g1 < g2).

    For a pair, the k smallest hashes of the UNION of both sketches
    form an implicit uniform sample of the union; the fraction also
    present in both groups estimates ``|A∩B| / |A∪B|``. Join volume
    is |pairs| x 2k sketch rows — independent of audience sizes.
    Returns (g1, g2, est_jaccard, k_used).
    """
    # the sketch feeds pair construction and both union sides; it is
    # groups x k rows — eagerly checkpointing it (tiny, lineage
    # truncated) saves three recomputations of the corpus-sized
    # hash/rank aggregation WITHOUT leaving an unreleased persist
    # handle behind for the life of the session
    bk = kmv_bottomk(df, group_col, element_col, k=k, seed=seed).localCheckpoint(
        eager=True
    )
    # explicit pair construction: groups are dimension-sized (the
    # sketch exists precisely because ELEMENTS are not)
    groups = bk.select("g").distinct()
    pairs = (
        groups.alias("x")
        .join(groups.alias("y"), F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("g1"), F.col("y.g").alias("g2"))
    )
    left = pairs.join(bk.withColumnRenamed("g", "g1"), "g1").select(
        "g1", "g2", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    right = pairs.join(bk.withColumnRenamed("g", "g2"), "g2").select(
        "g1", "g2", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    union = (
        left.unionByName(right)
        .groupBy("g1", "g2", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g1", "g2").orderBy("h")
    topk = union.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return topk.groupBy("g1", "g2").agg(
        F.expr(
            "CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
        ).alias("est_jaccard"),
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
    )


def kmv_jaccard_oracle_sql(
    table: str,
    group_col: str,
    element_col: str,
    k: int = 256,
    seed: int = 7,
) -> str:
    """DuckDB mirror of :func:`kmv_jaccard` (same hash, same ranks,
    same estimator arithmetic)."""
    h = _h60_sql(element_col, seed)
    return f"""
    WITH hashed AS (
        SELECT DISTINCT {group_col} AS g, {h} AS h FROM {table}),
    bk AS (
        SELECT g, h FROM (
            SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM hashed) WHERE rn <= {k}),
    pairs AS (
        SELECT x.g AS g1, y.g AS g2
        FROM (SELECT DISTINCT g FROM bk) x
        JOIN (SELECT DISTINCT g FROM bk) y ON x.g < y.g),
    uni AS (
        SELECT g1, g2, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
            SELECT p.g1, p.g2, s.h, 1 AS in_a, 0 AS in_b
            FROM pairs p JOIN bk s ON s.g = p.g1
            UNION ALL
            SELECT p.g1, p.g2, s.h, 0 AS in_a, 1 AS in_b
            FROM pairs p JOIN bk s ON s.g = p.g2)
        GROUP BY 1, 2, 3),
    topk AS (
        SELECT * FROM (
            SELECT g1, g2, in_a, in_b,
                   row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
            FROM uni) WHERE rn <= {k})
    SELECT g1, g2,
           CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS est_jaccard,
           CAST(COUNT(*) AS BIGINT) AS k_used
    FROM topk GROUP BY g1, g2
    """


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    element_col: str,
    k: int = 256,
    seed: int = 7,
) -> DataFrame:
    """Per-group distinct-count estimation from the same bottom-k
    state as :func:`kmv_jaccard`: with k uniform 60-bit hashes, the
    k-th smallest value h_k estimates cardinality as
    ``(k - 1) * 2^60 / h_k`` (the KMV estimator, Bar-Yossef'02 —
    unbiased, ~1/sqrt(k-2) relative error). Groups with fewer than
    ``k`` elements report their EXACT count (the sketch holds every
    hash). Deterministic, so unlike HLL (q118) it sits on the exact
    cross-engine gate; accuracy is pinned against true counts in
    unit tests.

    Returns (g, n_sketch, est_distinct): ``n_sketch`` = rows kept
    (min(k, true distinct)), ``est_distinct`` = the estimate as
    DOUBLE (exact count when n_sketch < k).
    """
    bk = kmv_bottomk(df, group_col, element_col, k=k, seed=seed)
    agg = bk.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        F.max("h").alias("hk"),
    )
    scale = float(2**60)
    return agg.select(
        "g",
        "n_sketch",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(scale) / F.col("hk").cast("double")
        )
        .alias("est_distinct"),
    )


def kmv_distinct_oracle_sql(
    table: str,
    group_col: str,
    element_col: str,
    k: int = 256,
    seed: int = 7,
) -> str:
    """DuckDB mirror of :func:`kmv_distinct`."""
    h = _h60_sql(element_col, seed)
    scale = float(2**60)
    return f"""
    WITH hashed AS (
        SELECT DISTINCT {group_col} AS g, {h} AS h FROM {table}),
    bk AS (
        SELECT g, h FROM (
            SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM hashed) WHERE rn <= {k}),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_sketch, MAX(h) AS hk
        FROM bk GROUP BY g)
    SELECT g, n_sketch,
           CASE WHEN n_sketch < {k} THEN CAST(n_sketch AS DOUBLE)
                ELSE CAST({float(k - 1)!r} AS DOUBLE) * CAST({scale!r} AS DOUBLE)
                     / CAST(hk AS DOUBLE) END AS est_distinct
    FROM agg
    """


def heavy_hitters(
    df: DataFrame, col: str, k: int = 100
) -> DataFrame:
    """Exact frequent-items detection at sketch cost: every item with
    count strictly greater than N/(k+1), found with a Misra-Gries
    pass (Misra & Gries 1982; merge rule from Agarwal et al.'s
    mergeable-summaries PODS'12) plus an exact verification pass
    restricted to the sketch's candidates.

    Why not a plain groupBy at 100 TB: the vocabulary tail (trillions
    of near-unique tokens/URLs/ids) dominates the shuffle even though
    none of it can be frequent. Here the tail never crosses the wire:

    * pass 1 — each input partition keeps a k-counter Misra-Gries
      summary (mapInPandas; per Arrow batch a vectorized
      ``value_counts`` is merged into the summary, then the summary
      is re-trimmed with the mergeable-summaries rule: subtract the
      (k+1)-th largest count, drop non-positives). An item absent
      from a partition's summary has partition count <= n_p/(k+1),
      so an item absent from EVERY summary has global count
      <= N/(k+1): the union of summaries is a guaranteed superset of
      the answer. Output: <= k items per partition.
    * pass 2 — the candidate set (partitions x k rows, broadcast)
      semi-joins the item stream and only candidates are counted
      exactly; ``cnt * (k+1) > N`` filters sketch survivors that the
      exact count disproves. N itself rides the sketch pass (each
      partition emits its row count beside its summary), so the
      stream really is scanned exactly twice.

    The result is therefore EXACT (sits on the value-hash gate with
    a plain GROUP BY/HAVING oracle); only the pruning is
    approximate. Returns (item, cnt, n, share), share rounded(6).
    """
    items = (
        df.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
    )

    def _mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for item, cnt in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - cut for i, c in counters.items() if c > cut
                }
        # candidates carry pcount=0; one extra row per partition
        # carries its row count, so the global N needs no second scan
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "pcount": [0] * len(counters) + [n_rows],
            }
        )

    summary = items.mapInPandas(
        _mg, schema="item string, pcount long"
    ).localCheckpoint(eager=True)
    cands = summary.filter(F.col("item").isNotNull()).select(
        "item"
    ).distinct()
    n = summary.agg(F.sum("pcount").cast("bigint").alias("n"))
    return (
        items.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * (k + 1) > F.col("n"))
        .select(
            "item",
            "cnt",
            "n",
            F.round(
                F.col("cnt").cast("double") / F.col("n").cast("double"), 6
            ).alias("share"),
        )
    )


def heavy_hitters_oracle_sql(items_sql: str, k: int) -> str:
    """DuckDB mirror of :func:`heavy_hitters`: the sketch is only a
    pruner, so the oracle is the definition itself. ``items_sql``
    yields one ``item`` VARCHAR column."""
    return f"""
    WITH items AS (SELECT item FROM ({items_sql}) WHERE item IS NOT NULL),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM items),
    cnts AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM items GROUP BY item)
    SELECT item, cnt, t.n,
           round(CAST(cnt AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS share
    FROM cnts, tot t
    WHERE cnt * ({k} + 1) > t.n
    """


def bloom_words(
    keys: DataFrame, key_col: str, n_bits: int, n_hashes: int = 6
) -> list[int]:
    """Build a bloom filter over ``keys[key_col]`` as a dense list of
    ``n_bits/64`` int64 words (driver-side, bounded: the whole point
    of a bloom is that it fits in memory when the key SET does not
    need to be shipped). Build cost is one sparse aggregation —
    (word_idx, OR of bit masks) rows, at most ``n_bits/64`` of them —
    and a driver collect of that word list, never of the keys.

    Hash family: ``xxhash64(key, seed_i)`` for i in [0, n_hashes) —
    the same JVM-side expression the probe test uses, so build and
    probe can never disagree.
    """
    n_words = (n_bits + 63) // 64
    rows = []
    for i in range(n_hashes):
        h = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(n_bits))
        rows.append(
            F.struct(
                (h / 64).cast("int").alias("w"),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("bigint"),
                    (h % 64).cast("int"),
                ).alias("m"),
            )
        )
    sparse = (
        keys.select(F.explode(F.array(*rows)).alias("b"))
        .select(F.col("b.w").alias("w"), F.col("b.m").alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in sparse:
        words[r.w] = r.word
    return words


def bloom_might_contain(
    words, key, n_bits: int, n_hashes: int = 6
):
    """Pure-Catalyst bloom membership test (codegen'd, no UDF): AND
    over ``n_hashes`` bit probes into the word array. ``words`` is a
    Column (an array attribute — see :func:`bloom_semi_join`) or a
    Python list; prefer the Column form for non-toy filters: a list
    lowers to a CreateArray expression that Spark re-materializes
    PER ROW (~10us/row at 5k words, measured), while an attribute
    from a broadcast single-row frame is built once."""
    arr = words if isinstance(words, Column) else F.lit(words)
    test = None
    for i in range(n_hashes):
        h = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
        word = F.element_at(arr, (h / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (h % 64).cast("int")
        )
        probe = word.bitwiseAND(bit) != 0
        test = probe if test is None else (test & probe)
    return test


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str,
    bits_per_key: int = 12,
    n_hashes: int = 6,
) -> DataFrame:
    """Exact semi join with bloom pre-pruning — the runtime-filter
    pattern (Spark's AQE InjectRuntimeFilter, made explicit and
    portable): at 100 TB a fact-side semi join shuffles the whole
    fact table on the join key even though only a sliver survives.
    Here the key side collapses to a bloom (one agg + a word-list
    collect, ~``bits_per_key``/8 bytes per distinct key), the fact
    scan is pruned by a codegen'd literal-array bit test BEFORE any
    exchange, and only the survivors (true matches + the bloom's
    false positives, ~0.05% at 12 bits/key, 6 hashes) reach the
    exact verification semi join. Result is EXACTLY the semi join —
    the bloom only prunes, the join decides.
    """
    kdist = keys.select(F.col(keys_key).alias(keys_key)).distinct()
    kdist = kdist.localCheckpoint(eager=True)  # one evaluation serves
    # the count, the bloom build, and the verify join
    n_keys = kdist.count()
    n_bits = max(64, n_keys * bits_per_key)
    words = bloom_words(kdist, keys_key, n_bits, n_hashes)
    # single-row broadcast frame, NOT a literal: a 5k-element literal
    # array is re-created per probed row (CreateArray in codegen);
    # the broadcast attribute is built once per partition
    wdf = big.sparkSession.createDataFrame(
        [(words,)], "__bloom_words array<bigint>"
    )
    pruned = (
        big.join(F.broadcast(wdf))
        .filter(
            bloom_might_contain(
                F.col("__bloom_words"), F.col(big_key), n_bits, n_hashes
            )
        )
        .drop("__bloom_words")
    )
    return pruned.join(
        kdist.withColumnRenamed(keys_key, big_key), big_key, "left_semi"
    )


def join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    sample_frac: float = 0.05,
    seed: int = 17,
) -> DataFrame:
    """Equi-join output-size estimate from a coordinated key sample —
    the pre-flight audit run before committing a cluster to a join
    whose output might be 100x its inputs (skewed keys multiply:
    |A join B| = sum_v cntA(v) * cntB(v)).

    Method (end-biased / coordinated sampling, the Estan-Naughton
    ICDE'06 family): both sides keep only keys whose portable hash
    bucket falls under ``sample_frac`` — the SAME hash on both sides,
    so a sampled key is sampled on both or neither and per-key
    products are EXACT within the sample; the estimate scales the
    sampled product mass by 1/sample_frac. One narrow filter + one
    count-agg per side over the sample (shuffle volume ~frac of the
    key histograms), never the join itself. Deterministic (hash
    sample, integer arithmetic), so the estimator itself sits on the
    exact value gate; its accuracy vs the true size is pinned by unit
    bracket tests. Returns (n_sampled_keys, est_join_rows).
    """
    from .sampling import BUCKETS, hash_bucket

    cut = int(round(sample_frac * BUCKETS))
    frac = cut / BUCKETS  # realized fraction (integer bucket cut)

    def side(df, key, name):
        return (
            df.select(F.col(key).alias("k"))
            .filter(hash_bucket(F.col("k"), seed=seed) < cut)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca = side(a, a_key, "ca")
    cb = side(b, b_key, "cb")
    prod = ca.join(cb, "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled_keys"),
        F.sum(
            (F.col("ca") * F.col("cb")).cast("decimal(38,0)")
        ).alias("mass"),
    )
    return prod.select(
        "n_sampled_keys",
        F.round(F.col("mass").cast("double") / F.lit(frac), 3).alias(
            "est_join_rows"
        ),
    )


def join_size_oracle_sql(
    a_sql: str,
    b_sql: str,
    sample_frac: float = 0.05,
    seed: int = 17,
) -> str:
    """DuckDB mirror of :func:`join_size_estimate`. ``a_sql``/``b_sql``
    each yield one ``k`` column."""
    from .sampling import BUCKETS, hash_bucket_sql

    cut = int(round(sample_frac * BUCKETS))
    frac = cut / BUCKETS
    bucket = hash_bucket_sql("k", seed=seed)
    return f"""
    WITH ca AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS ca
        FROM ({a_sql}) WHERE ({bucket}) < {cut} GROUP BY k),
    cb AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS cb
        FROM ({b_sql}) WHERE ({bucket}) < {cut} GROUP BY k),
    prod AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled_keys,
               SUM(CAST(ca * cb AS DECIMAL(38,0))) AS mass
        FROM ca JOIN cb USING (k))
    SELECT n_sampled_keys,
           round(CAST(mass AS DOUBLE) / {frac!r}, 3) AS est_join_rows
    FROM prod
    """


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Count-Min sketch build (Cormode-Muthukrishnan 2005): one
    (group..., r, c, cnt) row per touched cell, ``c = h_r(key) mod
    width`` with the md5-derived row hashes the rest of this module
    uses (cross-engine exact). Sketches are MERGEABLE by
    construction: union two sketch frames and re-sum on (group, r, c)
    — the rollup algebra KMV established for distincts, applied to
    frequencies. Point estimate of a key = min over rows r of
    ``cnt[r][h_r(key)]`` (an upper bound, never an undercount).

    Scale shape: one narrow map (explode depth rows per input row),
    one hash aggregate onto at most depth*width*|groups| cells —
    sketch size is INDEPENDENT of input rows, the whole point at
    100 TB: per-partition sketches merge associatively, so frequency
    monitoring costs a constant-size state per group however large
    the stream.
    """
    gcols = [F.col(g) for g in group_cols]
    rows = df.select(
        *gcols,
        F.col(key_col).cast("string").alias("k"),
    ).select(
        *gcols,
        "k",
        F.explode(
            F.array(*[F.lit(r) for r in range(depth)])
        ).alias("r"),
    )
    c = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("k"), F.lit(":"), F.col("r").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )
    return (
        rows.withColumn("c", c)
        .groupBy(*group_cols, "r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_hash_sql(key_expr: str, r_expr: str, width: int) -> str:
    """DuckDB mirror of the cm_sketch column hash."""
    return (
        f"(CAST(('0x' || substring(md5(CAST({key_expr} AS VARCHAR)"
        f" || ':' || CAST({r_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {width})"
    )


def cm_point_estimates(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a (r, c, cnt) Count-Min sketch: for each input key
    take min over rows of the hashed cell's count. Carries every
    other column of ``keys`` through. Keys never inserted may miss
    cells entirely (inner join drops them — CM has no membership
    semantics; pair with a Bloom filter for that)."""
    carry = [c for c in keys.columns]
    probe = keys.select(
        *carry,
        F.explode(
            F.array(*[F.lit(r) for r in range(depth)])
        ).alias("r"),
    ).withColumn(
        "c",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(key_col).cast("string"),
                        F.lit(":"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % width,
    )
    return (
        probe.join(sketch, ["r", "c"])
        .groupBy(*carry)
        .agg(F.min("cnt").cast("bigint").alias("cm_est"))
    )


# --------------------------------------------------------------------
# Dense HyperLogLog on the exact cross-engine gate
# --------------------------------------------------------------------

def _hll_consts(p: int) -> tuple[int, int, int, float]:
    """(m, q, rmax, alpha_m) for precision ``p``: m = 2^p registers,
    q = 60 - p hash bits feeding the rank, rmax = q + 1 the max
    register value, alpha the Flajolet bias constant (m >= 128)."""
    m = 1 << p
    q = 60 - p
    return m, q, q + 1, 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_col: str,
    element_col: str,
    p: int = 10,
    seed: int = 11,
) -> DataFrame:
    """Per-group dense HyperLogLog register state (Flajolet et al.
    2007): md5-derived 60-bit hash, top ``p`` bits pick the register,
    the rank of the first set bit in the remaining ``q = 60 - p``
    bits is max-aggregated per register. Returns (g, idx, M) — at
    most ``2^p`` rows per group regardless of group size, and
    MERGEABLE: max over matching idx merges two groups' state, which
    is the whole point of HLL rollups (q118 carries the same shape
    through DataSketches; this one is a pure deterministic function
    of the data, so it sits on the exact oracle gate).

    The rank uses string bit-length (``length(conv(w, 10, 2))``),
    identical to DuckDB's ``length(bin(w))`` for w > 0 — no float
    log2 near power-of-two boundaries.
    """
    m, q, rmax, _ = _hll_consts(p)
    h = _h60(F.col(element_col), seed)
    hashed = df.select(
        F.col(group_col).alias("g"),
        h.alias("h"),
    ).select(
        "g",
        # shiftright, NOT /: division routes through double, which
        # cannot hold 60-bit hashes exactly (> 2^53)
        F.shiftright(F.col("h"), q).alias("idx"),
        (F.col("h") % F.lit(1 << q)).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(rmax)).otherwise(
        F.lit(rmax)
        - F.length(F.conv(F.col("w").cast("string"), 10, 2))
    )
    return (
        hashed.select("g", "idx", rho.cast("int").alias("rho"))
        .groupBy("g", "idx")
        .agg(F.max("rho").alias("M"))
    )


def _hll_estimate(regs: DataFrame, p: int) -> DataFrame:
    """(g, n_set, zeros, est_distinct) from register state: the exact
    BIGINT sum ``zeros * 2^(q+1) + sum(2^(q+1-M))`` (dyadic terms
    scaled to integers — no float-sum order dependence), one double
    divide for the raw estimate, and the linear-counting branch below
    2.5m when empty registers remain. Final round(6) absorbs nothing:
    every input to the float ops is bit-identical cross-engine."""
    m, q, rmax, alpha = _hll_consts(p)
    num = alpha * m * m * float(1 << rmax)  # one python-folded literal
    agg = regs.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_set"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - M)"))
        .cast("bigint")
        .alias("s_set"),
    )
    zeros = (F.lit(m).cast("bigint") - F.col("n_set")).alias("zeros")
    s = F.col("zeros") * F.lit(1 << rmax).cast("bigint") + F.col("s_set")
    raw = F.lit(num) / s.cast("double")
    lin = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("zeros").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zeros") > 0), lin
    ).otherwise(raw)
    return agg.select("g", "n_set", zeros, "s_set").select(
        "g",
        "n_set",
        "zeros",
        F.round(est, 6).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    element_col: str,
    p: int = 10,
    seed: int = 11,
    merged_label: str = "*",
) -> DataFrame:
    """Per-group HLL distinct estimates PLUS the merged-rollup row:
    the ``merged_label`` group's estimate is computed from the
    max-merge of the per-group register states — never from the raw
    data — proving the mergeability contract the 100 TB rollup relies
    on (per-day/per-shard sketches union into totals without a
    second scan). Returns (g, n_set, zeros, est_distinct)."""
    regs = hll_registers(df, group_col, element_col, p=p, seed=seed)
    merged = (
        regs.groupBy("idx")
        .agg(F.max("M").alias("M"))
        .select(F.lit(merged_label).alias("g"), "idx", "M")
    )
    return _hll_estimate(regs.unionByName(merged), p)


def hll_oracle_sql(
    table: str,
    group_col: str,
    element_col: str,
    p: int = 10,
    seed: int = 11,
    merged_label: str = "*",
) -> str:
    """DuckDB mirror of :func:`hll_distinct` — same hash, same
    register ranks, same exact-integer sum and float tail."""
    m, q, rmax, alpha = _hll_consts(p)
    num = alpha * m * m * float(1 << rmax)
    h = _h60_sql(element_col, seed)
    return f"""
    WITH hll_h AS (
        SELECT {group_col} AS g,
               ({h}) // {1 << q} AS idx,
               ({h}) % {1 << q} AS w
        FROM {table}),
    hll_regs AS (
        SELECT g, idx,
               MAX(CASE WHEN w = 0 THEN {rmax}
                        ELSE {rmax} - length(bin(w)) END) AS M
        FROM hll_h GROUP BY 1, 2),
    hll_all AS (
        SELECT g, idx, M FROM hll_regs
        UNION ALL
        SELECT '{merged_label}' AS g, idx, MAX(M) AS M
        FROM hll_regs GROUP BY 2),
    hll_agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_set,
               CAST(SUM(1::BIGINT << ({rmax} - M)) AS BIGINT) AS s_set
        FROM hll_all GROUP BY 1),
    hll_est AS (
        SELECT g, n_set, CAST({m} - n_set AS BIGINT) AS zeros,
               CAST({num!r} AS DOUBLE)
                   / CAST(({m} - n_set) * {1 << rmax}::BIGINT + s_set
                          AS DOUBLE) AS raw
        FROM hll_agg)
    SELECT g, n_set, zeros,
           round(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                      THEN CAST({float(m)!r} AS DOUBLE)
                           * ln(CAST({float(m)!r} AS DOUBLE)
                                / CAST(zeros AS DOUBLE))
                      ELSE raw END, 6) AS est_distinct
    FROM hll_est"""


def hll_set_algebra(
    a: DataFrame,
    b: DataFrame,
    element_col: str,
    label_a: str = "a",
    label_b: str = "b",
    p: int = 10,
    seed: int = 11,
) -> DataFrame:
    """HLL sketch ALGEBRA (Flajolet 2007 + the standard inclusion-
    exclusion estimator): estimate |A|, |B|, |A ∪ B| (max-merge of
    register states — the only exact operation HLL supports) and
    derive |A ∩ B| = |A| + |B| - |A ∪ B| and Jaccard — the audience-
    overlap question q151 answers EXACTLY, re-answered from two
    constant-size sketches that never rescan or co-shuffle the raw
    sets. At 100 TB the exact bitmap join is a corpus shuffle; two
    2^p-row states union on a broadcast.

    The exact intersection is computed alongside (one distinct
    semi-join at gate scale) so the output self-reports estimator
    error; a production rollup would drop it. All register math is
    the q243 integer path; the inclusion-exclusion tail is three
    already-rounded doubles subtracted once, then round(6).
    Returns one row: (n_a, n_b, union_est, inter_est, jaccard_est,
    inter_exact, err_pct).
    """
    ea = a.select(F.col(element_col).alias("e")).distinct()
    eb = b.select(F.col(element_col).alias("e")).distinct()
    tagged = ea.select(F.lit(label_a).alias("g"), "e").unionByName(
        eb.select(F.lit(label_b).alias("g"), "e")
    )
    est = hll_distinct(
        tagged, "g", "e", p=p, seed=seed, merged_label="u"
    ).select("g", "est_distinct")
    wide = (
        est.groupBy()
        .pivot("g", [label_a, label_b, "u"])
        .agg(F.first("est_distinct"))
        .select(
            F.col(label_a).alias("n_a"),
            F.col(label_b).alias("n_b"),
            F.col("u").alias("union_est"),
        )
    )
    inter_exact = ea.join(eb, "e", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("inter_exact")
    )
    return (
        wide.crossJoin(F.broadcast(inter_exact))
        .select(
            "n_a",
            "n_b",
            "union_est",
            F.round(
                F.col("n_a") + F.col("n_b") - F.col("union_est"), 6
            ).alias("inter_est"),
            "inter_exact",
        )
        .select(
            "n_a",
            "n_b",
            "union_est",
            "inter_est",
            F.round(F.col("inter_est") / F.col("union_est"), 6).alias(
                "jaccard_est"
            ),
            "inter_exact",
            F.when(
                F.col("inter_exact") > 0,
                F.round(
                    (F.col("inter_est") - F.col("inter_exact").cast("double"))
                    / F.col("inter_exact").cast("double")
                    * 100,
                    2,
                ),
            ).alias("err_pct"),
        )
    )


def hll_set_algebra_sql(
    a_sql: str,
    b_sql: str,
    label_a: str = "a",
    label_b: str = "b",
    p: int = 10,
    seed: int = 11,
) -> str:
    """DuckDB mirror of :func:`hll_set_algebra`. ``a_sql``/``b_sql``
    each yield one column ``e``."""
    inner = hll_oracle_sql(
        f"""(SELECT '{label_a}' AS g, e FROM (SELECT DISTINCT e FROM ({a_sql}))
            UNION ALL
            SELECT '{label_b}' AS g, e FROM (SELECT DISTINCT e FROM ({b_sql}))
           ) hsa_in""",
        "g",
        "e",
        p=p,
        seed=seed,
        merged_label="u",
    )
    return f"""
    WITH hsa_est AS ({inner}),
    hsa_w AS (
        SELECT MAX(CASE WHEN g = '{label_a}' THEN est_distinct END) AS n_a,
               MAX(CASE WHEN g = '{label_b}' THEN est_distinct END) AS n_b,
               MAX(CASE WHEN g = 'u' THEN est_distinct END) AS union_est
        FROM hsa_est),
    hsa_x AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS inter_exact FROM (
            SELECT DISTINCT e FROM ({a_sql})
            INTERSECT
            SELECT DISTINCT e FROM ({b_sql}))),
    hsa_i AS (
        SELECT n_a, n_b, union_est,
               round(n_a + n_b - union_est, 6) AS inter_est,
               inter_exact
        FROM hsa_w CROSS JOIN hsa_x)
    SELECT n_a, n_b, union_est, inter_est,
           round(inter_est / union_est, 6) AS jaccard_est,
           inter_exact,
           CASE WHEN inter_exact > 0
                THEN round((inter_est - CAST(inter_exact AS DOUBLE))
                           / CAST(inter_exact AS DOUBLE) * 100, 2)
           END AS err_pct
    FROM hsa_i"""


# --------------------------------------------------------------------
# t-digest: mergeable quantile sketch (Dunning & Ertl, "Computing
# extremely accurate quantiles using t-digests", 2019). The missing
# member of this module's sketch family: KMV/HLL cover cardinality,
# CM/Misra-Gries cover frequency, the t-digest covers QUANTILES.
#
# Shape at 100 TB: every partition reduces its values to at most
# O(delta) centroids (one mapInPandas pass, no shuffle), the driver
# merges #partitions x delta centroid rows (bounded collect, same
# contract as the token-shard manifest), and any two digests merge by
# concatenating centroid lists and re-compressing — so digests roll
# up across executors, days, or shards. The implementation is the
# MERGING variant (no tree, no RNG): given the same values it is
# bit-deterministic, which is what lets q326 pin it on the gate.
# --------------------------------------------------------------------


def _td_compress(centroids, delta: int):
    """Merge sorted (mean, weight) centroids under the classic size
    bound w_max(q) = max(1, floor(4*W*q*(1-q)/delta)) (Dunning 2019
    §2.2, the k1/quadratic bound). Deterministic: input is sorted by
    (mean, weight), accumulation is left-to-right."""
    cs = sorted(centroids)
    W = sum(w for _, w in cs)
    if not cs or W <= 0:
        return []
    out = []
    cur_m, cur_w = cs[0]
    cum = 0.0  # weight strictly left of the current centroid
    for m, w in cs[1:]:
        q = (cum + cur_w / 2.0) / W
        limit = max(1.0, 4.0 * W * q * (1.0 - q) / float(delta))
        if cur_w + w <= limit:
            tot = cur_w + w
            cur_m += (m - cur_m) * (w / tot)
            cur_w = tot
        else:
            out.append((cur_m, cur_w))
            cum += cur_w
            cur_m, cur_w = m, w
    out.append((cur_m, cur_w))
    return out


def tdigest_partials(df: DataFrame, col: str, delta: int = 100) -> DataFrame:
    """Per-partition t-digest states: (mean, weight) centroid rows,
    at most O(delta) per input partition, built in one partition-local
    pass (zero Exchange — the plan is scan -> MapInPandas)."""

    def build(it):
        import pandas as _pd

        for pdf in it:
            vals = _pd.to_numeric(pdf[col], errors="coerce").dropna()
            if len(vals) == 0:
                continue
            cs = _td_compress(
                [(float(v), 1.0) for v in sorted(vals)], delta
            )
            yield _pd.DataFrame(
                {
                    "mean": [m for m, _ in cs],
                    "weight": [w for _, w in cs],
                }
            )

    return df.select(col).mapInPandas(build, schema="mean double, weight double")


def tdigest_merge(centroid_rows, delta: int = 100):
    """Merge any number of digests' centroid (mean, weight) pairs into
    one digest — associative up to re-compression, the property that
    makes the sketch roll up across partitions/days/shards."""
    return _td_compress([(float(m), float(w)) for m, w in centroid_rows], delta)


def tdigest_quantile(centroids, q: float) -> float:
    """Estimate the q-quantile from a merged digest: walk cumulative
    centroid weights, interpolate linearly between adjacent centroid
    means (Dunning 2019 §2.9, simplified to mid-point attribution)."""
    if not centroids:
        return float("nan")
    cs = sorted(centroids)
    W = sum(w for _, w in cs)
    target = q * W
    cum = 0.0
    for i, (m, w) in enumerate(cs):
        if cum + w / 2.0 >= target:
            if i == 0:
                return m
            pm, pw = cs[i - 1]
            left = cum - pw / 2.0
            right = cum + w / 2.0
            frac = 0.0 if right == left else (target - left) / (right - left)
            # clamp into [pm, m]: at denormal magnitudes the float
            # rounding of pm + (m-pm)*frac can land OUTSIDE the
            # centroid interval and break quantile monotonicity
            # (hypothesis-found with means around -2e-313)
            return min(max(pm + (m - pm) * frac, pm), m)
        cum += w
    return cs[-1][0]


def tdigest_group_partials(
    df: DataFrame, group_col: str, col: str, delta: int = 100
) -> DataFrame:
    """Per-(input partition, group) digest states: the grouped twin of
    :func:`tdigest_partials`. Still one partition-local pass — each
    Arrow batch groups its own rows, so no shuffle happens before the
    states exist and the downstream merge moves O(groups x partitions
    x delta) centroid rows instead of the data."""

    def build(it):
        import pandas as _pd

        for pdf in it:
            outs = []
            for g, sub in pdf.groupby("g", sort=True):
                vals = _pd.to_numeric(sub[col], errors="coerce").dropna()
                if len(vals) == 0:
                    continue
                cs = _td_compress(
                    [(float(v), 1.0) for v in sorted(vals)], delta
                )
                outs.append(
                    _pd.DataFrame(
                        {
                            "g": [g] * len(cs),
                            "mean": [m for m, _ in cs],
                            "weight": [w for _, w in cs],
                        }
                    )
                )
            if outs:
                yield _pd.concat(outs, ignore_index=True)

    return df.select(
        F.col(group_col).alias("g"), F.col(col).alias(col)
    ).mapInPandas(build, schema="g string, mean double, weight double")


def tdigest_group_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    qs: list,
    delta: int = 100,
) -> DataFrame:
    """Per-group quantile estimates (group, q, est): partial digests
    merge per group via applyInPandas — ONE shuffle keyed by group,
    carrying centroid rows, never data rows. The distributed-rollup
    shape: the same merge would roll partials across days or shards."""
    partials = tdigest_group_partials(df, group_col, col, delta)
    qlist = [float(q) for q in qs]

    def merge(pdf):
        import pandas as _pd

        digest = tdigest_merge(
            list(zip(pdf["mean"], pdf["weight"])), delta
        )
        return _pd.DataFrame(
            {
                "g": [pdf["g"].iloc[0]] * len(qlist),
                "q": qlist,
                "est": [tdigest_quantile(digest, q) for q in qlist],
            }
        )

    return (
        partials.groupBy("g")
        .applyInPandas(merge, schema="g string, q double, est double")
        .withColumnRenamed("g", group_col)
    )
