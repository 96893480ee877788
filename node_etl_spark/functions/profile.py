"""Table profiling: one-pass column statistics for pipeline QA.

Before a 100 TB corpus is trained on, every ingestion step wants the
same cheap questions answered — row counts, null fractions,
cardinalities, top values. The reference's only observability is the
per-job ``spy`` tap (jobs/job.js:202-210); this is the columnar
equivalent, built as plain aggregates so it runs as one (or for
exact distincts, one-per-column expanded) pass and never collects
data rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Long-format column profile: (column, n_rows, n_nulls,
    n_distinct) per listed column.

    ``exact=False`` swaps COUNT(DISTINCT) for HyperLogLog++
    (``approx_count_distinct``) — the constant-memory path for wide
    tables at extreme scale, where k exact distincts cost a k-way
    row expansion.
    """
    cols = cols or df.columns
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(nd(c).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (column, n_nulls, n_distinct)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def histogram(
    df: DataFrame, col: str, bins: int = 20
) -> DataFrame:
    """Exact equi-width histogram of a numeric column:
    ``(bin, lo_edge, hi_edge, n)`` rows, empty bins omitted.

    Two aggregations over one scan: a single-row min/max pre-pass
    broadcasts back onto the scan (never collected to the driver) and
    the bin assignment is a row-local expression, so the only wide op
    is the final count-by-bin — ``bins`` groups regardless of input
    size. The max value clamps into the last bin.
    """
    bounds = df.agg(
        F.min(col).cast("double").alias("__lo"),
        F.max(col).cast("double").alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_ = F.least(
        F.floor((F.col(col).cast("double") - F.col("__lo")) / width),
        F.lit(bins - 1),
    ).cast("int")
    return (
        df.join(F.broadcast(bounds))
        .groupBy(bin_.alias("bin"), "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * width).alias("lo_edge"),
            (F.col("__lo") + (F.col("bin") + 1) * width).alias("hi_edge"),
            "n",
        )
    )


def histogram_oracle_sql(table: str, col: str, bins: int = 20) -> str:
    """DuckDB mirror of :func:`histogram`."""
    return f"""
    WITH b AS (SELECT CAST(MIN({col}) AS DOUBLE) AS lo,
                      CAST(MAX({col}) AS DOUBLE) AS hi
               FROM {table}),
    binned AS (
        SELECT CAST(least(floor((CAST({col} AS DOUBLE) - lo)
                                / ((hi - lo) / {bins}.0)),
                          {bins - 1}) AS INTEGER) AS bin, lo, hi
        FROM {table}, b)
    SELECT bin,
           lo + bin * ((hi - lo) / {bins}.0) AS lo_edge,
           lo + (bin + 1) * ((hi - lo) / {bins}.0) AS hi_edge,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY 1, lo, hi
    """


def psi_drift(
    df: DataFrame, col: str, is_ref: Column, bins: int = 10
) -> DataFrame:
    """Population Stability Index between two cohorts of one table.

    Distribution-drift detection for ingest monitoring: bin ``col``
    equi-width over the GLOBAL min/max (one single-row pre-agg,
    broadcast back — both cohorts share edges), count each cohort per
    bin in one conditional-aggregate pass, then per-bin
    ``(p - q) * ln(p / q)`` with Laplace smoothing (+0.5 per bin) so
    empty bins stay finite. Output: one row per bin with its PSI term
    plus the ``total_psi`` (rule of thumb: <0.1 stable, >0.25 drifted).

    The only data-sized ops are the min/max scan and the bin count —
    both map-side combinable; everything after runs on ``bins`` rows.
    The total is summed over round(term, 12) decimals, so it is
    order-independent and engine-portable.
    """
    bounds = df.agg(
        F.min(col).cast("double").alias("__lo"),
        F.max(col).cast("double").alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_ = F.least(
        F.floor((F.col(col).cast("double") - F.col("__lo")) / width),
        F.lit(bins - 1),
    ).cast("int")
    counts = (
        df.withColumn("__is_ref", F.when(is_ref, F.lit(1)).otherwise(F.lit(0)))
        .join(F.broadcast(bounds))
        .groupBy(bin_.alias("bin"))
        .agg(
            F.sum("__is_ref").cast("bigint").alias("n_ref"),
            F.sum(1 - F.col("__is_ref")).cast("bigint").alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("__t_ref"),
        F.sum("n_cur").cast("double").alias("__t_cur"),
    )
    smooth = F.lit(0.5 * bins)
    p = (F.col("n_ref").cast("double") + F.lit(0.5)) / (F.col("__t_ref") + smooth)
    q = (F.col("n_cur").cast("double") + F.lit(0.5)) / (F.col("__t_cur") + smooth)
    terms = counts.join(F.broadcast(tot)).select(
        "bin", "n_ref", "n_cur", ((p - q) * F.log(p / q)).alias("psi_term")
    )
    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return terms.select(
        "bin",
        "n_ref",
        "n_cur",
        # round the emitted term too: raw (p-q)*ln(p/q) doubles can
        # differ from the SQL engine's libm in the last ulp (seen at
        # sf0.001), and the gate hashes every column
        F.round("psi_term", 12).alias("psi_term"),
        F.sum(F.round("psi_term", 12).cast("decimal(24,12)"))
        .over(w)
        .cast("double")
        .alias("total_psi"),
    )


def psi_oracle_sql(
    table: str, col: str, is_ref_sql: str, bins: int = 10
) -> str:
    """DuckDB mirror of :func:`psi_drift` (same expression shapes, so
    the doubles agree bit-for-bit)."""
    return f"""
    WITH b AS (SELECT CAST(MIN({col}) AS DOUBLE) AS lo,
                      CAST(MAX({col}) AS DOUBLE) AS hi FROM {table}),
    binned AS (
        SELECT CAST(least(floor((CAST({col} AS DOUBLE) - lo)
                                / ((hi - lo) / {bins}.0)),
                          {bins - 1}) AS INTEGER) AS bin,
               CASE WHEN {is_ref_sql} THEN 1 ELSE 0 END AS is_ref
        FROM {table}, b),
    counts AS (
        SELECT bin, CAST(SUM(is_ref) AS BIGINT) AS n_ref,
               CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
        FROM binned GROUP BY bin),
    tot AS (SELECT CAST(SUM(n_ref) AS DOUBLE) AS t_ref,
                   CAST(SUM(n_cur) AS DOUBLE) AS t_cur FROM counts),
    terms AS (
        SELECT bin, n_ref, n_cur,
               ((CAST(n_ref AS DOUBLE) + 0.5) / (t_ref + {0.5 * bins})
                - (CAST(n_cur AS DOUBLE) + 0.5) / (t_cur + {0.5 * bins}))
               * ln(((CAST(n_ref AS DOUBLE) + 0.5) / (t_ref + {0.5 * bins}))
                    / ((CAST(n_cur AS DOUBLE) + 0.5)
                       / (t_cur + {0.5 * bins}))) AS psi_term
        FROM counts, tot)
    SELECT bin, n_ref, n_cur, round(psi_term, 12) AS psi_term,
           CAST(SUM(CAST(round(psi_term, 12) AS DECIMAL(24,12)))
                    OVER () AS DOUBLE) AS total_psi
    FROM terms
    """


# ------------------------------------------------ group-wise OLS trend


def ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit (trend detection):
    slope and intercept of ``y`` over ``x`` within each group.

    Contract: ``x`` and ``y`` are BIGINT (pre-scale money to cents,
    timestamps to day/week indexes). All five sufficient statistics
    (n, Sx, Sy, Sxx, Sxy) are then exact int64 sums — one shuffle,
    map-side partial aggregation, order-independent — and the closed
    form runs on doubles converted from identical integers, so Spark
    and DuckDB produce bit-identical results (``ols_oracle_sql``).
    Built-in regr_slope/regr_intercept are avoided deliberately:
    their double accumulation is summation-order-dependent, which
    breaks the exact cross-engine gate. Degenerate groups (fewer
    than 2 points, or zero x-variance) are dropped.

    At 100 TB this is a plain two-level aggregate: the heavy input
    collapses to one row of longs per group before any wide exchange.
    """
    x, y = F.col(x_col).cast("bigint"), F.col(y_col).cast("bigint")
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    g = g.filter((F.col("n") >= 2) & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0))
    g = g.withColumn(
        "slope",
        F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE)"
        ),
    )
    return g.select(
        *group_cols,
        F.col("n").alias("n_points"),
        "slope",
        F.expr(
            "(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))"
            " / CAST(n AS DOUBLE)"
        ).alias("intercept"),
    )


def ols_oracle_sql(points_sql: str, group_cols: list[str]) -> str:
    """DuckDB mirror of :func:`ols_trend`. ``points_sql`` must yield
    the group columns plus BIGINT columns x and y; the closed form
    repeats the engine's exact integer sums and double conversions."""
    gc = ", ".join(group_cols)
    return f"""
    WITH pts AS ({points_sql}),
    stats AS (
        SELECT {gc},
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM pts GROUP BY {gc}),
    fit AS (
        SELECT {gc}, n, sx, sy,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
        FROM stats
        WHERE n >= 2 AND n * sxx - sx * sx <> 0)
    SELECT {gc}, n AS n_points, slope,
           (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS intercept
    FROM fit
    """


def gini_concentration(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Gini coefficient of a BIGINT measure across groups — the
    concentration/inequality audit (is 90% of the corpus coming from
    3 sources? is revenue concentrated in a handful of suppliers?).

    Sort-formula form on the per-group totals:
    ``G = (2 * SUM(i * x_i) - (n + 1) * SUM(x)) / (n * SUM(x))``
    with ``x`` ascending and ``i`` the 1-based rank. Everything up
    to the final division is exact integer arithmetic — the rank-sum
    accumulates as DECIMAL(38,0), because ``SUM(i * x)`` reaches
    ~n/2 * total and overflows int64 at millions of groups with
    cent-scale totals (DuckDB's HUGEINT sums are exact either way,
    so a silent Spark wrap would break parity exactly at scale) —
    hence both engines agree bit-for-bit (:func:`gini_oracle_sql`).
    The rank window
    runs over PER-GROUP TOTALS — dimension-sized after the first
    aggregate — so the single-partition sort is a few thousand rows
    regardless of input scale. Ties order by group for determinism.
    Returns one row: (n_groups, total, gini).
    """
    totals = df.groupBy(group_col).agg(
        F.sum(value_col).cast("bigint").alias("x")
    )
    w = Window.orderBy("x", group_col)
    ranked = totals.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("x").cast("bigint").alias("total"),
        F.expr(
            "CAST(2 * SUM(CAST(i AS DECIMAL(38,0)) * x)"
            " - (COUNT(*) + 1) * SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE)"
            " / CAST(COUNT(*) * SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("gini"),
    )


def gini_oracle_sql(points_sql: str) -> str:
    """DuckDB mirror of :func:`gini_concentration`. ``points_sql``
    must yield (g, x) per-group BIGINT totals."""
    return f"""
    WITH totals AS ({points_sql}),
    ranked AS (
        SELECT x, row_number() OVER (ORDER BY x, g) AS i FROM totals)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(x) AS BIGINT) AS total,
           CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
               / CAST(COUNT(*) * SUM(x) AS DOUBLE) AS gini
    FROM ranked
    """


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    g1,
    g2,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the BIGINT
    ``value_col`` distributions of two groups — the nonparametric
    drift test complementing PSI (q117): no binning choices, exact
    ties handling, sensitive to any distributional change.

    Exactness: D = max |F1(v) - F2(v)| over the pooled jump points,
    evaluated as the INTEGER cross-product form
    ``max |cum1 * n2 - cum2 * n1|`` so there is no floating point
    until the single final division — bit-identical across engines.
    Scale shape: counts aggregate per distinct value FIRST (one
    shuffle; the window then runs over the distinct-value frame,
    which for quantized measures — cents, ms, token counts — is
    bounded by the value domain, not the row count). Quantize truly
    continuous data before calling. Returns one row:
    (n1, n2, d_num, ks).
    """
    c = (
        df.filter(F.col(group_col).isin([g1, g2]))
        .groupBy(value_col)
        .agg(
            F.sum(F.when(F.col(group_col) == g1, 1).otherwise(0))
            .cast("bigint")
            .alias("c1"),
            F.sum(F.when(F.col(group_col) == g2, 1).otherwise(0))
            .cast("bigint")
            .alias("c2"),
        )
    )
    w = (
        Window.orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = c.withColumn("cum1", F.sum("c1").over(w)).withColumn(
        "cum2", F.sum("c2").over(w)
    )
    tot = c.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n1").cast("bigint").alias("n1"),
            F.max("n2").cast("bigint").alias("n2"),
            F.max(
                F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            )
            .cast("bigint")
            .alias("d_num"),
        )
        .select(
            "n1",
            "n2",
            "d_num",
            F.expr("CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)").alias(
                "ks"
            ),
        )
    )


def ks_oracle_sql(
    points_sql: str, g1_lit: str, g2_lit: str
) -> str:
    """DuckDB mirror of :func:`ks_statistic`. ``points_sql`` must
    yield (g, value) with BIGINT value."""
    return f"""
    WITH pts AS ({points_sql}),
    c AS (
        SELECT value,
               CAST(SUM(CASE WHEN g = {g1_lit} THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN g = {g2_lit} THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM pts WHERE g IN ({g1_lit}, {g2_lit}) GROUP BY value),
    cum AS (
        SELECT value,
               SUM(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum1,
               SUM(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum2
        FROM c),
    tot AS (SELECT CAST(MAX(cum1) AS BIGINT) AS n1,
                   CAST(MAX(cum2) AS BIGINT) AS n2 FROM cum)
    SELECT t.n1, t.n2,
           CAST(MAX(abs(cum1 * t.n2 - cum2 * t.n1)) AS BIGINT) AS d_num,
           CAST(MAX(abs(cum1 * t.n2 - cum2 * t.n1)) AS DOUBLE)
               / CAST(t.n1 * t.n2 AS DOUBLE) AS ks
    FROM cum, tot t GROUP BY t.n1, t.n2
    """


def mannwhitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    g1,
    g2,
) -> DataFrame:
    """Mann-Whitney U test statistic and AUC effect size between two
    groups' BIGINT value distributions — the rank-based location-
    shift test beside :func:`ks_statistic`'s shape test; the AUC is
    P(random g1 value > random g2 value) + 0.5 * P(tie), i.e. the
    ROC-AUC of ``value`` as a classifier for the group.

    Exact tie handling with zero floating point until the end:
    ranks use the midrank convention, and DOUBLED midranks are
    integers — a tied block occupying 0-based positions
    [start, start + c) has doubled midrank ``2 * start + c + 1`` —
    so the rank sum, U, and the AUC numerator stay exact int64 (per
    value-block counts aggregate first, the window runs over the
    distinct-value frame like :func:`ks_statistic`). Returns one
    row: (n1, n2, u1_x2, auc) with ``u1_x2 = 2 * U1``.
    """
    c = (
        df.filter(F.col(group_col).isin([g1, g2]))
        .groupBy(value_col)
        .agg(
            F.sum(F.when(F.col(group_col) == g1, 1).otherwise(0))
            .cast("bigint")
            .alias("c1"),
            F.sum(F.when(F.col(group_col) == g2, 1).otherwise(0))
            .cast("bigint")
            .alias("c2"),
        )
        .withColumn("c", F.col("c1") + F.col("c2"))
    )
    w = (
        Window.orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = c.withColumn("cum", F.sum("c").over(w)).withColumn(
        "r1x2_term",
        # doubled midrank of the block times the g1 count in it:
        # start = cum - c (0-based), doubled midrank = 2*start + c + 1
        F.col("c1") * (F.lit(2) * (F.col("cum") - F.col("c")) + F.col("c") + 1),
    )
    tot = ranked.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum("r1x2_term").cast("bigint").alias("r1x2"),
    )
    return tot.select(
        "n1",
        "n2",
        # 2*U1 = 2*R1 - n1*(n1+1) = r1x2 - n1*(n1+1)
        (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1))
        .cast("bigint")
        .alias("u1_x2"),
        F.expr(
            "CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)"
            " / CAST(2 * n1 * n2 AS DOUBLE)"
        ).alias("auc"),
    )


def mannwhitney_oracle_sql(points_sql: str, g1_lit: str, g2_lit: str) -> str:
    """DuckDB mirror of :func:`mannwhitney_u`. ``points_sql`` yields
    (g, value) with BIGINT value."""
    return f"""
    WITH pts AS ({points_sql}),
    c AS (
        SELECT value,
               CAST(SUM(CASE WHEN g = {g1_lit} THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN g = {g2_lit} THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM pts WHERE g IN ({g1_lit}, {g2_lit}) GROUP BY value),
    ranked AS (
        SELECT c1, c2, c1 + c2 AS c,
               SUM(c1 + c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
                   AS cum
        FROM c),
    tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2,
               CAST(SUM(c1 * (2 * (cum - c) + c + 1)) AS BIGINT) AS r1x2
        FROM ranked)
    SELECT n1, n2,
           CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
               / CAST(2 * n1 * n2 AS DOUBLE) AS auc
    FROM tot
    """


def chisq_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Pearson chi-square test of independence between two
    categorical columns, plus Cramér's V effect size — the
    label-vs-feature leakage / drift audit a training-data pipeline
    runs before trusting a stratification column.

    Scale shape: one count aggregation collapses the table to its
    contingency cells (for real categoricals, bounded by the domain
    product, not the row count); margins are re-aggregations OF the
    cell frame (strictly smaller, broadcast back); nothing after the
    first shuffle touches data rows again.

    Cross-engine exactness: every per-cell input (O, R, C, N) is an
    exact BIGINT. The statistic is evaluated in the zero-cell-free
    form ``chi2 = SUM(O^2 * N / (R * C)) - N`` (algebraically equal
    to SUM (O-E)^2/E over ALL cells including unobserved ones, which
    the cell frame by construction omits but which still carry
    E = R*C/N); each term is computed in double from identical
    integers (products in double — at petabyte row counts ``O*N``
    would wrap int64), quantized to DECIMAL(28,12), summed exactly,
    N subtracted exactly, final round(6) — the q148 ``tf*ln(p)``
    discipline. Returns one row:
    (n, n_a, n_b, dof, chi2, cramers_v).
    """
    cells = (
        df.select(
            F.col(a_col).cast("string").alias("a"),
            F.col(b_col).cast("string").alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    ra = cells.groupBy("a").agg(F.sum("o").cast("bigint").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("o").cast("bigint").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("a").cast("bigint").alias("n_a"),
        F.countDistinct("b").cast("bigint").alias("n_b"),
    )
    term = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_a",
            "n_b",
            F.expr(
                "CAST(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)"
                " * CAST(n AS DOUBLE)"
                " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))"
                " AS DECIMAL(28,12))"
            ).alias("t"),
        )
    )
    return (
        term.groupBy("n", "n_a", "n_b")
        .agg(F.sum("t").alias("__s"))
        .withColumn(
            "chi2",
            F.round(
                (F.col("__s") - F.col("n").cast("decimal(28,12)")).cast(
                    "double"
                ),
                6,
            ),
        )
        .select(
            "n",
            "n_a",
            "n_b",
            ((F.col("n_a") - 1) * (F.col("n_b") - 1))
            .cast("bigint")
            .alias("dof"),
            "chi2",
            # single-category columns make the denominator 0: Spark
            # double 0/0 is NaN while DuckDB division-by-zero is NULL
            # — return an explicit NULL on both sides
            F.when(
                F.least(F.col("n_a") - 1, F.col("n_b") - 1) > 0,
                F.round(
                    F.sqrt(
                        F.col("chi2")
                        / (
                            F.col("n").cast("double")
                            * F.least(
                                F.col("n_a") - 1, F.col("n_b") - 1
                            ).cast("double")
                        )
                    ),
                    6,
                ),
            ).alias("cramers_v"),
        )
    )


def chisq_oracle_sql(points_sql: str) -> str:
    """DuckDB mirror of :func:`chisq_independence`. ``points_sql``
    yields (a, b) string pairs, nulls pre-filtered or not (mirrored
    filter applied here)."""
    return f"""
    WITH pts AS (SELECT * FROM ({points_sql})
                 WHERE a IS NOT NULL AND b IS NOT NULL),
    cells AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
        FROM pts GROUP BY a, b),
    ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
    cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
                   CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b
            FROM cells),
    term AS (
        SELECT t.n, t.n_a, t.n_b,
               CAST(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
                    * CAST(t.n AS DOUBLE)
                    / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                    AS DECIMAL(28,12)) AS t
        FROM cells JOIN ra USING (a) JOIN cb USING (b), tot t),
    s AS (
        SELECT n, n_a, n_b,
               round(CAST(SUM(t) - CAST(n AS DECIMAL(28,12)) AS DOUBLE),
                     6) AS chi2
        FROM term GROUP BY n, n_a, n_b)
    SELECT n, n_a, n_b,
           CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
           chi2,
           CASE WHEN least(n_a - 1, n_b - 1) > 0
                THEN round(sqrt(chi2 / (CAST(n AS DOUBLE)
                     * CAST(least(n_a - 1, n_b - 1) AS DOUBLE))), 6)
                END AS cramers_v
    FROM s
    """


def mutual_information(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Mutual information (in bits) between two categorical columns
    with its normalized form NMI = MI / sqrt(H(a) * H(b)) — the
    information-theoretic complement of :func:`chisq_independence`
    (chi-square asks "is there ANY dependence"; MI measures HOW MUCH,
    on a scale comparable across column pairs — the feature-relevance
    ranking a training pipeline uses to pick stratification keys or
    detect target leakage).

    Same cell-frame scale shape as chi-square: one shuffle to cells,
    margins re-aggregate the cell frame. Cross-engine exactness:
    MI = SUM (O/N) * log2(O*N / (R*C)) with every input an identical
    BIGINT; each term (and each marginal-entropy term
    -(R/N)*log2(R/N)) is quantized to DECIMAL(28,12), summed exactly,
    final round(6) absorbing sub-ulp libm differences. Returns one
    row: (n, mi_bits, h_a, h_b, nmi).
    """
    cells = (
        df.select(
            F.col(a_col).cast("string").alias("a"),
            F.col(b_col).cast("string").alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    ra = cells.groupBy("a").agg(F.sum("o").cast("bigint").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("o").cast("bigint").alias("c"))
    n = cells.agg(F.sum("o").cast("bigint").alias("n"))
    mi = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "n",
            F.expr(
                "CAST((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))"
                " * LOG2(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)"
                "        / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))"
                " AS DECIMAL(28,12))"
            ).alias("t"),
        )
        .groupBy("n")
        .agg(F.round(F.sum("t").cast("double"), 6).alias("mi_bits"))
    )
    ent = (
        lambda m, cnt: m.crossJoin(F.broadcast(n))
        .select(
            F.expr(
                f"CAST(-(CAST({cnt} AS DOUBLE) / CAST(n AS DOUBLE))"
                f" * LOG2(CAST({cnt} AS DOUBLE) / CAST(n AS DOUBLE))"
                " AS DECIMAL(28,12))"
            ).alias("t")
        )
        .agg(F.round(F.sum("t").cast("double"), 6).alias("h"))
    )
    ha = ent(ra, "r").withColumnRenamed("h", "h_a")
    hb = ent(cb, "c").withColumnRenamed("h", "h_b")
    return (
        mi.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            "n",
            "mi_bits",
            "h_a",
            "h_b",
            F.when(
                (F.col("h_a") > 0) & (F.col("h_b") > 0),
                F.round(
                    F.col("mi_bits") / F.sqrt(F.col("h_a") * F.col("h_b")),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("nmi"),
        )
    )


def mutual_information_oracle_sql(points_sql: str) -> str:
    """DuckDB mirror of :func:`mutual_information`."""
    return f"""
    WITH pts AS (SELECT * FROM ({points_sql})
                 WHERE a IS NOT NULL AND b IS NOT NULL),
    cells AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
        FROM pts GROUP BY a, b),
    ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
    cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    mi AS (
        SELECT t.n,
               round(CAST(SUM(CAST(
                   (CAST(o AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * log2(CAST(o AS DOUBLE) * CAST(t.n AS DOUBLE)
                          / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
                   AS DECIMAL(28,12))) AS DOUBLE), 6) AS mi_bits
        FROM cells JOIN ra USING (a) JOIN cb USING (b), tot t
        GROUP BY t.n),
    ha AS (
        SELECT round(CAST(SUM(CAST(
                   -(CAST(r AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * log2(CAST(r AS DOUBLE) / CAST(t.n AS DOUBLE))
                   AS DECIMAL(28,12))) AS DOUBLE), 6) AS h_a
        FROM ra, tot t),
    hb AS (
        SELECT round(CAST(SUM(CAST(
                   -(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * log2(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
                   AS DECIMAL(28,12))) AS DOUBLE), 6) AS h_b
        FROM cb, tot t)
    SELECT n, mi_bits, h_a, h_b,
           CASE WHEN h_a > 0 AND h_b > 0
                THEN round(mi_bits / sqrt(h_a * h_b), 6)
                ELSE 0.0 END AS nmi
    FROM mi, ha, hb
    """


def fd_audit(
    df: DataFrame, candidates: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency audit (the Metanome/profiling primitive
    behind key discovery and denormalization safety): for each
    candidate ``lhs -> rhs``, does every lhs value map to exactly one
    rhs value? Reports per candidate the lhs group count, the number
    of VIOLATING groups (>1 distinct rhs), the worst fanout, and the
    verdict — the audit a pipeline runs before treating a column as
    a join key or collapsing a denormalized table.

    One count-distinct aggregation per candidate over (lhs, rhs)
    pairs — each is a single shuffle whose volume is the distinct
    pair count, not the row count; results union into one
    dimension-sized frame. NULL lhs rows are excluded (SQL FDs are
    defined over non-null determinants).
    """
    outs = []
    for lhs, rhs in candidates:
        g = (
            df.filter(F.col(lhs).isNotNull())
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("nd"))
        )
        outs.append(
            g.agg(
                F.lit(lhs).alias("lhs_col"),
                F.lit(rhs).alias("rhs_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
                F.max("nd").cast("bigint").alias("max_fanout"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.withColumn("holds", F.col("n_violating") == 0)


def fd_audit_oracle_sql(
    table: str, candidates: list[tuple[str, str]]
) -> str:
    """DuckDB mirror of :func:`fd_audit`."""
    parts = []
    for lhs, rhs in candidates:
        parts.append(f"""
        SELECT '{lhs}' AS lhs_col, '{rhs}' AS rhs_col,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(MAX(nd) AS BIGINT) AS max_fanout,
               SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
        FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd
              FROM {table} WHERE {lhs} IS NOT NULL GROUP BY {lhs})
        """)
    return " UNION ALL ".join(parts)


def decayed_trending(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    halflife_days: int = 1,
) -> DataFrame:
    """Exponentially-decayed activity scores per key — the trending /
    freshness-weighted monitor (half-life counting, as in decayed
    stream counters): each event contributes 2^-(age_days /
    halflife) to its key's count and value. A key with old volume
    decays away; a key with recent bursts rises — what a raw COUNT
    (q05) or a windowed agg (q73) can't express without materializing
    every window.

    Cross-engine exactness: age is a CALENDAR-DAY difference (both
    engines agree on date subtraction, unlike fractional epoch
    seconds), the weight 1 / (1 << k) is an EXACT power of two in
    binary floating point (never a libm pow call), and the per-event
    product value·w is one IEEE multiply of identical operands. Terms
    quantize via ``round(x * 1e12) -> BIGINT`` — NOT a decimal cast:
    2^-k in decimal always terminates in ...5, so at k = 13 a
    DECIMAL(28,12) cast lands on an EXACT tie and the engines split
    (Spark HALF_UP vs DuckDB half-even; measured +5.7e-11 drift at
    sf0.01). ``round()`` on positive doubles is half-away-from-zero
    on both engines, and the fixed-point longs sum exactly in
    DECIMAL(38,0). Ages beyond 62 half-lives clamp to weight 0
    (below the 1e-12 grid anyway).

    Scale shape: one scan, one hash aggregate onto |keys| rows; the
    reference timestamp (max ts) rides a 1-row broadcast. Decayed
    counters are NOT mergeable across different reference times —
    re-score per run, or fix T upstream for incremental rollups.

    Returns (key_col, n_events, decayed_count, decayed_value),
    decayed_* as DOUBLE of the exact decimal sums.
    """
    tmax = df.agg(F.max(F.to_date(F.col(ts_col))).alias("__tmax"))
    k = F.least(
        F.floor(
            F.datediff(F.col("__tmax"), F.to_date(F.col(ts_col)))
            / F.lit(halflife_days)
        ).cast("int"),
        F.lit(62),
    )
    # shiftleft needs a column shift amount -> SQL form over a
    # materialized __k (the python API only takes a literal int)
    w = F.expr("1.0d / CAST(shiftleft(CAST(1 AS BIGINT), __k) AS DOUBLE)")
    return (
        df.crossJoin(F.broadcast(tmax))
        .select(key_col, value_col, k.alias("__k"))
        .select(
            F.col(key_col),
            w.alias("__w"),
            (F.col(value_col).cast("double") * w).alias("__wv"),
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (
                F.sum(
                    F.round(F.col("__w") * F.lit(1e12))
                    .cast("bigint")
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.lit(1e12)
            ).alias("decayed_count"),
            (
                F.sum(
                    F.round(F.col("__wv") * F.lit(1e12))
                    .cast("bigint")
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.lit(1e12)
            ).alias("decayed_value"),
        )
    )


def decayed_trending_sql(
    table: str = "events",
    ts: str = "ts",
    key: str = "event_type",
    value: str = "value",
    halflife_days: int = 1,
) -> str:
    """DuckDB mirror of :func:`decayed_trending`."""
    return f"""
    WITH dt_t AS (SELECT MAX(CAST({ts} AS DATE)) AS tmax FROM {table}),
    dt_w AS (
        SELECT {key},
               1.0 / CAST(CAST(1 AS BIGINT) << LEAST(
                   CAST(floor(date_diff('day', CAST({ts} AS DATE),
                                        dt_t.tmax)
                              / {halflife_days}) AS INTEGER), 62)
                   AS DOUBLE) AS w,
               CAST({value} AS DOUBLE) AS v
        FROM {table}, dt_t)
    SELECT {key},
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(round(w * 1e12) AS BIGINT)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e12
               AS decayed_count,
           CAST(SUM(CAST(CAST(round(v * w * 1e12) AS BIGINT)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e12
               AS decayed_value
    FROM dt_w GROUP BY 1"""


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_cents_col: str,
    id_col: str,
    smoothing: int = 10,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing — the
    categorical-feature encoder gradient-boosting pipelines use
    (Micci-Barreca SIGKDD Expl. 2001; CatBoost's ordered variant is
    this plus a permutation): enc_i = (sum_cat(y) − y_i + m·ȳ) /
    (n_cat − 1 + m). Leaving the row's own target out prevents the
    direct-leakage overfit of naive mean encoding; the prior pull m·ȳ
    tames rare categories (and makes singletons well-defined).

    Exactness: targets arrive as exact integer cents (BIGINT), and
    the smoothed mean is computed as ONE exact integer fraction —
    enc = ((sum_cat − y_i)·N + m·total) / ((n_cat − 1 + m)·N), both
    sides DECIMAL(38,0) — then a single double division. No round()
    anywhere: round(x, 6) at magnitude ~1e7 is NOT engine-portable
    (Spark goes through BigDecimal's exact binary expansion, DuckDB
    rounds in scaled double space whose ULP at 1e13 is ~4e-3 — the
    sf0.1 gate caught ±1e-6 flips), whereas a division of identical
    exact integers is bit-identical by IEEE.

    Scale shape: one |categories|-row aggregate broadcast back, one
    1-row global broadcast; the encoding itself is row-local. Returns
    (id_col, cat_col, enc).
    """
    cs = df.groupBy(cat_col).agg(
        F.sum(target_cents_col).cast("bigint").alias("__cs"),
        F.count(F.lit(1)).cast("bigint").alias("__cn"),
    )
    g = df.agg(
        F.sum(target_cents_col).cast("bigint").alias("__tot"),
        F.count(F.lit(1)).cast("bigint").alias("__nt"),
    )
    num = (
        (F.col("__cs") - F.col(target_cents_col)).cast("decimal(38,0)")
        * F.col("__nt")
        + F.lit(smoothing).cast("decimal(38,0)") * F.col("__tot")
    )
    den = (F.col("__cn") - 1 + smoothing).cast("decimal(38,0)") * F.col(
        "__nt"
    )
    return (
        df.join(F.broadcast(cs), cat_col)
        .crossJoin(F.broadcast(g))
        .select(
            id_col,
            cat_col,
            (num.cast("double") / den.cast("double")).alias("enc"),
        )
    )


def target_encode_loo_sql(
    rows_sql: str,
    cat: str = "cat",
    y: str = "y",
    id_: str = "id",
    smoothing: int = 10,
) -> str:
    """DuckDB mirror of :func:`target_encode_loo`; ``rows_sql`` must
    yield (id_, cat, y) with y exact integer cents."""
    return f"""
    WITH te_b AS ({rows_sql}),
    te_c AS (SELECT {cat}, CAST(SUM({y}) AS BIGINT) AS cs,
                    CAST(COUNT(*) AS BIGINT) AS cn
             FROM te_b GROUP BY 1),
    te_g AS (SELECT CAST(SUM({y}) AS BIGINT) AS tot,
                    CAST(COUNT(*) AS BIGINT) AS nt
             FROM te_b)
    SELECT b.{id_}, b.{cat},
           CAST(CAST(cs - b.{y} AS DECIMAL(38,0)) * nt
                + CAST({smoothing} AS DECIMAL(38,0)) * tot AS DOUBLE)
           / CAST(CAST(cn - 1 + {smoothing} AS DECIMAL(38,0)) * nt
                  AS DOUBLE) AS enc
    FROM te_b b JOIN te_c USING ({cat}), te_g"""


def wilson_rank(
    df: DataFrame,
    key_col: str,
    success_col: str,
    z: float = 1.96,
    min_trials: int = 1,
) -> DataFrame:
    """Rank keys by the Wilson score interval's LOWER bound on their
    success rate (Wilson 1927; the "how not to sort by average
    rating" construct): a key with 2/2 successes must NOT outrank one
    with 98/100 — the lower bound prices in sample size, the raw rate
    does not. The standard ranking for review scores, CTRs, and
    (in a data pipeline) per-source pass-rates from a small audited
    sample.

    lb = (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n).

    Cross-engine determinism: n and s are exact BIGINTs and sqrt is
    correctly rounded by IEEE mandate, but the multiply-add CHAIN is
    not contraction-safe (one engine may fuse a*b+c, shifting the
    last ULP — observed at the sf0.01 gate), so both sides round the
    two output rates to 6 decimals; at magnitude <= 1 that rounding
    is itself portable (unlike round(,6) at 1e7, see
    target_encode_loo).

    One hash aggregate onto |keys| rows; everything after is
    row-local. Returns (key, n_trials, n_success, rate, wilson_lb).
    """
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trials"),
        F.sum(F.col(success_col).cast("int"))
        .cast("bigint")
        .alias("n_success"),
    ).filter(F.col("n_trials") >= min_trials)
    n = F.col("n_trials").cast("double")
    p = F.col("n_success").cast("double") / n
    z2 = z * z
    lb = (
        p
        + F.lit(z2) / (2 * n)
        - F.lit(z)
        * F.sqrt(p * (1 - p) / n + F.lit(z2) / (4 * n * n))
    ) / (1 + F.lit(z2) / n)
    return agg.select(
        key_col,
        "n_trials",
        "n_success",
        F.round(p, 6).alias("rate"),
        F.round(lb, 6).alias("wilson_lb"),
    )


def wilson_rank_sql(
    rows_sql: str,
    key: str = "k",
    success: str = "s",
    z: float = 1.96,
    min_trials: int = 1,
) -> str:
    """DuckDB mirror of :func:`wilson_rank`; ``rows_sql`` yields
    (key, success 0/1)."""
    z2 = z * z
    return f"""
    WITH wr_b AS ({rows_sql}),
    wr_a AS (
        SELECT {key}, CAST(COUNT(*) AS BIGINT) AS n_trials,
               CAST(SUM(CAST({success} AS INTEGER)) AS BIGINT)
                   AS n_success
        FROM wr_b GROUP BY 1
        HAVING COUNT(*) >= {min_trials})
    SELECT {key}, n_trials, n_success,
           round(CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE),
                 6) AS rate,
           round((CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE)
            + {z2} / (2 * CAST(n_trials AS DOUBLE))
            - {z} * sqrt(
                (CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE))
                * (1 - CAST(n_success AS DOUBLE)
                       / CAST(n_trials AS DOUBLE))
                / CAST(n_trials AS DOUBLE)
                + {z2} / (4 * CAST(n_trials AS DOUBLE)
                            * CAST(n_trials AS DOUBLE))))
           / (1 + {z2} / CAST(n_trials AS DOUBLE)), 6) AS wilson_lb
    FROM wr_a"""


def theil_sen_trend(
    points: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Theil-Sen robust trend: the MEDIAN of all pairwise
    slopes (Theil 1950 / Sen 1968) — the robust twin of
    :func:`ols_trend` exactly as MAD (q112) is of the z-score:
    up to ~29% contaminated points cannot move it, where one bad
    week drags OLS arbitrarily.

    Determinism: slope candidates carry their EXACT integer
    components (dy, dx BIGINT); selection orders by the double
    slope with (dy, dx) as exact tiebreak — identical doubles and
    identical tiebreaks on both engines pick the identical pair —
    and the reported slope is that pair's one double division. Lower
    median (rank ⌈n/2⌉) on purpose: no averaging of two middles, so
    no second float op.

    Scale shape: pairwise slopes are O(k²) PER GROUP over
    PRE-AGGREGATED points (weekly/daily rollups — k is time buckets,
    never raw rows); the self-join carries the group key so pairs
    never cross groups, and the median is one group-partitioned
    window over k² rows. For raw-row inputs aggregate first (as the
    gate query does).

    Returns (group_cols..., n_pairs, dy, dx, slope).
    """
    g = [F.col(c) for c in group_cols]
    base = points.select(
        *g,
        F.col(x_col).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.__x") < F.col("b.__x")
    for c in group_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in group_cols],
        (F.col("b.__y") - F.col("a.__y")).alias("dy"),
        (F.col("b.__x") - F.col("a.__x")).alias("dx"),
    )
    slope = F.col("dy").cast("double") / F.col("dx").cast("double")
    w = Window.partitionBy(*group_cols).orderBy(
        slope.asc(), F.col("dy").asc(), F.col("dx").asc()
    )
    wn = Window.partitionBy(*group_cols)
    ranked = pairs.select(
        *group_cols,
        "dy",
        "dx",
        F.row_number().over(w).cast("bigint").alias("__r"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("__n"),
    )
    return ranked.filter(
        F.col("__r") * 2 == F.col("__n") + (F.col("__n") % 2)
    ).select(
        *group_cols,
        F.col("__n").alias("n_pairs"),
        "dy",
        "dx",
        (F.col("dy").cast("double") / F.col("dx").cast("double")).alias(
            "slope"
        ),
    )


def theil_sen_oracle_sql(
    points_sql: str, group_cols: list[str], x: str = "x", y: str = "y"
) -> str:
    """DuckDB mirror of :func:`theil_sen_trend`; ``points_sql`` must
    yield (group_cols..., x, y) with x/y exact BIGINTs."""
    gl = ", ".join(group_cols)
    on = " AND ".join(f"a.{c} = b.{c}" for c in group_cols)
    ga = ", ".join(f"a.{c} AS {c}" for c in group_cols)
    return f"""
    WITH ts_p AS ({points_sql}),
    ts_pairs AS (
        SELECT {ga},
               CAST(b.{y} - a.{y} AS BIGINT) AS dy,
               CAST(b.{x} - a.{x} AS BIGINT) AS dx
        FROM ts_p a JOIN ts_p b ON {on} AND a.{x} < b.{x}),
    ts_r AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY {gl}
                   ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE),
                            dy, dx) AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY {gl}) AS BIGINT) AS n
        FROM ts_pairs)
    SELECT {gl}, n AS n_pairs, dy, dx,
           CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS slope
    FROM ts_r WHERE r * 2 = n + (n % 2)"""


def lead_lag_corr(
    a: DataFrame,
    b: DataFrame,
    max_lag: int = 7,
    t_col: str = "t",
    v_col: str = "v",
) -> DataFrame:
    """Lead-lag cross-correlation between two integer time series:
    Pearson correlation of (a_t, b_{t+lag}) for every lag in
    [-max_lag, +max_lag] — the alignment scan behind "does A's spike
    LEAD B's?" (demand vs supply, ingest vs errors). The argmax lag
    is the causal-direction hint a plain same-day corr (q127) hides.

    Exactness: values are exact BIGINTs (cents/counts); per lag the
    five sufficient statistics are exact DECIMAL(38,0) sums, the
    Pearson numerator/denominators are exact decimal products, and
    the only float ops are two decimal→double casts, one multiply,
    one sqrt (IEEE-exact), one divide — rounded to 6 at magnitude
    ≤ 1, where that rounding is itself portable.

    Scale shape: the inputs are PRE-AGGREGATED series (daily rollups
    — the data-sized work happens upstream); each a-row explodes to
    2·max_lag+1 lag rows and joins b on the shifted key — one shuffle
    over (2k+1)·|series| rows, then a (2k+1)-row aggregate. Returns
    (lag, n, corr) for lags with ≥ 2 aligned points and nonzero
    variance.
    """
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    al = a.select(
        F.col(t_col).cast("bigint").alias("ta"),
        F.col(v_col).cast("bigint").alias("x"),
    ).select("ta", "x", lags)
    bl = b.select(
        F.col(t_col).cast("bigint").alias("tb"),
        F.col(v_col).cast("bigint").alias("y"),
    )
    joined = al.join(bl, F.col("tb") == F.col("ta") + F.col("lag"))
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    stats = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * F.col("y")).alias("sxy"),
        F.sum(d("x") * F.col("x")).alias("sxx"),
        F.sum(d("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = n * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = n * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        stats.filter(F.col("n") >= 2)
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n",
            num.cast("double").alias("__num"),
            d1.cast("double").alias("__d1"),
            d2.cast("double").alias("__d2"),
        )
        .filter((F.col("__d1") > 0) & (F.col("__d2") > 0))
        .select(
            "lag",
            "n",
            F.round(
                F.col("__num")
                / F.sqrt(F.col("__d1") * F.col("__d2")),
                6,
            ).alias("corr"),
        )
    )


def lead_lag_corr_sql(
    a_sql: str, b_sql: str, max_lag: int = 7
) -> str:
    """DuckDB mirror of :func:`lead_lag_corr`; ``a_sql``/``b_sql``
    must yield (t, v) with BIGINT values."""
    return f"""
    WITH ll_a AS ({a_sql}),
    ll_b AS ({b_sql}),
    ll_j AS (
        SELECT u.lag, a.v AS x, b.v AS y
        FROM ll_a a
        CROSS JOIN unnest(range({-max_lag}, {max_lag + 1})) AS u(lag)
        JOIN ll_b b ON b.t = a.t + u.lag),
    ll_s AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(x AS DECIMAL(38,0))) AS sx,
               SUM(CAST(y AS DECIMAL(38,0))) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        FROM ll_j GROUP BY 1),
    ll_t AS (
        SELECT CAST(lag AS INTEGER) AS lag, n,
               CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
                   AS num,
               CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
                   AS d1,
               CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)
                   AS d2
        FROM ll_s WHERE n >= 2)
    SELECT lag, n, round(num / sqrt(d1 * d2), 6) AS corr
    FROM ll_t WHERE d1 > 0 AND d2 > 0"""


# --------------------------------------------------------------------
# Multi-touch attribution
# --------------------------------------------------------------------

def attribution(
    purchases: DataFrame,
    touches: DataFrame,
    lookback_days: int = 7,
) -> DataFrame:
    """Multi-touch revenue attribution over a conversion lookback
    window: for every purchase, credit its value (exact cents) to the
    user's touch events in the ``lookback_days`` before it under
    three standard models at once —

    * ``first_cents``: all credit to the earliest touch in window;
    * ``last_cents``: all credit to the latest touch before the
      purchase;
    * ``linear_cents``: cents split evenly by INTEGER division, the
      remainder going to the earliest touch — exact BIGINT
      conservation (the three columns each sum to the total cents of
      attributed purchases; floats would leak pennies and break the
      cross-engine gate).

    Inputs: ``purchases`` (user_id, ts, event_id, cents) and
    ``touches`` (user_id, ts, event_id, event_type). Returns one row
    per touch event_type with the three credited totals and
    ``n_touches``.

    Scale shape: a per-user range join (purchase x touches-in-window
    — bounded by touch density, never corpus²), then one window over
    each purchase to rank its touches and count them, then a narrow
    final aggregate. The purchase-scoped window shuffles on the
    purchase key, which is unique — no skew; at 100 TB the range
    join is the cost and AQE handles per-user fan-out.
    """
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.col("cents").alias("p_cents"),
    )
    t = touches.select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
    )
    joined = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        ),
    )
    w = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    ranked = joined.select(
        "p_id",
        "p_cents",
        "t_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("p_id")).alias("n"),
    )
    first_c = F.when(F.col("rn") == 1, F.col("p_cents")).otherwise(F.lit(0))
    last_c = F.when(F.col("rn") == F.col("n"), F.col("p_cents")).otherwise(
        F.lit(0)
    )
    # integer split: floor share to everyone, remainder to the first
    share = F.expr("p_cents DIV n")
    linear_c = share + F.when(
        F.col("rn") == 1, F.col("p_cents") % F.col("n")
    ).otherwise(F.lit(0))
    return (
        ranked.groupBy(F.col("t_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(first_c).cast("bigint").alias("first_cents"),
            F.sum(last_c).cast("bigint").alias("last_cents"),
            F.sum(linear_c).cast("bigint").alias("linear_cents"),
        )
    )


def attribution_sql(
    purchases_sql: str,
    touches_sql: str,
    lookback_days: int = 7,
) -> str:
    """DuckDB mirror of :func:`attribution` (same range join, same
    (ts, event_id) rank order, same integer remainder-to-first
    split)."""
    return f"""
    WITH at_p AS ({purchases_sql}),
    at_t AS ({touches_sql}),
    at_j AS (
        SELECT p.event_id AS p_id, p.cents AS p_cents,
               t.event_type AS t_type, t.ts AS t_ts,
               t.event_id AS t_id
        FROM at_p p JOIN at_t t
          ON t.user_id = p.user_id
         AND t.ts < p.ts
         AND t.ts >= p.ts - INTERVAL {int(lookback_days)} DAY),
    at_r AS (
        SELECT p_id, p_cents, t_type,
               row_number() OVER (PARTITION BY p_id
                                  ORDER BY t_ts, t_id) AS rn,
               COUNT(*) OVER (PARTITION BY p_id) AS n
        FROM at_j)
    SELECT t_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(CASE WHEN rn = 1 THEN p_cents ELSE 0 END)
                AS BIGINT) AS first_cents,
           CAST(SUM(CASE WHEN rn = n THEN p_cents ELSE 0 END)
                AS BIGINT) AS last_cents,
           CAST(SUM(p_cents // n
                    + CASE WHEN rn = 1 THEN p_cents % n ELSE 0 END)
                AS BIGINT) AS linear_cents
    FROM at_r GROUP BY 1"""


# --------------------------------------------------------------------
# Spearman rank correlation (robust twin of the Pearson matrix)
# --------------------------------------------------------------------

def spearman_corr(
    series: DataFrame,
    metric_col: str = "metric",
    t_col: str = "t",
    v_col: str = "v",
) -> DataFrame:
    """Pairwise Spearman rank correlation between aligned series —
    the robust twin of q127's Pearson matrix: monotone-invariant and
    immune to the heavy-tailed daily totals that drag moment-based
    correlation around.

    Input is LONG format (metric, t, v) with exact integer values.
    Ranks use the standard average-tie convention, held exact as
    DOUBLED ranks (``2*rank_min + ties - 1`` — always an integer, so
    the whole rank transform and every sufficient statistic stays in
    BIGINT; the only floats are the final two sqrts, one multiply,
    one divide, rounded at 6). rho is Pearson on the doubled ranks
    (scaling both variables by 2 cancels).

    Scale shape: one rank window per metric (series are
    pre-aggregated — days, not events), a t-aligned self-join of the
    dimension-sized rank frame for metric pairs, and one exact
    sufficient-stats aggregate per pair. BIGINT stats are exact up to
    ~1e5 aligned points per pair; beyond that widen to
    DECIMAL(38,0).

    Returns (m_a, m_b, n, rho) for every metric pair m_a < m_b over
    the t-values BOTH series cover.
    """
    w_rank = Window.partitionBy(metric_col).orderBy(v_col)
    w_ties = Window.partitionBy(metric_col, v_col)
    # doubled average-tie rank = rank_min + rank_max
    # = 2*rank_min + (ties - 1), rank() being the 1-based min rank
    ranked = series.select(
        F.col(metric_col).alias("m"),
        F.col(t_col).alias("t"),
        (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_ties)
            - F.lit(1)
        )
        .cast("bigint")
        .alias("r2"),
    )
    a = ranked.select(
        F.col("m").alias("m_a"), "t", F.col("r2").alias("x")
    )
    b = ranked.select(
        F.col("m").alias("m_b"), "t", F.col("r2").alias("y")
    )
    j = a.join(b, "t").filter(F.col("m_a") < F.col("m_b"))
    s = j.groupBy("m_a", "m_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y * y")).cast("bigint").alias("syy"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        "m_a",
        "m_b",
        "n",
        F.when(
            (dx > 0) & (dy > 0),
            F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6),
        ).alias("rho"),
    )


def spearman_oracle_sql(series_sql: str) -> str:
    """DuckDB mirror of :func:`spearman_corr` over a (metric, t, v)
    subquery — same doubled average-tie ranks, same exact BIGINT
    sufficient statistics, same float tail."""
    return f"""
    WITH sp_src AS ({series_sql}),
    sp_r AS (
        SELECT metric AS m, t,
               CAST(2 * rank() OVER (PARTITION BY metric ORDER BY v)
                    + COUNT(*) OVER (PARTITION BY metric, v)
                    - 1 AS BIGINT) AS r2
        FROM sp_src),
    sp_j AS (
        SELECT a.m AS m_a, b.m AS m_b, a.r2 AS x, b.r2 AS y
        FROM sp_r a JOIN sp_r b ON a.t = b.t AND a.m < b.m),
    sp_s AS (
        SELECT m_a, m_b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM sp_j GROUP BY 1, 2)
    SELECT m_a, m_b, n,
           CASE WHEN (n * sxx - sx * sx) > 0
                 AND (n * syy - sy * sy) > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))),
                           6)
           END AS rho
    FROM sp_s"""


# --------------------------------------------------------------------
# Sequential pattern mining (bounded subsequence support)
# --------------------------------------------------------------------

def sequence_mining(
    events: DataFrame,
    min_support: int = 5,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Frequent sequential patterns of length 2 and 3 (the useful
    prefix of PrefixSpan / GSP, Srikant & Agrawal 1996): a user
    SUPPORTS pattern ``a>b`` if some a-event precedes some b-event
    in their timeline (any gap), and ``a>b>c`` likewise; support =
    distinct users. Generalizes q102 (adjacent transitions only) and
    q239 (one fixed funnel, occurrence-counted).

    The naive shape joins each user's timeline against itself once
    per pattern position — O(n^k) per user. This implementation uses
    the bounds reduction: with ``pos`` the per-user event rank,
    ``a>b`` holds iff ``min_pos(a) < max_pos(b)`` (take the earliest
    a and the latest b), and ``a>b>c`` holds iff some b-event lies
    strictly between ``min_pos(a)`` and ``max_pos(c)``. So the work
    is one rank window, a per-(user, type) min/max aggregate
    (dimension-sized: |types| rows per user), a |types|² bounds
    cross per user, and for triples one bounded join of the event
    stream against those bounds — linear in events with a |types|²
    constant, never n².

    Returns (pattern, support) with support >= ``min_support``.
    """
    ts_col, id_col = order_cols
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.row_number().over(w).alias("pos"),
    )
    bounds = ev.groupBy("u", "et").agg(
        F.min("pos").alias("mn"), F.max("pos").alias("mx")
    )
    a = bounds.select(
        "u", F.col("et").alias("ta"), F.col("mn").alias("a_mn")
    )
    c = bounds.select(
        "u", F.col("et").alias("tc"), F.col("mx").alias("c_mx")
    )
    p2 = (
        a.join(c, "u")
        .filter(F.col("a_mn") < F.col("c_mx"))
        .select(
            F.concat_ws(">", "ta", "tc").alias("pattern"), "u"
        )
    )
    ac = a.join(c, "u").filter(F.col("a_mn") + 1 < F.col("c_mx"))
    p3 = (
        ac.join(ev.select("u", F.col("et").alias("tb"), "pos"), "u")
        .filter(
            (F.col("pos") > F.col("a_mn"))
            & (F.col("pos") < F.col("c_mx"))
        )
        .select(
            F.concat_ws(">", "ta", "tb", "tc").alias("pattern"), "u"
        )
        .distinct()
    )
    return (
        p2.unionByName(p3)
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def sequence_mining_sql(
    events_sql: str,
    min_support: int = 5,
) -> str:
    """DuckDB mirror of :func:`sequence_mining` — deliberately the
    NAIVE subsequence joins (distinct users over an O(n^2)/O(n^3)
    per-user self-join). The two shapes agree only if the bounds
    reduction is exactly right, the strongest check the gate can
    make (q239's pattern). Input subquery must yield
    (user_id, event_type, ts, event_id)."""
    return f"""
    WITH sm_e AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS pos
        FROM ({events_sql})),
    sm_p2 AS (
        SELECT DISTINCT x.event_type || '>' || y.event_type AS pattern,
               x.user_id
        FROM sm_e x JOIN sm_e y
          ON y.user_id = x.user_id AND y.pos > x.pos),
    sm_p3 AS (
        SELECT DISTINCT x.event_type || '>' || y.event_type
                   || '>' || z.event_type AS pattern,
               x.user_id
        FROM sm_e x
        JOIN sm_e y ON y.user_id = x.user_id AND y.pos > x.pos
        JOIN sm_e z ON z.user_id = y.user_id AND z.pos > y.pos),
    sm_all AS (
        SELECT pattern, user_id FROM sm_p2
        UNION ALL
        SELECT pattern, user_id FROM sm_p3)
    SELECT pattern, CAST(COUNT(*) AS BIGINT) AS support
    FROM sm_all GROUP BY 1
    HAVING COUNT(*) >= {int(min_support)}"""


# --------------------------------------------------------------------
# Isotonic regression calibration (PAV via the minimax formula)
# --------------------------------------------------------------------

def isotonic_fit(
    bins: DataFrame,
    bin_col: str = "bin",
    y_col: str = "y",
    c_col: str = "c",
) -> DataFrame:
    """Isotonic regression over pre-aggregated score bins — the
    model-calibration step (Zadrozny & Elkan 2002) that maps a raw
    score to a MONOTONE success rate, where q230's quantile
    normalization only aligns distributions. Computed by the minimax
    characterization of the pool-adjacent-violators solution
    (Robertson-Wright-Dykstra 1988, Thm 1.4.4):

        iso(i) = max_{j<=i} min_{k>=i} mean(y over bins j..k)

    which needs no sequential pooling loop — the whole fit is two
    dimension-sized joins over the B-row bin frame (B² interval
    means from exclusive prefix sums, then a (j,i,k) min/max
    cascade, O(B³) rows with B fixed), after ONE corpus-scale count
    aggregate produced the bins. Every interval mean is one divide
    of exact BIGINTs — identical doubles cross-engine, so min/max
    selection is portable; final round(6).

    Input: (bin, y, c) with integer successes/trials per ascending
    score bin. Returns (bin, c, y, rate, iso_rate) with iso_rate
    non-decreasing in bin and conserving sum(iso_rate * c) = sum(y).
    """
    w = Window.orderBy(bin_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = bins.select(
        F.col(bin_col).alias("b"),
        F.col(y_col).cast("bigint").alias("y"),
        F.col(c_col).cast("bigint").alias("c"),
        (F.sum(y_col).over(w) - F.col(y_col))
        .cast("bigint")
        .alias("y_excl"),
        (F.sum(c_col).over(w) - F.col(c_col))
        .cast("bigint")
        .alias("c_excl"),
        F.sum(y_col).over(w).cast("bigint").alias("y_incl"),
        F.sum(c_col).over(w).cast("bigint").alias("c_incl"),
    )
    j = pref.select(
        F.col("b").alias("j"),
        F.col("y_excl").alias("jy"),
        F.col("c_excl").alias("jc"),
    )
    k = pref.select(
        F.col("b").alias("k"),
        F.col("y_incl").alias("ky"),
        F.col("c_incl").alias("kc"),
    )
    pairs = (
        j.join(k, F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (
                (F.col("ky") - F.col("jy")).cast("double")
                / (F.col("kc") - F.col("jc")).cast("double")
            ).alias("mean"),
        )
    )
    i = pref.select(F.col("b").alias("i"))
    mn = (
        pairs.join(
            i, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i"))
        )
        .groupBy("j", "i")
        .agg(F.min("mean").alias("mn"))
    )
    iso = mn.groupBy("i").agg(F.round(F.max("mn"), 6).alias("iso_rate"))
    return (
        bins.select(
            F.col(bin_col).alias("bin"),
            F.col(c_col).cast("bigint").alias("c"),
            F.col(y_col).cast("bigint").alias("y"),
            F.round(
                F.col(y_col).cast("double") / F.col(c_col).cast("double"),
                6,
            ).alias("rate"),
        )
        .join(iso, F.col("bin") == F.col("i"))
        .select("bin", "c", "y", "rate", "iso_rate")
    )


def isotonic_oracle_sql(bins_sql: str) -> str:
    """DuckDB mirror of :func:`isotonic_fit` over a (bin, y, c)
    subquery — same exclusive-prefix interval means, same minimax
    cascade."""
    return f"""
    WITH if_b AS ({bins_sql}),
    if_p AS (
        SELECT bin AS b, CAST(y AS BIGINT) AS y, CAST(c AS BIGINT) AS c,
               CAST(SUM(y) OVER (ORDER BY bin) - y AS BIGINT) AS y_excl,
               CAST(SUM(c) OVER (ORDER BY bin) - c AS BIGINT) AS c_excl,
               CAST(SUM(y) OVER (ORDER BY bin) AS BIGINT) AS y_incl,
               CAST(SUM(c) OVER (ORDER BY bin) AS BIGINT) AS c_incl
        FROM if_b),
    if_pairs AS (
        SELECT j.b AS j, k.b AS k,
               CAST(k.y_incl - j.y_excl AS DOUBLE)
                   / CAST(k.c_incl - j.c_excl AS DOUBLE) AS mean
        FROM if_p j JOIN if_p k ON j.b <= k.b),
    if_mn AS (
        SELECT p.j, i.b AS i, MIN(p.mean) AS mn
        FROM if_pairs p JOIN if_p i ON p.j <= i.b AND p.k >= i.b
        GROUP BY 1, 2),
    if_iso AS (
        SELECT i, round(MAX(mn), 6) AS iso_rate FROM if_mn GROUP BY 1)
    SELECT b.bin, CAST(b.c AS BIGINT) AS c, CAST(b.y AS BIGINT) AS y,
           round(CAST(b.y AS DOUBLE) / CAST(b.c AS DOUBLE), 6) AS rate,
           s.iso_rate
    FROM if_b b JOIN if_iso s ON s.i = b.bin"""


# --------------------------------------------------------------------
# COEC: position-bias-corrected click-through rate
# --------------------------------------------------------------------

def coec_ctr(
    views: DataFrame,
    clicks: DataFrame,
    click_window_min: int = 30,
    max_pos: int = 10,
    min_views: int = 20,
) -> DataFrame:
    """Clicks-over-expected-clicks (COEC; Zhang & Jones 2007 /
    Chapelle-Zhang WWW'09 examine-then-click family): naive CTR
    rewards items shown at good positions; COEC divides an item's
    clicks by the clicks EXPECTED from the positions it was actually
    shown at, using the global per-position prior.

    Inputs: ``views`` (user_id, item, ts, event_id) impressions —
    event_id a unique impression key — and ``clicks``
    (user_id, item, ts). A view converts if the same user clicks the
    same item within ``click_window_min`` minutes after it. Position
    is the view's rank within its user's day (capped at
    ``max_pos``) — the feed-order proxy.

    Determinism: the per-item expected-clicks sum adds one float
    prior per position group; both engines sum ``round(prior, 12)``
    as exact DECIMAL(24,12) (the PSI-term idiom), so accumulation
    order cannot split them. COEC itself is one divide, round(6).

    Scale shape: the click-match is a per-(user, item) interval
    join bounded by click density; position priors are a max_pos-row
    broadcast; everything else is two hash aggregates. Returns
    (item, views, clicks, ctr, coec) for items with >=
    ``min_views`` impressions.
    """
    # event_id is the final tiebreaker: two impressions with the same
    # (user, day, ts, item) would otherwise get engine-dependent pos
    w = Window.partitionBy(
        "user_id", F.to_date("ts")
    ).orderBy("ts", "item", "event_id")
    v = views.select(
        "user_id",
        "item",
        "ts",
        "event_id",
        F.least(F.row_number().over(w), F.lit(max_pos)).alias("pos"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("item").alias("c_item"),
        F.col("ts").alias("c_ts"),
    )
    matched = v.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_item") == F.col("item"))
        & (F.col("c_ts") > F.col("ts"))
        & (
            F.col("c_ts")
            <= F.col("ts") + F.expr(f"INTERVAL {int(click_window_min)} MINUTES")
        ),
        "left_semi",
    ).select("event_id", F.lit(1).alias("clicked"))
    imp = v.join(matched, "event_id", "left").select(
        "item", "pos", F.coalesce("clicked", F.lit(0)).alias("clicked")
    )
    prior = imp.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("v_p"),
        F.sum("clicked").cast("bigint").alias("c_p"),
    ).select(
        "pos",
        F.round(
            F.col("c_p").cast("double") / F.col("v_p").cast("double"), 12
        )
        .cast("decimal(24,12)")
        .alias("prior"),
    )
    per_item = (
        imp.join(F.broadcast(prior), "pos")
        .groupBy("item")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("views"),
            F.sum("clicked").cast("bigint").alias("clicks"),
            F.sum("prior").alias("expected"),
        )
        .filter(F.col("views") >= min_views)
    )
    return per_item.select(
        "item",
        "views",
        "clicks",
        F.round(
            F.col("clicks").cast("double") / F.col("views").cast("double"),
            6,
        ).alias("ctr"),
        F.when(
            F.col("expected") > 0,
            F.round(
                F.col("clicks").cast("double")
                / F.col("expected").cast("double"),
                6,
            ),
        ).alias("coec"),
    )


def coec_oracle_sql(
    views_sql: str,
    clicks_sql: str,
    click_window_min: int = 30,
    max_pos: int = 10,
    min_views: int = 20,
) -> str:
    """DuckDB mirror of :func:`coec_ctr`."""
    return f"""
    WITH co_v0 AS ({views_sql}),
    co_c AS ({clicks_sql}),
    co_v AS (
        SELECT user_id, item, ts,
               least(row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, item, event_id), {int(max_pos)}) AS pos
        FROM co_v0),
    co_i AS (
        SELECT v.item, v.pos,
               CASE WHEN EXISTS (
                   SELECT 1 FROM co_c c
                   WHERE c.user_id = v.user_id AND c.item = v.item
                     AND c.ts > v.ts
                     AND c.ts <= v.ts + INTERVAL {int(click_window_min)} MINUTE)
                    THEN 1 ELSE 0 END AS clicked
        FROM co_v v),
    co_p AS (
        SELECT pos,
               CAST(round(CAST(SUM(clicked) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE), 12)
                    AS DECIMAL(24,12)) AS prior
        FROM co_i GROUP BY 1),
    co_a AS (
        SELECT i.item,
               CAST(COUNT(*) AS BIGINT) AS views,
               CAST(SUM(i.clicked) AS BIGINT) AS clicks,
               SUM(p.prior) AS expected
        FROM co_i i JOIN co_p p USING (pos)
        GROUP BY 1
        HAVING COUNT(*) >= {int(min_views)})
    SELECT item, views, clicks,
           round(CAST(clicks AS DOUBLE) / CAST(views AS DOUBLE), 6)
               AS ctr,
           CASE WHEN expected > 0
                THEN round(CAST(clicks AS DOUBLE)
                           / CAST(expected AS DOUBLE), 6)
           END AS coec
    FROM co_a"""


# --------------------------------------------------------------------
# Split-conformal prediction intervals with held-out coverage
# --------------------------------------------------------------------

def conformal_coverage(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.1,
    train_buckets: int = 8,
    calib_bucket: int = 8,
    buckets: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Split-conformal calibration (Vovk et al. 2005; Lei et al.
    JASA 2018) with an honest held-out coverage check, per group.

    Three-way md5 hash split of the rows: buckets <
    ``train_buckets`` fit the predictor (here the per-group mean —
    the predictor is deliberately simple; the conformal wrapper is
    the operator), bucket == ``calib_bucket`` calibrates, the rest
    test. Nonconformity = |value - prediction|; the conformal
    quantile is the ``ceil((n_calib + 1) * (1 - alpha))``-th
    smallest calibration score (the finite-sample-valid order
    statistic — worth being exact about: quantile interpolation
    would void the coverage guarantee), +infinity when the rank
    exceeds n_calib. Coverage on test = fraction with score <=
    threshold; conformal theory promises >= 1 - alpha in
    expectation.

    Determinism: prediction = round(double-division of exact decimal
    sum, 6); scores round(,6); the order statistic is picked by
    (score, id) row_number so calibration ties cannot split engines.
    Scale shape: one aggregate for the predictor, one aggregate for
    the per-group percentile_approx rank band, one rank-within-group
    window over only the BAND of the calibration slice (~6n/acc rows
    per group — the exact order statistic provably lies inside; see
    the inline derivation), one broadcast join of the per-group
    thresholds back onto the test slice. Returns (group, n_calib,
    q_hat, n_test, covered, coverage).
    """
    from .sampling import hash_bucket

    q = 1.0 - float(alpha)
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.col(id_col).alias("rid"),
        hash_bucket(F.col(id_col), seed=seed, buckets=buckets).alias("bkt"),
    )
    pred = (
        base.filter(F.col("bkt") < train_buckets)
        .groupBy("grp")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(24,6)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("yhat")
        )
    )
    calib = (
        base.filter(F.col("bkt") == calib_bucket)
        .join(F.broadcast(pred), "grp")
        .select(
            "grp",
            "rid",
            F.round(F.abs(F.col("v") - F.col("yhat")), 6).alias("score"),
        )
    )
    # Banded exact order statistic (round-8 scale fix). The naive
    # shape — row_number() over the WHOLE calibration slice filtered
    # by rk == ceil((n+1)q) — defeats WindowGroupLimit pushdown (the
    # rank filter is an equality, not a rn <= k prefix), so with
    # low-cardinality groups at 100 TB it is a multi-TB single-task
    # sort per group. Instead, bracket the target rank with a
    # percentile_approx band and take the exact order statistic
    # INSIDE the band; global rank = (#rows strictly below the band)
    # + rank within the band. The bracket is provable from the GK
    # sketch guarantee (rank error <= n/acc, Greenwald & Khanna
    # SIGMOD'01): for n >= acc,
    #   rank(lo at q - 2/acc) <= n(q - 1/acc) + 1 <= nq < r, and
    #   rank(hi at q + 4/acc) >= n(q + 3/acc) - 1 >= nq + 2 > r
    # (r = ceil((n+1)q) lies in (nq, nq + 2)). Groups smaller than
    # acc use an infinite band — identical to the unbanded plan,
    # where the per-group sort is tiny anyway. Ties at the band
    # edges are kept by the >=/<= filter, so the (score, rid)
    # tiebreak order is preserved exactly; the result is the SAME
    # order statistic as the unbanded plan, only the window input
    # shrinks from the full slice to ~6n/acc rows per group.
    acc = 2000
    plo = max(0.0, q - 2.0 / acc)
    phi = min(1.0, q + 4.0 / acc)
    bounds = (
        calib.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_calib"),
            # one shared GK sketch serves both band edges (array
            # percentages) — half the sketch cost of two aggregates
            F.percentile_approx(
                "score", F.array(F.lit(plo), F.lit(phi)), F.lit(acc)
            ).alias("b"),
        )
        .select(
            "grp",
            "n_calib",
            F.when(F.col("n_calib") >= acc, F.col("b")[0])
            .otherwise(F.lit(float("-inf")))
            .alias("b_lo"),
            F.when(F.col("n_calib") >= acc, F.col("b")[1])
            .otherwise(F.lit(float("inf")))
            .alias("b_hi"),
        )
    )
    below = (
        calib.join(F.broadcast(bounds), "grp")
        .filter(F.col("score") < F.col("b_lo"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_below"))
    )
    band = (
        calib.join(F.broadcast(bounds), "grp")
        .filter(
            (F.col("score") >= F.col("b_lo"))
            & (F.col("score") <= F.col("b_hi"))
        )
        .join(F.broadcast(below), "grp", "left")
        .select(
            "grp",
            "score",
            "rid",
            "n_calib",
            F.coalesce(F.col("n_below"), F.lit(0)).alias("n_below"),
        )
    )
    w = Window.partitionBy("grp").orderBy("score", "rid")
    ranked = band.select(
        "grp",
        "score",
        "n_calib",
        (F.col("n_below") + F.row_number().over(w)).alias("rk"),
    )
    thresh = (
        ranked.filter(
            F.col("rk")
            == F.ceil((F.col("n_calib") + 1) * F.lit(q)).cast("int")
        )
        .select("grp", F.col("n_calib").cast("bigint").alias("n_calib"),
                F.col("score").alias("q_hat"))
    )
    test = (
        base.filter(
            (F.col("bkt") > calib_bucket)
            | ((F.col("bkt") >= train_buckets) & (F.col("bkt") < calib_bucket))
        )
        .join(F.broadcast(pred), "grp")
        .join(F.broadcast(thresh), "grp")
        .select(
            "grp",
            "n_calib",
            "q_hat",
            (F.round(F.abs(F.col("v") - F.col("yhat")), 6) <= F.col("q_hat"))
            .cast("int")
            .alias("cov"),
        )
    )
    return test.groupBy("grp", "n_calib", "q_hat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("cov").cast("bigint").alias("covered"),
    ).select(
        "grp",
        "n_calib",
        "q_hat",
        "n_test",
        "covered",
        F.round(
            F.col("covered").cast("double") / F.col("n_test").cast("double"),
            6,
        ).alias("coverage"),
    )


def conformal_oracle_sql(
    rows_sql: str,
    group: str = "event_type",
    value: str = "value",
    id_: str = "event_id",
    alpha: float = 0.1,
    train_buckets: int = 8,
    calib_bucket: int = 8,
    buckets: int = 10,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`conformal_coverage`."""
    from .sampling import hash_bucket_sql

    bkt = hash_bucket_sql(id_, seed=seed, buckets=buckets)
    q = 1.0 - float(alpha)
    return f"""
    WITH cf_base AS (
        SELECT {group} AS grp, {value} AS v, {id_} AS rid,
               {bkt} AS bkt
        FROM ({rows_sql})),
    cf_pred AS (
        SELECT grp,
               round(CAST(SUM(CAST(v AS DECIMAL(24,6))) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS yhat
        FROM cf_base WHERE bkt < {int(train_buckets)} GROUP BY 1),
    cf_cal AS (
        SELECT b.grp, b.rid, round(abs(b.v - p.yhat), 6) AS score
        FROM cf_base b JOIN cf_pred p USING (grp)
        WHERE b.bkt = {int(calib_bucket)}),
    cf_rk AS (
        SELECT grp, score,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY score, rid) AS rk,
               COUNT(*) OVER (PARTITION BY grp) AS n_calib
        FROM cf_cal),
    cf_th AS (
        SELECT grp, CAST(n_calib AS BIGINT) AS n_calib, score AS q_hat
        FROM cf_rk
        WHERE rk = CAST(ceil((n_calib + 1) * {q!r}) AS INTEGER)),
    cf_test AS (
        SELECT b.grp, t.n_calib, t.q_hat,
               CASE WHEN round(abs(b.v - p.yhat), 6) <= t.q_hat
                    THEN 1 ELSE 0 END AS cov
        FROM cf_base b
        JOIN cf_pred p USING (grp)
        JOIN cf_th t USING (grp)
        WHERE b.bkt > {int(calib_bucket)}
           OR (b.bkt >= {int(train_buckets)} AND b.bkt < {int(calib_bucket)}))
    SELECT grp, n_calib, q_hat,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(cov) AS BIGINT) AS covered,
           round(CAST(SUM(cov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS coverage
    FROM cf_test
    GROUP BY 1, 2, 3"""


# --------------------------------------------------------------------
# Differentially-private histogram release (seeded Laplace)
# --------------------------------------------------------------------

def dp_histogram(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Laplace-mechanism histogram release (Dwork et al. TCC 2006):
    per-cell counts plus Laplace(1/epsilon) noise — sensitivity of a
    disjoint-cell histogram is 1 — with the noise drawn from a
    SEEDED hash of the cell key instead of an OS RNG, so the release
    is reproducible (and cross-engine testable): a real pipeline
    would swap the hash for a DRBG keyed per release, the plumbing
    is identical.

    u in (0,1) comes from the first 12 hex chars of
    ``md5(cellkey:seed)`` (48 uniform bits, exact in a double);
    noise = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|), the standard
    inverse-CDF Laplace transform, rounded to 6 so libm ULP noise
    cannot split engines. Released count = max(0, count + noise)
    rounded to 6 (post-processing keeps DP). Pure row-local
    expressions over a one-aggregate frame — nothing here shuffles
    beyond the groupBy.

    Returns group_cols + (n_raw, noise, n_released). n_raw is
    included for the oracle check; a production release would drop
    it (and the DP guarantee is about the released column only).

    Known sentinel collision (accepted trade-off): a REAL string key
    equal to "\\x00null" hashes identically to a NULL key, merging
    its noise draw with the NULL cell's. NUL bytes are vanishingly
    rare in key columns and the collision only correlates two cells'
    noise (it never changes counts); a collision-free alternative is
    a type-tagged encoding (distinct literal branch for the NULL
    case) at the cost of a bulkier expression on both engines.
    """
    b = 1.0 / float(epsilon)
    # coalesce NULL key parts to a sentinel BEFORE hashing: concat_ws
    # silently skips NULLs while SQL `||` NULL-propagates, so without
    # this a NULL-keyed cell draws different noise cross-engine
    key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in group_cols
        ],
    )
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit(f":{seed}"))), 1, 12),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 48))
    )
    centered = u - F.lit(0.5)
    noise = F.round(
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered)),
        6,
    )
    return agg.select(
        *group_cols,
        "n_raw",
        noise.alias("noise"),
        F.round(
            F.greatest(
                F.lit(0.0), F.col("n_raw").cast("double") + noise
            ),
            6,
        ).alias("n_released"),
    )


def dp_histogram_oracle_sql(
    rows_sql: str,
    group_exprs: list[str],
    epsilon: float = 1.0,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`dp_histogram`. ``group_exprs`` are the
    SELECT expressions producing the (already-named) group columns."""
    b = 1.0 / float(epsilon)
    names = [e.split(" AS ")[-1].strip() for e in group_exprs]
    keys = ", ".join(names)
    # COALESCE to the same NULL sentinel the Spark side uses, so a
    # NULL key part can't NULL-propagate through || and diverge
    cell = " || chr(31) || ".join(
        f"COALESCE(CAST({n} AS VARCHAR), chr(0) || 'null')" for n in names
    )
    return f"""
    WITH dp_a AS (
        SELECT {', '.join(group_exprs)},
               CAST(COUNT(*) AS BIGINT) AS n_raw
        FROM ({rows_sql}) GROUP BY {', '.join(str(i + 1) for i in range(len(names)))}),
    dp_u AS (
        SELECT *,
               CAST(CAST(('0x' || substring(md5({cell} || ':{seed}'), 1, 12))
                         AS BIGINT) AS DOUBLE) / {float(1 << 48)!r} AS u
        FROM dp_a),
    dp_n AS (
        SELECT *, round(-({b!r}) * sign(u - 0.5)
                        * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise
        FROM dp_u)
    SELECT {keys}, n_raw, noise,
           round(greatest(0.0, CAST(n_raw AS DOUBLE) + noise), 6)
               AS n_released
    FROM dp_n"""


# --------------------------------------------------------------------
# Off-policy evaluation of logged feedback: IPS and SNIPS
# --------------------------------------------------------------------

def offpolicy_eval(
    views: DataFrame,
    clicks: DataFrame,
    click_window_min: int = 30,
    max_pos: int = 10,
    clip: float = 10.0,
) -> DataFrame:
    """Replay (counterfactual) evaluation of a UNIFORM target policy
    on logged feedback — inverse-propensity scoring (Horvitz-Thompson
    1952; Li et al. WSDM'11 replay) and its self-normalized variant
    (SNIPS, Swaminathan-Joachims NeurIPS'15).

    Logged data: the same clickstream shape as :func:`coec_ctr` —
    impressions with a feed position (rank within user-day, capped),
    reward = click within ``click_window_min``. Behavior propensity
    mu(item | pos) is the empirical frequency of the item among that
    position's impressions; the target policy is uniform over the
    items the position ever showed, pi = 1 / n_items(pos). Weight
    w = min(pi / mu, clip); IPS = sum(w * r) / N estimates the CTR
    the uniform policy WOULD get, SNIPS = sum(w * r) / sum(w) trades
    a little bias for variance. clip_frac reports how much mass the
    clip touched — the standard OPE diagnostic.

    Determinism: w and w * r are rounded to 9 and summed as exact
    DECIMAL(28,9); divisions happen once at the end, rounded to 6.
    Scale shape: propensities are a (pos, item) aggregate joined
    back by key; the click-match is the bounded per-(user, item)
    interval join. Returns per-position rows (pos, n, naive_ctr,
    ips_ctr, snips_ctr, clip_frac).
    """
    # event_id is the final tiebreaker: two impressions with the same
    # (user, day, ts, item) would otherwise get engine-dependent pos
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "item", "event_id"
    )
    v = views.select(
        "user_id",
        "item",
        "ts",
        "event_id",
        F.least(F.row_number().over(w), F.lit(max_pos)).alias("pos"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("item").alias("c_item"),
        F.col("ts").alias("c_ts"),
    )
    rewarded = v.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_item") == F.col("item"))
        & (F.col("c_ts") > F.col("ts"))
        & (
            F.col("c_ts")
            <= F.col("ts") + F.expr(f"INTERVAL {int(click_window_min)} MINUTES")
        ),
        "left_semi",
    ).select("event_id", F.lit(1).alias("r"))
    imp = v.join(rewarded, "event_id", "left").select(
        "pos", "item", F.coalesce("r", F.lit(0)).alias("r")
    )
    mu = imp.groupBy("pos", "item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pi")
    )
    posn = mu.groupBy("pos").agg(
        F.sum("n_pi").cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("k_pos"),
    )
    wts = (
        imp.join(mu, ["pos", "item"])
        .join(F.broadcast(posn), "pos")
        .select(
            "pos",
            "r",
            # pi/mu = (1/k) / (n_pi/n_pos) = n_pos / (k * n_pi)
            F.round(
                F.least(
                    F.lit(float(clip)),
                    F.col("n_pos").cast("double")
                    / (F.col("k_pos") * F.col("n_pi")).cast("double"),
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("w"),
        )
    )
    agg = wts.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("n_click"),
        F.sum("w").alias("sw"),
        F.sum(F.expr("w * r")).alias("swr"),
        F.sum(
            F.when(F.col("w") >= F.round(F.lit(float(clip)), 9), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_clip"),
    )
    return agg.select(
        "pos",
        "n",
        F.round(F.col("n_click").cast("double") / F.col("n").cast("double"), 6)
        .alias("naive_ctr"),
        F.round(F.col("swr").cast("double") / F.col("n").cast("double"), 6)
        .alias("ips_ctr"),
        F.when(
            F.col("sw") > 0,
            F.round(F.col("swr").cast("double") / F.col("sw").cast("double"), 6),
        ).alias("snips_ctr"),
        F.round(F.col("n_clip").cast("double") / F.col("n").cast("double"), 6)
        .alias("clip_frac"),
    )


def offpolicy_oracle_sql(
    views_sql: str,
    clicks_sql: str,
    click_window_min: int = 30,
    max_pos: int = 10,
    clip: float = 10.0,
) -> str:
    """DuckDB mirror of :func:`offpolicy_eval`."""
    return f"""
    WITH op_v0 AS ({views_sql}),
    op_c AS ({clicks_sql}),
    op_v AS (
        SELECT user_id, item, ts, event_id,
               least(row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, item, event_id), {int(max_pos)}) AS pos
        FROM op_v0),
    op_i AS (
        SELECT v.pos, v.item,
               CASE WHEN EXISTS (
                   SELECT 1 FROM op_c c
                   WHERE c.user_id = v.user_id AND c.item = v.item
                     AND c.ts > v.ts
                     AND c.ts <= v.ts + INTERVAL {int(click_window_min)} MINUTE)
                    THEN 1 ELSE 0 END AS r
        FROM op_v v),
    op_mu AS (
        SELECT pos, item, CAST(COUNT(*) AS BIGINT) AS n_pi
        FROM op_i GROUP BY 1, 2),
    op_p AS (
        SELECT pos, CAST(SUM(n_pi) AS BIGINT) AS n_pos,
               CAST(COUNT(*) AS BIGINT) AS k_pos
        FROM op_mu GROUP BY 1),
    op_w AS (
        SELECT i.pos, i.r,
               CAST(round(least({float(clip)!r},
                   CAST(p.n_pos AS DOUBLE)
                   / CAST(p.k_pos * m.n_pi AS DOUBLE)), 9)
                    AS DECIMAL(28,9)) AS w
        FROM op_i i
        JOIN op_mu m USING (pos, item)
        JOIN op_p p ON p.pos = i.pos),
    op_a AS (
        SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS n_click,
               SUM(w) AS sw, SUM(w * r) AS swr,
               CAST(SUM(CASE WHEN w >= CAST(round({float(clip)!r}, 9)
                                       AS DECIMAL(28,9))
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clip
        FROM op_w GROUP BY 1)
    SELECT pos, n,
           round(CAST(n_click AS DOUBLE) / CAST(n AS DOUBLE), 6) AS naive_ctr,
           round(CAST(swr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ips_ctr,
           CASE WHEN sw > 0
                THEN round(CAST(swr AS DOUBLE) / CAST(sw AS DOUBLE), 6)
           END AS snips_ctr,
           round(CAST(n_clip AS DOUBLE) / CAST(n AS DOUBLE), 6) AS clip_frac
    FROM op_a"""


# --------------------------------------------------------------------
# Distributed ridge regression with k-fold CV (fold-additive moments)
# --------------------------------------------------------------------

def ridge_cv(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    id_col: str,
    k: int = 5,
    lam: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """K-fold cross-validated ridge regression on two features +
    intercept, solved in closed form from SUFFICIENT STATISTICS —
    the pattern that makes regression a one-pass aggregate at
    100 TB (Chu et al. NIPS'06 "Map-Reduce for ML on multicore"):
    X'X and X'y are sums of per-row outer products, so each fold's
    TRAIN moments are ``total - fold`` — one corpus scan computes
    all k models, no per-fold passes.

    The 3x3 normal system ((X'X + lam*diag(0,1,1)) b = X'y — the
    intercept is not penalized) is solved per fold by Cramer's rule
    on the driver-free fold frame (k rows). Determinism: every
    moment is ``round(product, 9)`` summed as exact DECIMAL(38,9);
    both engines then run the IDENTICAL fixed-order IEEE double
    arithmetic for the determinants, so coefficients match
    bit-for-bit. Test MSE joins the k coefficient rows back and
    decimal-sums round-6 squared residuals.

    Returns (fold, n_train, n_test, b0, b1, b2, mse) — one row per
    fold, coefficients rounded to 8, mse to 4.

    r11: the input is spread() first — the md5 fold hash and the
    nine round-9 double->decimal moment conversions are the per-row
    cost, and on a single-split scan they ran in ONE task (7.5s of
    the 8.8s sf0.1 total in the map-stage breakdown; guide §2.5).
    No-op whenever the scan has native splits.
    """
    from ..util import spread
    from .sampling import hash_bucket

    df = spread(df)
    base = df.select(
        hash_bucket(F.col(id_col), seed=seed, buckets=k).alias("fold"),
        F.col(x1_col).cast("double").alias("x1"),
        F.col(x2_col).cast("double").alias("x2"),
        F.col(y_col).cast("double").alias("y"),
    )

    def m(expr: str):
        return F.sum(F.round(F.expr(expr), 9).cast("decimal(38,9)"))

    # k rows; checkpointed so the totals, the train subtraction and
    # the coefficient join read state instead of re-running the
    # corpus moment scan (~12% on the bench — the md5 fold hash per
    # scoring row, not the extra scans, is the dominant cost)
    per_fold = base.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        m("x1").alias("s1"),
        m("x2").alias("s2"),
        m("x1 * x1").alias("s11"),
        m("x1 * x2").alias("s12"),
        m("x2 * x2").alias("s22"),
        m("y").alias("sy"),
        m("x1 * y").alias("s1y"),
        m("x2 * y").alias("s2y"),
    ).localCheckpoint(eager=True)
    tot = per_fold.agg(
        F.sum("n").alias("n"),
        *[F.sum(c).alias(c) for c in
          ["s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]],
    )
    train = per_fold.crossJoin(F.broadcast(tot).alias("t")).select(
        "fold",
        (F.col("t.n") - per_fold["n"]).cast("bigint").alias("n_train"),
        per_fold["n"].cast("bigint").alias("n_test"),
        *[
            (F.col(f"t.{c}") - per_fold[c]).cast("double").alias(c)
            for c in ["s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]
        ],
    )
    # normal equations (A + lam on the feature diagonal) b = v, A =
    # [[n, s1, s2], [s1, s11+lam, s12], [s2, s12, s22+lam]]
    L = float(lam)
    coef = train.select(
        "fold",
        "n_train",
        "n_test",
        F.expr(
            f"""
            named_struct(
              'a11', CAST(n_train AS DOUBLE), 'a12', s1, 'a13', s2,
              'a22', s11 + {L!r}, 'a23', s12, 'a33', s22 + {L!r},
              'v1', sy, 'v2', s1y, 'v3', s2y)
            """
        ).alias("m"),
    ).select(
        "fold",
        "n_train",
        "n_test",
        F.expr(
            """
            m.a11 * (m.a22 * m.a33 - m.a23 * m.a23)
            - m.a12 * (m.a12 * m.a33 - m.a23 * m.a13)
            + m.a13 * (m.a12 * m.a23 - m.a22 * m.a13)
            """
        ).alias("det"),
        F.col("m").alias("m"),
    ).select(
        "fold",
        "n_train",
        "n_test",
        (
            F.expr(
                """
                m.v1 * (m.a22 * m.a33 - m.a23 * m.a23)
                - m.a12 * (m.v2 * m.a33 - m.a23 * m.v3)
                + m.a13 * (m.v2 * m.a23 - m.a22 * m.v3)
                """
            )
            / F.col("det")
        ).alias("b0"),
        (
            F.expr(
                """
                m.a11 * (m.v2 * m.a33 - m.v3 * m.a23)
                - m.v1 * (m.a12 * m.a33 - m.a23 * m.a13)
                + m.a13 * (m.a12 * m.v3 - m.v2 * m.a13)
                """
            )
            / F.col("det")
        ).alias("b1"),
        (
            F.expr(
                """
                m.a11 * (m.a22 * m.v3 - m.v2 * m.a23)
                - m.a12 * (m.a12 * m.v3 - m.v2 * m.a13)
                + m.v1 * (m.a12 * m.a23 - m.a22 * m.a13)
                """
            )
            / F.col("det")
        ).alias("b2"),
    )
    scored = base.join(F.broadcast(coef), "fold").select(
        "fold",
        "n_train",
        "n_test",
        "b0",
        "b1",
        "b2",
        F.round(
            F.expr("pow(y - (b0 + b1 * x1 + b2 * x2), 2)"), 6
        )
        .cast("decimal(38,6)")
        .alias("se"),
    )
    return scored.groupBy("fold", "n_train", "n_test").agg(
        F.round(F.first("b0"), 8).alias("b0"),
        F.round(F.first("b1"), 8).alias("b1"),
        F.round(F.first("b2"), 8).alias("b2"),
        F.round(
            F.sum("se").cast("double") / F.count(F.lit(1)).cast("double"), 4
        ).alias("mse"),
    )


def ridge_cv_oracle_sql(
    rows_sql: str,
    x1: str,
    x2: str,
    y: str,
    id_: str,
    k: int = 5,
    lam: float = 1.0,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`ridge_cv`."""
    from .sampling import hash_bucket_sql

    bkt = hash_bucket_sql(id_, seed=seed, buckets=k)
    L = float(lam)

    def m(expr: str, alias: str) -> str:
        return (f"SUM(CAST(round({expr}, 9) AS DECIMAL(38,9))) AS {alias}")

    return f"""
    WITH rg_b AS (
        SELECT {bkt} AS fold,
               CAST({x1} AS DOUBLE) AS x1, CAST({x2} AS DOUBLE) AS x2,
               CAST({y} AS DOUBLE) AS y
        FROM ({rows_sql})),
    rg_f AS (
        SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
               {m('x1', 's1')}, {m('x2', 's2')},
               {m('x1 * x1', 's11')}, {m('x1 * x2', 's12')},
               {m('x2 * x2', 's22')},
               {m('y', 'sy')}, {m('x1 * y', 's1y')}, {m('x2 * y', 's2y')}
        FROM rg_b GROUP BY 1),
    rg_t AS (
        SELECT SUM(n) AS n, SUM(s1) AS s1, SUM(s2) AS s2,
               SUM(s11) AS s11, SUM(s12) AS s12, SUM(s22) AS s22,
               SUM(sy) AS sy, SUM(s1y) AS s1y, SUM(s2y) AS s2y
        FROM rg_f),
    rg_tr AS (
        SELECT f.fold,
               CAST(t.n - f.n AS BIGINT) AS n_train,
               CAST(f.n AS BIGINT) AS n_test,
               CAST(t.s1 - f.s1 AS DOUBLE) AS s1,
               CAST(t.s2 - f.s2 AS DOUBLE) AS s2,
               CAST(t.s11 - f.s11 AS DOUBLE) AS s11,
               CAST(t.s12 - f.s12 AS DOUBLE) AS s12,
               CAST(t.s22 - f.s22 AS DOUBLE) AS s22,
               CAST(t.sy - f.sy AS DOUBLE) AS sy,
               CAST(t.s1y - f.s1y AS DOUBLE) AS s1y,
               CAST(t.s2y - f.s2y AS DOUBLE) AS s2y
        FROM rg_f f CROSS JOIN rg_t t),
    rg_m AS (
        SELECT fold, n_train, n_test,
               CAST(n_train AS DOUBLE) AS a11, s1 AS a12, s2 AS a13,
               s11 + {L!r} AS a22, s12 AS a23, s22 + {L!r} AS a33,
               sy AS v1, s1y AS v2, s2y AS v3
        FROM rg_tr),
    rg_c AS (
        SELECT fold, n_train, n_test,
               (v1 * (a22 * a33 - a23 * a23)
                - a12 * (v2 * a33 - a23 * v3)
                + a13 * (v2 * a23 - a22 * v3))
               / (a11 * (a22 * a33 - a23 * a23)
                  - a12 * (a12 * a33 - a23 * a13)
                  + a13 * (a12 * a23 - a22 * a13)) AS b0,
               (a11 * (v2 * a33 - v3 * a23)
                - v1 * (a12 * a33 - a23 * a13)
                + a13 * (a12 * v3 - v2 * a13))
               / (a11 * (a22 * a33 - a23 * a23)
                  - a12 * (a12 * a33 - a23 * a13)
                  + a13 * (a12 * a23 - a22 * a13)) AS b1,
               (a11 * (a22 * v3 - v2 * a23)
                - a12 * (a12 * v3 - v2 * a13)
                + v1 * (a12 * a23 - a22 * a13))
               / (a11 * (a22 * a33 - a23 * a23)
                  - a12 * (a12 * a33 - a23 * a13)
                  + a13 * (a12 * a23 - a22 * a13)) AS b2
        FROM rg_m)
    SELECT b.fold, c.n_train, c.n_test,
           round(ANY_VALUE(c.b0), 8) AS b0,
           round(ANY_VALUE(c.b1), 8) AS b1,
           round(ANY_VALUE(c.b2), 8) AS b2,
           round(CAST(SUM(CAST(round(
                     pow(b.y - (c.b0 + c.b1 * b.x1 + c.b2 * b.x2), 2), 6)
                     AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS mse
    FROM rg_b b JOIN rg_c c USING (fold)
    GROUP BY 1, 2, 3"""


# --------------------------------------------------------------------
# Multiple-testing control: Benjamini-Hochberg step-up
# --------------------------------------------------------------------

def bh_fdr(
    df: DataFrame,
    key_col: str,
    p_col: str,
    q: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg
    JRSS-B 1995): given one p-value per hypothesis, find the largest
    rank k with ``p_(k) <= q * k / m`` and reject hypotheses ranked
    <= k — the standard guard against the false-discovery flood any
    dashboard fires when it screens thousands of segments at alpha
    each.

    The rank window runs over the HYPOTHESIS frame (one row per
    tested key — dimension-sized after upstream aggregation, never
    the corpus), ties broken by key so both engines rank
    identically. The threshold comparison multiplies integers
    before dividing (p * m <= q * i avoids an engine-specific
    division grid). Returns (key, p, rank, m, rejected).
    """
    w = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    ranked = df.select(
        F.col(key_col).alias("key"),
        F.col(p_col).alias("p"),
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1))
        .over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("m"),
    )
    # k* = max rank whose p clears its own line; a window max over
    # the same tiny frame
    kstar = ranked.select(
        "key",
        "p",
        "rank",
        "m",
        F.max(
            F.when(
                F.col("p") * F.col("m").cast("double")
                <= F.lit(float(q)) * F.col("rank").cast("double"),
                F.col("rank"),
            ).otherwise(F.lit(0))
        )
        .over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("k"),
    )
    return kstar.select(
        "key",
        "p",
        "rank",
        "m",
        (F.col("rank") <= F.col("k")).cast("int").alias("rejected"),
    )


def bh_fdr_sql(hyp_sql: str, key: str, p: str, q: float = 0.05) -> str:
    """DuckDB mirror of :func:`bh_fdr`. ``hyp_sql`` yields one row
    per hypothesis with columns ``{key}`` and ``{p}``."""
    return f"""
    WITH bh_h AS ({hyp_sql}),
    bh_r AS (
        SELECT {key} AS key, {p} AS p,
               row_number() OVER (ORDER BY {p} ASC, {key} ASC) AS rank,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM bh_h),
    bh_k AS (
        SELECT *, MAX(CASE WHEN p * CAST(m AS DOUBLE)
                                <= {float(q)!r} * CAST(rank AS DOUBLE)
                           THEN rank ELSE 0 END) OVER () AS k
        FROM bh_r)
    SELECT key, p, rank, m,
           CASE WHEN rank <= k THEN 1 ELSE 0 END AS rejected
    FROM bh_k"""


# --------------------------------------------------------------------
# Mahalanobis outliers from grouped covariance moments
# --------------------------------------------------------------------

def mahalanobis_outliers(
    df: DataFrame,
    group_col: str,
    x1_col: str,
    x2_col: str,
    id_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Per-group multivariate outliers by squared Mahalanobis
    distance on two features (Mahalanobis 1936) — the covariance-
    aware generalization of the q112 MAD rule: a point can be
    ordinary on every axis yet far off the group's correlation
    ridge, which is exactly what the Euclidean-distance screens
    miss.

    One corpus scan computes each group's moment vector (sums,
    squares, cross term) as round-9 exact decimal sums; the 2x2
    covariance inverts in closed form on the GROUP frame, and
    d^2 = (dx, dy) S^-1 (dx, dy)' is a row-local expression after a
    broadcast join back. Groups with singular covariance (det <=
    0, e.g. constant features) emit nothing — a documented drop,
    not a NaN. Returns the ``top_k`` rows per group by
    (d2 desc, id): (grp, rid, d2) with d2 rounded to 6.

    r11: input spread() first — the round-9 double->decimal moment
    conversions (and the d^2 scoring pass) are map-side per-row
    cost that a single-split scan serializes into one task (guide
    §2.5). No-op whenever the scan has native splits.
    """
    from ..util import spread

    df = spread(df)
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(x1_col).cast("double").alias("x1"),
        F.col(x2_col).cast("double").alias("x2"),
        F.col(id_col).alias("rid"),
    )

    def m(expr: str):
        return F.sum(F.round(F.expr(expr), 9).cast("decimal(38,9)"))

    mom = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        m("x1").alias("s1"),
        m("x2").alias("s2"),
        m("x1 * x1").alias("s11"),
        m("x1 * x2").alias("s12"),
        m("x2 * x2").alias("s22"),
    ).filter(F.col("n") >= 3)
    cov = mom.select(
        "grp",
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n").cast("double")).alias("m2"),
        F.expr(
            "(CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
            " / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)"
        ).alias("c11"),
        F.expr(
            "(CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)"
            " / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)"
        ).alias("c12"),
        F.expr(
            "(CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
            " / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)"
        ).alias("c22"),
    ).withColumn(
        "det", F.expr("c11 * c22 - c12 * c12")
    ).filter(F.col("det") > 0)
    scored = base.join(F.broadcast(cov), "grp").select(
        "grp",
        "rid",
        F.round(
            F.expr(
                "((x1 - m1) * (c22 * (x1 - m1) - c12 * (x2 - m2))"
                " + (x2 - m2) * (c11 * (x2 - m2) - c12 * (x1 - m1)))"
                " / det"
            ),
            6,
        ).alias("d2"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("d2").desc(), F.col("rid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("grp", "rid", "d2")
    )


def mahalanobis_oracle_sql(
    rows_sql: str,
    group: str,
    x1: str,
    x2: str,
    id_: str,
    top_k: int = 5,
) -> str:
    """DuckDB mirror of :func:`mahalanobis_outliers`."""

    def m(expr: str, alias: str) -> str:
        return f"SUM(CAST(round({expr}, 9) AS DECIMAL(38,9))) AS {alias}"

    return f"""
    WITH mh_b AS (
        SELECT {group} AS grp, CAST({x1} AS DOUBLE) AS x1,
               CAST({x2} AS DOUBLE) AS x2, {id_} AS rid
        FROM ({rows_sql})),
    mh_m AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               {m('x1', 's1')}, {m('x2', 's2')},
               {m('x1 * x1', 's11')}, {m('x1 * x2', 's12')},
               {m('x2 * x2', 's22')}
        FROM mh_b GROUP BY 1
        HAVING COUNT(*) >= 3),
    mh_c AS (
        SELECT grp,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
               (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS c11,
               (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
                / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS c12,
               (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS c22
        FROM mh_m),
    mh_d AS (
        SELECT grp, m1, m2, c11, c12, c22, c11 * c22 - c12 * c12 AS det
        FROM mh_c
        WHERE c11 * c22 - c12 * c12 > 0),
    mh_s AS (
        SELECT b.grp, b.rid,
               round(((b.x1 - d.m1) * (d.c22 * (b.x1 - d.m1)
                                       - d.c12 * (b.x2 - d.m2))
                      + (b.x2 - d.m2) * (d.c11 * (b.x2 - d.m2)
                                         - d.c12 * (b.x1 - d.m1)))
                     / d.det, 6) AS d2,
               row_number() OVER (PARTITION BY b.grp
                                  ORDER BY round(((b.x1 - d.m1)
                                      * (d.c22 * (b.x1 - d.m1)
                                         - d.c12 * (b.x2 - d.m2))
                                      + (b.x2 - d.m2) * (d.c11 * (b.x2 - d.m2)
                                         - d.c12 * (b.x1 - d.m1)))
                                      / d.det, 6) DESC, b.rid ASC) AS rn
        FROM mh_b b JOIN mh_d d USING (grp))
    SELECT grp, rid, d2 FROM mh_s WHERE rn <= {int(top_k)}"""


# --------------------------------------------------------------------
# Sequential A/B monitoring: Wald SPRT over daily conversion counts
# --------------------------------------------------------------------

def sprt_monitor(
    df: DataFrame,
    group_col: str,
    day_col: str,
    n_col: str,
    x_col: str,
    p0: float = 0.10,
    p1: float = 0.12,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Wald sequential probability ratio test (Wald 1945) replayed
    over each group's daily Bernoulli counts — the always-valid
    alternative to peeking at a fixed-horizon test every morning
    (each peek at alpha inflates the false-positive rate; the SPRT
    boundaries price the peeking in).

    Input is already day-aggregated: (group, day, n trials,
    x successes). The log-likelihood-ratio walk adds
    ``x*ln(p1/p0) + (n-x)*ln((1-p1)/(1-p0))`` per day — both log
    constants are computed ONCE in Python and inlined as identical
    literals in Spark and the oracle, so no engine evaluates a
    transcendental. Daily terms round to 9 and accumulate as exact
    decimals through a per-group ordered window (days per group, a
    short series). Decision = first day the walk leaves
    ``[ln(beta/(1-alpha)), ln((1-beta)/alpha)]``: 'accept_h1',
    'accept_h0', or 'continue' if it never exits. Returns (grp,
    n_days, final_llr, decision, decided_day).
    """
    import math

    lw = round(math.log(p1 / p0), 12)
    ll = round(math.log((1.0 - p1) / (1.0 - p0)), 12)
    a = round(math.log((1.0 - beta) / alpha), 6)
    b = round(math.log(beta / (1.0 - alpha)), 6)
    daily = df.select(
        F.col(group_col).alias("grp"),
        F.col(day_col).alias("day"),
        F.round(
            F.col(x_col).cast("double") * F.lit(lw)
            + (F.col(n_col) - F.col(x_col)).cast("double") * F.lit(ll),
            9,
        )
        .cast("decimal(38,9)")
        .alias("term"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = daily.select(
        "grp",
        "day",
        F.sum("term").over(w).cast("double").alias("llr"),
    ).select(
        "grp",
        "day",
        "llr",
        F.when(F.col("llr") >= a, F.lit("accept_h1"))
        .when(F.col("llr") <= b, F.lit("accept_h0"))
        .alias("hit"),
    )
    agg = walk.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max(F.struct(F.col("day"), F.col("llr"))).alias("last"),
        F.min(
            F.when(
                F.col("hit").isNotNull(),
                F.struct(F.col("day"), F.col("hit")),
            )
        ).alias("first_hit"),
    )
    return agg.select(
        "grp",
        "n_days",
        # no re-round: llr is already exact on the 1e-9 decimal grid,
        # identical in both engines; a round(6) here could split on a
        # .5-ULP tie
        F.col("last.llr").alias("final_llr"),
        F.coalesce(F.col("first_hit.hit"), F.lit("continue")).alias(
            "decision"
        ),
        F.col("first_hit.day").alias("decided_day"),
    )


def sprt_oracle_sql(
    daily_sql: str,
    group: str = "grp",
    day: str = "day",
    n: str = "n",
    x: str = "x",
    p0: float = 0.10,
    p1: float = 0.12,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> str:
    """DuckDB mirror of :func:`sprt_monitor`. ``daily_sql`` yields
    one row per (group, day) with trial and success counts."""
    import math

    lw = round(math.log(p1 / p0), 12)
    ll = round(math.log((1.0 - p1) / (1.0 - p0)), 12)
    a = round(math.log((1.0 - beta) / alpha), 6)
    b = round(math.log(beta / (1.0 - alpha)), 6)
    return f"""
    WITH sp_d AS (
        SELECT {group} AS grp, {day} AS day,
               CAST(round(CAST({x} AS DOUBLE) * {lw!r}
                          + CAST({n} - {x} AS DOUBLE) * {ll!r}, 9)
                    AS DECIMAL(38,9)) AS term
        FROM ({daily_sql})),
    sp_w AS (
        SELECT grp, day,
               CAST(SUM(term) OVER (PARTITION BY grp ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS llr
        FROM sp_d),
    sp_h AS (
        SELECT grp, day, llr,
               CASE WHEN llr >= {a!r} THEN 'accept_h1'
                    WHEN llr <= {b!r} THEN 'accept_h0' END AS hit
        FROM sp_w),
    sp_a AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days,
               MAX(struct_pack(day := day, llr := llr)) AS last,
               MIN(CASE WHEN hit IS NOT NULL
                        THEN struct_pack(day := day, hit := hit) END)
                   AS first_hit
        FROM sp_h GROUP BY 1)
    SELECT grp, n_days,
           last.llr AS final_llr,
           COALESCE(first_hit.hit, 'continue') AS decision,
           first_hit.day AS decided_day
    FROM sp_a"""


# --------------------------------------------------------------------
# Classical seasonal decomposition: day-of-week index + trend
# --------------------------------------------------------------------

def seasonal_decompose(
    df: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Classical multiplicative seasonal decomposition on a weekly
    cycle (the ratio-to-moving-average family, Makridakis et al.
    "Forecasting" ch. 3, reduced to its distributable core): per
    group, each day-of-week's seasonal index = that weekday's mean
    daily value over the group mean; the trend is the OLS slope of
    the DESEASONALIZED series (value / index) against the day
    number. Answers "is Tuesday really down, or is everything
    down?" for the q120/q144-style trend dashboards, which fit raw
    values and confound weekday mix with drift.

    Determinism: daily values are exact decimal sums; weekday and
    group means are integer-ratio doubles; the deseasonalized OLS
    runs on round-9 decimal moments with the identical fixed-order
    closed form both engines. One corpus aggregate to days,
    then dimension-sized math. Returns one row per (grp, dow):
    (grp, dow, s_index, trend_slope) — the slope repeats per group
    for audit convenience.
    """
    daily = df.groupBy(
        F.col(group_col).alias("grp"),
        F.to_date(F.col(day_col)).alias("day"),
    ).agg(
        F.sum(F.col(value_col).cast("decimal(24,6)"))
        .cast("double")
        .alias("v")
    )
    keyed = daily.select(
        "grp",
        "day",
        "v",
        F.dayofweek("day").cast("int").alias("dow"),
        F.datediff("day", F.lit("2020-01-01")).cast("double").alias("t"),
    )
    dow_mean = keyed.groupBy("grp", "dow").agg(
        (
            F.sum(F.round("v", 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dmean")
    )
    g_mean = keyed.groupBy("grp").agg(
        (
            F.sum(F.round("v", 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("gmean")
    )
    idx = dow_mean.join(g_mean, "grp").select(
        "grp",
        "dow",
        F.round(F.col("dmean") / F.col("gmean"), 9).alias("idx"),
    )
    deseas = keyed.join(F.broadcast(idx), ["grp", "dow"]).select(
        "grp",
        "dow",
        "t",
        F.round(F.col("v") / F.col("idx"), 6).alias("z"),
    )

    def m(expr: str):
        return F.sum(F.round(F.expr(expr), 9).cast("decimal(38,9)"))

    mom = deseas.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        m("t").alias("st"),
        m("z").alias("sz"),
        m("t * t").alias("stt"),
        m("t * z").alias("stz"),
    )
    slope = mom.select(
        "grp",
        F.round(
            F.expr(
                "(CAST(n AS DOUBLE) * CAST(stz AS DOUBLE)"
                " - CAST(st AS DOUBLE) * CAST(sz AS DOUBLE))"
                " / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)"
                "    - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))"
            ),
            6,
        ).alias("trend_slope"),
    )
    return (
        idx.join(F.broadcast(slope), "grp")
        .select("grp", "dow", F.round("idx", 6).alias("s_index"), "trend_slope")
    )


def seasonal_oracle_sql(
    rows_sql: str,
    group: str,
    day: str,
    value: str,
) -> str:
    """DuckDB mirror of :func:`seasonal_decompose`. Day-of-week uses
    Spark's dayofweek numbering (1 = Sunday)."""

    def m(expr: str, alias: str) -> str:
        return f"SUM(CAST(round({expr}, 9) AS DECIMAL(38,9))) AS {alias}"

    return f"""
    WITH sd_d AS (
        SELECT {group} AS grp, CAST({day} AS DATE) AS day,
               CAST(SUM(CAST({value} AS DECIMAL(24,6))) AS DOUBLE) AS v
        FROM ({rows_sql}) GROUP BY 1, 2),
    sd_k AS (
        SELECT grp, day, v,
               CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
               CAST(date_diff('day', DATE '2020-01-01', day) AS DOUBLE) AS t
        FROM sd_d),
    sd_dm AS (
        SELECT grp, dow,
               CAST(SUM(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS dmean
        FROM sd_k GROUP BY 1, 2),
    sd_gm AS (
        SELECT grp,
               CAST(SUM(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS gmean
        FROM sd_k GROUP BY 1),
    sd_i AS (
        SELECT dm.grp, dm.dow, round(dm.dmean / gm.gmean, 9) AS idx
        FROM sd_dm dm JOIN sd_gm gm USING (grp)),
    sd_z AS (
        SELECT k.grp, k.t, round(k.v / i.idx, 6) AS z
        FROM sd_k k JOIN sd_i i ON i.grp = k.grp AND i.dow = k.dow),
    sd_m AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               {m('t', 'st')}, {m('z', 'sz')},
               {m('t * t', 'stt')}, {m('t * z', 'stz')}
        FROM sd_z GROUP BY 1),
    sd_s AS (
        SELECT grp,
               round((CAST(n AS DOUBLE) * CAST(stz AS DOUBLE)
                      - CAST(st AS DOUBLE) * CAST(sz AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                        - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 6)
                   AS trend_slope
        FROM sd_m)
    SELECT i.grp, i.dow, round(i.idx, 6) AS s_index, s.trend_slope
    FROM sd_i i JOIN sd_s s USING (grp)"""


# --------------------------------------------------------------------
# EWMA anomaly walk over daily series (integer fixed-point fold)
# --------------------------------------------------------------------

def ewma_anomalies(
    df: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """EWMA (alpha = 1/4) forecast walk over each group's daily
    totals with a spike/crash flag per day — the Holt-free core of
    every ops anomaly monitor: a day is anomalous when its value
    more than doubles or falls below half of yesterday's smoothed
    level, and the level then absorbs it.

    Sequential by nature, distributed by shape: the corpus collapses
    to per-(group, day) integer micro-totals first; the fold runs as
    a Catalyst higher-order ``aggregate`` over each group's SORTED
    day array (days-per-group elements, JVM-side, no Python, no
    window over the corpus). All state is BIGINT micros with
    round-half-up division — ``s' = (v + 3 s + 2) DIV 4`` — so the
    walk is exact and the DuckDB mirror (a recursive CTE) matches
    bit-for-bit; no float ever enters the recursion.

    Returns (grp, n_days, final_ewma, n_anomalies).
    """
    daily = df.groupBy(
        F.col(group_col).alias("grp"),
        F.to_date(F.col(day_col)).alias("day"),
    ).agg(
        F.sum(
            F.round(F.col(value_col).cast("double") * 1e6).cast("bigint")
        ).alias("vm")
    )
    packed = daily.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct(F.col("day"), F.col("vm")))
        ).alias("arr"),
    )
    walk = packed.select(
        "grp",
        "n_days",
        F.expr(
            """
            aggregate(
                slice(arr, 2, greatest(0, CAST(n_days AS INT) - 1)),
                named_struct('s', arr[0].vm, 'na', CAST(0 AS BIGINT)),
                (acc, x) -> named_struct(
                    's', (x.vm + 3 * acc.s + 2) DIV 4,
                    'na', acc.na + CASE WHEN x.vm > 2 * acc.s
                                          OR 2 * x.vm < acc.s
                                        THEN 1 ELSE 0 END)
            )
            """
        ).alias("w"),
    )
    return walk.select(
        "grp",
        "n_days",
        (F.col("w.s").cast("double") / F.lit(1e6)).alias("final_ewma"),
        F.col("w.na").alias("n_anomalies"),
    )


def ewma_oracle_sql(
    rows_sql: str,
    group: str,
    day: str,
    value: str,
) -> str:
    """DuckDB mirror of :func:`ewma_anomalies` — the same integer
    walk as a recursive CTE."""
    return f"""
    WITH RECURSIVE ew_d AS (
        SELECT {group} AS grp, CAST({day} AS DATE) AS day,
               CAST(SUM(CAST(round(CAST({value} AS DOUBLE) * 1e6, 0)
                             AS BIGINT)) AS BIGINT) AS vm
        FROM ({rows_sql}) GROUP BY 1, 2),
    ew_r AS (
        SELECT grp, vm,
               row_number() OVER (PARTITION BY grp ORDER BY day) AS rn,
               COUNT(*) OVER (PARTITION BY grp) AS n_days
        FROM ew_d),
    ew_w AS (
        SELECT grp, rn, vm AS s, CAST(0 AS BIGINT) AS na
        FROM ew_r WHERE rn = 1
        UNION ALL
        SELECT r.grp, r.rn,
               (r.vm + 3 * w.s + 2) // 4 AS s,
               w.na + CASE WHEN r.vm > 2 * w.s OR 2 * r.vm < w.s
                           THEN 1 ELSE 0 END AS na
        FROM ew_w w JOIN ew_r r ON r.grp = w.grp AND r.rn = w.rn + 1)
    SELECT w.grp, CAST(r.n_days AS BIGINT) AS n_days,
           CAST(w.s AS DOUBLE) / 1e6 AS final_ewma,
           w.na AS n_anomalies
    FROM ew_w w
    JOIN (SELECT grp, MAX(rn) AS rn, ANY_VALUE(n_days) AS n_days
          FROM ew_r GROUP BY 1) r
      ON r.grp = w.grp AND r.rn = w.rn"""


# --------------------------------------------------------------------
# Heavy-tail audit: Hill estimator of the tail index
# --------------------------------------------------------------------

def hill_tail_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Hill estimator of the power-law tail index (Hill 1975):
    ``alpha = 1 / mean(ln(x_(i) / x_(k+1)))`` over each group's top
    ``k`` order statistics — the heavy-tail audit that decides
    whether means/variances of a value column can be trusted at all
    (alpha <= 2: infinite variance; alpha <= 1: infinite mean, and
    every q193-style trimmed mean is load-bearing).

    Scale shape: a top-(k+1) per group via window rank over the
    POSITIVE values only — the k+1 threshold row broadcasts back —
    then one k-row-per-group aggregate. Each ln ratio rounds to 12
    and sums as exact decimal; ties at the threshold resolve by a
    deterministic (value, id-free) rank on value desc so both
    engines pick identical top sets regardless of row order (ties
    inside the top-k contribute identical ratios anyway). Groups
    with fewer than k+1 positive values emit nothing. Returns
    (grp, k_used, x_k1, alpha) with alpha rounded 6.
    """
    pos = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("x"),
    ).filter(F.col("x") > 0)
    w = Window.partitionBy("grp").orderBy(F.col("x").desc())
    ranked = pos.select(
        "grp", "x", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= k + 1)
    thresh = ranked.filter(F.col("rk") == k + 1).select(
        "grp", F.col("x").alias("xk1")
    )
    top = ranked.filter(F.col("rk") <= k).join(
        F.broadcast(thresh), "grp"
    )
    agg = top.groupBy("grp", "xk1").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.sum(
            F.round(F.log(F.col("x") / F.col("xk1")), 12).cast(
                "decimal(38,12)"
            )
        ).alias("slog"),
    )
    return agg.select(
        "grp",
        "k_used",
        F.round(F.col("xk1"), 6).alias("x_k1"),
        F.when(
            F.col("slog") > 0,
            F.round(
                F.col("k_used").cast("double")
                / F.col("slog").cast("double"),
                6,
            ),
        ).alias("alpha"),
    )


def hill_oracle_sql(
    rows_sql: str,
    group: str,
    value: str,
    k: int = 200,
) -> str:
    """DuckDB mirror of :func:`hill_tail_index`."""
    return f"""
    WITH hl_p AS (
        SELECT {group} AS grp, CAST({value} AS DOUBLE) AS x
        FROM ({rows_sql})
        WHERE CAST({value} AS DOUBLE) > 0),
    hl_r AS (
        SELECT grp, x,
               row_number() OVER (PARTITION BY grp ORDER BY x DESC) AS rk
        FROM hl_p),
    hl_t AS (
        SELECT grp, x AS xk1 FROM hl_r WHERE rk = {int(k) + 1}),
    hl_a AS (
        SELECT r.grp, t.xk1,
               CAST(COUNT(*) AS BIGINT) AS k_used,
               SUM(CAST(round(ln(r.x / t.xk1), 12) AS DECIMAL(38,12)))
                   AS slog
        FROM hl_r r JOIN hl_t t USING (grp)
        WHERE r.rk <= {int(k)}
        GROUP BY 1, 2)
    SELECT grp, k_used, round(xk1, 6) AS x_k1,
           CASE WHEN slog > 0
                THEN round(CAST(k_used AS DOUBLE) / CAST(slog AS DOUBLE), 6)
           END AS alpha
    FROM hl_a"""


# --------------------------------------------------------------------
# Causal estimates from observational logs: matching ATT and DiD
# --------------------------------------------------------------------

def matched_att(
    units: DataFrame,
    treat_col: str = "treated",
    score_col: str = "score",
    outcome_col: str = "y",
    id_col: str = "uid",
) -> DataFrame:
    """Nearest-neighbor matching estimate of the average treatment
    effect on the treated (Rubin 1973 matching family): each
    treated unit is matched WITH REPLACEMENT to the control unit
    nearest on the 1-D balancing score, and ATT = mean over treated
    of (y_t - y_matched_control). Equidistant scores break toward
    the smaller control id; within a score the representative
    control is the (uid, y)-smallest — both deterministic.

    Scale shape: matching happens on the DISTINCT-SCORE axis, not
    the unit axis — controls collapse to one min-struct
    representative per score, treated contribute their distinct
    scores, and the prev/next-control carry (the q99 LOCF frames)
    runs over that score-level frame (bounded by the score range,
    thousands of rows at any corpus size, never a corpus-sized
    single-partition window). Treated units then pick up their
    match with one broadcast join on score. Integer scores and
    outcomes keep every delta exact; one division at the end,
    rounded 6. Returns one row (n_treated, n_matched, att,
    mean_y_treated, mean_y_control).
    """
    base = units.select(
        F.col(id_col).alias("uid"),
        F.col(score_col).cast("bigint").alias("score"),
        F.col(outcome_col).cast("bigint").alias("y"),
        F.col(treat_col).cast("int").alias("is_t"),
    )
    reps = (
        base.filter(F.col("is_t") == 0)
        .groupBy("score")
        .agg(F.min(F.struct("uid", "y")).alias("c"))
        .select("score", F.lit(0).alias("is_t"), "c")
    )
    tsc = (
        base.filter(F.col("is_t") == 1)
        .select("score")
        .distinct()
        .select("score", F.lit(1).alias("is_t"), F.lit(None).cast(
            "struct<uid:bigint,y:bigint>"
        ).alias("c"))
    )
    w = Window.orderBy("score", "is_t")
    frame = reps.unionByName(tsc).select(
        "score",
        "is_t",
        F.last(
            F.when(F.col("is_t") == 0, F.struct("score", "c")),
            ignorenulls=True,
        )
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_c"),
        F.first(
            F.when(F.col("is_t") == 0, F.struct("score", "c")),
            ignorenulls=True,
        )
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("next_c"),
    )
    pick_prev = (
        F.when(F.col("next_c").isNull(), True)
        .when(F.col("prev_c").isNull(), False)
        .when(
            F.abs(F.col("score") - F.col("prev_c.score"))
            < F.abs(F.col("next_c.score") - F.col("score")),
            True,
        )
        .when(
            F.abs(F.col("score") - F.col("prev_c.score"))
            > F.abs(F.col("next_c.score") - F.col("score")),
            False,
        )
        .otherwise(F.col("prev_c.c.uid") < F.col("next_c.c.uid"))
    )
    decision = (
        frame.filter(F.col("is_t") == 1)
        .select(
            "score",
            F.when(pick_prev, F.col("prev_c.c"))
            .otherwise(F.col("next_c.c"))
            .alias("m"),
        )
        .filter(F.col("m").isNotNull())
    )
    matched = base.filter(F.col("is_t") == 1).join(
        F.broadcast(decision), "score"
    )
    return matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_treated"),
        F.count("m").cast("bigint").alias("n_matched"),
        F.round(
            F.sum(F.col("y") - F.col("m.y")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("att"),
        F.round(
            F.sum("y").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_y_treated"),
        F.round(
            F.sum(F.col("m.y")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_y_control"),
    )


def matched_att_sql(units_sql: str) -> str:
    """DuckDB mirror of :func:`matched_att`. ``units_sql`` yields
    (uid, score, y, treated)."""
    return f"""
    WITH ma_b AS (
        SELECT uid, CAST(score AS BIGINT) AS score,
               CAST(y AS BIGINT) AS y, CAST(treated AS INTEGER) AS is_t
        FROM ({units_sql})),
    ma_r AS (
        SELECT score, 0 AS is_t,
               MIN(struct_pack(uid := uid, y := y)) AS c
        FROM ma_b WHERE is_t = 0 GROUP BY 1),
    ma_ts AS (
        SELECT DISTINCT score, 1 AS is_t,
               CAST(NULL AS STRUCT(uid BIGINT, y BIGINT)) AS c
        FROM ma_b WHERE is_t = 1),
    ma_u AS (SELECT * FROM ma_r UNION ALL SELECT * FROM ma_ts),
    ma_f AS (
        SELECT score, is_t,
               LAST_VALUE(CASE WHEN is_t = 0 THEN
                       struct_pack(score := score, c := c) END IGNORE NULLS)
                   OVER (ORDER BY score, is_t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_c,
               FIRST_VALUE(CASE WHEN is_t = 0 THEN
                       struct_pack(score := score, c := c) END IGNORE NULLS)
                   OVER (ORDER BY score, is_t
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_c
        FROM ma_u),
    ma_d AS (
        SELECT score,
               CASE WHEN next_c IS NULL THEN prev_c.c
                    WHEN prev_c IS NULL THEN next_c.c
                    WHEN abs(score - prev_c.score)
                         < abs(next_c.score - score) THEN prev_c.c
                    WHEN abs(score - prev_c.score)
                         > abs(next_c.score - score) THEN next_c.c
                    WHEN prev_c.c.uid < next_c.c.uid THEN prev_c.c
                    ELSE next_c.c END AS m
        FROM ma_f WHERE is_t = 1),
    ma_m AS (
        SELECT b.uid, b.y, d.m
        FROM ma_b b JOIN ma_d d USING (score)
        WHERE b.is_t = 1 AND d.m IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
           CAST(COUNT(m) AS BIGINT) AS n_matched,
           round(CAST(SUM(y - m.y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS att,
           round(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS mean_y_treated,
           round(CAST(SUM(m.y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS mean_y_control
    FROM ma_m"""


def diff_in_diff(
    df: DataFrame,
    unit_col: str,
    treated_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Two-period difference-in-differences (Card & Krueger 1994
    canonical design): DiD = (T_post - T_pre) - (C_post - C_pre)
    over per-unit-period outcome totals — the parallel-trends
    subtraction that turns a before/after comparison into a
    treatment estimate.

    Input is row-level; the op aggregates to unit-period cells,
    then to the four design cells (exact integer cent/micro sums),
    and the DiD itself is three subtractions of round-6 cell means.
    Returns one row per design cell PLUS the estimate columns
    repeated, wide: (mean_t_pre, mean_t_post, mean_c_pre,
    mean_c_post, did).
    """
    cells = (
        df.groupBy(
            F.col(unit_col).alias("u"),
            F.col(treated_col).cast("int").alias("t"),
            F.col(post_col).cast("int").alias("p"),
        )
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("v"))
        .groupBy("t", "p")
        .agg(
            F.round(
                F.sum("v").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_v")
        )
    )
    flat = cells.agg(
        F.sum(F.when((F.col("t") == 1) & (F.col("p") == 0), F.col("mean_v"))).alias("mean_t_pre"),
        F.sum(F.when((F.col("t") == 1) & (F.col("p") == 1), F.col("mean_v"))).alias("mean_t_post"),
        F.sum(F.when((F.col("t") == 0) & (F.col("p") == 0), F.col("mean_v"))).alias("mean_c_pre"),
        F.sum(F.when((F.col("t") == 0) & (F.col("p") == 1), F.col("mean_v"))).alias("mean_c_post"),
    )
    return flat.select(
        "mean_t_pre",
        "mean_t_post",
        "mean_c_pre",
        "mean_c_post",
        F.round(
            (F.col("mean_t_post") - F.col("mean_t_pre"))
            - (F.col("mean_c_post") - F.col("mean_c_pre")),
            6,
        ).alias("did"),
    )


def diff_in_diff_sql(rows_sql: str) -> str:
    """DuckDB mirror of :func:`diff_in_diff`. ``rows_sql`` yields
    (u, treated, post, v) row-level."""
    return f"""
    WITH dd_u AS (
        SELECT u, CAST(treated AS INTEGER) AS t,
               CAST(post AS INTEGER) AS p,
               CAST(SUM(CAST(v AS BIGINT)) AS BIGINT) AS v
        FROM ({rows_sql}) GROUP BY 1, 2, 3),
    dd_c AS (
        SELECT t, p,
               round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS mean_v
        FROM dd_u GROUP BY 1, 2),
    dd_f AS (
        SELECT SUM(CASE WHEN t = 1 AND p = 0 THEN mean_v END) AS mean_t_pre,
               SUM(CASE WHEN t = 1 AND p = 1 THEN mean_v END) AS mean_t_post,
               SUM(CASE WHEN t = 0 AND p = 0 THEN mean_v END) AS mean_c_pre,
               SUM(CASE WHEN t = 0 AND p = 1 THEN mean_v END) AS mean_c_post
        FROM dd_c)
    SELECT mean_t_pre, mean_t_post, mean_c_pre, mean_c_post,
           round((mean_t_post - mean_t_pre) - (mean_c_post - mean_c_pre), 6)
               AS did
    FROM dd_f"""


# --------------------------------------------------------------------
# Poisson bootstrap confidence intervals (seeded, one pass)
# --------------------------------------------------------------------

def _poisson1_thresholds(kmax: int = 8) -> list[float]:
    """Cumulative Poisson(1) thresholds P(X <= k), k = 0..kmax-1,
    computed once in Python and inlined identically in both engines."""
    import math

    acc, out, term = 0.0, [], math.exp(-1.0)
    for k in range(kmax):
        acc += term
        out.append(round(acc, 12))
        term /= k + 1
    return out


def poisson_bootstrap_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    b: int = 100,
    alpha: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Percentile bootstrap CI for the per-group mean via the
    POISSON bootstrap (Hanley & MacGibbon 2006; the resampling that
    works when data cannot be held or indexed on one machine —
    each row independently receives a Poisson(1) multiplicity per
    replicate, so one scan with a B-way explode yields all B
    resampled means; no sampling with replacement over a shuffled
    corpus). Weights come from the inverse CDF of a seeded md5
    uniform, thresholds inlined from Python — the same
    reproducibility contract as q255's DP noise.

    The CI is the conservative order-statistic percentile: lo =
    ceil(alpha/2 * B)-th smallest replicate mean, hi the mirrored
    rank. Replicate means are single divides of exact decimal sums;
    the rank window runs over B rows per group. Returns (grp, n,
    mean_full, ci_lo, ci_hi).

    r11: the input is spread() first — the b/4-way explode, the md5
    per (row, hash-block) and the weight inverse-CDF all run
    map-side BEFORE the (grp, bi) shuffle, so on a single-split scan
    (one parquet row group) the whole per-row cost otherwise lands
    in ONE task (guide §2.5 input skew). No-op whenever the scan
    already has >= cluster-parallelism native splits.
    """
    from ..util import spread

    df = spread(df)
    th = _poisson1_thresholds()
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("rid"),
        F.round(F.col(value_col).cast("double") * 1e6)
        .cast("bigint")
        .alias("vm"),
    )
    # md5 is the hot path: one hash serves FOUR replicates (4 x 32
    # exact uniform bits from the 32-hex digest), so the explode is
    # b/4-way, not b-way — measured 4x on the sf1 leg
    nh = (int(b) + 3) // 4
    rep = base.select(
        "grp",
        "rid",
        "vm",
        F.explode(F.sequence(F.lit(0), F.lit(nh - 1))).alias("hb"),
    ).select(
        "grp",
        "vm",
        "hb",
        F.md5(
            F.concat_ws(
                ":",
                F.col("rid").cast("string"),
                F.col("hb").cast("string"),
                F.lit(str(seed)),
            )
        ).alias("h"),
    ).select(
        "grp",
        "vm",
        "hb",
        "h",
        F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("lane"),
    ).filter(F.col("hb") * 4 + F.col("lane") < int(b)).select(
        "grp",
        "vm",
        (F.col("hb") * 4 + F.col("lane")).alias("bi"),
        (
            F.conv(
                F.expr("substring(h, lane * 8 + 1, 8)"), 16, 10
            ).cast("double")
            / F.lit(float(1 << 32))
        ).alias("u"),
    )
    w = F.lit(len(th))
    for k in range(len(th) - 1, -1, -1):
        w = F.when(F.col("u") <= F.lit(th[k]), F.lit(k)).otherwise(w)
    means = (
        rep.select("grp", "bi", w.alias("w"), "vm")
        .groupBy("grp", "bi")
        .agg(
            F.sum("w").cast("bigint").alias("sw"),
            F.sum(F.expr("CAST(w AS BIGINT) * vm")).cast("bigint").alias("swv"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "grp",
            F.round(
                F.col("swv").cast("double")
                / (F.col("sw").cast("double") * F.lit(1e6)),
                6,
            ).alias("m"),
        )
    )
    import math as _math

    lo_rank = max(1, _math.ceil(alpha / 2.0 * b))
    hi_rank = b + 1 - lo_rank
    wnd = Window.partitionBy("grp").orderBy("m")
    ranked = means.select(
        "grp", "m", F.row_number().over(wnd).alias("rk")
    )
    ci = ranked.groupBy("grp").agg(
        F.max(F.when(F.col("rk") == lo_rank, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rk") == hi_rank, F.col("m"))).alias("ci_hi"),
    )
    full = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum("vm").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e6)),
            6,
        ).alias("mean_full"),
    )
    return full.join(ci, "grp").select(
        "grp", "n", "mean_full", "ci_lo", "ci_hi"
    )


def poisson_bootstrap_sql(
    rows_sql: str,
    group: str,
    value: str,
    id_: str,
    b: int = 100,
    alpha: float = 0.05,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`poisson_bootstrap_ci`."""
    import math as _math

    th = _poisson1_thresholds()
    lo_rank = max(1, _math.ceil(alpha / 2.0 * b))
    hi_rank = b + 1 - lo_rank
    wcase = " ".join(
        f"WHEN u <= {t!r} THEN {k}" for k, t in enumerate(th)
    )
    return f"""
    WITH pb_b AS (
        SELECT {group} AS grp, {id_} AS rid,
               CAST(round(CAST({value} AS DOUBLE) * 1e6, 0) AS BIGINT)
                   AS vm
        FROM ({rows_sql})),
    pb_h AS MATERIALIZED (
        SELECT grp, vm, t.hb,
               md5(CAST(rid AS VARCHAR) || ':' || CAST(t.hb AS VARCHAR)
                   || ':' || '{seed}') AS h
        FROM pb_b, unnest(range({(int(b) + 3) // 4})) AS t(hb)),
    pb_u AS (
        SELECT grp, hb * 4 + l.lane AS bi, vm,
               CAST(CAST(('0x' || substring(h, l.lane * 8 + 1, 8))
                         AS BIGINT) AS DOUBLE) / {float(1 << 32)!r} AS u
        FROM pb_h, unnest(range(4)) AS l(lane)
        WHERE hb * 4 + l.lane < {int(b)}),
    pb_w AS (
        SELECT grp, bi, vm,
               CASE {wcase} ELSE {len(th)} END AS w
        FROM pb_u),
    pb_m AS (
        SELECT grp,
               round(CAST(SUM(CAST(w AS BIGINT) * vm) AS DOUBLE)
                     / (CAST(SUM(w) AS DOUBLE) * 1e6), 6) AS m
        FROM pb_w GROUP BY grp, bi
        HAVING SUM(w) > 0),
    pb_k AS (
        SELECT grp, m,
               row_number() OVER (PARTITION BY grp ORDER BY m) AS rk
        FROM pb_m),
    pb_ci AS (
        SELECT grp,
               MAX(CASE WHEN rk = {lo_rank} THEN m END) AS ci_lo,
               MAX(CASE WHEN rk = {hi_rank} THEN m END) AS ci_hi
        FROM pb_k GROUP BY 1),
    pb_f AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(vm) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_full
        FROM pb_b GROUP BY 1)
    SELECT f.grp, f.n, f.mean_full, c.ci_lo, c.ci_hi
    FROM pb_f f JOIN pb_ci c USING (grp)"""


# --------------------------------------------------------------------
# Uplift curve by score decile (qini-style targeting audit)
# --------------------------------------------------------------------

def uplift_deciles(
    units: DataFrame,
    treat_col: str = "treated",
    score_col: str = "score",
    outcome_col: str = "y",
    id_col: str = "uid",
    buckets: int = 10,
) -> DataFrame:
    """Cumulative uplift curve (Radcliffe 2007 qini family): rank
    ALL units by targeting score descending, cut into deciles, and
    report at each depth the cumulative treated-minus-control mean
    outcome — "if we only acted on the top d/10, how much lift
    would we bank". The targeting audit that decides whether q271's
    average effect concentrates where a model says it does.

    Scale shape: deciles come from the SCORE HISTOGRAM — decile of
    score s = ceil(buckets * cum_users_through_s / N) on the
    distinct-score frame — never an ntile window over the unit
    axis; all users sharing a score share a decile by contract
    (score-level granularity is the price of the corpus-safe plan,
    and the honest one: a targeting rule cannot split ties it
    cannot see). Cumulative sums run over the buckets-row frame.
    Returns (decile, n_t, n_c, cum_rate_t, cum_rate_c, uplift).
    """
    base = units.select(
        F.col(id_col).alias("uid"),
        F.col(score_col).cast("bigint").alias("score"),
        F.col(outcome_col).cast("bigint").alias("y"),
        F.col(treat_col).cast("int").alias("is_t"),
    )
    hist = base.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wcum = Window.orderBy(F.col("score").desc())
    n_tot = hist.agg(F.sum("n").cast("bigint").alias("nt"))
    dec = (
        hist.crossJoin(F.broadcast(n_tot))
        .select(
            "score",
            F.ceil(
                F.lit(buckets)
                * F.sum("n").over(wcum).cast("double")
                / F.col("nt").cast("double")
            )
            .cast("int")
            .alias("decile"),
        )
    )
    cells = (
        base.join(F.broadcast(dec), "score")
        .groupBy("decile")
        .agg(
            F.sum(F.when(F.col("is_t") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_t"),
            F.sum(F.when(F.col("is_t") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_c"),
            F.sum(F.when(F.col("is_t") == 1, F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("y_t"),
            F.sum(F.when(F.col("is_t") == 0, F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("y_c"),
        )
    )
    wd = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "decile",
        F.col("n_t"),
        F.col("n_c"),
        F.sum("n_t").over(wd).alias("ct_n"),
        F.sum("n_c").over(wd).alias("cc_n"),
        F.sum("y_t").over(wd).alias("ct_y"),
        F.sum("y_c").over(wd).alias("cc_y"),
    )
    rate_t = F.when(
        F.col("ct_n") > 0,
        F.round(F.col("ct_y").cast("double") / F.col("ct_n").cast("double"), 6),
    )
    rate_c = F.when(
        F.col("cc_n") > 0,
        F.round(F.col("cc_y").cast("double") / F.col("cc_n").cast("double"), 6),
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        rate_t.alias("cum_rate_t"),
        rate_c.alias("cum_rate_c"),
        F.round(rate_t - rate_c, 6).alias("uplift"),
    )


def uplift_oracle_sql(units_sql: str, buckets: int = 10) -> str:
    """DuckDB mirror of :func:`uplift_deciles`. ``units_sql`` yields
    (uid, score, y, treated)."""
    return f"""
    WITH up_b AS (
        SELECT uid, CAST(score AS BIGINT) AS score,
               CAST(y AS BIGINT) AS y, CAST(treated AS INTEGER) AS is_t
        FROM ({units_sql})),
    up_h AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS n
        FROM up_b GROUP BY 1),
    up_d AS (
        SELECT score,
               CAST(ceil({int(buckets)}
                   * CAST(SUM(n) OVER (ORDER BY score DESC) AS DOUBLE)
                   / CAST((SELECT SUM(n) FROM up_h) AS DOUBLE))
                   AS INTEGER) AS decile
        FROM up_h),
    up_c AS (
        SELECT d.decile,
               CAST(SUM(CASE WHEN b.is_t = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_t,
               CAST(SUM(CASE WHEN b.is_t = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_c,
               CAST(SUM(CASE WHEN b.is_t = 1 THEN b.y ELSE 0 END) AS BIGINT)
                   AS y_t,
               CAST(SUM(CASE WHEN b.is_t = 0 THEN b.y ELSE 0 END) AS BIGINT)
                   AS y_c
        FROM up_b b JOIN up_d d USING (score)
        GROUP BY 1),
    up_k AS (
        SELECT decile, n_t, n_c,
               SUM(n_t) OVER w AS ct_n, SUM(n_c) OVER w AS cc_n,
               SUM(y_t) OVER w AS ct_y, SUM(y_c) OVER w AS cc_y
        FROM up_c
        WINDOW w AS (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT decile, n_t, n_c,
           CASE WHEN ct_n > 0 THEN
               round(CAST(ct_y AS DOUBLE) / CAST(ct_n AS DOUBLE), 6)
           END AS cum_rate_t,
           CASE WHEN cc_n > 0 THEN
               round(CAST(cc_y AS DOUBLE) / CAST(cc_n AS DOUBLE), 6)
           END AS cum_rate_c,
           round(CASE WHEN ct_n > 0 THEN
                     round(CAST(ct_y AS DOUBLE) / CAST(ct_n AS DOUBLE), 6)
                 END
                 - CASE WHEN cc_n > 0 THEN
                     round(CAST(cc_y AS DOUBLE) / CAST(cc_n AS DOUBLE), 6)
                 END, 6) AS uplift
    FROM up_k"""


# --------------------------------------------------------------------
# Expected calibration error of a probabilistic predictor
# --------------------------------------------------------------------

def expected_calibration_error(
    df: DataFrame,
    conf_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Expected calibration error (Naeini et al. AAAI'15; the
    reliability-diagram number every model card quotes): bucket
    predictions by confidence into ``bins`` equal-width bins and
    ECE = sum_b (n_b / N) * |acc_b - conf_b|. Complements the
    calibration FIXERS (q230 quantile, q250 isotonic) with the
    measurement that says whether fixing is needed.

    One aggregate; accuracies and mean confidences are single
    divides of exact sums (confidence summed on the round-9
    decimal grid). Returns per-bin rows plus the weighted total in
    every row: (bin, n, conf_avg, acc, gap, ece).
    """
    b = int(bins)
    binned = df.select(
        F.least(
            F.lit(b - 1),
            F.floor(F.col(conf_col).cast("double") * b).cast("int"),
        ).alias("bin"),
        F.round(F.col(conf_col).cast("double"), 9)
        .cast("decimal(28,9)")
        .alias("c"),
        F.col(label_col).cast("int").alias("y"),
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").alias("sc"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    tot = cells.agg(F.sum("n").cast("bigint").alias("nt"))
    per = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "nt",
        F.round(F.col("sc").cast("double") / F.col("n").cast("double"), 6)
        .alias("conf_avg"),
        F.round(F.col("sy").cast("double") / F.col("n").cast("double"), 6)
        .alias("acc"),
    ).select(
        "bin",
        "n",
        "nt",
        "conf_avg",
        "acc",
        F.round(F.abs(F.col("acc") - F.col("conf_avg")), 6).alias("gap"),
    )
    ece = per.agg(
        F.round(
            F.sum(
                F.col("gap").cast("decimal(28,9)") * F.col("n")
            ).cast("double")
            / F.first(F.col("nt")).cast("double"),
            6,
        ).alias("ece")
    )
    return per.crossJoin(F.broadcast(ece)).select(
        "bin", "n", "conf_avg", "acc", "gap", "ece"
    )


def ece_oracle_sql(rows_sql: str, conf: str, label: str, bins: int = 10) -> str:
    """DuckDB mirror of :func:`expected_calibration_error`."""
    b = int(bins)
    return f"""
    WITH ec_b AS (
        SELECT least({b - 1},
                     CAST(floor(CAST({conf} AS DOUBLE) * {b}) AS INTEGER))
                   AS bin,
               CAST(round(CAST({conf} AS DOUBLE), 9) AS DECIMAL(28,9)) AS c,
               CAST({label} AS INTEGER) AS y
        FROM ({rows_sql})),
    ec_c AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(c) AS sc, CAST(SUM(y) AS BIGINT) AS sy
        FROM ec_b GROUP BY 1),
    ec_p AS (
        SELECT bin, n,
               round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS conf_avg,
               round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc
        FROM ec_c),
    ec_g AS (
        SELECT bin, n, conf_avg, acc,
               round(abs(acc - conf_avg), 6) AS gap
        FROM ec_p),
    ec_e AS (
        SELECT round(CAST(SUM(CAST(gap AS DECIMAL(28,9)) * n) AS DOUBLE)
                     / CAST(SUM(n) AS DOUBLE), 6) AS ece
        FROM ec_g)
    SELECT g.bin, g.n, g.conf_avg, g.acc, g.gap, e.ece
    FROM ec_g g CROSS JOIN ec_e e"""


# --------------------------------------------------------------------
# CUPED variance reduction for experiment metrics
# --------------------------------------------------------------------

def cuped_adjust(
    df: DataFrame,
    unit_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. WSDM'13; the standard
    pre-experiment covariate adjustment at every experimentation
    platform): adjusted metric Y' = Y - theta (X - mean X) with
    theta = cov(X, Y)/var(X) from pre/post unit aggregates. The
    payoff is the variance ratio — var(Y')/var(Y) = 1 - rho^2 —
    i.e. how much smaller an experiment the same power now needs.

    One unit-level aggregate feeds five round-9 decimal moments;
    theta and both variances are fixed-order double closed forms.
    Returns one row (n, theta, var_y, var_adj, reduction_pct).
    """

    def m(expr: str):
        return F.sum(F.round(F.expr(expr), 9).cast("decimal(38,9)"))

    mom = df.select(
        F.col(unit_col).alias("u"),
        F.col(pre_col).cast("double").alias("x"),
        F.col(post_col).cast("double").alias("y"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        m("x").alias("sx"),
        m("y").alias("sy"),
        m("x * x").alias("sxx"),
        m("x * y").alias("sxy"),
        m("y * y").alias("syy"),
    )
    return mom.select(
        "n",
        F.round(
            F.expr(
                "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
                " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
                "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            ),
            6,
        ).alias("theta"),
        F.round(
            F.expr(
                "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
                " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
                " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"
            ),
            6,
        ).alias("var_y"),
        F.round(
            F.expr(
                "((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
                "  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
                " - pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
                "       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)"
                "   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
                "      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
                " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"
            ),
            6,
        ).alias("var_adj"),
    ).select(
        "n",
        "theta",
        "var_y",
        "var_adj",
        F.when(
            F.col("var_y") > 0,
            F.round(
                (F.lit(1.0) - F.col("var_adj") / F.col("var_y")) * 100, 2
            ),
        ).alias("reduction_pct"),
    )


def cuped_oracle_sql(rows_sql: str) -> str:
    """DuckDB mirror of :func:`cuped_adjust`. ``rows_sql`` yields
    (u, x, y) unit aggregates."""

    def m(expr: str, alias: str) -> str:
        return f"SUM(CAST(round({expr}, 9) AS DECIMAL(38,9))) AS {alias}"

    return f"""
    WITH cu_b AS (
        SELECT u, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
        FROM ({rows_sql})),
    cu_m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {m('x', 'sx')}, {m('y', 'sy')},
               {m('x * x', 'sxx')}, {m('x * y', 'sxy')},
               {m('y * y', 'syy')}
        FROM cu_b),
    cu_r AS (
        SELECT n,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS theta,
               round((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)
                   AS var_y,
               round(((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                      - pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)
                   AS var_adj
        FROM cu_m)
    SELECT n, theta, var_y, var_adj,
           CASE WHEN var_y > 0
                THEN round((1.0 - var_adj / var_y) * 100, 2)
           END AS reduction_pct
    FROM cu_r"""


# --------------------------------------------------------------------
# Median-of-means robust location estimate
# --------------------------------------------------------------------

def median_of_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Median-of-means estimator (Nemirovski-Yudin 1983 / the
    heavy-tail-robust mean modern statistics reaches for when q269
    says the tail index is low): rows hash into ``k`` buckets, the
    estimate is the MEDIAN of the k bucket means — sub-Gaussian
    deviation bounds under nothing but finite variance, where the
    plain mean is hostage to the largest outlier.

    Buckets come from the portable md5 idiom so both engines build
    identical partitions; bucket means are single divides of exact
    decimal sums; the median is the lower order statistic of the
    k-row frame (exact, no interpolation). Returns (grp, n,
    mean_plain, mom) per group.
    """
    from .sampling import hash_bucket

    base = df.select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col).cast("double") * 1e6)
        .cast("bigint")
        .alias("vm"),
        hash_bucket(F.col(id_col), seed=seed, buckets=int(k)).alias("bk"),
    )
    bm = base.groupBy("grp", "bk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("vm").cast("bigint").alias("s"),
    ).select(
        "grp",
        "n",
        F.round(
            F.col("s").cast("double") / (F.col("n").cast("double") * 1e6), 9
        ).alias("m"),
    )
    w = Window.partitionBy("grp").orderBy("m")
    med = bm.select(
        "grp",
        "n",
        "m",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("nb"),
    )
    mom = med.filter(
        F.col("rk") == F.expr("CAST((nb + 1) / 2 AS INT)")
    ).select("grp", F.round("m", 6).alias("mom"))
    plain = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum("vm").cast("double")
            / (F.count(F.lit(1)).cast("double") * 1e6),
            6,
        ).alias("mean_plain"),
    )
    return plain.join(mom, "grp").select("grp", "n", "mean_plain", "mom")


def median_of_means_sql(
    rows_sql: str,
    group: str,
    value: str,
    id_: str,
    k: int = 32,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`median_of_means`."""
    from .sampling import hash_bucket_sql

    bkt = hash_bucket_sql(id_, seed=seed, buckets=int(k))
    return f"""
    WITH mm_b AS (
        SELECT {group} AS grp,
               CAST(round(CAST({value} AS DOUBLE) * 1e6, 0) AS BIGINT)
                   AS vm,
               {bkt} AS bk
        FROM ({rows_sql})),
    mm_m AS (
        SELECT grp,
               round(CAST(SUM(vm) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * 1e6), 9) AS m
        FROM mm_b GROUP BY grp, bk),
    mm_r AS (
        SELECT grp, m,
               row_number() OVER (PARTITION BY grp ORDER BY m) AS rk,
               COUNT(*) OVER (PARTITION BY grp) AS nb
        FROM mm_m),
    mm_md AS (
        SELECT grp, round(m, 6) AS mom
        FROM mm_r WHERE rk = CAST((nb + 1) / 2 AS INTEGER)),
    mm_p AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(vm) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_plain
        FROM mm_b GROUP BY 1)
    SELECT p.grp, p.n, p.mean_plain, d.mom
    FROM mm_p p JOIN mm_md d USING (grp)"""


# --------------------------------------------------------------------
# Covariate balance audit: standardized mean differences
# --------------------------------------------------------------------

def balance_smd(
    units: DataFrame,
    treat_col: str,
    covariates: list[str],
) -> DataFrame:
    """Standardized mean differences between treated and control
    for each covariate (Rosenbaum-Rubin balance diagnostics;
    |SMD| < 0.1 is the conventional 'balanced' line): SMD =
    (mean_t - mean_c) / sqrt((var_t + var_c) / 2). The audit that
    must accompany any q271-style matched estimate — an ATT over
    imbalanced covariates is confounding wearing a suit.

    One aggregate computes all covariates' per-arm round-9 decimal
    moments (the frame unpivots covariates first, so adding a
    column is a constant, not a pass); variances and the SMD are
    fixed-order double closed forms. Returns (covariate, mean_t,
    mean_c, smd, balanced).
    """
    arms = units.select(
        F.col(treat_col).cast("int").alias("t"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("cov"),
                        F.col(c).cast("double").alias("x"),
                    )
                    for c in covariates
                ]
            )
        ).alias("e"),
    ).select("t", F.col("e.cov").alias("cov"), F.col("e.x").alias("x"))
    mom = arms.groupBy("cov", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round("x", 9).cast("decimal(38,9)")).alias("s"),
        F.sum(F.round(F.expr("x * x"), 9).cast("decimal(38,9)")).alias("ss"),
    )
    wide = mom.groupBy("cov").agg(
        *[
            F.max(F.when(F.col("t") == arm, F.col(c))).alias(f"{c}{arm}")
            for arm in (0, 1)
            for c in ("n", "s", "ss")
        ]
    )
    mean_t = F.expr("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)")
    mean_c = F.expr("CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)")
    var_t = F.expr(
        "(CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
        " / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))"
    )
    var_c = F.expr(
        "(CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)"
        " - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))"
        " / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE))"
    )
    smd = F.when(
        (var_t + var_c) > 0,
        F.round(
            (mean_t - mean_c)
            / F.sqrt((var_t + var_c) / F.lit(2.0)),
            6,
        ),
    )
    return wide.select(
        "cov",
        F.round(mean_t, 6).alias("mean_t"),
        F.round(mean_c, 6).alias("mean_c"),
        smd.alias("smd"),
        F.when(F.abs(smd) < 0.1, 1).otherwise(0).alias("balanced"),
    )


def balance_smd_sql(units_sql: str, covariates: list[str]) -> str:
    """DuckDB mirror of :func:`balance_smd`. ``units_sql`` yields
    (treated, <covariates...>)."""
    unions = "\n        UNION ALL\n        ".join(
        f"SELECT CAST(treated AS INTEGER) AS t, '{c}' AS cov,"
        f" CAST({c} AS DOUBLE) AS x FROM ({units_sql})"
        for c in covariates
    )
    return f"""
    WITH bs_a AS (
        {unions}),
    bs_m AS (
        SELECT cov, t, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(round(x, 9) AS DECIMAL(38,9))) AS s,
               SUM(CAST(round(x * x, 9) AS DECIMAL(38,9))) AS ss
        FROM bs_a GROUP BY 1, 2),
    bs_w AS (
        SELECT cov,
               MAX(CASE WHEN t = 0 THEN n END) AS n0,
               MAX(CASE WHEN t = 0 THEN s END) AS s0,
               MAX(CASE WHEN t = 0 THEN ss END) AS ss0,
               MAX(CASE WHEN t = 1 THEN n END) AS n1,
               MAX(CASE WHEN t = 1 THEN s END) AS s1,
               MAX(CASE WHEN t = 1 THEN ss END) AS ss1
        FROM bs_m GROUP BY 1),
    bs_s AS (
        SELECT cov,
               CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_t,
               CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_c,
               (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)) AS var_t,
               (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
                - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
               / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE)) AS var_c
        FROM bs_w)
    SELECT cov, round(mean_t, 6) AS mean_t, round(mean_c, 6) AS mean_c,
           CASE WHEN var_t + var_c > 0
                THEN round((mean_t - mean_c)
                           / sqrt((var_t + var_c) / 2.0), 6)
           END AS smd,
           CASE WHEN abs(CASE WHEN var_t + var_c > 0
                 THEN round((mean_t - mean_c)
                            / sqrt((var_t + var_c) / 2.0), 6) END) < 0.1
                THEN 1 ELSE 0 END AS balanced
    FROM bs_s"""


# --------------------------------------------------------------------
# RFM segmentation by histogram quintiles
# --------------------------------------------------------------------

def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    asof: str,
    buckets: int = 5,
) -> DataFrame:
    """Recency-Frequency-Monetary segmentation (Hughes 1994, the
    classic CRM cut): each user scores 1..5 on recency (days since
    last event, LOWER is better), frequency (event count) and
    monetary (total cents); segments are the score triples. Scores
    come from the q274 HISTOGRAM-quintile rule per dimension —
    ceil(buckets * cum/N) over the distinct-value frame, ties share
    a bucket — never a corpus-axis ntile. Monetary SCORES on the
    dollar grid (cents DIV 100): per-user cent sums are nearly
    all-distinct, and an all-distinct histogram is the user-sized
    window this design exists to avoid; recency and frequency are
    already coarse. Returns one row per
    (r_score, f_score, m_score) cell: (r_score, f_score, m_score,
    n_users, avg_monetary).
    """
    b = int(buckets)
    units = df.groupBy(F.col(user_col).alias("u")).agg(
        F.datediff(F.lit(asof), F.max(F.col(ts_col))).cast("bigint").alias(
            "rec"
        ),
        F.count(F.lit(1)).cast("bigint").alias("frq"),
        F.sum(F.round(F.col(value_col) * 100).cast("bigint"))
        .cast("bigint")
        .alias("mon"),
    )

    def hist_score(col: str, asc: bool):
        wc = Window.orderBy(F.col("v").asc() if asc else F.col("v").desc())
        h = units.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        t = h.agg(F.sum("n").cast("bigint").alias("nt"))
        return h.crossJoin(F.broadcast(t)).select(
            F.col("v").alias(col),
            F.ceil(
                F.lit(b)
                * F.sum("n").over(wc).cast("double")
                / F.col("nt").cast("double")
            )
            .cast("int")
            .alias(f"{col}_s"),
        )
    # recency: fewer days = better = HIGHER score -> ascending
    # cumulation ranks small recency into the top bucket via desc?
    # convention: score 5 = best. recency asc -> first buckets are
    # the most recent; we want them scored 5 -> use (b + 1 - bucket)
    rsc = hist_score("rec", asc=True).select(
        "rec", (F.lit(b + 1) - F.col("rec_s")).alias("r_score")
    )
    fsc = hist_score("frq", asc=True).select(
        "frq", F.col("frq_s").alias("f_score")
    )
    units = units.withColumn("mon_g", F.expr("mon DIV 100"))
    msc = hist_score("mon_g", asc=True).select(
        "mon_g", F.col("mon_g_s").alias("m_score")
    )
    scored = (
        units.join(F.broadcast(rsc), "rec")
        .join(F.broadcast(fsc), "frq")
        .join(F.broadcast(msc), "mon_g")
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(
            F.sum("mon").cast("double")
            / (F.count(F.lit(1)).cast("double") * 100),
            2,
        ).alias("avg_monetary"),
    )


def rfm_oracle_sql(
    rows_sql: str,
    user: str,
    ts: str,
    value: str,
    asof: str,
    buckets: int = 5,
) -> str:
    """DuckDB mirror of :func:`rfm_segments`."""
    b = int(buckets)

    def hist(col: str) -> str:
        return f"""(
        SELECT v AS {col},
               CAST(ceil({b} * CAST(SUM(n) OVER (ORDER BY v ASC) AS DOUBLE)
                    / CAST((SELECT COUNT(*) FROM rfm_u) AS DOUBLE))
                    AS INTEGER) AS {col}_s
        FROM (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS n
              FROM rfm_u GROUP BY 1) h)"""

    return f"""
    WITH rfm_u AS (
        SELECT {user} AS u,
               CAST(date_diff('day', CAST(MAX({ts}) AS DATE),
                              DATE '{asof}') AS BIGINT) AS rec,
               CAST(COUNT(*) AS BIGINT) AS frq,
               CAST(SUM(CAST(round({value} * 100, 0) AS BIGINT)) AS BIGINT)
                   AS mon,
               CAST(SUM(CAST(round({value} * 100, 0) AS BIGINT)) AS BIGINT)
                   // 100 AS mon_g
        FROM ({rows_sql}) GROUP BY 1),
    rfm_r AS {hist('rec')},
    rfm_f AS {hist('frq')},
    rfm_m AS {hist('mon_g')},
    rfm_s AS (
        SELECT u, ({b} + 1 - r.rec_s) AS r_score, f.frq_s AS f_score,
               m.mon_g_s AS m_score, un.mon
        FROM rfm_u un
        JOIN rfm_r r USING (rec)
        JOIN rfm_f f USING (frq)
        JOIN rfm_m m USING (mon_g))
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(mon) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * 100), 2) AS avg_monetary
    FROM rfm_s GROUP BY 1, 2, 3"""


# --------------------------------------------------------------------
# Panel fixed-effects (within) estimator vs pooled OLS
# --------------------------------------------------------------------

def within_estimator(
    df: DataFrame,
    unit_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Panel fixed-effects slope by the within transformation
    (Mundlak 1961 / the workhorse panel estimator): demean x and y
    WITHIN each unit, then OLS on the demeaned data — every
    time-invariant unit confounder drops out algebraically, which
    is why the within slope and the pooled slope disagree exactly
    when unit-level selection is doing the work. Both reported so
    the gap is the diagnostic.

    Per-unit integer moment five-tuples reduce map-side; each
    unit's demeaned cross/self products (the only divisions) round
    to 6 and sum as exact decimals, so the global numerator and
    denominator are order-independent. Returns one row (n_units,
    n_obs, beta_within, beta_pooled).
    """
    pm = df.groupBy(F.col(unit_col).alias("u")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(x_col).cast("bigint")).alias("sx"),
        F.sum(F.col(y_col).cast("bigint")).alias("sy"),
        F.sum(F.expr(f"CAST({x_col} AS BIGINT) * CAST({y_col} AS BIGINT)"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.expr(f"CAST({x_col} AS BIGINT) * CAST({x_col} AS BIGINT)"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    within = pm.select(
        "n",
        "sx",
        "sy",
        F.round(
            F.col("sxy").cast("double")
            - F.col("sx").cast("double")
            * F.col("sy").cast("double")
            / F.col("n").cast("double"),
            6,
        )
        .cast("decimal(38,6)")
        .alias("wxy"),
        F.round(
            F.col("sxx").cast("double")
            - F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / F.col("n").cast("double"),
            6,
        )
        .cast("decimal(38,6)")
        .alias("wxx"),
        F.col("sxy"),
        F.col("sxx"),
    )
    agg = within.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("n").cast("bigint").alias("n_obs"),
        F.sum("wxy").alias("swxy"),
        F.sum("wxx").alias("swxx"),
        F.sum("sx").cast("decimal(38,0)").alias("tx"),
        F.sum("sy").cast("decimal(38,0)").alias("ty"),
        F.sum("sxy").alias("txy"),
        F.sum("sxx").alias("txx"),
    )
    return agg.select(
        "n_units",
        "n_obs",
        F.when(
            F.col("swxx") > 0,
            F.round(
                F.col("swxy").cast("double") / F.col("swxx").cast("double"),
                6,
            ),
        ).alias("beta_within"),
        F.round(
            F.expr(
                "(CAST(n_obs AS DOUBLE) * CAST(txy AS DOUBLE)"
                " - CAST(tx AS DOUBLE) * CAST(ty AS DOUBLE))"
                " / (CAST(n_obs AS DOUBLE) * CAST(txx AS DOUBLE)"
                "    - CAST(tx AS DOUBLE) * CAST(tx AS DOUBLE))"
            ),
            6,
        ).alias("beta_pooled"),
    )


def within_oracle_sql(rows_sql: str) -> str:
    """DuckDB mirror of :func:`within_estimator`. ``rows_sql``
    yields (u, x, y) integer panel observations."""
    return f"""
    WITH wi_p AS (
        SELECT u, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(x AS BIGINT) * CAST(y AS BIGINT))
                    AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT))
                    AS DECIMAL(38,0)) AS sxx
        FROM ({rows_sql}) GROUP BY 1),
    wi_w AS (
        SELECT n, sx, sy, sxy, sxx,
               CAST(round(CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                            / CAST(n AS DOUBLE), 6) AS DECIMAL(38,6))
                   AS wxy,
               CAST(round(CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n AS DOUBLE), 6) AS DECIMAL(38,6))
                   AS wxx
        FROM wi_p),
    wi_a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM(n) AS BIGINT) AS n_obs,
               SUM(wxy) AS swxy, SUM(wxx) AS swxx,
               CAST(SUM(sx) AS DECIMAL(38,0)) AS tx,
               CAST(SUM(sy) AS DECIMAL(38,0)) AS ty,
               SUM(sxy) AS txy, SUM(sxx) AS txx
        FROM wi_w)
    SELECT n_units, n_obs,
           CASE WHEN swxx > 0
                THEN round(CAST(swxy AS DOUBLE) / CAST(swxx AS DOUBLE), 6)
           END AS beta_within,
           round((CAST(n_obs AS DOUBLE) * CAST(txy AS DOUBLE)
                  - CAST(tx AS DOUBLE) * CAST(ty AS DOUBLE))
                 / (CAST(n_obs AS DOUBLE) * CAST(txx AS DOUBLE)
                    - CAST(tx AS DOUBLE) * CAST(tx AS DOUBLE)), 6)
               AS beta_pooled
    FROM wi_a"""


# --------------------------------------------------------------------
# Log-rank test between two survival cohorts
# --------------------------------------------------------------------

def logrank_test(
    df: DataFrame,
    group_col: str = "grp",
    time_col: str = "t",
    event_col: str = "e",
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966; the standard 'are
    these two survival curves the same' companion to q198's
    Kaplan-Meier): at every distinct event time, compare group 1's
    observed deaths to those expected from the pooled risk set;
    chi2 = (sum O - sum E)^2 / sum V with the hypergeometric
    variance V_t = d n1 n2 (n - d) / (n^2 (n - 1)).

    Input: one row per subject — (group in {0,1}, integer duration,
    event flag 1 = observed / 0 = censored). Risk sets come from
    suffix sums over the DISTINCT-TIME frame (cumulative windows on
    a dimension-sized axis, never the subject axis); E and V terms
    are round-9 decimal sums of fixed-order double expressions.
    Returns one row (n1, n2, d1, d2, o_minus_e, chi2).
    """
    base = df.select(
        F.col(group_col).cast("int").alias("g"),
        F.col(time_col).cast("bigint").alias("t"),
        F.col(event_col).cast("int").alias("e"),
    )
    cells = base.groupBy("t").agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("ent1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("ent0"),
        F.sum(F.when((F.col("g") == 1) & (F.col("e") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when((F.col("g") == 0) & (F.col("e") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("d0"),
    )
    # risk set at t = subjects with duration >= t: suffix sums
    ws = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = cells.select(
        "t",
        "d1",
        "d0",
        F.sum("ent1").over(ws).alias("n1t"),
        F.sum("ent0").over(ws).alias("n0t"),
    ).filter((F.col("d1") + F.col("d0")) > 0)
    terms = risk.select(
        "d1",
        "d0",
        F.round(
            F.expr(
                "CAST(d1 + d0 AS DOUBLE) * CAST(n1t AS DOUBLE)"
                " / CAST(n1t + n0t AS DOUBLE)"
            ),
            9,
        )
        .cast("decimal(38,9)")
        .alias("e1"),
        F.round(
            F.expr(
                "CASE WHEN n1t + n0t > 1 THEN"
                " CAST(d1 + d0 AS DOUBLE) * CAST(n1t AS DOUBLE)"
                " * CAST(n0t AS DOUBLE)"
                " * CAST(n1t + n0t - d1 - d0 AS DOUBLE)"
                " / (CAST(n1t + n0t AS DOUBLE) * CAST(n1t + n0t AS DOUBLE)"
                "    * CAST(n1t + n0t - 1 AS DOUBLE))"
                " ELSE 0.0 END"
            ),
            9,
        )
        .cast("decimal(38,9)")
        .alias("v"),
    )
    tot = base.agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    agg = terms.agg(
        F.sum("d1").cast("bigint").alias("d1"),
        F.sum("d0").cast("bigint").alias("d2"),
        F.sum("e1").alias("se1"),
        F.sum("v").alias("sv"),
    )
    return tot.crossJoin(F.broadcast(agg)).select(
        "n1",
        "n2",
        "d1",
        "d2",
        F.round(
            F.col("d1").cast("double") - F.col("se1").cast("double"), 6
        ).alias("o_minus_e"),
        F.when(
            F.col("sv") > 0,
            F.round(
                F.pow(
                    F.col("d1").cast("double") - F.col("se1").cast("double"),
                    F.lit(2.0),
                )
                / F.col("sv").cast("double"),
                6,
            ),
        ).alias("chi2"),
    )


def logrank_oracle_sql(subjects_sql: str) -> str:
    """DuckDB mirror of :func:`logrank_test`. ``subjects_sql``
    yields (g, t, e)."""
    return f"""
    WITH lr_b AS (
        SELECT CAST(g AS INTEGER) AS g, CAST(t AS BIGINT) AS t,
               CAST(e AS INTEGER) AS e
        FROM ({subjects_sql})),
    lr_c AS (
        SELECT t,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ent1,
               CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ent0,
               CAST(SUM(CASE WHEN g = 1 AND e = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d1,
               CAST(SUM(CASE WHEN g = 0 AND e = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d0
        FROM lr_b GROUP BY 1),
    lr_r AS (
        SELECT t, d1, d0,
               SUM(ent1) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS n1t,
               SUM(ent0) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS n0t
        FROM lr_c),
    lr_t AS (
        SELECT d1, d0,
               CAST(round(CAST(d1 + d0 AS DOUBLE) * CAST(n1t AS DOUBLE)
                          / CAST(n1t + n0t AS DOUBLE), 9)
                    AS DECIMAL(38,9)) AS e1,
               CAST(round(CASE WHEN n1t + n0t > 1 THEN
                          CAST(d1 + d0 AS DOUBLE) * CAST(n1t AS DOUBLE)
                          * CAST(n0t AS DOUBLE)
                          * CAST(n1t + n0t - d1 - d0 AS DOUBLE)
                          / (CAST(n1t + n0t AS DOUBLE)
                             * CAST(n1t + n0t AS DOUBLE)
                             * CAST(n1t + n0t - 1 AS DOUBLE))
                          ELSE 0.0 END, 9) AS DECIMAL(38,9)) AS v
        FROM lr_r WHERE d1 + d0 > 0),
    lr_a AS (
        SELECT CAST(SUM(d1) AS BIGINT) AS d1,
               CAST(SUM(d0) AS BIGINT) AS d2,
               SUM(e1) AS se1, SUM(v) AS sv
        FROM lr_t),
    lr_n AS (
        SELECT CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2
        FROM lr_b)
    SELECT n.n1, n.n2, a.d1, a.d2,
           round(CAST(a.d1 AS DOUBLE) - CAST(a.se1 AS DOUBLE), 6)
               AS o_minus_e,
           CASE WHEN a.sv > 0
                THEN round(pow(CAST(a.d1 AS DOUBLE)
                               - CAST(a.se1 AS DOUBLE), 2)
                           / CAST(a.sv AS DOUBLE), 6)
           END AS chi2
    FROM lr_n n CROSS JOIN lr_a a"""


# --------------------------------------------------------------------
# Quantile treatment effects via histogram quantiles
# --------------------------------------------------------------------

def quantile_effects(
    units: DataFrame,
    treat_col: str = "treated",
    outcome_col: str = "y",
    quantiles: tuple = (10, 25, 50, 75, 90),
) -> DataFrame:
    """Quantile treatment effects (Doksum 1974; the distributional
    refinement of a mean effect): QTE(q) = Q_treated(q) -
    Q_control(q) at the requested percentiles — a treatment can
    leave the mean still and move the tails, and only the QTE
    profile shows it.

    Quantiles are exact lower order statistics read off each arm's
    OUTCOME HISTOGRAM (value -> count, cumulative window over the
    distinct-value frame; rank = ceil(q/100 * n)) — deterministic,
    interpolation-free, and never a window over the unit axis.
    Returns (pct, q_treated, q_control, qte) per percentile.
    """
    base = units.select(
        F.col(treat_col).cast("int").alias("t"),
        F.col(outcome_col).cast("bigint").alias("y"),
    )
    hist = base.groupBy("t", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wc = Window.partitionBy("t").orderBy("y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "t",
        "y",
        F.sum("n").over(wc).alias("c"),
        F.sum("n").over(Window.partitionBy("t")).alias("nt"),
    )
    pcts = F.explode(
        F.array(*[F.lit(int(p)) for p in quantiles])
    ).alias("pct")
    ranked = cum.select("t", "y", "c", "nt").crossJoin(
        cum.sparkSession.range(1).select(pcts)
    )
    qs = (
        ranked.filter(
            F.col("c")
            >= F.ceil(
                F.col("pct").cast("double") / 100.0 * F.col("nt").cast("double")
            )
        )
        .groupBy("t", "pct")
        .agg(F.min("y").alias("q"))
    )
    wide = qs.groupBy("pct").agg(
        F.max(F.when(F.col("t") == 1, F.col("q"))).alias("q_treated"),
        F.max(F.when(F.col("t") == 0, F.col("q"))).alias("q_control"),
    )
    return wide.select(
        "pct",
        "q_treated",
        "q_control",
        (F.col("q_treated") - F.col("q_control")).alias("qte"),
    )


def quantile_effects_sql(
    units_sql: str,
    quantiles: tuple = (10, 25, 50, 75, 90),
) -> str:
    """DuckDB mirror of :func:`quantile_effects`. ``units_sql``
    yields (treated, y)."""
    plist = ", ".join(str(int(p)) for p in quantiles)
    return f"""
    WITH qe_b AS (
        SELECT CAST(treated AS INTEGER) AS t, CAST(y AS BIGINT) AS y
        FROM ({units_sql})),
    qe_h AS (
        SELECT t, y, CAST(COUNT(*) AS BIGINT) AS n
        FROM qe_b GROUP BY 1, 2),
    qe_c AS (
        SELECT t, y,
               SUM(n) OVER (PARTITION BY t ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               SUM(n) OVER (PARTITION BY t) AS nt
        FROM qe_h),
    qe_p AS (SELECT CAST(p.pct AS INTEGER) AS pct
             FROM unnest([{plist}]) AS p(pct)),
    qe_q AS (
        SELECT c.t, p.pct, MIN(c.y) AS q
        FROM qe_c c CROSS JOIN qe_p p
        WHERE c.c >= ceil(CAST(p.pct AS DOUBLE) / 100.0
                          * CAST(c.nt AS DOUBLE))
        GROUP BY 1, 2),
    qe_w AS (
        SELECT pct,
               MAX(CASE WHEN t = 1 THEN q END) AS q_treated,
               MAX(CASE WHEN t = 0 THEN q END) AS q_control
        FROM qe_q GROUP BY 1)
    SELECT pct, q_treated, q_control,
           q_treated - q_control AS qte
    FROM qe_w"""


# --------------------------------------------------------------------
# Mann-Kendall trend test (significance twin of Theil-Sen)
# --------------------------------------------------------------------

def mann_kendall(
    df: DataFrame,
    group_col: str,
    t_col: str,
    y_col: str,
) -> DataFrame:
    """Mann-Kendall trend test (Mann 1945 / Kendall; the standard
    non-parametric 'is there a monotone trend' companion to q240's
    Theil-Sen slope — the slope says HOW MUCH, this says WHETHER):
    S = sum over pairs of sign(y_j - y_i), with the tie-corrected
    variance ``var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18``
    and the continuity-corrected z.

    Runs on pre-aggregated per-(group, t) points (the q240 shape:
    pairs are points^2 per group, invariant to corpus rows). S and
    both variance terms are EXACT integers; the only floats are one
    sqrt and one divide, rounded 6. Returns (grp, n_points, s_stat,
    var_s, z).
    """
    pts = df.select(
        F.col(group_col).alias("grp"),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.grp").alias("grp"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("b.y") - F.col("a.y")).cast("double")
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nn = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ties = (
        pts.groupBy("grp", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tc"))
        .groupBy("grp")
        .agg(
            F.sum(
                F.expr("tc * (tc - 1) * (2 * tc + 5)")
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    j = s.join(nn, "grp").join(ties, "grp")
    var_s = F.expr(
        "CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0"
    )
    zc = F.when(F.col("s_stat") > 0, F.col("s_stat") - 1).when(
        F.col("s_stat") < 0, F.col("s_stat") + 1
    ).otherwise(F.lit(0))
    return j.select(
        "grp",
        F.col("n").alias("n_points"),
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.when(
            var_s > 0,
            F.round(zc.cast("double") / F.sqrt(var_s), 6),
        ).otherwise(F.lit(0.0)).alias("z"),
    )


def mann_kendall_sql(rows_sql: str, group: str, t: str, y: str) -> str:
    """DuckDB mirror of :func:`mann_kendall`."""
    return f"""
    WITH mk_p AS (
        SELECT {group} AS grp, CAST({t} AS BIGINT) AS t,
               CAST({y} AS BIGINT) AS y
        FROM ({rows_sql})),
    mk_s AS (
        SELECT a.grp,
               CAST(SUM(CAST(sign(CAST(b.y - a.y AS DOUBLE)) AS BIGINT))
                    AS BIGINT) AS s_stat
        FROM mk_p a JOIN mk_p b ON b.grp = a.grp AND a.t < b.t
        GROUP BY 1),
    mk_n AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM mk_p GROUP BY 1),
    mk_t AS (
        SELECT grp,
               CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
                   AS tie_term
        FROM (SELECT grp, y, CAST(COUNT(*) AS BIGINT) AS tc
              FROM mk_p GROUP BY 1, 2)
        GROUP BY 1),
    mk_j AS (
        SELECT s.grp, n.n, s.s_stat, t.tie_term,
               CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS DOUBLE)
               / 18.0 AS var_s
        FROM mk_s s JOIN mk_n n USING (grp) JOIN mk_t t USING (grp))
    SELECT grp, n AS n_points, s_stat,
           round(var_s, 6) AS var_s,
           CASE WHEN var_s > 0
                THEN round(CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                                     WHEN s_stat < 0 THEN s_stat + 1
                                     ELSE 0 END AS DOUBLE)
                           / sqrt(var_s), 6)
                ELSE 0.0 END AS z
    FROM mk_j"""
