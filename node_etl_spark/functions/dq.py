"""Declarative data-quality checks (Deequ-style assertion suite).

The reference has no validation layer — its error policy is implicit
(skip bad NDJSON lines with a warning, `jobs/readers/job-reader-jsons.js:41-44`;
pass rows through unchanged when a join processor throws,
`jobs/hi-order/job-joiner.js:94-97`). At 100 TB that policy silently
corrupts downstream aggregates, so validation becomes a first-class
pre-flight query instead:

* every **row-level** check compiles to a conditional aggregate, so an
  arbitrary number of them run in ONE scan (map-side combinable,
  ``|checks|`` output rows, no shuffle of data rows);
* **uniqueness** adds one count-by-key shuffle (partial aggs combine
  map-side, only keys with duplicates survive the filter);
* **referential** checks are left-anti joins against the dimension's
  distinct keys — broadcast when the dimension is dimension-sized.

Output is one long-format DataFrame ``(check, n_violations, n_rows,
passed)`` — the shape a scheduler gates on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A row-level check is (name, violation_condition). The condition
# marks BAD rows; NULL handling is explicit per builder so not_null
# and domain checks compose without double-counting.


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violated when a non-null value falls outside [lo, hi]."""
    return (
        f"in_range({col})",
        F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def accepted_values(col: str, vals) -> tuple[str, Column]:
    return (
        f"accepted_values({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(list(vals)),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    """Violated when a non-null value does not fully match ``pattern``."""
    return (
        f"matches({col})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def row_checks(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """All row-level checks in one conditional-aggregate pass.

    Returns ``(check, n_violations)`` — one row per check, one scan
    total regardless of how many checks run.
    """
    aggs = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias(name)
        for name, cond in checks
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', `{name}`" for name, _ in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stack}) AS (check, n_violations)"
    )


def uniqueness_check(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows participating in any duplicate key group (0 = unique)."""
    name = f"unique({','.join(cols)})"
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter("c > 1")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_violations"))
        .select(F.lit(name).alias("check"), "n_violations")
    )


def referential_check(
    df: DataFrame, col: str, dim: DataFrame, key: str, broadcast_dim: bool = True
) -> DataFrame:
    """Non-null foreign keys with no match in ``dim.key`` (orphans)."""
    name = f"referential({col})"
    keys = dim.select(F.col(key).alias(col)).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    return (
        df.filter(F.col(col).isNotNull())
        .join(keys, on=col, how="left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        .select(F.lit(name).alias("check"), "n_violations")
    )


def dq_suite(
    df: DataFrame,
    checks: list[tuple[str, Column]] = (),
    unique: list[list[str]] = (),
    references: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Run a full suite; returns ``(check, n_violations, n_rows, passed)``.

    ``n_rows`` is computed once (single-row aggregate) and joined onto
    every result row by broadcast — never a per-check rescan.
    """
    parts: list[DataFrame] = []
    if checks:
        parts.append(row_checks(df, list(checks)))
    for cols in unique:
        parts.append(uniqueness_check(df, list(cols)))
    for col, dim, key in references:
        parts.append(referential_check(df, col, dim, key))
    if not parts:
        raise ValueError("dq_suite: no checks given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    return out.join(F.broadcast(total)).select(
        "check",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )


# ------------------------------------------------ Benford's-law profile

import math  # noqa: E402  (stdlib; used for the Benford constants)

_BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_profile(
    df: DataFrame, amount_col: str, scale: int = 100
) -> DataFrame:
    """First-significant-digit distribution of a positive amount
    column vs Benford's law — the classic fabricated-data /
    broken-feed detector for financial facts.

    Digit extraction is integer-exact and engine-portable: amounts
    become ``round(x * scale)`` BIGINTs (the repo's cents idiom) and
    the leading digit comes from the integer's decimal string —
    never from ``log10`` floor tricks, whose last-ulp libm
    differences could flip a digit at power-of-ten boundaries.
    Expected probabilities are injected as Python double literals
    into BOTH engines (no runtime ``log10`` at all), so observed,
    expected, and the per-digit chi-square contribution are
    bit-identical (:func:`benford_oracle_sql`). One count aggregate
    over the scan; nine output rows.
    """
    d1 = F.substring(
        F.expr(f"CAST(CAST(round({amount_col} * {scale}) AS BIGINT) AS STRING)"),
        1,
        1,
    ).cast("int")
    obs = (
        # filter on the SCALED integer, not the raw amount: a value in
        # (0, 0.5/scale) passes `amount > 0` but rounds to 0 cents —
        # leading digit '0' — and would inflate n while matching no
        # digit row, turning every chi2_term into a spurious alarm
        df.filter(F.expr(f"CAST(round({amount_col} * {scale}) AS BIGINT) >= 1"))
        .select(d1.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_P.items()], "digit int, expected_p double"
    )
    n = obs.agg(F.sum("observed").cast("bigint").alias("n"))
    return (
        expected.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).cast("bigint").alias("observed"),
            "expected_p",
            F.expr(
                "pow(CAST(coalesce(observed, 0) AS DOUBLE)"
                " - CAST(n AS DOUBLE) * expected_p, 2)"
                " / (CAST(n AS DOUBLE) * expected_p)"
            ).alias("chi2_term"),
        )
    )


def benford_oracle_sql(
    table: str, amount_col: str, scale: int = 100
) -> str:
    """DuckDB mirror of :func:`benford_profile` (same literal
    expected probabilities, same integer digit extraction)."""
    vals = ", ".join(f"({d}, CAST({p!r} AS DOUBLE))" for d, p in _BENFORD_P.items())
    return f"""
    WITH obs AS (
        SELECT CAST(substr(CAST(CAST(round({amount_col} * {scale}) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INTEGER) AS digit,
               CAST(COUNT(*) AS BIGINT) AS observed
        FROM {table}
        WHERE CAST(round({amount_col} * {scale}) AS BIGINT) >= 1 GROUP BY 1),
    expected(digit, expected_p) AS (VALUES {vals}),
    n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM obs)
    SELECT e.digit,
           CAST(COALESCE(o.observed, 0) AS BIGINT) AS observed,
           e.expected_p,
           pow(CAST(COALESCE(o.observed, 0) AS DOUBLE)
               - CAST(n.n AS DOUBLE) * e.expected_p, 2)
               / (CAST(n.n AS DOUBLE) * e.expected_p) AS chi2_term
    FROM expected e LEFT JOIN obs o USING (digit), n
    """


# ------------------------------------------------ CUSUM change detection


def cusum_shift(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    threshold: int,
    ref_col: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM level-shift detection over per-group ordered
    BIGINT series (Page 1954) — the metric-drift alarm for pipeline
    observability (daily volumes, feed latencies, revenue).

    Uses the prefix identity instead of the textbook recursion:
    ``s+_t = P_t - min(0, min_{j<=t} P_j)`` and
    ``s-_t = max(0, max_{j<=t} P_j) - P_t`` where ``P`` is the
    running sum of ``value - ref`` — so the whole detector is two
    window passes over ONE shuffle (the group partition), no
    iterative state, and all-integer arithmetic keeps both engines
    bit-identical. ``ref`` defaults to each group's integer-mean
    (``total DIV n``), joined back from a pre-aggregate. Emits the
    full trace: (group, order, value, s_pos, s_neg, alarm).
    """
    gcols = [F.col(c) for c in group_cols]
    if ref_col is None:
        means = df.groupBy(*gcols).agg(
            F.expr(f"CAST(SUM({value_col}) AS BIGINT) DIV COUNT(*)").alias(
                "__ref"
            )
        )
        df = df.join(means, group_cols)
        ref = F.col("__ref")
    else:
        ref = F.col(ref_col)
    w = (
        Window.partitionBy(*gcols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col(value_col) - ref).over(w)
    out = (
        df.withColumn("__p", p)
        .withColumn("__pmin", F.min("__p").over(w))
        .withColumn("__pmax", F.max("__p").over(w))
        .select(
            *group_cols,
            order_col,
            F.col(value_col).cast("bigint").alias("value"),
            (F.col("__p") - F.least(F.lit(0).cast("bigint"), F.col("__pmin")))
            .cast("bigint")
            .alias("s_pos"),
            (
                F.greatest(F.lit(0).cast("bigint"), F.col("__pmax"))
                - F.col("__p")
            )
            .cast("bigint")
            .alias("s_neg"),
        )
        .withColumn(
            "alarm",
            (F.col("s_pos") > threshold) | (F.col("s_neg") > threshold),
        )
    )
    return out


def cusum_oracle_sql(
    points_sql: str,
    group_cols: list[str],
    order_col: str,
    threshold: int,
) -> str:
    """DuckDB mirror of :func:`cusum_shift` (group-mean reference).
    ``points_sql`` must yield the group columns, ``order_col``, and a
    BIGINT ``value``."""
    gc = ", ".join(group_cols)
    return f"""
    WITH pts AS ({points_sql}),
    refs AS (
        SELECT {gc}, CAST(SUM(value) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
               AS ref
        FROM pts GROUP BY {gc}),
    prefixed AS (
        SELECT p.*, SUM(p.value - r.ref) OVER w AS pp
        FROM pts p JOIN refs r USING ({gc})
        WINDOW w AS (PARTITION BY {gc} ORDER BY p.{order_col}
                     ROWS UNBOUNDED PRECEDING)),
    pre AS (
        SELECT *, MIN(pp) OVER w AS pmin, MAX(pp) OVER w AS pmax
        FROM prefixed
        WINDOW w AS (PARTITION BY {gc} ORDER BY {order_col}
                     ROWS UNBOUNDED PRECEDING))
    SELECT {gc}, {order_col}, CAST(value AS BIGINT) AS value,
           CAST(pp - least(0, pmin) AS BIGINT) AS s_pos,
           CAST(greatest(0, pmax) - pp AS BIGINT) AS s_neg,
           (pp - least(0, pmin) > {threshold}
            OR greatest(0, pmax) - pp > {threshold}) AS alarm
    FROM pre
    """


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two dataset snapshots — the lakehouse audit
    behind "what changed since yesterday's load": full outer join on
    the key, each row classified ``added`` / ``removed`` /
    ``changed`` / ``unchanged``, with the names of the differing
    columns (sorted, comma-joined) for changed rows.

    Comparison is null-safe per column (NULL -> NULL is unchanged,
    NULL -> value is a change). One shuffle on the key; at 100 TB
    pair with partition pruning (diff only the partitions a load
    touched) — the operator itself adds nothing beyond the join.
    Returns key columns + (status, changed_cols).
    """
    compare_cols = compare_cols or [
        c for c in old.columns if c in set(new.columns) and c not in keys
    ]
    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, [f"__k_{k}" for k in keys], "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in sorted(compare_cols)
            ]
        )
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[F.col(f"__k_{k}").alias(k) for k in keys],
        status.alias("status"),
        F.when(
            status == "changed", F.concat_ws(",", diffs)
        ).otherwise(F.lit("")).alias("changed_cols"),
    )
