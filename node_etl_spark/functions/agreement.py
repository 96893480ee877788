"""Inter-rater agreement statistics for labeled / judged corpora.

Net-new vs the reference (adn-tm/node-etl has no statistics surface;
its closest relative is the user-coded `Reducer` fold,
components/reducer.js). In an LLM data pipeline these audit the label
streams everything downstream trusts: do two cheap quality
classifiers agree (route the disagreements to review)? do two judge
prompts agree on preference labels (q187/q191's input)? Chance-
corrected agreement (Cohen, Educational & Psychological Measurement
1960) is the standard answer — raw percent agreement rewards
imbalanced label marginals.

Scale design (100 TB): everything reduces through ONE map-side-
combinable contingency aggregate — (group, label_a, label_b) counts,
at most |A| x |B| rows per group. Marginals, observed and expected
agreement come from that tiny frame; no row-level data survives the
first shuffle. Determinism: all counts are exact BIGINTs; the final
ratios are single IEEE divisions of identical integers on both
engines, rounded to 6 places.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohen_kappa", "cohen_kappa_oracle_sql"]


def cohen_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Cohen's kappa between two label columns, optionally per group.

    kappa = (po - pe) / (1 - pe) with po = observed agreement rate
    and pe = chance agreement from the raters' marginal label
    distributions: sum over labels k of ma_k * mb_k / n^2 (a label
    only a single rater ever uses contributes nothing — the marginal
    join is inner). Items with a null label on either side are
    excluded (both raters must have voted). Returns one row per
    group: (group..., n_items, po, pe, kappa), ratios rounded to 6;
    kappa is 0.0 when pe = 1 (both raters constant — agreement
    carries no information, the conventional degenerate-case value).
    """
    g = list(group_cols)
    cont = (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(*g, F.col(a_col).alias("la"), F.col(b_col).alias("lb"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cont.groupBy(*g).agg(
        F.sum("c").alias("n_items"),
        F.sum(
            F.when(F.col("la") == F.col("lb"), F.col("c")).otherwise(F.lit(0))
        ).alias("agree"),
    )
    amarg = cont.groupBy(*g, F.col("la").alias("k")).agg(
        F.sum("c").alias("ma")
    )
    bmarg = cont.groupBy(*g, F.col("lb").alias("k")).agg(
        F.sum("c").alias("mb")
    )
    smm = (
        amarg.join(bmarg, [*g, "k"])
        .groupBy(*g)
        .agg(F.sum(F.col("ma") * F.col("mb")).alias("smm"))
    )
    # left join: a group whose raters share NO label still reports
    # (pe = 0 — chance agreement is impossible, kappa = po)
    stats = (
        tot.join(smm, g, "left") if g else tot.crossJoin(smm)
    ).withColumn("smm", F.coalesce(F.col("smm"), F.lit(0)))
    po = F.col("agree") / F.col("n_items")
    pe = F.col("smm") / (F.col("n_items") * F.col("n_items"))
    return stats.select(
        *g,
        F.col("n_items").cast("bigint").alias("n_items"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.when(
            pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6)
        ).otherwise(F.lit(0.0)).alias("kappa"),
    )


def cohen_kappa_oracle_sql(
    source_sql: str,
    a: str = "la",
    b: str = "lb",
    group_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB mirror of :func:`cohen_kappa` over ``source_sql`` (a
    SELECT producing the two label columns and any group columns) —
    identical integer contingency, identical single divisions."""
    g = ", ".join(group_cols)
    gp = f"{g}, " if g else ""
    on = f"USING ({gp}k)" if g else "USING (k)"
    join_grp = f"GROUP BY {g}" if g else ""
    stats_join = f"LEFT JOIN smm USING ({g})" if g else "CROSS JOIN smm"
    return f"""
    WITH src AS ({source_sql}),
    cont AS (
        SELECT {gp}{a} AS la, {b} AS lb, CAST(COUNT(*) AS BIGINT) AS c
        FROM src WHERE {a} IS NOT NULL AND {b} IS NOT NULL
        GROUP BY {gp}la, lb),
    tot AS (
        SELECT {gp}SUM(c) AS n_items,
               SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS agree
        FROM cont {("GROUP BY " + g) if g else ""}),
    am AS (SELECT {gp}la AS k, SUM(c) AS ma FROM cont GROUP BY {gp}la),
    bm AS (SELECT {gp}lb AS k, SUM(c) AS mb FROM cont GROUP BY {gp}lb),
    smm AS (
        SELECT {gp}SUM(ma * mb) AS smm
        FROM am JOIN bm {on} {join_grp})
    SELECT {gp}CAST(n_items AS BIGINT) AS n_items,
           round(CAST(agree AS DOUBLE) / n_items, 6) AS po,
           round(CAST(COALESCE(smm, 0) AS DOUBLE)
                 / (n_items * n_items), 6) AS pe,
           CASE WHEN CAST(COALESCE(smm, 0) AS DOUBLE)
                     / (n_items * n_items) < 1.0
                THEN round(
                    (CAST(agree AS DOUBLE) / n_items
                     - CAST(COALESCE(smm, 0) AS DOUBLE)
                       / (n_items * n_items))
                    / (1.0 - CAST(COALESCE(smm, 0) AS DOUBLE)
                             / (n_items * n_items)),
                    6)
                ELSE 0.0 END AS kappa
    FROM tot {stats_join}
    """
