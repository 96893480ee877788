"""Probabilistic record linkage (Fellegi & Sunter, JASA 1969).

Net-new vs the reference (adn-tm/node-etl's closest surface is the
key-equality `Joiner`, components/joiner.js — equality on a single
key, no scored linkage). Entity resolution is the ETL workhorse this
generalizes: score candidate pairs by per-field agreement weights
ln(m/u) (agree) / ln((1-m)/(1-u)) (disagree), where m is the
probability a TRUE match agrees on the field (a quality prior) and u
the probability a RANDOM pair agrees (estimated exactly from the
field's value distribution: u = sum_v count_v^2 / n^2). Pairs above
an upper threshold auto-link, a middle band goes to review — the
decision theory that distinguishes FS linkage from ad-hoc fuzzy
joins. Complements q125's edit-distance golden records: FS fuses
*multi-field* evidence with calibrated weights.

Scale design (100 TB): candidate pairs come from equality blocking
(one shuffle on the block key; the q201 salting pattern applies to a
hot block). u-probabilities are three tiny value-frequency
aggregates; the per-field ln terms are computed ONCE in that scalar
frame and broadcast, so scoring a pair is pure fixed-shape double
addition — no ln in the pair loop, no UDF anywhere.

Determinism: u ratios divide exact BIGINT counts; ln is evaluated
once per field on identical doubles (the BM25 precedent: DuckDB and
the JVM agree on these inputs); the pair weight is a fixed-order
3-term sum rounded to 6, same expression shape in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["FSField", "fs_link_pairs", "fs_link_oracle_sql"]


@dataclass(frozen=True)
class FSField:
    """One comparison field: Spark SQL expression string + its DuckDB
    mirror + the m-probability prior (P(agree | true match)). Strings,
    not Columns — fields are declared at registration time, before
    any SparkContext exists."""

    name: str
    spark_expr: str
    sql_expr: str
    m: float


def fs_link_pairs(
    df: DataFrame,
    fields: list[FSField],
    block_cols: tuple[str, ...],
    id_col: str,
    lower: float = 1.5,
    upper: float = 4.5,
) -> DataFrame:
    """Score within-block candidate pairs by the Fellegi-Sunter
    log-likelihood weight; emit pairs with weight >= ``lower``.

    Returns (id1, id2, weight, decision) with decision = 'match'
    (weight >= ``upper``) or 'possible' (review band). Sub-threshold
    pairs are dropped — at scale the non-match mass is ~all pairs and
    materializing it is pure waste.
    """
    vals = df.select(
        F.col(id_col).alias("rid"),
        *[F.expr(f.spark_expr).alias(f.name) for f in fields],
        *block_cols,
    )
    n = vals.count()
    # u_f = P(random pair agrees on f) = sum_v count_v^2 / n^2,
    # then the two ln terms per field — computed ONCE, broadcast
    uterms = None
    for f in fields:
        cnts = vals.groupBy(f.name).agg(F.count(F.lit(1)).alias("c"))
        u = cnts.agg(
            (
                F.sum(F.col("c") * F.col("c"))
                / F.lit(float(n) * float(n))
            ).alias("u")
        ).select(
            F.expr(f"ln({f.m} / u)").alias(f"wa_{f.name}"),
            F.expr(f"ln((1.0 - {f.m}) / (1.0 - u))").alias(f"wd_{f.name}"),
        )
        uterms = u if uterms is None else uterms.crossJoin(u)

    a = vals.alias("a")
    b = vals.alias("b")
    pair_cond = (F.col("a.rid") < F.col("b.rid"))
    for bc in block_cols:
        pair_cond = pair_cond & (F.col(f"a.{bc}") == F.col(f"b.{bc}"))
    weight = None
    for f in fields:
        term = F.when(
            F.col(f"a.{f.name}").eqNullSafe(F.col(f"b.{f.name}")),
            F.col(f"wa_{f.name}"),
        ).otherwise(F.col(f"wd_{f.name}"))
        weight = term if weight is None else weight + term
    return (
        a.join(b, pair_cond)
        .crossJoin(F.broadcast(uterms))
        .select(
            F.col("a.rid").alias("id1"),
            F.col("b.rid").alias("id2"),
            F.round(weight, 6).alias("weight"),
        )
        .filter(F.col("weight") >= lower)
        .withColumn(
            "decision",
            F.when(F.col("weight") >= upper, F.lit("match")).otherwise(
                F.lit("possible")
            ),
        )
    )


def fs_link_oracle_sql(
    table: str,
    fields: list[FSField],
    block_cols: tuple[str, ...],
    id_col: str,
    lower: float = 1.5,
    upper: float = 4.5,
) -> str:
    """DuckDB mirror of :func:`fs_link_pairs` — identical u counts,
    identical once-per-field ln terms, identical fixed-order sum."""
    field_sel = ", ".join(f"{f.sql_expr} AS {f.name}" for f in fields)
    blocks = ", ".join(block_cols)
    u_ctes = ",\n    ".join(
        f"""u_{f.name} AS (
        SELECT ln({f.m} / u) AS wa_{f.name},
               ln((1.0 - {f.m}) / (1.0 - u)) AS wd_{f.name}
        FROM (SELECT CAST(SUM(c * c) AS DOUBLE)
                     / ((SELECT COUNT(*) FROM vals)
                        * (SELECT COUNT(*) FROM vals)) AS u
              FROM (SELECT {f.name}, CAST(COUNT(*) AS BIGINT) AS c
                    FROM vals GROUP BY {f.name})))"""
        for f in fields
    )
    u_join = " CROSS JOIN ".join(f"u_{f.name}" for f in fields)
    block_on = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    weight = " + ".join(
        f"(CASE WHEN a.{f.name} IS NOT DISTINCT FROM b.{f.name} "
        f"THEN wa_{f.name} ELSE wd_{f.name} END)"
        for f in fields
    )
    return f"""
    WITH vals AS (
        SELECT {id_col} AS rid, {field_sel}, {blocks} FROM {table}),
    {u_ctes},
    scored AS (
        SELECT a.rid AS id1, b.rid AS id2,
               round({weight}, 6) AS weight
        FROM vals a JOIN vals b
          ON a.rid < b.rid AND {block_on}, {u_join})
    SELECT id1, id2, weight,
           CASE WHEN weight >= {upper} THEN 'match'
                ELSE 'possible' END AS decision
    FROM scored WHERE weight >= {lower}
    """
