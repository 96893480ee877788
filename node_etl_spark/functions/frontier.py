"""Pareto frontier (skyline) queries.

The skyline of a table under a set of maximize/minimize criteria is
the set of rows not *dominated* by any other row (dominated = at
least as good on every criterion, strictly better on one). Classic
multi-criteria optimization surface (Börzsönyi et al., ICDE'01 "The
Skyline Operator"); the reference engine has no such operator —
net-new analytics capability.

Scale design (the 100 TB story): skyline is distributive —
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` because
dominance is transitive, so a globally dominated row is also
dominated by some row that survives its own partition's local
skyline. Phase 1 computes local skylines per input partition in one
Arrow-batched pass (streaming: the kept set carries across batches,
memory bounded by the local skyline size, which is O(log^d n) in
expectation for random data — tiny). Phase 2 shuffles ONLY the local
skylines to a single task and reduces them once more. The heavy scan
never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline(
    df: DataFrame,
    maximize: tuple[str, ...] = (),
    minimize: tuple[str, ...] = (),
) -> DataFrame:
    """Rows of ``df`` not Pareto-dominated under the given criteria.

    Exact duplicates on every criterion do not dominate each other
    (no strict improvement), so tied frontier rows are all kept —
    mirroring the SQL ``NOT EXISTS`` dominance test exactly
    (:func:`skyline_oracle_sql`). Rows with NULL — or, for floating
    criteria, NaN — in any criterion are excluded: dominance is
    undefined on missing values, and NaN comparison semantics differ
    between numpy (never comparable) and SQL engines (DuckDB orders
    NaN above every value), so admitting NaN rows would diverge from
    the oracle. All non-criterion columns pass through untouched.

    Criteria are compared as float64; integer criteria beyond 2^53
    would compare with rounding — keep criterion magnitudes inside
    the float64-exact integer range.
    """
    import numpy as np
    import pandas as pd

    dims = list(maximize) + list(minimize)
    if not dims:
        raise ValueError("skyline needs at least one criterion")
    signs = np.array([1.0] * len(maximize) + [-1.0] * len(minimize))
    from pyspark.sql.types import DoubleType, FloatType

    cond = None
    for d in dims:
        c = F.col(d).isNotNull()
        if isinstance(df.schema[d].dataType, (DoubleType, FloatType)):
            c = c & ~F.isnan(F.col(d))
        cond = c if cond is None else (cond & c)
    df = df.filter(cond)
    schema = df.schema

    def reduce(frame, m):
        # sweep in lexicographic descending order: a later row can
        # never dominate an earlier KEPT one (it is <= on the first
        # differing criterion; domination would force equality on
        # every criterion, which is not strict), so the kept set only
        # grows during the sweep — no removals, O(n * |skyline|)
        order = np.lexsort(
            tuple(-m[:, j] for j in reversed(range(m.shape[1])))
        )
        # preallocated kept buffer: appending via vstack would copy
        # the whole matrix per kept row — O(|skyline|^2) exactly when
        # frontiers are large (anti-correlated criteria)
        km = np.empty_like(m)
        cnt = 0
        keep_idx = []
        for i in order:
            v = m[i]
            if cnt:
                ge = (km[:cnt] >= v).all(axis=1)
                gt = (km[:cnt] > v).any(axis=1)
                if bool((ge & gt).any()):
                    continue
            keep_idx.append(i)
            km[cnt] = v
            cnt += 1
        keep_idx = sorted(keep_idx)  # restore input order for stability
        return frame.iloc[keep_idx].reset_index(drop=True), m[keep_idx]

    def local(batches):
        kept = None  # pandas frame of current survivors
        kept_m = None  # their criterion matrix, sign-normalized
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = pdf[dims].to_numpy(dtype="float64") * signs
            if kept is None:
                kept, kept_m = reduce(pdf, m)
            else:
                # re-reduce survivors together with the new batch: a
                # new row may dominate an earlier batch's survivor,
                # so the kept set must stay a true skyline of
                # everything seen (it is small — this is cheap)
                kept, kept_m = reduce(
                    pd.concat([kept, pdf], ignore_index=True),
                    np.vstack([kept_m, m]),
                )
        if kept is not None:
            yield kept

    sky_local = df.mapInPandas(local, schema)
    # repartition (not coalesce — coalesce would collapse phase 1's
    # parallelism too): only the tiny local skylines cross the wire
    return sky_local.repartition(1).mapInPandas(local, schema)


def skyline_oracle_sql(
    relation_sql: str,
    maximize: tuple[str, ...] = (),
    minimize: tuple[str, ...] = (),
    float_criteria: tuple[str, ...] = (),
) -> str:
    """DuckDB mirror of :func:`skyline`: the quadratic NOT EXISTS
    dominance test (fine at oracle scale). List floating-point
    criteria in ``float_criteria`` so their NaN rows are excluded
    like the engine's filter does."""
    dims = list(maximize) + list(minimize)
    notnull = " AND ".join(
        f"{d} IS NOT NULL"
        + (f" AND NOT isnan({d})" if d in float_criteria else "")
        for d in dims
    )
    weak = " AND ".join(
        [f"b.{d} >= a.{d}" for d in maximize]
        + [f"b.{d} <= a.{d}" for d in minimize]
    )
    strict = " OR ".join(
        [f"b.{d} > a.{d}" for d in maximize]
        + [f"b.{d} < a.{d}" for d in minimize]
    )
    return f"""
    WITH c AS (SELECT * FROM ({relation_sql}) WHERE {notnull})
    SELECT * FROM c a
    WHERE NOT EXISTS (
        SELECT 1 FROM c b WHERE {weak} AND ({strict}))
    """
