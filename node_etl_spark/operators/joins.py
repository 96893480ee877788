"""Join operators (reference jobs/hi-order).

Joiner     — broadcast vocab enrichment join (job-joiner.js:35-102).
JoinDetail — master/detail correlated join    (job-join-detail.js:55-117).
Semi/Anti  — net-new relational joins the reference lacks (SURVEY §2.6)
             but any engine user expects; exposed for completeness.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .base import Source, Transform

if TYPE_CHECKING:
    from ..context import Context


def _to_col(c: str | Column) -> Column:
    return F.expr(c) if isinstance(c, str) else c


class Vocab:
    """One build-side lookup table for Joiner.

    Reference: the ``vocabs`` entries (job-joiner.js:17-24) — a job id
    drained into an in-memory dict keyed by ``idPath``. Here the vocab
    is a Source/DataFrame joined on an explicit key equality; ``select``
    names the enrichment columns pulled from the vocab (the reference's
    user fn copied fields by hand, e.g. tests/jobs.js:170-172).
    """

    def __init__(
        self,
        source,
        on: str | Column | Sequence[str],
        select: Mapping[str, str] | None = None,
        prefix: str = "",
    ) -> None:
        self.source = source
        self.on = on
        self.select = dict(select) if select else None
        self.prefix = prefix

    def frame(self, spark, ctx) -> DataFrame:
        src = self.source
        if isinstance(src, DataFrame):
            return src
        if isinstance(src, Source):
            return src.load(spark, ctx)
        raise TypeError(f"Vocab source must be DataFrame or Source, got {type(src)}")


class Joiner(Transform):
    """N-way broadcast left join against small vocab tables.

    Reference semantics (job-joiner.js:49-99): each vocab is fully
    materialized in memory before the probe stream runs; lookups are
    left-outer (probe rows always survive; enrichment null on miss —
    the reference passes the row through unchanged on processor error,
    94-97). The Spark form is exactly a broadcast hash join: the build
    side ships to every executor once, the probe side never shuffles.
    AQE falls back to shuffle join automatically if a "vocab" turns out
    huge — unlike the reference, which would OOM.
    """

    def __init__(self, vocabs: Sequence[Vocab], name: str | None = None) -> None:
        super().__init__(name)
        self.vocabs = list(vocabs)

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        out = df
        for i, v in enumerate(self.vocabs):
            vf = v.frame(df.sparkSession, ctx)
            if v.select is not None:
                on_cols = [v.on] if isinstance(v.on, str) else list(v.on)
                need = {c for c in on_cols if isinstance(c, str) and c in vf.columns}
                vf = vf.select(
                    *[F.col(c) for c in sorted(need)],
                    *[F.col(src).alias(dst) for dst, src in v.select.items()],
                )
            if v.prefix:
                keep = (
                    {v.on} if isinstance(v.on, str) else set()
                )
                vf = vf.select(
                    *[
                        F.col(c).alias(c if c in keep else f"{v.prefix}{c}")
                        for c in vf.columns
                    ]
                )
            on = v.on if not isinstance(v.on, str) else [v.on]
            out = out.join(F.broadcast(vf), on=on, how="left")
        return out


class JoinDetail(Transform):
    """Master/detail join: per-master aggregation or nested list.

    Reference (job-join-detail.js:55-117): for each master row it
    re-instantiates the detail stream (one HTTP/file scan *per row*),
    buffers all details, and emits ``processor(master, details)``.
    Decorrelated Spark form: aggregate the detail side once
    (``groupBy(key)`` with either explicit aggregates or
    ``collect_list(struct(...))`` for the faithful nested shape), then
    a single left equi-join — one shuffle, no per-row rescans.
    """

    def __init__(
        self,
        detail,
        on: str | Sequence[str],
        aggs: Mapping[str, str | Column] | None = None,
        nest_as: str | None = None,
        nest_cols: Sequence[str] | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        if aggs is None and nest_as is None:
            raise ValueError("JoinDetail needs aggs= and/or nest_as=")
        self.detail = detail
        self.on = [on] if isinstance(on, str) else list(on)
        self.aggs = dict(aggs) if aggs else {}
        self.nest_as = nest_as
        self.nest_cols = list(nest_cols) if nest_cols else None

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        detail = self.detail
        if isinstance(detail, Source):
            detail = detail.load(df.sparkSession, ctx)
        agg_cols = [_to_col(a).alias(n) for n, a in self.aggs.items()]
        if self.nest_as:
            cols = self.nest_cols or [c for c in detail.columns if c not in self.on]
            agg_cols.append(
                F.collect_list(F.struct(*[F.col(c) for c in cols])).alias(self.nest_as)
            )
        grouped = detail.groupBy(*[F.col(k) for k in self.on]).agg(*agg_cols)
        return df.join(grouped, on=self.on, how="left")


class SemiJoin(Transform):
    """Keep masters having >=1 matching detail row (left semi)."""

    def __init__(self, right, on: str | Sequence[str], name: str | None = None) -> None:
        super().__init__(name)
        self.right = right
        self.on = [on] if isinstance(on, str) else list(on)

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        right = self.right
        if isinstance(right, Source):
            right = right.load(df.sparkSession, ctx)
        return df.join(right, on=self.on, how="left_semi")


class AntiJoin(Transform):
    """Keep masters with no matching detail row (left anti)."""

    def __init__(self, right, on: str | Sequence[str], name: str | None = None) -> None:
        super().__init__(name)
        self.right = right
        self.on = [on] if isinstance(on, str) else list(on)

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        right = self.right
        if isinstance(right, Source):
            right = right.load(df.sparkSession, ctx)
        return df.join(right, on=self.on, how="left_anti")
