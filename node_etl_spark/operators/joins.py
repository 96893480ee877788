"""Join operators (reference jobs/hi-order).

Joiner     — broadcast vocab enrichment join (job-joiner.js:35-102).
JoinDetail — master/detail correlated join    (job-join-detail.js:55-117).
Semi/Anti  — net-new relational joins the reference lacks (SURVEY §2.6)
             but any engine user expects; exposed for completeness.
AsofJoin   — temporal as-of (latest right row at-or-before each left
             row per key); union+window form, one shuffle, no range
             cross product.
RangeJoin  — point-in-interval join; bucketed form so big-big range
             joins shuffle on bucket id instead of exploding into a
             theta cross join.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
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


class AsofJoin(Transform):
    """Backward as-of join: enrich each left row with the latest right
    row whose ``right_ts <= left_ts``, per key (left outer).

    Net-new vs the reference (SURVEY §2.6 lists no as-of join). The
    naive form is a range theta-join (quadratic per key). This is the
    scalable union form: tag both sides, union, then one window pass
    per key ordered by (ts, side) with ``last(value, ignorenulls)`` —
    a single shuffle on the key, linear per partition, no cross
    product. Right rows sort before left rows at equal ts, so an
    exactly-simultaneous right row is visible (ASOF >= semantics).

    Duplicate right rows at the same (key, ts) are collapsed to the
    one with the highest ``right_id`` tiebreak column (required for
    determinism; DuckDB's ASOF would otherwise pick arbitrarily).
    """

    def __init__(
        self,
        right,
        on: str | Sequence[str],
        left_ts: str,
        right_ts: str,
        payload: Mapping[str, str],
        right_id: str | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.right = right
        self.on = [on] if isinstance(on, str) else list(on)
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.payload = dict(payload)  # out_name -> right column/expr
        self.right_id = right_id

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        right = self.right
        if isinstance(right, Source):
            right = right.load(df.sparkSession, ctx)
        if self.right_id is not None:
            w_dedup = Window.partitionBy(
                *self.on, self.right_ts
            ).orderBy(F.col(self.right_id).desc())
            right = (
                right.withColumn("__rn", F.row_number().over(w_dedup))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        rvals = F.struct(
            *[_to_col(src).alias(dst) for dst, src in self.payload.items()]
        )
        r = right.select(
            *[F.col(k) for k in self.on],
            F.col(self.right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            rvals.alias("__rvals"),
            F.lit(None).cast(
                df.select(F.struct(*df.columns).alias("s")).schema["s"].dataType.simpleString()
            ).alias("__lrow"),
        )
        l = df.select(
            *[F.col(k) for k in self.on],
            F.col(self.left_ts).alias("__ts"),
            F.lit(1).alias("__side"),
            F.lit(None).cast(r.schema["__rvals"].dataType.simpleString()).alias("__rvals"),
            F.struct(*df.columns).alias("__lrow"),
        )
        w = (
            Window.partitionBy(*self.on)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = (
            r.unionByName(l)
            .withColumn("__filled", F.last("__rvals", ignorenulls=True).over(w))
            .filter(F.col("__side") == 1)
        )
        return filled.select(
            *[F.col(f"__lrow.{c}").alias(c) for c in df.columns],
            *[F.col(f"__filled.{dst}").alias(dst) for dst in self.payload],
        )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side's key with
    a random-ish shard id and replicate the right side across all
    shards, so one hot key spreads over ``salt`` reducer partitions
    instead of melting a single task.

    AQE's skew-join split (enabled in session.py) handles most skew at
    runtime; explicit salting remains the tool when a single key's
    rows exceed what any one split can hold, or when the join sits
    under an operator AQE can't re-plan. The shard id is derived from
    a hash of the whole left row (deterministic, no RNG), so repeated
    runs produce identical partitioning.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = left.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt)),
    )
    rsalt = right.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return lsalt.join(rsalt, on=[*keys, "__salt"], how=how).drop("__salt")


class RangeJoin(Transform):
    """Point-in-interval join: keep (left, right) pairs where
    ``left.point ∈ [right.lo, right.hi)``, optionally also equi-keyed.

    Net-new vs the reference (SURVEY §2.6). Two physical strategies:

    * ``bucket_width`` set — the scale path: the right interval is
      exploded into covering buckets (``sequence(floor(lo/w),
      floor(hi/w))``), the left point hashes to exactly one bucket,
      and the join shuffles on (bucket, *keys) before the residual
      range filter. Big-big range joins stay a hash join; no
      broadcast-nested-loop cross product. Pick ``bucket_width`` near
      the typical interval width so each interval covers O(1) buckets.
    * ``bucket_width=None`` — broadcast theta join for dimension-sized
      right sides (Catalyst's BroadcastNestedLoop is fine there).

    A left point lands in exactly one bucket, so no post-join dedup is
    needed; half-open [lo, hi) keeps boundary points single-counted.
    """

    def __init__(
        self,
        right,
        point: str,
        lo: str = "lo",
        hi: str = "hi",
        on: Sequence[str] = (),
        bucket_width: float | None = None,
        how: str = "inner",
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.right = right
        self.point = point
        self.lo = lo
        self.hi = hi
        self.on = list(on)
        self.bucket_width = bucket_width
        self.how = how

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        right = self.right
        if isinstance(right, Source):
            right = right.load(df.sparkSession, ctx)
        point = F.col(self.point)
        in_range = (point >= F.col(self.lo)) & (point < F.col(self.hi))
        if self.bucket_width is None:
            cond = in_range
            for k in self.on:
                cond = cond & (df[k] == right[k])
            return df.join(F.broadcast(right), cond, self.how)
        w = float(self.bucket_width)
        r = right.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(self.lo) / w).cast("long"),
                    # hi is exclusive, but a point in [hi_bucket*w, hi)
                    # still lives in hi's bucket — keep it
                    F.floor(F.col(self.hi) / w).cast("long"),
                )
            ),
        )
        l = df.withColumn("__bucket", F.floor(point / w).cast("long"))
        joined = l.join(r, on=["__bucket", *self.on], how="inner").filter(in_range)
        return joined.drop("__bucket")
