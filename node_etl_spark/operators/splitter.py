"""Splitter — fan-out / routed multi-sink writes.

Reference: jobs/hi-order/job-splitter.js:65-134. Without a processor it
broadcasts every row to every receiver (fork, 112-114); with one, a
router picks exactly one receiver per row (116-124, e.g. odd/even in
tests/jobs.js:237).

Spark form: persist the input once, then one write per receiver —
broadcast mode writes the same frame everywhere; routed mode writes
disjoint ``filter(route == i)`` slices. ``persist`` guarantees the
upstream plan runs once even with N sinks (the reference got this for
free from single-pass streaming; Spark needs explicit reuse).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .base import Sink, Transform

if TYPE_CHECKING:
    from ..context import Context


class Splitter(Sink):
    def __init__(
        self,
        receivers: Sequence[Sink | Callable[[DataFrame], None]],
        route: str | Column | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.receivers = list(receivers)
        self.route = route

    def _send(self, receiver, df: DataFrame, ctx: "Context") -> None:
        if isinstance(receiver, Sink):
            receiver.write(df, ctx)
        else:
            receiver(df)

    def write(self, df: DataFrame, ctx: "Context") -> None:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            df.count()  # materialize once before fan-out
            if self.route is None:
                for r in self.receivers:
                    self._send(r, df, ctx)
            else:
                route = F.expr(self.route) if isinstance(self.route, str) else self.route
                routed = df.withColumn("__route", route)
                for i, r in enumerate(self.receivers):
                    self._send(r, routed.filter(F.col("__route") == i).drop("__route"), ctx)
        finally:
            df.unpersist()


class RouteTag(Transform):
    """Non-terminal routing: tag each row with its receiver index.

    Lets routed-split semantics (row conservation, exactly-one-receiver)
    be verified relationally — used by the correctness queries.
    """

    def __init__(self, route: str | Column, as_col: str = "route", name: str | None = None) -> None:
        super().__init__(name)
        self.route = route
        self.as_col = as_col

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        route = F.expr(self.route) if isinstance(self.route, str) else self.route
        return df.withColumn(self.as_col, route)
