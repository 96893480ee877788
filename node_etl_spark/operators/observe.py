"""Observability operators.

Reference: per-job ``spy`` tap streams (jobs/job.js:202-210, wiring
99-116) let callers watch rows mid-pipeline; ``getLinkedJobs``
(job-pipeline.js:108-151) exports the DAG as {nodes, links} for
visualization (the Sankey JSON in tests/jobs.js:467-469).

Spark-first forms:
* ``Spy`` — ``df.observe()`` named metrics: counts/sums computed
  inline during the action, no extra pass, surfaced via
  ``collect_metrics``. (A row-callback spy would force serializing
  rows through Python — the anti-pattern; metrics are the scalable
  tap.)
* ``Limit`` — bounded take-n: the reference approximated "take n" by
  spying and calling stop() mid-flight (tests/jobs.js:300-308);
  Spark's ``limit`` plans CollectLimit/LocalLimit and stops scanning
  early — same effect, planned not improvised.
* ``pipeline_dag`` — {nodes, links} export for a Pipeline.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Mapping

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from .base import Sink, Source, Transform

if TYPE_CHECKING:
    from ..context import Context
    from ..pipeline import Pipeline


class Spy(Transform):
    """Named inline metrics tap. Metrics become available on the
    attached ``Observation`` after the first action on the frame."""

    def __init__(
        self,
        metrics: Mapping[str, str | Column] | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.metrics = dict(metrics) if metrics else {"n_rows": F.count(F.lit(1))}
        self.observation: Observation | None = None

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        self.observation = Observation(self.name)
        cols = [
            (F.expr(m) if isinstance(m, str) else m).alias(n)
            for n, m in self.metrics.items()
        ]
        return df.observe(self.observation, *cols)

    def get(self) -> dict:
        if self.observation is None:
            raise RuntimeError("Spy not yet applied / no action run")
        return self.observation.get


class Limit(Transform):
    """Take-n (reference spy+stop() idiom, tests/jobs.js:300-308)."""

    def __init__(self, n: int, name: str | None = None) -> None:
        super().__init__(name)
        self.n = n

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        return df.limit(self.n)


def pipeline_dag(pipe: "Pipeline") -> dict:
    """Export a Pipeline as {nodes, links} (getLinkedJobs analogue,
    job-pipeline.js:108-151). Nested pipelines flatten into their
    chains; links carry unit weight like the reference's Sankey feed."""
    nodes: list[dict] = []
    links: list[dict] = []

    def add_chain(chain, parent_idx: int | None) -> int | None:
        prev = parent_idx
        for op in chain:
            from ..pipeline import Pipeline as P

            if isinstance(op, P):
                prev = add_chain(op.chain, prev)
                continue
            idx = len(nodes)
            nodes.append(
                {
                    "name": op.name,
                    "type": type(op).__name__,
                    "isReadable": getattr(op, "is_readable", True),
                    "isWriteable": getattr(op, "is_writeable", True),
                }
            )
            if prev is not None:
                links.append({"source": prev, "target": idx, "value": 1})
            prev = idx
        return prev

    add_chain(pipe.chain, None)
    return {"nodes": nodes, "links": links}
