"""Declarative Pipeline: compose Source -> Transforms -> Sink(s).

Reference: jobs/hi-order/job-pipeline.js — a ``chain`` of job ids
resolved from MongoDB, materialized to Node streams, piped head->tail,
driven by stream backpressure (33-186). Here the chain is a list of
Op objects (or names resolved from a ``Catalog``); lowering is simple
function composition over DataFrames and Catalyst plans the physical
execution. ``run()`` is the terminal action; ``explain()`` exposes the
optimized plan (the reference's getLinkedJobs DAG export analogue,
108-151).

Nested pipelines are ops themselves (a Pipeline is a valid chain
element, mirroring tests/jobs.js:457).
"""

from __future__ import annotations

import uuid
from typing import Any, Sequence

from pyspark import InheritableThread
from pyspark.sql import DataFrame, SparkSession

from .context import Context
from .operators.base import Op, Sink, Source, Transform


class Catalog:
    """Named-job registry (the reference's MongoDB job store,
    jobs/hi-order/job-pipeline.js:153-165 ``ensureDepts``).

    A plain in-memory dict here; persistence would be a JSON/YAML file
    or a table — deliberately not a database dependency.
    """

    def __init__(self) -> None:
        self._jobs: dict[str, Op] = {}

    def save(self, op: Op) -> Op:
        self._jobs[op.name] = op
        return op

    def get(self, name: str) -> Op:
        if name not in self._jobs:
            raise KeyError(f"unresolved job reference: {name!r}")  # hard error, as in reference
        return self._jobs[name]

    def remove(self, name: str) -> None:
        self._jobs.pop(name, None)


class Pipeline(Op):
    """A chain of ops. Source must be first; Sinks may appear only at
    the tail (fan-out via Splitter). A Pipeline whose head is not a
    Source is itself a Transform (composable mid-chain)."""

    def __init__(
        self,
        chain: Sequence[Op | str],
        catalog: Catalog | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.catalog = catalog
        self.chain = [self._resolve(c) for c in chain]

    def _resolve(self, item: Op | str) -> Op:
        if isinstance(item, str):
            if self.catalog is None:
                raise KeyError(f"string chain element {item!r} but no catalog")
            return self.catalog.get(item)
        return item

    # -- lowering -----------------------------------------------------
    def to_frame(
        self,
        spark: SparkSession,
        ctx: Context | None = None,
        head: DataFrame | None = None,
    ) -> DataFrame:
        """Lower the chain to a DataFrame (no action executed)."""
        ctx = ctx or Context()
        df = head
        for op in self.chain:
            if isinstance(op, Source):
                if df is not None:
                    raise ValueError(f"Source {op.name!r} not at head of chain")
                df = op.load(spark, ctx)
            elif isinstance(op, Pipeline):
                df = op.to_frame(spark, ctx, head=df)
            elif isinstance(op, Transform):
                if df is None:
                    raise ValueError(f"Transform {op.name!r} at head without input")
                df = op.apply(df, ctx)
            elif isinstance(op, Sink):
                raise ValueError(
                    f"Sink {op.name!r} mid-chain; sinks only via run()/tail"
                )
        if df is None:
            raise ValueError("empty pipeline")
        return df

    # Pipelines compose as transforms (nested pipeline support)
    def apply(self, df: DataFrame, ctx: Context) -> DataFrame:
        return self.to_frame(df.sparkSession, ctx, head=df)

    def run(
        self,
        spark: SparkSession,
        args: dict[str, Any] | None = None,
        config: dict[str, str] | None = None,
    ) -> DataFrame | None:
        """Execute. If the chain ends in Sink(s), write and return None;
        otherwise return the lowered DataFrame (caller owns the action),
        matching the reference's readable-tail pipelines."""
        ctx = Context(args=args, config=config)
        tail_sinks: list[Sink] = []
        body = list(self.chain)
        while body and isinstance(body[-1], Sink):
            tail_sinks.insert(0, body.pop())
        df = Pipeline(body, name=self.name).to_frame(spark, ctx) if body else None
        if not tail_sinks:
            return df
        assert df is not None
        for sink in tail_sinks:
            sink.write(df, ctx)
        return None

    def run_async(
        self,
        spark: SparkSession,
        args: dict[str, Any] | None = None,
        config: dict[str, str] | None = None,
    ) -> "RunHandle":
        """Start the pipeline under a cancellable job group and return
        a handle (the reference's mid-flight ``stop()``,
        job-pipeline.js:23-32 — observed from a spy in
        tests/jobs.js:302-307).

        A readable-tail chain is drained with a count (the reference's
        ``run`` likewise attaches listeners and drains); sink-tailed
        chains write as in :meth:`run`. Cancellation kills the job
        group on the JVM side — every running stage's tasks are
        interrupted, mid-flight shuffle/output files are cleaned up by
        Spark's task abort path.
        """
        return RunHandle(self, spark, args, config)

    def explain(self, spark: SparkSession, mode: str = "formatted") -> None:
        self.to_frame(spark).explain(mode)


class RunHandle:
    """A cancellable in-flight pipeline run (job-group scoped)."""

    def __init__(
        self,
        pipeline: Pipeline,
        spark: SparkSession,
        args: dict[str, Any] | None,
        config: dict[str, str] | None,
    ) -> None:
        self._spark = spark
        self.group = f"pipeline-{pipeline.name}-{uuid.uuid4().hex[:8]}"
        self.rows: int | None = None
        self.error: BaseException | None = None
        self.stopped = False

        def work() -> None:
            sc = spark.sparkContext
            # pinned-thread mode scopes the group to this thread
            sc.setJobGroup(self.group, f"pipeline {pipeline.name}", interruptOnCancel=True)
            try:
                df = pipeline.run(spark, args, config)
                if df is not None:
                    self.rows = df.count()
            except BaseException as exc:  # noqa: BLE001 — surfaced via .error
                self.error = exc

        self._thread = InheritableThread(target=work, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        """Cancel every job in the run's group (mid-flight unpipe)."""
        self.stopped = True
        self._spark.sparkContext.cancelJobGroup(self.group)

    def wait(self, timeout: float | None = None) -> bool:
        self._thread.join(timeout)
        return not self._thread.is_alive()

    @property
    def running(self) -> bool:
        return self._thread.is_alive()
