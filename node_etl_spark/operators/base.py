"""Operator base classes.

The reference models every pipeline stage as a Job document compiled
to a Node object-mode stream (reference jobs/job.js:67-117). Here a
stage is a small declarative object that *lowers to DataFrame
transformations* — Catalyst then owns optimization (predicate
pushdown, column pruning, join planning) that the reference never had
(SURVEY.md §4.1).

Three roles, mirroring the reference's isReadable/isWriteable flags
(jobs/job.js:30-35):

* ``Source``   — produces a DataFrame (readable head).
* ``Transform``— DataFrame -> DataFrame (readable + writeable).
* ``Sink``     — consumes a DataFrame (writeable tail).

No user-code-as-string anywhere: "processors" are Spark SQL
expressions, Column objects, or explicit Python callables passed at
construction time (never eval'd from text).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from ..context import Context


class Op:
    """Common base. ``name`` mirrors the reference Job ``name`` field."""

    is_readable = True
    is_writeable = True

    def __init__(self, name: str | None = None) -> None:
        self.name = name or type(self).__name__

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{type(self).__name__} {self.name!r}>"


class Source(Op):
    """Head of a chain: produces a DataFrame."""

    is_writeable = False

    def load(self, spark: SparkSession, ctx: "Context") -> DataFrame:
        raise NotImplementedError


class Transform(Op):
    """Mid-chain: DataFrame -> DataFrame."""

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        raise NotImplementedError


class Sink(Op):
    """Tail: consumes the DataFrame (terminal action)."""

    is_readable = False

    def write(self, df: DataFrame, ctx: "Context") -> None:
        raise NotImplementedError


class FnTransform(Transform):
    """Adapter: wrap a plain ``df -> df`` callable as a Transform."""

    def __init__(self, fn, name: str | None = None) -> None:
        super().__init__(name or getattr(fn, "__name__", "fn"))
        self._fn = fn

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        return self._fn(df)
