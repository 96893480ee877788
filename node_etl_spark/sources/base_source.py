"""Shared Source plumbing: path resolution + format dispatch."""

from __future__ import annotations

from typing import TYPE_CHECKING, Mapping

from pyspark.sql import DataFrame, SparkSession

from ..operators.base import Source

if TYPE_CHECKING:
    from ..context import Context


class PathSource(Source):
    """A Source reading from a (templated) path.

    The path runs through ``Context.resolve_url`` so ``$VAR`` roots and
    ``{%param%}`` placeholders resolve per run (reference
    utils.js:22-28,145-172; dynamic sources computed in ``initer``,
    examples/bor-dwc.js:110-114).
    """

    def __init__(
        self,
        path: str,
        options: Mapping[str, str] | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.path = path
        self.options = dict(options or {})

    def load(self, spark: SparkSession, ctx: "Context") -> DataFrame:
        return self._read(spark, ctx.resolve_url(self.path))

    def _read(self, spark: SparkSession, path: str) -> DataFrame:  # pragma: no cover
        raise NotImplementedError
