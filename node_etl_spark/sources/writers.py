"""Sink operators (reference jobs/writers).

* WriterJSONS -> NdjsonSink   (job-writer-jsons.js:30-35)
* WriterJSON  -> JsonArraySink (job-writer-json.js:19-45 — a single
  JSON array document; inherently single-file, so it collects on the
  driver: correct for the reference's dimension-sized outputs, guarded
  by ``max_rows`` so it can never be misused on the data plane)
* net-new: ParquetSink / CsvSink / XmlSink — the scale sinks.
* WriterJSONTree -> TreeSink (job-writer-tree.js) lives in
  operators/tree.py (build_document / build_json_column).

HTTP/Mongo destinations (utils.js:38-57) are out of scope for the data
plane; the reference used them for dimension-sized payloads — the
JsonArraySink's bytes can be POSTed by the caller.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Mapping

from pyspark.sql import DataFrame

from ..operators.base import Sink

if TYPE_CHECKING:
    from ..context import Context


class _PathSink(Sink):
    def __init__(
        self,
        path: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        options: Mapping[str, str] | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.path = path
        self.mode = mode
        self.partition_by = partition_by or []
        self.options = dict(options or {})

    def _writer(self, df: DataFrame):
        w = df.write.mode(self.mode).options(**self.options)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w


class NdjsonSink(_PathSink):
    """One JSON object per line (reference WriterJSONS). Distributed —
    one file per partition, like every scale-path sink."""

    def write(self, df: DataFrame, ctx: "Context") -> None:
        self._writer(df).json(ctx.resolve_url(self.path))


class ParquetSink(_PathSink):
    def write(self, df: DataFrame, ctx: "Context") -> None:
        self._writer(df).parquet(ctx.resolve_url(self.path))


class CsvSink(_PathSink):
    def write(self, df: DataFrame, ctx: "Context") -> None:
        self._writer(df).option("header", "true").csv(ctx.resolve_url(self.path))


class XmlSink(_PathSink):
    def __init__(self, path: str, row_tag: str = "item", **kwargs) -> None:
        super().__init__(path, **kwargs)
        self.row_tag = row_tag

    def write(self, df: DataFrame, ctx: "Context") -> None:
        self._writer(df).format("xml").option("rowTag", self.row_tag).save(
            ctx.resolve_url(self.path)
        )


class JsonArraySink(Sink):
    """Single JSON-array document (reference WriterJSON,
    job-writer-json.js:33-41). Driver-side by construction; refuses
    more than ``max_rows`` rows — use NdjsonSink/ParquetSink for data.
    """

    def __init__(self, path: str, max_rows: int = 1_000_000, name: str | None = None) -> None:
        super().__init__(name)
        self.path = path
        self.max_rows = max_rows

    def write(self, df: DataFrame, ctx: "Context") -> None:
        capped = df.limit(self.max_rows + 1).collect()
        if len(capped) > self.max_rows:
            raise ValueError(
                f"JsonArraySink: >{self.max_rows} rows; use NdjsonSink/ParquetSink"
            )
        payload = [row.asDict(recursive=True) for row in capped]
        path = ctx.resolve_url(self.path)
        if path.startswith("file:"):
            path = path[len("file:") :]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, ensure_ascii=False, default=str)


class NoopSink(Sink):
    """Devnull terminal action (reference Nothing as a sink)."""

    def write(self, df: DataFrame, ctx: "Context") -> None:
        df.write.format("noop").mode("overwrite").save()
