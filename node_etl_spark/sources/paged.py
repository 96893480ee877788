"""Paged REST ingestion (reference ReaderPaged,
jobs/readers/job-reader-paged.js:80-217).

The reference drives repeated HTTP GETs from a URL template with
``{%offset%}``/``{%limit%}`` placeholders, tracking
``{page, rows, totalRows, ...}`` state, stopping on an empty page or
when ``totalRows`` is reached, with one retry after a 1 s backoff
(157-170).

Spark-first disposition (SURVEY §2.1): REST pagination is inherently
sequential/stateful, so it stays a **driver-side ingestion loop** that
lands pages into a DataFrame (then parquet) — ingestion is not a
distributed-plane operator. The state dict mirrors ``context.state``
(job-reader-paged.js:92). ``fetch`` is injectable for tests (no
network in CI); the default uses urllib.
"""

from __future__ import annotations

import json
import time
from typing import TYPE_CHECKING, Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..context import Context, get_path, render_template
from ..operators.base import Source

if TYPE_CHECKING:
    pass


def _default_fetch(url: str, req_options: dict | None = None) -> bytes:
    import urllib.request

    req = urllib.request.Request(url, headers=(req_options or {}).get("headers", {}))
    with urllib.request.urlopen(req, timeout=30) as resp:  # nosec - caller-supplied URL
        return resp.read()


def default_url_gen(template: str, state: dict[str, Any]) -> str:
    """Default offset/limit URL generator (job-reader-paged.js:25-37):
    page size 100, offset = page*100."""
    limit = state.setdefault("limit", 100)
    offset = state["page"] * limit
    return render_template(template, {**state, "offset": offset, "limit": limit})


class PagedRestSource(Source):
    """Iterate pages until empty page / total_rows reached; return one
    DataFrame over all fetched rows.

    ``rows_path`` extracts the row array from each page document
    (reference chains a parser job; ``"data"`` ≈ rootNode ``data.*``).
    ``total_path`` reads the server-reported total if present.
    """

    def __init__(
        self,
        url_template: str,
        rows_path: str | None = None,
        total_path: str | None = None,
        url_gen: Callable[[str, dict], str] = default_url_gen,
        fetch: Callable[[str, dict | None], bytes] = _default_fetch,
        req_options: dict | None = None,
        max_pages: int = 100_000,
        retry_wait_s: float = 1.0,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.url_template = url_template
        self.rows_path = rows_path
        self.total_path = total_path
        self.url_gen = url_gen
        self.fetch = fetch
        self.req_options = req_options
        self.max_pages = max_pages
        self.retry_wait_s = retry_wait_s

    def _pages(self, ctx: Context) -> Iterator[list[dict]]:
        state = ctx.state.setdefault(
            self.name,
            {"page": 0, "rows": 0, "total_rows_processed": 0, "total_rows": None},
        )
        retried = False
        while state["page"] < self.max_pages:
            url = self.url_gen(ctx.expand_var(self.url_template), state)
            state["url"] = url
            doc = json.loads(self.fetch(url, self.req_options))
            rows = get_path(doc, self.rows_path) if self.rows_path else doc
            rows = rows or []
            if self.total_path and state["total_rows"] is None:
                state["total_rows"] = get_path(doc, self.total_path)
            if not rows:
                # reference: one retry after a short wait, then stop (157-170)
                if retried:
                    return
                retried = True
                time.sleep(self.retry_wait_s)
                continue
            retried = False
            state["rows"] = len(rows)
            state["total_rows_processed"] += len(rows)
            state["page"] += 1
            yield rows
            if (
                state["total_rows"] is not None
                and state["total_rows_processed"] >= state["total_rows"]
            ):
                return

    def load(self, spark: SparkSession, ctx: Context) -> DataFrame:
        all_rows: list[dict] = []
        for page in self._pages(ctx):
            all_rows.extend(page)
        if not all_rows:
            raise ValueError(f"PagedRestSource {self.name!r}: no rows fetched")
        # json round-trip via the JSON datasource gives consistent
        # schema inference with file-based JSON reads
        rdd = spark.sparkContext.parallelize([json.dumps(r) for r in all_rows])
        return spark.read.json(rdd)
