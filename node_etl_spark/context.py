"""Run-parameter context: config vars and path templating.

The reference resolves ``$VAR``-prefixed URLs from a config object
(reference utils.js:22-28,67-73) and substitutes ``{%path%}``
placeholders from a params object (reference utils.js:145-172). Here
the context is an explicit dict (no ``vm`` sandbox, no string-eval of
user code) shared by every op in a pipeline — the Spark-side analogue
of the reference's shared vm context (reference jobs/job.js:81-91).
"""

from __future__ import annotations

import os
import re
from typing import Any

_PLACEHOLDER = re.compile(r"\{%\s*([^%]+?)\s*%\}")


def get_path(obj: Any, dotted: str, default: Any = None) -> Any:
    """Dotted-path get over nested dicts/lists (reference object-path)."""
    cur = obj
    for part in str(dotted).split("."):
        if isinstance(cur, dict):
            if part not in cur:
                return default
            cur = cur[part]
        elif isinstance(cur, (list, tuple)):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return default
        else:
            return default
    return cur


def set_path(obj: dict, dotted: str, value: Any) -> dict:
    """Dotted-path set over nested dicts (creates intermediates)."""
    parts = str(dotted).split(".")
    cur = obj
    for part in parts[:-1]:
        nxt = cur.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[part] = nxt
        cur = nxt
    cur[parts[-1]] = value
    return obj


def render_template(template: str, params: dict[str, Any]) -> str:
    """Replace ``{%dotted.path%}`` placeholders (reference utils.js:145-172).

    Unknown placeholders render as the empty string, matching the
    reference's permissive replacement.
    """

    def _sub(m: re.Match) -> str:
        val = get_path(params, m.group(1))
        return "" if val is None else str(val)

    return _PLACEHOLDER.sub(_sub, template)


class Context:
    """Mutable run context shared across a pipeline's operators.

    ``config`` holds ``$VAR`` roots (reference config object); ``args``
    holds run parameters (reference run args merged with job args,
    jobs/job.js:75-77); ``state`` holds per-op mutable state such as
    pagination cursors (reference context.state, job-reader-paged.js:92).
    """

    def __init__(
        self,
        args: dict[str, Any] | None = None,
        config: dict[str, str] | None = None,
    ) -> None:
        self.args: dict[str, Any] = dict(args or {})
        self.config: dict[str, str] = dict(config or {})
        self.state: dict[str, Any] = {}

    def resolve_url(self, url: str) -> str:
        """Expand ``$VAR`` root and ``{%param%}`` placeholders."""
        return render_template(self.expand_var(url), {**self.config, **self.args})

    def expand_var(self, url: str) -> str:
        """Expand only a leading ``$VAR`` from config/env (utils.js:22-28),
        leaving ``{%...%}`` placeholders intact (used by paged readers
        whose URL generator substitutes them per page)."""
        if url.startswith("$"):
            m = re.match(r"^\$([A-Za-z_][A-Za-z0-9_]*)", url)
            if m:
                var = m.group(1)
                root = self.config.get(var, os.environ.get(var))
                if root is None:
                    raise KeyError(f"config variable ${var} is not defined")
                url = root + url[m.end() :]
        return url
