"""Engine function library.

scalars/text: expression-level helpers (JVM-side, codegen-friendly).
dedup/similarity: training-data pipeline operators (exact + LSH paths).
multimodal: binary-column ingest + Arrow-batched decode plumbing.
graph/frontier/profile/dq/search/sampling: distributed analytics
(components, PageRank, LPA, SSSP, skyline, OLS trends, BM25, splits).
"""

from . import (  # noqa: F401
    dedup,
    dq,
    frontier,
    graph,
    multimodal,
    profile,
    sampling,
    scalars,
    search,
    similarity,
    sketch,
    text,
    web,
)
