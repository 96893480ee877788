"""Engine function library.

scalars/text: expression-level helpers (JVM-side, codegen-friendly).
dedup/similarity: training-data pipeline operators (exact + LSH paths).
multimodal: binary-column ingest + Arrow-batched decode plumbing.
"""

from . import dedup, graph, multimodal, sampling, scalars, similarity, text  # noqa: F401
