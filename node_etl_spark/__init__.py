"""node_etl_spark — a PySpark-native analytics/ETL engine.

A ground-up reimplementation of the query and data-processing
capabilities of adn-tm/node-etl ("Piped ETL streams") on Apache Spark.
The reference is a single-threaded Node.js object-stream pipeline
engine (see SURVEY.md); this package re-expresses every operator as
declarative DataFrame transformations so Catalyst/Tungsten provide the
optimization, partitioning, and scale the reference lacks.

Layout:
    session.py    SparkSession factory tuned for local[32] testing and
                  cluster-scale defaults (AQE, Arrow, shuffle sizing).
    context.py    Run-parameter context: $VAR config resolution and
                  {%path%} templating (reference utils.js:22-28,145-172).
    pipeline.py   Declarative pipeline spec -> chained DataFrame ops
                  (reference jobs/hi-order/job-pipeline.js).
    operators/    Row/relational operators (reference jobs/convertors,
                  jobs/hi-order).
    sources/      Readers/parsers/writers (reference jobs/readers,
                  jobs/parsers, jobs/writers).
    functions/    Scalar helpers + training-data-pipeline ops (dedup,
                  similarity, text analysis, multimodal).
    plans/        The query catalog driving correctness + bench.
    streaming/    Structured Streaming variants.
"""

__version__ = "0.1.0"
