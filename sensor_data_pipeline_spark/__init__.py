"""sensor_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the data-processing capabilities of the
reference sensor pipeline (``alex-lt-kong/sensor-data-pipeline``, see
SURVEY.md), re-expressed Spark-first:

- the reference's fixed-interval micro-batch loop
  (reference ``src/event_loops.c:33-52``) is Structured Streaming's
  micro-batch engine with ``Trigger.ProcessingTime``;
- its JSON wire records (``src/modules/dd/producer.c:136-141``) are
  ``to_json``/``from_json`` over explicit ``StructType`` schemas;
- its scalar transforms / sessionization / staleness watermark become
  composable ``DataFrame -> DataFrame`` operators built on Catalyst
  expressions (never row-at-a-time Python in the hot path);
- the north-star extensions (dedup, similarity search, multimodal
  columns, text analysis) are first-class operators designed to scale
  to 1000-executor clusters: broadcast-where-small, LSH-bucket joins
  instead of cross joins, map-side combine friendly aggregations.

Layout:
    session    SparkSession factory tuned for the engine
    schemas    explicit StructType registry (reference has compile-time schemas)
    sources/   table loaders, config (JSON-pointer, src/utils.c:12-44),
               partitioned/bucketed layout writers
    functions/ scalar/time/json/text/vector column function library
    operators/ joins (as-of/range/salted), sessionization, dedup,
               similarity (brute-force/LSH/IVF), staleness, topk,
               multimodal binary columns (stubbed codecs)
    plans/     the declared query registry (spark impl + DuckDB oracle SQL)
    streaming/ structured-streaming twins: pipelines, stateful ops, sinks
"""

__version__ = "0.1.0"

from sensor_data_pipeline_spark.session import get_spark  # noqa: F401
