"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference user-behavior event pipeline
(jmdatasci/user-behavior-spark-pipeline), re-expressed Spark-first.

Layout (semantic layers, per SURVEY.md §7 — NOT the reference's file layout):

- ``session``    — SparkSession factory tuned for local tests + 100 TB posture
- ``schemas``    — event schemas (old + new unified), Kafka-source test double
- ``sources``    — table loaders, Kafka readers (gated), synthetic event gen
- ``operators``  — ingest (cast/filter/parse/flatten), classify, joins,
                   windows, dedup, similarity, text, multimodal
- ``functions``  — column-level helpers (vector math, text metrics)
- ``plans``      — explain/plan-inspection helpers used by tests
- ``streaming``  — Structured Streaming jobs (file-source test double, sinks)
- ``analytics``  — the reference's Presto query surface as Spark SQL/DataFrame
"""

__version__ = "0.1.0"
