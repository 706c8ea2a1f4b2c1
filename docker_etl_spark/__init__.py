"""docker_etl_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities embodied by the mozilla/docker-etl job fleet (reference
surveyed in SURVEY.md), expressed Spark-first: DataFrame/SQL logical
plans optimized by Catalyst, built-in functions over UDFs, Structured
Streaming for streams, and Pandas UDFs only where built-ins cannot
express the semantics.

Layout
------
- ``session``    SparkSession factory with scale-oriented defaults.
- ``sources``    IO layer: parquet/csv/json readers & writers, write
                 modes (append / overwrite / partition replace /
                 dry-run), driver-side source adapters.
- ``functions``  Scalar Column-function library (string/URL/date/JSON/
                 histogram families — SURVEY.md §2.8/§2.9).
- ``operators``  Named relational operators from the SURVEY.md §2
                 inventory (dedup, conditional aggregation, range
                 joins, lag features, funnels, …) plus the LLM-data
                 operators (text dedup, similarity search, text
                 analysis).
- ``plans``      Catalog/templating (ref() view DAG), incremental
                 watermark orchestration.
- ``streaming``  Structured Streaming sources/sinks and stateful
                 semantics (tumbling windows, dedup, dead-letter).
"""

__version__ = "0.1.0"
