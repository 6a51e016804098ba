"""PySpark-native engine with the query & data-processing capabilities of
muhammadhani18/Change-Data-Capture-Service (reference: a Go CDC pipeline
Postgres → Kafka → Elasticsearch), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession builder tuned for the engine.
- ``catalog``    : table schemas + loaders (the engine's schema registry,
                   reference ``internal/wal/replicator.go:30,320-322``).
- ``registry``   : query registry -- every operator from SURVEY.md §2 is a
                   named (spark, sf_dir) -> DataFrame callable plus, where
                   SQL-expressible, a DuckDB oracle string.
- ``operators/`` : relational + CDC-derived + north-star operators.
- ``functions/`` : scalar function surface (string/date/math/array/json/...).
- ``streaming/`` : the CDC pipeline proper on Structured Streaming
                   (envelope, snapshot, change stream, routed sink, audit log)
                   and watermarked streaming analytics.
- ``sources/``   : batch/stream source helpers (parquet fixtures, change logs).
- ``plans/``     : plan inspection helpers (pushdown / broadcast assertions).
"""

__version__ = "0.1.0"
