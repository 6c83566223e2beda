"""inspig_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ETL (``kilhyeon-kim/inspig-etl``), re-expressed
as declarative DataFrame pipelines so Catalyst/Tungsten/AQE pick the physical
strategy. See ``SURVEY.md`` for the operator inventory this package covers.

Layout
------
- ``session``    SparkSession factory (AQE on, KST-stable business clock helpers)
- ``catalog``    named parquet sources for the synthetic test tables
- ``functions``  scalar helpers: dates/ISO weeks, half-up rounding, text, vectors
- ``operators``  composable DataFrame operators: event windows, as-of joins,
                 buckets+spines, pivots, dedup, similarity, status/schedule
- ``sources``    merge/upsert sink semantics (MERGE keyed, insert-if-absent, ...)
- ``streaming``  Structured Streaming wrappers (watermark windows, foreachBatch)
- ``queries``    the registry of (DataFrame query, DuckDB oracle SQL) pairs that
                 the driver's correctness gate runs
"""

__version__ = "0.1.0"
