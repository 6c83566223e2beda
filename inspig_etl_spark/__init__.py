"""inspig_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ETL (``kilhyeon-kim/inspig-etl``), re-expressed
as declarative DataFrame pipelines so Catalyst/Tungsten/AQE pick the physical
strategy. See ``SURVEY.md`` for the operator inventory this package covers.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC session zone for
                 deterministic distributed date math)
- ``catalog``    named parquet sources for the synthetic test tables
- ``functions``  scalar helpers: dates/ISO weeks/yyyymmdd sentinels + KST
                 business clock, half-up rounding, text/tokens/hashes, geo
- ``operators``  composable DataFrame operators: event windows, as-of joins,
                 range bands, pivots/wide rows, dedup (exact/MinHash-LSH/
                 SimHash), similarity/ANN, status truth table, schedule
                 expansion, multimodal binary plumbing
- ``sources``    merge/upsert sink semantics (MERGE keyed w/ partial update,
                 insert-if-absent, partition overwrite, staged atomic swap)
- ``streaming``  Structured Streaming: watermark windows, foreachBatch MERGE,
                 layered precedence, stateful sessionization, run manifests
- ``queries``    the registry of (DataFrame query, DuckDB oracle SQL) pairs
                 that the driver's correctness gate runs
"""

__version__ = "0.1.0"
