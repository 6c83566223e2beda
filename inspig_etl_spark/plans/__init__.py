"""Plan-level tooling: the lint gate that keeps every registry query
scale-safe (see :mod:`inspig_etl_spark.plans.lint`)."""
