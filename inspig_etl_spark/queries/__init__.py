"""Query registry: every implemented operator from SURVEY.md §2, declared as a
(DataFrame query, DuckDB oracle SQL) pair.

The driver's correctness gate runs each pair side-by-side at sf=0.01 and
compares row count + schema + order-insensitive value hash, so:

- every aggregate/computed column is aliased identically on both sides;
- every floating-point aggregate goes through an exact DecimalType
  intermediate (see ``functions/rounding.py``) so results are
  order-independent and bit-identical across engines;
- queries with no ANSI-SQL equivalent (hash-dependent LSH sketches,
  streaming) register ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    operators: str  # SURVEY.md §2 operator ids this query exercises


REGISTRY: dict[str, Query] = {}


def register(name: str, operators: str, oracle: str | None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, operators=operators)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _load()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import all query modules (each registers into REGISTRY).

    Import order IS registration order, and the driver's correctness gate
    samples the first 50 oracled registrations — so modules whose queries
    have never had a driver row come first, queries proven green in earlier
    rounds (r01: tpch; r02: aggregates/domain_aggs/event_log/...) rotate to
    the back.
    """
    global _LOADED
    if _LOADED:
        return
    from inspig_etl_spark.queries import (  # noqa: F401
        pivots,
        scalar_funcs,
        sessions,
        sinks_merge,
        skew,
        status_schedule,
        weekly_report,
        schedule_ext,
        weather_pipeline,
        productivity,
        weather_ingest,
        llm_sampling,
        llm_text,
        multimodal,
        llm_dedup,
        llm_similarity,
        geo,
        joins,
        event_log,
        aggregates,
        domain_aggs,
        tpch,
    )

    _LOADED = True
