"""File-landing readers for the non-parquet formats the ingestion edge
produces: JSON-lines (the shape of landed API payloads — the reference
fetches JSON envelopes, ``src/collectors/weather.py:666-739``) and CSV
(manual exports/backfills).

Engine rules, enforced here rather than left to callers:

- **Explicit schema, never inference.** Schema inference is an extra full
  scan before the real one (unacceptable at 100 TB) and its result depends
  on the data sampled — a type can silently flip between runs. Both
  readers REQUIRE a schema.
- **Malformed rows are quarantined, not fatal.** PERMISSIVE mode routes
  undecodable lines into ``_corrupt_record`` so a bad producer cannot
  abort a billion-row load; callers split the frame on that column and
  land rejects next to the sink (the same tolerated-error posture as the
  reference's per-step try/except).
- **JSON-lines, not multiline JSON documents.** Line-delimited files split
  by byte range across executors; a multiline document forces one task
  per file.

Stringly-typed payload fields should stay STRING in the landing schema and
go through the X18 ``try_cast`` decodes downstream — exactly like the
REST-landed item tables in ``sources/weather_api.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: str) -> str:
    return f"{schema}, {CORRUPT_COL} STRING"


def _split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, rejects). Rejects keep the FULL row (any fields that did
    parse plus the raw line): Spark disallows plans whose only referenced
    column from a raw JSON/CSV relation is the corrupt-record column, and
    the partial parse is diagnostic value anyway."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.filter(F.col(CORRUPT_COL).isNotNull())
    # Caveat: an aggregation that column-prunes rejects down to the corrupt
    # column alone (e.g. rejects.count()) trips Spark's raw-relation guard;
    # the intended use — writing rejects to a quarantine sink — references
    # every column and is fine.
    return good, rejects


def read_json_lines(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON with an enforced schema.

    Returns ``(good, rejects)``: rows that parsed against the schema, and
    quarantined raw lines (one ``_corrupt_record`` string each).
    """
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(df)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV with an enforced schema; same (good, rejects) contract as
    :func:`read_json_lines`."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split(df)
