"""MERGE-semantics queries (SURVEY.md §2.1 S6/S9/S10/S12/S14).

Each query computes the POST-MERGE logical state of a sink as a DataFrame,
with the DuckDB oracle deriving the same state in SQL — the strongest
correctness check available for write semantics without a shared mutable
store. The physical write paths (dynamic partition overwrite, staged atomic
swap) are exercised by round-trip tests in tests/test_sinks.py.

Model: a daily-rollup sink keyed (user_id, event_day) — the shape of the
reference's weather tables keyed (NX, NY, WK_DATE). The "existing" state is
days < 2024-01-15; the "incoming batch" covers days >= 2024-01-10, so keys
overlap on 01-10..01-14 (update path) and extend beyond (insert path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.dates import us_to_day
from inspig_etl_spark.functions.rounding import dec_sum, sql_dec_sum
from inspig_etl_spark.queries import register
from inspig_etl_spark.sources.sinks import delete_then_insert, insert_if_absent, merge_upsert

CUTOFF = "2024-01-15"
BATCH_FROM = "2024-01-10"

_SQL_TARGET = f"""
target AS (
  SELECT user_id, CAST(ts AS DATE) AS event_day,
         COUNT(*) AS event_cnt,
         {sql_dec_sum('value', 6)} AS value_sum
  FROM events WHERE ts < TIMESTAMP '{CUTOFF} 00:00:00'
  GROUP BY 1, 2
)"""

# The incoming batch re-reads a trailing window (the reference's ASOS
# 7-day re-read, ST2) and carries a PARTIAL column: value_sum is only
# present when the day saw a purchase — NULL must keep the old value
# (RAIN_PROB = NVL(:new, old)).
_SQL_UPDATES = f"""
updates AS (
  SELECT user_id, CAST(ts AS DATE) AS event_day,
         COUNT(*) AS event_cnt,
         CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
              THEN {sql_dec_sum('value', 6)} END AS value_sum
  FROM events WHERE ts >= TIMESTAMP '{BATCH_FROM} 00:00:00'
  GROUP BY 1, 2
)"""


def _target(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts_us") < F.lit(_us(CUTOFF))
    )
    return ev.groupBy("user_id", us_to_day(F.col("ts_us")).alias("event_day")).agg(
        F.count(F.lit(1)).alias("event_cnt"),
        dec_sum(F.col("value"), 6).alias("value_sum"),
    )


def _updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("ts_us") >= F.lit(_us(BATCH_FROM)))
    return ev.groupBy("user_id", us_to_day(F.col("ts_us")).alias("event_day")).agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)) > 0,
            dec_sum(F.col("value"), 6),
        ).alias("value_sum"),
    )


def _us(day: str) -> int:
    import datetime as dt

    d = dt.datetime.fromisoformat(day).replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp()) * 1_000_000


@register(
    "merge_upsert_partial",
    operators="S6,S7,S8,ST2 (keyed MERGE upsert w/ NVL partial update; ref weather.py:1697-1732)",
    oracle=f"""
WITH {_SQL_TARGET}, {_SQL_UPDATES}
SELECT COALESCE(t.user_id, u.user_id) AS user_id,
       COALESCE(t.event_day, u.event_day) AS event_day,
       CASE WHEN u.user_id IS NOT NULL THEN u.event_cnt ELSE t.event_cnt END AS event_cnt,
       COALESCE(u.value_sum, t.value_sum) AS value_sum
FROM target t FULL OUTER JOIN updates u
  ON t.user_id = u.user_id AND t.event_day = u.event_day
""",
)
def merge_upsert_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-MERGE state: matched keys take the update's event_cnt, value_sum
    falls back to the old value when the update carries NULL (partial)."""
    tgt = _target(spark, sf_dir)
    upd = _updates(spark, sf_dir)
    # event_cnt: whole-column update; value_sum: NVL partial — mixed
    # per-column semantics in ONE full-outer join, like the reference's
    # MERGE statements.
    return merge_upsert(tgt, upd, ["user_id", "event_day"], partial=["value_sum"])


@register(
    "merge_insert_if_absent",
    operators="S9 (WHEN NOT MATCHED only: existing rows win; ref weather.py:2406-2443)",
    oracle=f"""
WITH {_SQL_TARGET}, {_SQL_UPDATES}
SELECT user_id, event_day, event_cnt, value_sum FROM target
UNION ALL
SELECT u.user_id, u.event_day, u.event_cnt, u.value_sum
FROM updates u
WHERE NOT EXISTS (
  SELECT 1 FROM target t
  WHERE t.user_id = u.user_id AND t.event_day = u.event_day
)
""",
)
def merge_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    tgt = _target(spark, sf_dir)
    upd = _updates(spark, sf_dir)
    return insert_if_absent(tgt, upd, ["user_id", "event_day"])


@register(
    "merge_delete_then_insert",
    operators="S10,S12,S13 (idempotent delete-scope-then-insert; ref productivity.py:375-451, modon.py:97-105)",
    oracle=f"""
WITH {_SQL_TARGET}, {_SQL_UPDATES},
replacement AS (
  SELECT * FROM updates WHERE event_day < DATE '{CUTOFF}'
)
SELECT user_id, event_day, event_cnt, value_sum FROM target
WHERE NOT (event_day >= DATE '{BATCH_FROM}' AND event_day < DATE '{CUTOFF}')
UNION ALL
SELECT user_id, event_day, event_cnt, value_sum FROM replacement
""",
)
def merge_delete_then_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-run of the 01-10..01-14 slice: delete the scope from the sink,
    insert the freshly computed rows — byte-identical on repeat runs."""
    tgt = _target(spark, sf_dir)
    upd = _updates(spark, sf_dir)
    scope = (F.col("event_day") >= F.lit(BATCH_FROM).cast("date")) & (
        F.col("event_day") < F.lit(CUTOFF).cast("date")
    )
    replacement = upd.filter(F.col("event_day") < F.lit(CUTOFF).cast("date"))
    return delete_then_insert(tgt, replacement, scope)


@register(
    "surrogate_keys_dim",
    operators="S14,T1 (deterministic surrogate ids replacing SEQ_*.NEXTVAL; ref orchestrator.py:969-970)",
    oracle="""
SELECT n_name, n_regionkey,
       CAST(ROW_NUMBER() OVER (ORDER BY n_name) + 99 AS BIGINT) AS nation_sk
FROM nation
""",
)
def surrogate_keys_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14: reproducible dense ids over an explicit total order, seeded at
    100 — unlike a sequence, re-running yields identical keys. Applied to a
    bounded dim (25 nations); for fact-scale keys the helper's contract says
    use composite natural keys instead of a global row_number."""
    from inspig_etl_spark.sources.sinks import with_surrogate_key

    nat = table(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    out = with_surrogate_key(nat, "nation_sk", ["n_name"], start=100)
    return out.withColumn("nation_sk", F.col("nation_sk").cast("long"))


@register(
    "cascade_delete_gate",
    operators="S13,S12 (scoped cascading delete; master deleted only when its week rows are all gone; ref orchestrator.py:828-881)",
    oracle="""
WITH detail AS (
  SELECT n_nationkey % 5 AS master_seq, n_nationkey AS farm_no FROM nation
),
masters AS (SELECT DISTINCT master_seq FROM detail),
kept AS (
  SELECT * FROM detail
  WHERE NOT (master_seq = 0 OR (master_seq = 1 AND farm_no < 10))
),
touched AS (
  SELECT DISTINCT master_seq FROM detail
  WHERE master_seq = 0 OR (master_seq = 1 AND farm_no < 10)
),
emptied AS (
  SELECT master_seq FROM touched t
  WHERE NOT EXISTS (SELECT 1 FROM kept k WHERE k.master_seq = t.master_seq)
)
SELECT 'master' AS kind, master_seq, CAST(NULL AS BIGINT) AS farm_no
FROM masters m
WHERE NOT EXISTS (SELECT 1 FROM emptied e WHERE e.master_seq = m.master_seq)
UNION ALL
SELECT 'week' AS kind, master_seq, farm_no FROM kept
""",
)
def cascade_delete_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 with the emptiness gate: the scope clears ALL of master 0's farm
    rows (master row cascades away) but only part of master 1's (master row
    survives). Masters outside the scope are untouched even if examined."""
    from inspig_etl_spark.sources.sinks import cascade_delete

    nat = table(spark, sf_dir, "nation")
    detail = nat.select(
        (F.col("n_nationkey") % 5).alias("master_seq"),
        F.col("n_nationkey").alias("farm_no"),
    )
    master = detail.select("master_seq").distinct()
    scope = (F.col("master_seq") == 0) | (
        (F.col("master_seq") == 1) & (F.col("farm_no") < 10)
    )
    m_after, d_after = cascade_delete(master, detail, ["master_seq"], scope)
    return m_after.select(
        F.lit("master").alias("kind"),
        "master_seq",
        F.lit(None).cast("bigint").alias("farm_no"),
    ).unionByName(
        d_after.select(F.lit("week").alias("kind"), "master_seq", "farm_no")
    )
