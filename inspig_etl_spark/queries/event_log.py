"""Event-log queries over the synthetic `events` stream table
(SURVEY.md §2.3 J2/J4, §2.5 W1-W6 — the sow work-history idioms).

The current testdata ships ``events.ts`` as parquet TIMESTAMP(MICROS), which
Spark reads as TIMESTAMP_NTZ; the catalog's dtype dispatch (``catalog.py``)
still tolerates the historical TIMESTAMP(NANOS) generation (read as a long
under ``nanosAsLong``) and exposes a uniform ``ts_us`` column (epoch
microseconds, BIGINT) that matches DuckDB's reading of the same file exactly.
All time math below is integer arithmetic on ``ts_us`` — both engines see
identical values and no timezone cast is ever involved; queries that only
ORDER by event time use raw ``ts`` (same sort order, no projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.dates import us_to_sec
from inspig_etl_spark.functions.rounding import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum
from inspig_etl_spark.operators.events import (
    asof_value_single_scan,
    latest_per_key,
    next_event_after,
)
from inspig_etl_spark.queries import register

# DuckDB-side expression equal to the catalog's ts_us column.
SQL_TS_US = "epoch_us(ts)"
# FLOOR via double division, NOT integer // : DuckDB's integer // 
# truncates toward zero (probed: -1 // 1000000 = 0), so a pre-epoch
# microsecond would land in second 0 while Spark's floor lands it in
# second -1; floor(x / 1e6) is the identical IEEE op on both engines.
SQL_TS_SEC = "CAST(FLOOR(epoch_us(ts) / 1000000.0) AS BIGINT)"


@register(
    "event_gaps_lag_lead",
    operators="J2,W2 (lag/lead replaces SEQ±1 self-join; ref data_loader.py:299-327)",
    oracle=f"""
WITH g AS (
  SELECT event_type,
         {SQL_TS_SEC} - LAG({SQL_TS_SEC}) OVER (PARTITION BY user_id ORDER BY {SQL_TS_US}, event_id) AS gap_s,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY {SQL_TS_US}, event_id) AS next_type
  FROM events
)
SELECT event_type,
       COUNT(*) AS event_cnt,
       COUNT(gap_s) AS gap_cnt,
       {sql_dec_avg('gap_s', 0)} AS avg_gap_s,
       COUNT(CASE WHEN next_type = 'purchase' THEN 1 END) AS next_purchase_cnt
FROM g
GROUP BY event_type
""",
)
def event_gaps_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("sec", us_to_sec(F.col("ts_us")))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = ev.select(
        "event_type",
        (F.col("sec") - F.lag("sec").over(w)).alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.count("gap_s").alias("gap_cnt"),
        dec_avg(F.col("gap_s"), 0).alias("avg_gap_s"),
        F.count(F.when(F.col("next_type") == "purchase", 1)).alias("next_purchase_cnt"),
    )


@register(
    "purchase_asof_last_view",
    operators="J4 (as-of join: last view strictly before each purchase; ref accident.py:130-173)",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, {SQL_TS_US} AS t_us, event_id, event_type,
         CASE WHEN event_type = 'view' THEN value END AS view_val
  FROM events WHERE event_type IN ('view', 'purchase')
),
filled AS (
  SELECT *,
         LAST_VALUE(view_val IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY t_us, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_view_value
  FROM tagged
)
SELECT user_id,
       COUNT(*) AS purchase_cnt,
       COUNT(asof_view_value) AS matched_cnt,
       {sql_dec_sum('asof_view_value', 6)} AS sum_asof_view_value
FROM filled
WHERE event_type = 'purchase'
GROUP BY user_id
""",
)
def purchase_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both as-of sides are subsets of the one events table, so use the
    # single-scan kernel (one scan + one shuffle; the two-DataFrame
    # ``asof_join`` union idiom plans the events scan twice — the r5
    # regression was paying the ts_us projection once per branch scan).
    # Ordering is on the catalog's ``ts_us`` (micros), NOT raw ``ts``:
    # under a TIMESTAMP(NANOS) file the raw nanos order refines micro-level
    # ties that the DuckDB oracle (which truncates to micros) treats as
    # equal, flipping strict-inequality visibility for equal-microsecond
    # view/purchase pairs. With a single scan the per-row projection is
    # paid once — measured perf-neutral.
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    joined = asof_value_single_scan(
        ev,
        keys=["user_id"],
        ts="ts_us",
        is_left=F.col("event_type") == "purchase",
        right_val=F.col("value"),
        tiebreak=["event_id"],
        strict=True,
        out="view_value_asof",
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("purchase_cnt"),
        F.count("view_value_asof").alias("matched_cnt"),
        dec_sum(F.col("view_value_asof"), 6).alias("sum_asof_view_value"),
    )


@register(
    "latest_event_per_user",
    operators="W1,W6 (latest-per-key row_number; ref data_loader.py:258-261)",
    oracle=f"""
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       {SQL_TS_US} AS last_ts_us
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY {SQL_TS_US} DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    last = latest_per_key(ev, keys=["user_id"], order_by=["ts_us", "event_id"])
    return last.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("ts_us").alias("last_ts_us"),
    )


@register(
    "next_event_after_error",
    operators="W5,A9,F3 (event-type filter + forward-looking min / MIN KEEP DENSE_RANK; ref weaning.py:145-162)",
    oracle=f"""
WITH nxt AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY {SQL_TS_US}, event_id) AS next_event_type
  FROM events
)
SELECT user_id,
       COUNT(*) AS error_cnt,
       COUNT(next_event_type) AS has_next_cnt,
       COUNT(CASE WHEN next_event_type = 'error' THEN 1 END) AS next_is_error_cnt
FROM nxt
WHERE event_type = 'error'
GROUP BY user_id
""",
)
def next_event_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    nxt = next_event_after(
        ev, keys=["user_id"], order_by=["ts_us", "event_id"], cols=["event_type"]
    )
    return (
        nxt.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("error_cnt"),
            F.count(F.when(F.col("next_event_type").isNotNull(), 1)).alias("has_next_cnt"),
            F.count(F.when(F.col("next_event_type") == "error", 1)).alias("next_is_error_cnt"),
        )
    )


@register(
    "user_event_mode",
    operators="A12 (mode / most-frequent with deterministic tie; ref weather.py:871-888)",
    oracle="""
SELECT user_id, event_type AS top_event_type, cnt AS top_cnt
FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
""",
)
def user_event_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event_type"), F.col("cnt").alias("top_cnt"))
    )


# --- ordered funnel conversion ------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "event_funnel_conversion",
    operators=(
        "A5,J2,W5 + analytics-funnel (ordered sequential-pattern funnel: "
        "per user, first 'view', first 'click' strictly AFTER it, first "
        "'purchase' strictly after that — step reach counts + conversion "
        "ppm, the product-analytics funnel report computed as staged "
        "min-after-anchor aggregations)"
    ),
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
  WHERE ts IS NOT NULL
),
v1 AS (
  SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view'
  GROUP BY user_id
),
v2 AS (
  SELECT e.user_id, MIN(us) AS t2
  FROM e JOIN v1 USING (user_id)
  WHERE event_type = 'click' AND us > t1
  GROUP BY e.user_id
),
v3 AS (
  SELECT e.user_id, MIN(us) AS t3
  FROM e JOIN v2 USING (user_id)
  WHERE event_type = 'purchase' AND us > t2
  GROUP BY e.user_id
),
j AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v1) AS c1,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM v2) AS c2,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM v3) AS c3
)
SELECT CAST(1 AS INT) AS step, 'view' AS step_name, c1 AS users,
       CAST(CASE WHEN c1 > 0 THEN 1000000 END AS BIGINT) AS conv_ppm FROM j
UNION ALL
SELECT CAST(2 AS INT), 'click_after_view', c2,
       CAST(c2 * 1000000 // NULLIF(c1, 0) AS BIGINT) FROM j
UNION ALL
SELECT CAST(3 AS INT), 'purchase_after_click', c3,
       CAST(c3 * 1000000 // NULLIF(c1, 0) AS BIGINT) FROM j
""",
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-analytics funnel over the event log: a user converts a
    step only by performing it strictly AFTER the previous step's first
    occurrence (a purchase before the first view does not count — ordered
    semantics, not mere set membership). Three staged aggregations: the
    anchor (first view) per user, then min-click-after-anchor, then
    min-purchase-after-that; reach counts and integer-ppm conversion vs
    step 1 come from ONE final row exploded to the 3 step rows.

    Scale shape: each stage is a partial-aggregated groupBy(user_id) plus
    an equi-join against the previous stage's (user, anchor) pairs — at
    100 TB three user-keyed shuffles over progressively SHRINKING frames
    (v2 joins only step-1 converters), never a per-event window; AQE
    reuses the user_id exchange across stages.
    """
    # NULL timestamps are excluded symmetrically on both sides (the oracle's
    # e CTE carries WHERE ts IS NOT NULL) so a regen introducing NULL ts
    # cannot diverge c1 cross-engine — same defence as
    # event_weekly_cohort_retention below (ADVICE r10).
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts_us").isNotNull())
        .select("user_id", "ts_us", "event_type")
    )
    v1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    v2 = (
        e.filter(F.col("event_type") == "click")
        .join(v1, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    v3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(v2, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    agg = (
        v1.join(v2, "user_id", "left")
        .join(v3, "user_id", "left")
        .agg(
            F.count("t1").cast("bigint").alias("c1"),
            F.count("t2").cast("bigint").alias("c2"),
            F.count("t3").cast("bigint").alias("c3"),
        )
    )

    def _step(no, name, c, ppm):
        return F.struct(
            F.lit(no).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            F.col(c).alias("users"),
            ppm.cast("bigint").alias("conv_ppm"),
        )

    # `div`, not `/`: integer ppm exactly like the oracle's `//`.
    return agg.select(
        F.explode(
            F.array(
                _step(
                    1, "view", "c1",
                    F.when(F.col("c1") > 0, F.lit(1000000).cast("bigint")),
                ),
                _step(2, "click_after_view", "c2",
                      F.expr("c2 * 1000000 div nullif(c1, 0)")),
                _step(3, "purchase_after_click", "c3",
                      F.expr("c3 * 1000000 div nullif(c1, 0)")),
            )
        ).alias("s")
    ).select("s.*")


WEEK_US = 604_800_000_000  # 7 days in microseconds (epoch-aligned weeks)


@register(
    "event_weekly_cohort_retention",
    operators=(
        "A2,A17 + analytics-cohort (weekly cohort retention triangle: "
        "users bucketed by first-activity week, per (cohort, week-offset) "
        "distinct active users + retention ppm vs cohort size — the "
        "product-analytics retention matrix as two user-keyed aggs and "
        "two equi-joins)"
    ),
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events WHERE ts IS NOT NULL
),
w AS (
  SELECT user_id, us - ((us % {WEEK_US}) + {WEEK_US}) % {WEEK_US} AS wk
  FROM e
),
first AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id
),
sz AS (
  SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM first GROUP BY cohort_wk
),
act AS (
  SELECT DISTINCT user_id, wk FROM w
),
g AS (
  SELECT f.cohort_wk, (a.wk - f.cohort_wk) // {WEEK_US} AS week_offset,
         CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
  FROM act a JOIN first f USING (user_id)
  GROUP BY f.cohort_wk, (a.wk - f.cohort_wk) // {WEEK_US}
)
SELECT g.cohort_wk AS cohort_week_us,
       CAST(g.week_offset AS BIGINT) AS week_offset,
       sz.cohort_users,
       g.active_users,
       CAST(g.active_users * 1000000 // sz.cohort_users AS BIGINT)
         AS retention_ppm
FROM g JOIN sz USING (cohort_wk)
""",
)
def event_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention triangle: each user joins the cohort of their first
    active epoch-aligned week (integer floored multiple of 7 days — no
    ISO-week or timezone semantics to diverge on), and each (cohort,
    week-offset) cell counts the cohort's users active that week, with
    retention as integer ppm of the cohort size. Offset 0 is the cohort
    week itself (retention_ppm = 1000000 by construction).

    Scale shape: one groupBy(user) for the cohort anchor, one distinct
    over (user, week) — both partial-aggregated — then a user-keyed
    equi-join and a (cohort, offset) groupBy whose output is bounded by
    weeks², not events; the final join attaches cohort sizes by the
    cohort key (weeks rows — broadcast at any scale).
    """
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts_us").isNotNull())
        .select("user_id", "ts_us")
    )
    w = e.select(
        "user_id",
        F.expr(
            f"ts_us - ((ts_us % {WEEK_US}) + {WEEK_US}) % {WEEK_US}"
        ).alias("wk"),
    )
    first = w.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sz = first.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    act = w.distinct()
    g = (
        act.join(first, "user_id")
        .groupBy(
            "cohort_wk",
            F.expr(f"(wk - cohort_wk) div {WEEK_US}").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
    )
    return g.join(sz, "cohort_wk").select(
        F.col("cohort_wk").alias("cohort_week_us"),
        F.col("week_offset").cast("bigint").alias("week_offset"),
        "cohort_users",
        "active_users",
        F.expr("active_users * 1000000 div cohort_users")
        .cast("bigint")
        .alias("retention_ppm"),
    )
