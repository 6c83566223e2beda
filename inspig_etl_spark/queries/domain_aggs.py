"""Remaining operator coverage: JSON parsing, SHA-256 tokens, include/
exclude rewrites, quality gates, agg-then-join, dedup-union, domain-rule
totals, monthly-ratio-then-mean, and the dedicated window forms
(SURVEY.md F6/F8, J5, U2, A16/A18/A20, W3/W4, X13/X14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.dates import us_to_day
from inspig_etl_spark.functions.rounding import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum
from inspig_etl_spark.queries import register


@register(
    "json_props_extract",
    operators="X13 (from_json with explicit schema; ref schedule.py:180-207, config.py:229-255)",
    # STRICT typed extraction mirroring Spark from_json(struct<k:int>):
    # DuckDB's ->> + CAST is looser ('"7"' -> 7, 1.5 -> 2, true -> 1) and
    # json_extract THROWS on malformed documents, so the oracle gates on
    # json_valid + integer json_type and TRY_CASTs for int range — probed
    # byte-equal to Spark across 11 value shapes (string/double/bool/
    # overflow/malformed/missing/null all -> NULL on both engines).
    oracle=f"""
WITH x AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
                   AND json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
              THEN TRY_CAST(json_extract(props, '$.k') AS INTEGER) END AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS event_cnt,
       COUNT(k) AS k_present_cnt,
       MIN(k) AS k_min,
       MAX(k) AS k_max,
       {sql_dec_avg("k", 0)} AS k_avg
FROM x
GROUP BY event_type
""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference stores JSON configs in VARCHAR columns; parse with an
    explicit schema (from_json), never schema inference per row."""
    ev = table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    k = F.from_json(F.col("props"), schema)["k"]
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.count("k").alias("k_present_cnt"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        dec_avg(F.col("k"), 0).alias("k_avg"),
    )


@register(
    "sha2_share_token",
    operators="X14,X2 (SHA-256 share token + expiry; ref farm_processor.py:204-227)",
    oracle="""
SELECT c_custkey,
       sha256(CAST(c_custkey AS VARCHAR) || '-' || c_name || '-19980101') AS share_token,
       DATE '1998-01-01' + INTERVAL 6 DAY AS expires_on
FROM customer
WHERE c_custkey % 10 = 0
""",
)
def sha2_share_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-token generation; the reference appends a random hex salt —
    that stays a driver-side concern (randomness is not a distributed
    expression), the deterministic core is the hashed composite key."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    return cust.select(
        "c_custkey",
        F.sha2(
            F.concat_ws("-", F.col("c_custkey"), F.col("c_name"), F.lit("19980101")), 256
        ).alias("share_token"),
        F.date_add(F.lit("1998-01-01").cast("date"), 6).cast("timestamp_ntz").alias(
            "expires_on"
        ),
    )


# F6: the reference splices include/exclude farm lists into its base SQL;
# here the rewrite is a composable filter applied to the dimension.
INCLUDE_SEGMENTS = ("BUILDING", "MACHINERY", "AUTOMOBILE")
EXCLUDE_NATIONS = (3, 7, 11)


@register(
    "include_exclude_rewrite",
    operators="F6,F2 (dynamic include/exclude list predicates; ref orchestrator.py:992-1040)",
    oracle=f"""
SELECT c_mktsegment, COUNT(*) AS cust_cnt, {sql_dec_sum('c_acctbal', 2)} AS acctbal_sum
FROM customer
WHERE c_mktsegment IN ({", ".join(f"'{s}'" for s in INCLUDE_SEGMENTS)})
  AND c_nationkey NOT IN ({", ".join(str(n) for n in EXCLUDE_NATIONS)})
GROUP BY c_mktsegment
""",
)
def include_exclude_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    filtered = cust.filter(
        F.col("c_mktsegment").isin(list(INCLUDE_SEGMENTS))
        & ~F.col("c_nationkey").isin(list(EXCLUDE_NATIONS))
    )
    return filtered.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("cust_cnt"),
        dec_sum(F.col("c_acctbal"), 2).alias("acctbal_sum"),
    )


@register(
    "quality_threshold_semijoin",
    operators="F8,A20 (drop incomplete groups via count-gate semi-join; ref weather.py:922-926)",
    oracle="""
WITH complete_days AS (
  SELECT user_id, CAST(ts AS DATE) AS event_day
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT user_id, COUNT(*) AS complete_day_cnt
FROM complete_days
GROUP BY user_id
""",
)
def quality_threshold_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days with < 2 purchases are 'incomplete' and dropped before the
    rollup — the reference's forecast-quality gate."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    complete = (
        ev.groupBy("user_id", us_to_day(F.col("ts_us")).alias("event_day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    return complete.groupBy("user_id").agg(F.count(F.lit(1)).alias("complete_day_cnt"))


@register(
    "agg_then_equijoin",
    operators="J5,A2 (pre-aggregate then equi-join, the hash-lookup替 join; ref farrowing.py:138-199)",
    oracle=f"""
WITH item_agg AS (
  SELECT l_orderkey,
         COUNT(*) AS line_cnt,
         {sql_dec_sum('l_quantity', 2)} AS qty_sum,
         {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS net_value
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT o_orderkey, o_orderstatus, line_cnt, qty_sum, net_value
FROM orders JOIN item_agg ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
""",
)
def agg_then_equijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    item_agg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("line_cnt"),
        dec_sum(F.col("l_quantity"), 2).alias("qty_sum"),
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net_value"),
    )
    return orders.join(item_agg, orders.o_orderkey == item_agg.l_orderkey).select(
        "o_orderkey", "o_orderstatus", "line_cnt", "qty_sum", "net_value"
    )


@register(
    "dedup_union_keys",
    operators="U2,A19 (union then dedup; ref weather.py:1340-1347)",
    oracle="""
SELECT nationkey, COUNT(*) AS src_cnt FROM (
  SELECT DISTINCT c_nationkey AS nationkey, 'customer' AS src FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT DISTINCT s_nationkey, 'supplier' FROM supplier
)
GROUP BY nationkey
""",
)
def dedup_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
        .withColumn("src", F.lit("customer"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
        .withColumn("src", F.lit("supplier"))
    )
    return cust.unionByName(supp).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("src_cnt")
    )


@register(
    "totals_domain_rule",
    operators="A16,X7 (total excludes a category; metric prefers external value via coalesce; ref modon.py:245-265,373-465)",
    oracle=f"""
WITH local_counts AS (
  SELECT c_nationkey,
         COUNT(*) AS all_cnt,
         COUNT(CASE WHEN c_mktsegment <> 'FURNITURE' THEN 1 END) AS total_cnt
  FROM customer
  GROUP BY c_nationkey
),
metrics AS (
  SELECT n_nationkey AS m_nationkey,
         CASE WHEN n_nationkey % 3 = 0 THEN n_nationkey * 100 END AS official_cnt
  FROM nation
)
SELECT n_name,
       total_cnt,
       all_cnt,
       COALESCE(official_cnt, all_cnt) AS sangsi_cnt
FROM local_counts
JOIN metrics ON c_nationkey = m_nationkey
JOIN nation ON n_nationkey = c_nationkey
""",
)
def totals_domain_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """modon's domain rule: the headline total EXCLUDES one category
    (gilts/'FURNITURE' here) while the all-count keeps it, and the 상시
    metric prefers the official metrics-table value, falling back to the
    local count."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    local = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("all_cnt"),
        F.count(F.when(F.col("c_mktsegment") != "FURNITURE", 1)).alias("total_cnt"),
    )
    # Rename the metrics key: metrics derives from nation and nation joins
    # again below — distinct names keep the self-join unambiguous.
    metrics = nation.select(
        F.col("n_nationkey").alias("m_nationkey"),
        F.when(F.col("n_nationkey") % 3 == 0, F.col("n_nationkey") * 100).alias(
            "official_cnt"
        ),
    )
    return (
        local.join(metrics, local.c_nationkey == metrics.m_nationkey)
        .join(F.broadcast(nation), local.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "total_cnt",
            "all_cnt",
            F.coalesce(F.col("official_cnt"), F.col("all_cnt")).alias("sangsi_cnt"),
        )
    )


@register(
    "monthly_ratio_then_mean",
    operators="A18,X6 (per-month ratio with shifted denominator, then mean, fallback when empty; ref config.py:146-227)",
    oracle=f"""
WITH ship AS (
  SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m') AS mo, COUNT(*) AS ship_cnt
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
wean AS (
  SELECT user_id, strftime(CAST(CAST(ts AS DATE) + INTERVAL 7 DAY AS DATE), '%Y-%m') AS mo,
         COUNT(*) AS wean_cnt
  FROM events WHERE event_type = 'view'
  GROUP BY 1, 2
),
ratio AS (
  SELECT ship.user_id, ship.mo,
         ROUND(ship_cnt * 100.0 / wean_cnt, 4) AS mo_ratio
  FROM ship JOIN wean ON ship.user_id = wean.user_id AND ship.mo = wean.mo
  WHERE wean_cnt > 0
)
SELECT user_id,
       ROUND(COALESCE({sql_dec_avg('mo_ratio', 4)}, 90.0), 4) AS rearing_rate,
       COUNT(*) AS month_cnt
FROM ratio
GROUP BY user_id
""",
)
def monthly_ratio_then_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """config.py's rearing rate: per month, purchases / (views shifted
    forward 7 days) x100; then the mean of the monthly ratios with a 90
    fallback when no month qualifies."""
    ev = table(spark, sf_dir, "events")
    day = us_to_day(F.col("ts_us"))
    ship = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_format(day, "yyyy-MM").alias("mo"))
        .agg(F.count(F.lit(1)).alias("ship_cnt"))
    )
    wean = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(
            "user_id", F.date_format(F.date_add(day, 7), "yyyy-MM").alias("mo")
        )
        .agg(F.count(F.lit(1)).alias("wean_cnt"))
    )
    ratio = (
        ship.join(wean, ["user_id", "mo"])
        .filter(F.col("wean_cnt") > 0)
        .withColumn("mo_ratio", F.round(F.col("ship_cnt") * 100.0 / F.col("wean_cnt"), 4))
    )
    return ratio.groupBy("user_id").agg(
        F.round(F.coalesce(dec_avg(F.col("mo_ratio"), 4), F.lit(90.0)), 4).alias(
            "rearing_rate"
        ),
        F.count(F.lit(1)).alias("month_cnt"),
    )


@register(
    "intersect_except_nations",
    operators="U3 (INTERSECT/EXCEPT set ops — available natively, unused by the reference)",
    oracle="""
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500),
s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_suppkey % 2 = 0)
SELECT 'both' AS membership, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT 'rich_customers_only', nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
""",
)
def intersect_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 2 == 0)
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = c.intersect(s).select(F.lit("both").alias("membership"), "nationkey")
    only = c.exceptAll(s).select(
        F.lit("rich_customers_only").alias("membership"), "nationkey"
    )
    return both.unionByName(only)


@register(
    "newline_template_block",
    operators="X10,X11 (LISTAGG + newline-joined template text; ref schedule.py:1055-1130)",
    oracle="""
SELECT p_brand,
       'brand: ' || p_brand || chr(10) ||
       string_agg(p_type || '(' || cnt || ')', chr(10) ORDER BY p_type) AS summary_block
FROM (SELECT p_brand, p_type, COUNT(*) AS cnt FROM part GROUP BY 1, 2)
GROUP BY p_brand
""",
)
def newline_template_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The settings-snapshot text block: 'name(N)' lines joined with CHR(10)
    under a header — template assembly as expressions."""
    part = table(spark, sf_dir, "part")
    per_type = part.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("cnt"))
    line = F.concat(F.col("p_type"), F.lit("("), F.col("cnt"), F.lit(")"))
    return per_type.groupBy("p_brand").agg(
        F.concat(
            F.lit("brand: "),
            F.col("p_brand"),
            F.lit("\n"),
            F.concat_ws("\n", F.sort_array(F.collect_list(line))),
        ).alias("summary_block")
    )


@register(
    "running_max_so_far",
    operators="W3 (running max-so-far reduce; ref data_loader.py:625-649)",
    oracle="""
SELECT event_id, user_id, value,
       MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_so_far
FROM events
WHERE event_type = 'purchase'
""",
)
def running_max_so_far(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "value", F.max("value").over(w).alias("max_so_far")
    )


@register(
    "last_value_before_cutoff",
    operators="W4 (latest value at-or-before a date per key via max(struct); ref data_loader.py:669-702)",
    oracle="""
SELECT user_id,
       MAX({'ts': ts, 'event_id': event_id, 'value': value}).value AS last_value,
       CAST(MAX({'ts': ts, 'event_id': event_id, 'value': value}).ts AS DATE) AS last_day
FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-20 00:00:00'
GROUP BY user_id
""",
)
def last_value_before_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregate, no window: max of (ts, id, value) structs picks the
    latest row's value atomically — the scan-free form of W4."""
    import datetime as dt

    cutoff_us = int(
        dt.datetime(2024, 1, 20, tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    ev = table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("ts_us") < cutoff_us)
    )
    packed = F.max(F.struct("ts_us", "event_id", "value"))
    return ev.groupBy("user_id").agg(
        packed["value"].alias("last_value"),
        us_to_day(packed["ts_us"]).alias("last_day"),
    )
