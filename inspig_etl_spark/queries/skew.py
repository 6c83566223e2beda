"""Skew-safe variants of hot-key joins and distinct aggregates
(operators/skew.py). Each query's RESULT is identical to the naive plan —
the salt/two-stage machinery is internal — so both run under the full
oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.rounding import dec_sum
from inspig_etl_spark.operators.skew import salted_join, two_stage_count_distinct
from inspig_etl_spark.queries import register


@register(
    "salted_brand_volume",
    operators="J3,A2 + operators/skew.salted_join (hot-key salt-replicated equi-join; scale path for skewed fact-dim joins)",
    oracle="""
SELECT p_brand,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10
GROUP BY p_brand
""",
)
def salted_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join through the salt kernel: lineitem rows spread over 8
    salt buckets, part replicated 8-fold. Same result as the plain join —
    the point is the shuffle layout, provably unchanged output."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, part, on=["l_partkey"], n_salts=8)
    return joined.groupBy("p_brand").agg(
        dec_sum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "distinct_users_per_type_skewsafe",
    operators="A2,A19 + operators/skew.two_stage_count_distinct (exact skew-proof COUNT DISTINCT)",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
""",
)
def distinct_users_per_type_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via dedup-then-count: the shuffle
    carries unique (type, user) pairs — map-side combined — never the raw
    event stream, so one hot event type cannot pin a reducer."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    return two_stage_count_distinct(ev, ["event_type"], "user_id", alias="n_users")
