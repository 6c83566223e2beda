"""Geo queries (SURVEY.md §2.3 J11, §2.8 X15/X16).

Synthetic coordinates: farms (customers) and weather stations (suppliers)
get deterministic lat/lon inside the Korean peninsula's bounding box,
derived from their keys — the same formula in Spark and the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.geo import (
    EARTH_RADIUS_KM,
    a_to_km,
    haversine_a,
    lambert_grid,
    sql_haversine_a,
    sql_lambert_grid,
)
from inspig_etl_spark.queries import register

# Deterministic coordinate synthesis (lat 33..38, lon 126..129.5).
_SQL_FARM = """
farms AS (
  SELECT c_custkey AS farm_no,
         33.0 + (c_custkey % 500) / 100.0 AS lat,
         126.0 + ((c_custkey * 7) % 350) / 100.0 AS lon
  FROM customer
)"""
_SQL_STATION = """
stations AS (
  SELECT s_suppkey AS stn_id,
         33.0 + (s_suppkey * 13 % 500) / 100.0 AS lat,
         126.0 + (s_suppkey * 31 % 350) / 100.0 AS lon
  FROM supplier
)"""


def _farms(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("farm_no"),
        (33.0 + (F.col("c_custkey") % 500) / 100.0).alias("lat"),
        (126.0 + ((F.col("c_custkey") * 7) % 350) / 100.0).alias("lon"),
    )


def _stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("stn_id"),
        (33.0 + (F.col("s_suppkey") * 13 % 500) / 100.0).alias("lat"),
        (126.0 + (F.col("s_suppkey") * 31 % 350) / 100.0).alias("lon"),
    )


@register(
    "nearest_station_haversine",
    operators="J11,X15 (broadcast cross join + Haversine + min-struct nearest; ref weather.py:142-148,213-276)",
    oracle=f"""
WITH {_SQL_FARM}, {_SQL_STATION},
d AS (
  SELECT farm_no, stn_id,
         CAST(FLOOR({sql_haversine_a('farms.lat', 'farms.lon', 'stations.lat', 'stations.lon')} * 1e12) AS BIGINT) AS a
  FROM farms CROSS JOIN stations
),
best AS (
  SELECT farm_no, MIN({{'a': a, 'stn': stn_id}}) AS b FROM d GROUP BY farm_no
)
SELECT farm_no, b.stn AS nearest_stn,
       ROUND(2 * {EARTH_RADIUS_KM} * asin(sqrt(b.a / 1e12)), 4) AS dist_km
FROM best
""",
)
def nearest_station_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each farm's nearest ASOS station.

    Three scale/parity choices: (1) candidates are ranked on the monotone
    haversine PARAMETER (no asin/sqrt per pair; only the winner converts to
    km); (2) the rank key is integer-quantized (floor(a*1e12), pure double
    math — a per-pair decimal ROUND measured 3x slower) with station-id
    tiebreak so sub-ulp libm differences between engines can't flip the
    order on symmetric exact-tie layouts; (3) the nearest pick is a
    ``min(struct)`` AGGREGATE, not a row_number window — partial
    aggregation collapses the |farms| x |stations| pairs map-side, so the
    shuffle carries one row per farm instead of one per pair."""
    # The farm table arrives in O(file-size) partitions, but the cross join
    # fans each row out |stations|-fold — without a repartition the whole
    # |farms|x|stations| evaluation lands on the handful of scan tasks.
    # Spreading the SMALL side before the fan-out costs a tiny shuffle and
    # buys full-cluster parallelism at any scale.
    farms = _farms(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    stations = _stations(spark, sf_dir)
    a = F.floor(
        haversine_a(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")) * 1e12
    ).cast("long")
    d = farms.crossJoin(F.broadcast(stations.select(
        "stn_id", F.col("lat").alias("s_lat"), F.col("lon").alias("s_lon")
    ))).select("farm_no", a.alias("a"), "stn_id")
    best = d.groupBy("farm_no").agg(F.min(F.struct("a", "stn_id")).alias("b"))
    return best.select(
        "farm_no",
        F.col("b.stn_id").alias("nearest_stn"),
        F.round(a_to_km(F.col("b.a") / 1e12), 4).alias("dist_km"),
    )


_NX, _NY = sql_lambert_grid("lat", "lon")


@register(
    "lambert_grid_cells",
    operators="X16,A19 (Lambert lat/lon->KMA grid + distinct-grid dedup; ref weather.py:279-326,1239-1282)",
    oracle=f"""
WITH {_SQL_FARM}
SELECT {_NX} AS nx, {_NY} AS ny, COUNT(*) AS farm_cnt
FROM farms
GROUP BY 1, 2
""",
)
def lambert_grid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farms mapped onto the KMA 5 km grid and deduped to cells — the
    reference's many-farms-one-grid fan-in before its weather API calls."""
    farms = _farms(spark, sf_dir)
    nx, ny = lambert_grid(F.col("lat"), F.col("lon"))
    return farms.groupBy(nx.alias("nx"), ny.alias("ny")).agg(
        F.count(F.lit(1)).alias("farm_cnt")
    )
