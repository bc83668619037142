"""Sketches, anomaly windows, geo functions, external-table round-trips —
gate queries for the remaining SURVEY.md §2 function packages."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greptimedb_spark.functions import anomaly as A
from greptimedb_spark.functions import geo as G
from greptimedb_spark.functions import sketch as SK
from greptimedb_spark.queries import QuerySpec, read

# Fixture oracle path derived from this file so any checkout location works.
_FIXDIR = os.path.normpath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests", "fixtures"))
_Q84_FIXTURE = os.path.join(_FIXDIR, "oracle_q84_sf001.parquet")
_Q81_FIXTURE = os.path.join(_FIXDIR, "oracle_q81_sf001.parquet")


# -- q80: count_hash (exact-equivalent: count distinct of hashed tuples) ---------

def q80_count_hash(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    return e.groupBy("event_type").agg(
        SK.count_hash("user_id").alias("nd_users"),
        SK.count_hash("user_id", "event_id").alias("nd_pairs"),
    )


Q80_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS nd_users,
       COUNT(DISTINCT (user_id, event_id)) AS nd_pairs
FROM events GROUP BY event_type
"""


# -- q81: HLL sketch state + merge. The estimates come out of Spark's Apache
# DataSketches HLL bits, which cannot be independently re-derived in DuckDB —
# so the oracle is a SELF-generated fixture (tools/gen_q81_self_fixture.py):
# a REGRESSION PIN against silent breakage, NOT an independent oracle.
# Determinism: HLL registers are max-based, so the per-type state, the union,
# and the estimates are row-order-insensitive pure functions of the input.

def q81_hll_sketch(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    # two cardinality regimes: user_id (small, exact-register range) and
    # event_id (thousands — the estimator's approximate range, where the pin
    # is sensitive to register width / lgK drift)
    states = e.groupBy("event_type").agg(
        SK.hll("user_id").alias("su"), SK.hll("event_id").alias("se"))
    per_type = states.select(
        "event_type",
        SK.hll_count(F.col("su")).alias("est_users"),
        SK.hll_count(F.col("se")).alias("est_events"))
    merged = states.agg(
        SK.hll_count(SK.hll_merge("su")).alias("est_users"),
        SK.hll_count(SK.hll_merge("se")).alias("est_events"),
    ).select(F.lit("__merged__").alias("event_type"), "est_users", "est_events")
    return per_type.unionAll(merged)


# -- q82: anomaly z-score over trailing window --------------------------------------

def q82_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    ).rowsBetween(-20, 0)
    scored = e.withColumn("score", A.anomaly_score_zscore("value", w))
    return scored.groupBy("user_id").agg(
        F.round(F.max("score"), 4).alias("max_score"),
        F.round(F.avg("score"), 4).alias("avg_score"),
    ).filter(F.col("user_id") % 10 == 0)


Q82_SQL = """
WITH scored AS (
  SELECT user_id,
         CASE WHEN STDDEV_POP(value) OVER w > 0
              THEN ABS(value - AVG(value) OVER w) / (STDDEV_POP(value) OVER w)
              ELSE 0.0 END AS score
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
)
SELECT user_id, ROUND(MAX(score), 4) AS max_score, ROUND(AVG(score), 4) AS avg_score
FROM scored WHERE user_id % 10 = 0
GROUP BY user_id
"""


# -- q83: st_distance haversine -----------------------------------------------------

def q83_st_distance(spark: SparkSession, sf: str) -> DataFrame:
    c = read(spark, sf, "customer")
    lat = (F.col("c_custkey") % 180 - 90).cast("double") * 0.9
    lng = (F.col("c_nationkey") * 14 % 360 - 180).cast("double") * 0.9
    return c.select(
        "c_custkey",
        F.round(G.st_distance(lat, lng, F.lit(0.0), F.lit(0.0)) / 1000.0, 3).alias("km_to_origin"),
    ).filter(F.col("c_custkey") % 40 == 0)


Q83_SQL = """
WITH pts AS (
  SELECT c_custkey,
         CAST(c_custkey % 180 - 90 AS DOUBLE) * 0.9 AS lat,
         CAST((c_nationkey * 14) % 360 - 180 AS DOUBLE) * 0.9 AS lng
  FROM customer WHERE c_custkey % 40 = 0
)
SELECT c_custkey,
       ROUND(6371008.8 * 2 * ASIN(SQRT(
         POW(SIN(RADIANS(0 - lat) / 2), 2) +
         COS(RADIANS(lat)) * COS(RADIANS(0)) * POW(SIN(RADIANS(0 - lng) / 2), 2)
       )) / 1000.0, 3) AS km_to_origin
FROM pts
"""


# -- q84: geohash + trajectory. DuckDB has no geohash, so the oracle is a
# committed fixture from an independent Python geohash + path derivation
# (tools/gen_oracle_fixtures.gen_q84). The path columns come from DECODING
# json_encode_path's output (from_json round-trip — shortest-repr doubles
# survive exactly), so both encode and decode are under test.

def q84_geohash_path(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    lat = (F.col("user_id") % 180 - 90).cast("double") * 0.9
    lng = (F.col("value") * 36 % 360 - 180).cast("double")
    pts = e.select("user_id", "ts", lat.alias("lat"), lng.alias("lng"))
    decoded = F.from_json(
        G.json_encode_path("lat", "lng", "ts"), "array<array<double>>")
    return pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.substring(F.min(G.geohash(F.col("lat"), F.col("lng"), 6)), 1, 6).alias("min_gh"),
        F.round(F.element_at(F.element_at(decoded, 1), 1), 6).alias("first_lng"),
        F.round(F.element_at(F.element_at(decoded, -1), 2), 6).alias("last_lat"),
    ).filter(F.col("user_id") % 25 == 0)


# -- q85: external CSV table round-trip ----------------------------------------------

def q85_external_csv(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import copy_table_to, external_table

    n = read(spark, sf, "nation")
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ext", "nation_csv")
    copy_table_to(n, path, fmt="csv")
    back = external_table(
        spark, path, fmt="csv",
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


Q85_SQL = """
SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
FROM nation GROUP BY n_regionkey
"""


# -- q86: external JSON round-trip -----------------------------------------------------

def q86_external_json(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import copy_table_to, external_table

    r = read(spark, sf, "region")
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ext", "region_json")
    copy_table_to(r, path, fmt="json")
    back = external_table(spark, path, fmt="json", schema="r_regionkey int, r_name string")
    return back.select("r_regionkey", "r_name")


Q86_SQL = "SELECT r_regionkey, r_name FROM region"


QUERIES = {
    "q80_count_hash": QuerySpec(q80_count_hash, Q80_SQL, "count_hash ≡ count distinct"),
    "q81_hll_sketch": QuerySpec(
        q81_hll_sketch,
        "SELECT * FROM read_parquet('{}')".format(_Q81_FIXTURE),
        "HLL state+merge+estimate (SELF-oracle regression pin — "
        "datasketches bits are not independently derivable)"),
    "q82_anomaly_zscore": QuerySpec(q82_anomaly_zscore, Q82_SQL, "z-score window anomaly"),
    "q83_st_distance": QuerySpec(q83_st_distance, Q83_SQL, "haversine distance"),
    "q84_geohash_path": QuerySpec(
        q84_geohash_path,
        "SELECT * FROM read_parquet('{}')".format(_Q84_FIXTURE),
        "geohash + geo_path round-trip (fixture oracle)"),
    "q85_external_csv": QuerySpec(q85_external_csv, Q85_SQL, "COPY TO csv + external table"),
    "q86_external_json": QuerySpec(q86_external_json, Q86_SQL, "COPY TO json + external table"),
}
