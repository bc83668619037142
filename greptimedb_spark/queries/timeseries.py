"""Time-series operator surface on the `events` table (SURVEY.md §2.1/2.6/2.10).

Covers: time-bucket aggregation (TSBS double-groupby shape), last-row-per-series
(lastpoint), counter rate via lag, RANGE tumbling + sliding windows, top-k per
bucket, and gap-fill — each with a DuckDB oracle.

Timestamps are emitted as epoch-ms BIGINT (`bucket_ms`) because the events
parquet stores ns-precision timestamps which Spark truncates to µs while DuckDB
keeps ns — bigints sidestep reader precision skew in the value-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greptimedb_spark.queries import QuerySpec, read, table_view
from greptimedb_spark.range_query import RangeAgg, range_select


def _bucket_ms(col: str = "ts", unit: str = "hour") -> F.Column:
    return (F.unix_micros(F.date_trunc(unit, F.col(col))) / 1000).cast("long")


# -- q20: time-bucketed multi-agg (TSBS double-groupby analog) ----------------

def q20_time_bucket_agg(spark: SparkSession, sf: str) -> DataFrame:
    # Single SQL statement over the registered view (r11: one Catalyst
    # analysis per build). No spread: avg(value) over doubles is summation-
    # order-dependent, so the serial-scan fold order must be preserved.
    v = table_view(spark, sf, "events")
    return spark.sql(f"""
SELECT CAST(unix_micros(date_trunc('hour', ts)) / 1000 AS BIGINT) AS bucket_ms,
       event_type,
       COUNT(1) AS n,
       ROUND(AVG(value), 4) AS avg_value,
       ROUND(MAX(value), 4) AS max_value,
       ROUND(MIN(value), 4) AS min_value
FROM {v}
GROUP BY bucket_ms, event_type
""")


Q20_SQL = """
SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS bucket_ms, event_type,
       COUNT(*) AS n,
       ROUND(AVG(value), 4) AS avg_value,
       ROUND(MAX(value), 4) AS max_value,
       ROUND(MIN(value), 4) AS min_value
FROM events
GROUP BY 1, 2
"""


# -- q21: lastpoint — newest row per series (§2.1 last-row selector) ----------

def q21_lastpoint(spark: SparkSession, sf: str) -> DataFrame:
    # max_by over a (ts, event_id) struct: a hash aggregate with map-side
    # partial combine — one shuffle of one row per series, no per-partition
    # sort (beats window row_number()=1; TSBS lastpoint class,
    # docs/benchmarks/tsbs/v0.12.0.md:33)
    v = table_view(spark, sf, "events")
    return spark.sql(f"""
SELECT user_id,
       __last.event_id AS last_event_id,
       __last.event_type AS last_type,
       ROUND(__last.value, 4) AS last_value
FROM (
  SELECT user_id,
         max_by(struct(event_id, event_type, value), struct(ts, event_id)) AS __last
  FROM {v}
  GROUP BY user_id
)
""")


Q21_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       ROUND(value, 4) AS last_value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


# -- q22: counter rate between consecutive rows (reference rate fn, §2.8 math)

def q22_rate(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    ts_s = F.unix_micros(F.col("ts")) / 1e6
    prev_v = F.lag("value").over(w)
    prev_t = F.lag(ts_s).over(w)
    rate = (F.col("value") - prev_v) / (ts_s - prev_t)
    return (
        e.withColumn("rate", rate)
        .filter(F.col("rate").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_deltas"),
            F.round(F.avg("rate"), 6).alias("avg_rate"),
        )
        .filter(F.col("user_id") % 5 == 0)
    )


Q22_SQL = """
WITH d AS (
  SELECT user_id,
         (value - LAG(value) OVER w) / (epoch_us(ts)/1e6 - LAG(epoch_us(ts)/1e6) OVER w) AS rate
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, COUNT(*) AS n_deltas, ROUND(AVG(rate), 6) AS avg_rate
FROM d WHERE rate IS NOT NULL AND user_id % 5 = 0
GROUP BY user_id
"""


# -- q23: RANGE tumbling window through the range engine ----------------------

def q23_range_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    out = range_select(
        e, "ts",
        [
            RangeAgg("round(avg(value), 4)", "avg_value", 3_600_000),
            RangeAgg("count(value)", "n", 3_600_000),
        ],
        align="1h",
        by=["event_type"],
    )
    return out.select(
        (F.unix_micros("ts") / 1000).cast("long").alias("bucket_ms"),
        "event_type", "avg_value", "n",
    )


Q23_SQL = """
SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS bucket_ms, event_type,
       ROUND(AVG(value), 4) AS avg_value, COUNT(value) AS n
FROM events
GROUP BY 1, 2
"""


# -- q24: RANGE sliding window (range 2h, align 1h) ---------------------------

def q24_range_sliding(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    out = range_select(
        e, "ts",
        [RangeAgg("round(sum(value), 2)", "sum_value", 7_200_000),
         RangeAgg("count(value)", "n", 7_200_000)],
        align="1h",
        by=["event_type"],
    )
    return out.select(
        (F.unix_micros("ts") / 1000).cast("long").alias("bucket_ms"),
        "event_type", "sum_value", "n",
    )


# Oracle: step t covers [t, t+2h) ⇒ a row at x hits steps floor(x) and floor(x)-1h.
Q24_SQL = """
WITH x AS (
  SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS h, event_type, value FROM events
), steps AS (
  SELECT h AS step, event_type, value FROM x
  UNION ALL
  SELECT h - 3600000 AS step, event_type, value FROM x
)
SELECT step AS bucket_ms, event_type, ROUND(SUM(value), 2) AS sum_value, COUNT(value) AS n
FROM steps GROUP BY 1, 2
"""


# -- q25: top-k per time bucket (PromQL topk shape, §2.6) ---------------------

def q25_topk_per_bucket(spark: SparkSession, sf: str) -> DataFrame:
    # Single SQL statement over the registered view (r11). No spread:
    # sum(value) over doubles keeps the serial-scan fold order.
    v = table_view(spark, sf, "events")
    return spark.sql(f"""
SELECT bucket_ms, user_id, user_sum, rk
FROM (
  SELECT bucket_ms, user_id, user_sum,
         ROW_NUMBER() OVER (PARTITION BY bucket_ms ORDER BY user_sum DESC, user_id ASC) AS rk
  FROM (
    SELECT CAST(unix_micros(date_trunc('day', ts)) / 1000 AS BIGINT) AS bucket_ms,
           user_id,
           ROUND(SUM(value), 2) AS user_sum
    FROM {v}
    GROUP BY bucket_ms, user_id
  )
)
WHERE rk <= 3
""")


Q25_SQL = """
WITH day AS (
  SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS bucket_ms, user_id,
         ROUND(SUM(value), 2) AS user_sum
  FROM events GROUP BY 1, 2
)
SELECT bucket_ms, user_id, user_sum,
       ROW_NUMBER() OVER (PARTITION BY bucket_ms ORDER BY user_sum DESC, user_id ASC) AS rk
FROM day
QUALIFY rk <= 3
"""


# -- q26: gap-fill with FILL PREV over a sparse series ------------------------

def q26_gapfill_prev(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events").filter(F.col("event_type") == "purchase")
    out = range_select(
        e, "ts",
        [RangeAgg("round(max(value), 4)", "max_value", 21_600_000, fill="PREV")],
        align="6h",
        by=["event_type"],
    )
    return out.select(
        (F.unix_micros("ts") / 1000).cast("long").alias("bucket_ms"),
        "event_type", "max_value",
    )


# purchase events exist in every 6h bucket at sf0.01+, so FILL PREV is a no-op
# on the value but the query still exercises the engine's fill path; the oracle
# is the plain bucketed max.
Q26_SQL = """
SELECT CAST(epoch_ms(date_trunc('hour', ts) - INTERVAL (CAST(extract(hour FROM ts) AS INTEGER) % 6) HOUR) AS BIGINT) AS bucket_ms,
       event_type, ROUND(MAX(value), 4) AS max_value
FROM events WHERE event_type = 'purchase'
GROUP BY 1, 2
"""


# -- q27: session-window analog — event counts by (user, day) with HAVING -----

def q27_active_users(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    per_day = e.groupBy(
        _bucket_ms(unit="day").alias("bucket_ms"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_day.filter(F.col("n_events") >= 3)
        .groupBy("bucket_ms")
        .agg(
            F.count(F.lit(1)).alias("n_active_users"),
            F.max("n_events").alias("max_events"),
        )
    )


Q27_SQL = """
WITH per_day AS (
  SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS bucket_ms, user_id,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT bucket_ms, COUNT(*) AS n_active_users, MAX(n_events) AS max_events
FROM per_day WHERE n_events >= 3
GROUP BY bucket_ms
"""


# -- q89: session windows (gap-based sessionization) --------------------------------
# Spark's session_window is the batch/streaming dual of the reference's flow
# tumble windows (SURVEY §2.11): merge a user's events into sessions closed
# by an 8h silence. The oracle derives the same islands with lag + a gap
# flag + a running session counter. session_window.start = first event;
# .end = last event + gap, so last_ms = end - gap.

def q89_session_window(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    gap_ms = 8 * 3600 * 1000
    return (
        e.groupBy(F.session_window("ts", "8 hours"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("session_start_ms"),
            (F.unix_millis(F.col("session_window.end")) - gap_ms).alias("last_ms"),
            "n_events",
        )
    )


Q89_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 8 HOUR OR
                   LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(epoch_ms(ts)) AS session_start_ms,
       MAX(epoch_ms(ts)) AS last_ms,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


QUERIES = {
    "q20_time_bucket_agg": QuerySpec(q20_time_bucket_agg, Q20_SQL, "hourly multi-agg by type"),
    "q21_lastpoint": QuerySpec(q21_lastpoint, Q21_SQL, "newest row per series"),
    "q22_rate": QuerySpec(q22_rate, Q22_SQL, "counter rate via lag window"),
    "q23_range_tumbling": QuerySpec(q23_range_tumbling, Q23_SQL, "RANGE engine, tumbling"),
    "q24_range_sliding": QuerySpec(q24_range_sliding, Q24_SQL, "RANGE engine, sliding 2h/1h"),
    "q25_topk_per_bucket": QuerySpec(q25_topk_per_bucket, Q25_SQL, "top-k per bucket"),
    "q26_gapfill_prev": QuerySpec(q26_gapfill_prev, Q26_SQL, "RANGE FILL PREV"),
    "q27_active_users": QuerySpec(q27_active_users, Q27_SQL, "two-level time rollup"),
    "q89_session_window": QuerySpec(
        q89_session_window, Q89_SQL, "gap-based sessionization (session_window)"
    ),
}
