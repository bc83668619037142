"""PromQL-surface queries over the events table (SURVEY.md §2.9).

The `events` stream doubles as a metric: value=value, tags=[event_type].
Grid: 2024-01-05 → 2024-01-08, step 6h. Window/lookback joins are expressed
in the DuckDB oracles via generate_series + interval joins — the same
(t-window, t] semantics the engine implements by step explosion.

rate/increase (extrapolation math) are verified by the Prometheus-conformant
golden tests in tests/test_promql.py and run rows-only here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greptimedb_spark.queries import QuerySpec, read

START = 1704412800000  # 2024-01-05T00:00:00Z
END = 1704672000000    # 2024-01-08T00:00:00Z
STEP = 21_600_000      # 6h


def _engine(spark: SparkSession, sf: str):
    from greptimedb_spark.promql import MetricTable, PromQLEngine

    e = read(spark, sf, "events")
    return PromQLEngine(spark, {"events_value": MetricTable(e, tags=["event_type"])})


def _out(df: DataFrame, round_to: int | None = 4) -> DataFrame:
    v = F.round("value", round_to) if round_to is not None else F.col("value")
    return df.select(
        (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms"),
        "event_type",
        v.alias("value"),
    )


# -- q60: count_over_time (RangeManipulate + count) ----------------------------

def q60_promql_count_over_time(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine(spark, sf)
    return _out(eng.evaluate("count_over_time(events_value[1d])", START, END, STEP), None)


Q60_SQL = """
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-08', INTERVAL 6 HOUR)) AS gts
)
SELECT CAST(epoch_ms(gts) AS BIGINT) AS ts_ms, event_type, CAST(COUNT(*) AS DOUBLE) AS value
FROM grid JOIN events ON ts > gts - INTERVAL 24 HOUR AND ts <= gts
GROUP BY 1, 2
"""


# -- q61: sum_over_time --------------------------------------------------------

def q61_promql_sum_over_time(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine(spark, sf)
    return _out(eng.evaluate("sum_over_time(events_value[6h])", START, END, STEP))


Q61_SQL = """
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-08', INTERVAL 6 HOUR)) AS gts
)
SELECT CAST(epoch_ms(gts) AS BIGINT) AS ts_ms, event_type, ROUND(SUM(value), 4) AS value
FROM grid JOIN events ON ts > gts - INTERVAL 6 HOUR AND ts <= gts
GROUP BY 1, 2
"""


# -- q62: instant selector with lookback (InstantManipulate) --------------------

def q62_promql_instant(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine(spark, sf)
    return _out(eng.evaluate("events_value", START, END, STEP))


# lookback = 5m default; arg_max picks the latest sample in (t-5m, t]
Q62_SQL = """
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-08', INTERVAL 6 HOUR)) AS gts
)
SELECT CAST(epoch_ms(gts) AS BIGINT) AS ts_ms, event_type,
       ROUND(arg_max(value, ts), 4) AS value
FROM grid JOIN events ON ts > gts - INTERVAL 5 MINUTE AND ts <= gts
GROUP BY 1, 2
"""


# -- q63: aggregation + topk over the instant vector ----------------------------

def q63_promql_topk(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine(spark, sf)
    return _out(eng.evaluate("topk(2, count_over_time(events_value[1d]))", START, END, STEP), None)


Q63_SQL = """
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-08', INTERVAL 6 HOUR)) AS gts
), cnt AS (
  SELECT CAST(epoch_ms(gts) AS BIGINT) AS ts_ms, event_type, CAST(COUNT(*) AS DOUBLE) AS value
  FROM grid JOIN events ON ts > gts - INTERVAL 24 HOUR AND ts <= gts
  GROUP BY 1, 2
)
SELECT ts_ms, event_type, value
FROM cnt
QUALIFY ROW_NUMBER() OVER (PARTITION BY ts_ms ORDER BY value DESC, event_type DESC) <= 2
"""


# -- q64: binary op between two instant vectors ----------------------------------

def q64_promql_binary(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine(spark, sf)
    df = eng.evaluate(
        'avg_over_time(events_value{event_type="click"}[1d])'
        ' / on () avg_over_time(events_value{event_type="view"}[1d])',
        START, END, STEP,
    )
    return df.select(
        (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms"),
        F.round("value", 6).alias("value"),
    )


Q64_SQL = """
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-08', INTERVAL 6 HOUR)) AS gts
), a AS (
  SELECT CAST(epoch_ms(gts) AS BIGINT) AS ts_ms, AVG(value) AS v
  FROM grid JOIN events ON ts > gts - INTERVAL 24 HOUR AND ts <= gts AND event_type = 'click'
  GROUP BY 1
), b AS (
  SELECT CAST(epoch_ms(gts) AS BIGINT) AS ts_ms, AVG(value) AS v
  FROM grid JOIN events ON ts > gts - INTERVAL 24 HOUR AND ts <= gts AND event_type = 'view'
  GROUP BY 1
)
SELECT a.ts_ms, ROUND(a.v / b.v, 6) AS value
FROM a JOIN b USING (ts_ms)
"""


# -- q65: rate with Prometheus extrapolation ------------------------------------
# The extrapolation formula (src/promql/src/functions/extrapolate_rate.rs:
# 244-281) is plain arithmetic, so the DuckDB oracle reimplements it directly:
# per-series running counter-reset correction, then per (grid step, series)
# first/last sample stats and the boundary-extrapolation factor, evaluated in
# the same IEEE-754 operation order as the Spark column expressions.

def q65_promql_rate(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine(spark, sf)
    return _out(eng.evaluate("rate(events_value[1d])", START, END, STEP), 6)


Q65_SQL = """
WITH grid AS (
  SELECT CAST(epoch_ms(unnest(generate_series(
           TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-08', INTERVAL 6 HOUR))) AS BIGINT) AS t
), lagged AS (
  SELECT event_type, ts, CAST(epoch_us(ts) // 1000 AS BIGINT) AS x, value AS v,
         lag(value) OVER (PARTITION BY event_type ORDER BY ts) AS prev_v
  FROM events
), o AS (
  SELECT event_type, x, v,
         SUM(CASE WHEN v < prev_v THEN prev_v ELSE 0 END)
             OVER (PARTITION BY event_type ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_corr
  FROM lagged
), wnd AS (
  SELECT t, event_type,
         COUNT(*) AS n,
         CAST(MIN(x) AS DOUBLE) AS first_ts, CAST(MAX(x) AS DOUBLE) AS last_ts,
         arg_min(v, x) AS first_val, arg_max(v, x) AS last_val,
         arg_max(cum_corr, x) - arg_min(cum_corr, x) AS corr
  FROM grid JOIN o ON o.x > t - 86400000 AND o.x <= t
  GROUP BY 1, 2
), calc AS (
  SELECT t, event_type, n,
         last_val - first_val + corr AS result,
         last_ts - first_ts AS sampled,
         (last_ts - first_ts) / (n - 1) AS avg_int,
         first_ts - (t - 86400000) AS dur_start0,
         t - last_ts AS dur_end,
         (last_ts - first_ts) * (first_val / (last_val - first_val + corr)) AS dur_zero,
         first_val
  FROM wnd WHERE n >= 2
), ext AS (
  SELECT t, event_type, result, sampled,
         sampled
         + (CASE WHEN (CASE WHEN result > 0 AND first_val >= 0 AND dur_zero < dur_start0
                            THEN dur_zero ELSE dur_start0 END) < avg_int * 1.1
                 THEN (CASE WHEN result > 0 AND first_val >= 0 AND dur_zero < dur_start0
                            THEN dur_zero ELSE dur_start0 END)
                 ELSE avg_int / 2 END)
         + (CASE WHEN dur_end < avg_int * 1.1 THEN dur_end ELSE avg_int / 2 END) AS extended
  FROM calc
)
SELECT t AS ts_ms, event_type,
       ROUND(result * ((extended / sampled) / 86400.0), 6) AS value
FROM ext
"""


# -- q113: group_right with include-label copy ----------------------------------
# N:1 vector matching where the ONE side's include label OVERWRITES the many
# side's value of the same label (prometheus vector-matching contract; the
# reference planner's group_left/right include handling in
# src/query/src/promql/planner.rs). Two views of events: the many side
# carries bucket='per_type' per event_type, the one side a single
# bucket='all' series — the result must carry bucket='all' on every row.

def q113_promql_group_right(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.promql import MetricTable, PromQLEngine

    e = read(spark, sf, "events")
    eng = PromQLEngine(spark, {
        "events_value": MetricTable(
            e.withColumn("bucket", F.lit("per_type")),
            tags=["event_type", "bucket"]),
        "events_total": MetricTable(
            e.withColumn("bucket", F.lit("all")), tags=["bucket"]),
    })
    df = eng.evaluate(
        "avg_over_time(events_total[1d])"
        " / on () group_right (bucket) avg_over_time(events_value[1d])",
        START, END, STEP,
    )
    return df.select(
        (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms"),
        "event_type", "bucket",
        F.round("value", 6).alias("value"),
    )


Q113_SQL = """
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-08', INTERVAL 6 HOUR)) AS gts
), per_type AS (
  SELECT CAST(epoch_ms(gts) AS BIGINT) AS ts_ms, event_type, AVG(value) AS v
  FROM grid JOIN events ON ts > gts - INTERVAL 24 HOUR AND ts <= gts
  GROUP BY 1, 2
), total AS (
  SELECT CAST(epoch_ms(gts) AS BIGINT) AS ts_ms, AVG(value) AS v
  FROM grid JOIN events ON ts > gts - INTERVAL 24 HOUR AND ts <= gts
  GROUP BY 1
)
SELECT p.ts_ms, p.event_type, 'all' AS bucket, ROUND(t.v / p.v, 6) AS value
FROM per_type p JOIN total t USING (ts_ms)
"""


QUERIES = {
    "q60_promql_count_over_time": QuerySpec(q60_promql_count_over_time, Q60_SQL, "count_over_time grid"),
    "q61_promql_sum_over_time": QuerySpec(q61_promql_sum_over_time, Q61_SQL, "sum_over_time grid"),
    "q62_promql_instant": QuerySpec(q62_promql_instant, Q62_SQL, "instant selector + lookback"),
    "q63_promql_topk": QuerySpec(q63_promql_topk, Q63_SQL, "topk over count vector"),
    "q64_promql_binary": QuerySpec(q64_promql_binary, Q64_SQL, "vector/vector binary op"),
    "q65_promql_rate": QuerySpec(q65_promql_rate, Q65_SQL, "rate w/ extrapolation"),
    "q113_promql_group_right": QuerySpec(
        q113_promql_group_right, Q113_SQL,
        "N:1 group_right with include-label overwrite"),
}
