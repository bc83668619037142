"""Window frames, value window functions, date/time battery, array/string/bit/
bool aggregates, TABLESAMPLE, catalog merge semantics, vector aggregates —
rounding out the SURVEY.md §2 inventory in the driver gate."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greptimedb_spark.queries import QuerySpec, read


# -- q16: RANGE window frames over event time (reference window_frames.sql) ------

def q16_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    o = read(spark, sf, "orders")
    sec = F.unix_seconds(F.col("o_orderdate").cast("timestamp"))
    w30d = Window.partitionBy("o_custkey").orderBy(sec.asc()).rangeBetween(-30 * 86400, 0)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.count(F.lit(1)).over(w30d).alias("orders_30d"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w30d), 2)
            .cast("double")
            .alias("spend_30d"),
        )
        .filter(F.col("o_custkey") % 25 == 0)
    )


Q16_SQL = """
SELECT o_custkey, o_orderkey,
       COUNT(*) OVER w AS orders_30d,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE) AS spend_30d
FROM orders
WHERE o_custkey % 25 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate) ASC
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
"""


# -- q17: percent_rank / cume_dist / nth_value (value_functions.sql) ---------------

def q17_percent_functions(spark: SparkSession, sf: str) -> DataFrame:
    s = read(spark, sf, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        # coalesce: single-row partitions yield NULL, which pandas would float64
        F.coalesce(F.nth_value("s_suppkey", 2).over(wf), F.lit(-1)).alias("second_supp"),
        F.first("s_suppkey").over(wf).alias("first_supp"),
        F.last("s_suppkey").over(wf).alias("last_supp"),
    )


Q17_SQL = """
SELECT s_suppkey, s_nationkey,
       ROUND(PERCENT_RANK() OVER w, 6) AS prk,
       ROUND(CUME_DIST() OVER w, 6) AS cd,
       COALESCE(NTH_VALUE(s_suppkey, 2) OVER wf, -1) AS second_supp,
       FIRST_VALUE(s_suppkey) OVER wf AS first_supp,
       LAST_VALUE(s_suppkey) OVER wf AS last_supp
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC),
       wf AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# -- q18: array_agg / string_agg / bit & bool aggregates ----------------------------

def q18_collect_aggs(spark: SparkSession, sf: str) -> DataFrame:
    n = read(spark, sf, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("names_csv"),
        F.size(F.collect_set("n_name")).alias("n_distinct"),
        F.expr("bit_and(n_nationkey)").alias("band"),
        F.expr("bit_or(n_nationkey)").alias("bor"),
        F.expr("bit_xor(n_nationkey)").alias("bxor"),
        F.expr("bool_and(n_nationkey >= 0)").alias("all_nonneg"),
        F.expr("bool_or(n_nationkey > 20)").alias("any_gt20"),
    )


Q18_SQL = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS names_csv,
       CAST(COUNT(DISTINCT n_name) AS INTEGER) AS n_distinct,
       bit_and(n_nationkey) AS band,
       bit_or(n_nationkey) AS bor,
       bit_xor(n_nationkey) AS bxor,
       bool_and(n_nationkey >= 0) AS all_nonneg,
       bool_or(n_nationkey > 20) AS any_gt20
FROM nation GROUP BY n_regionkey
"""


# -- q19: date/time function battery (reference common/types/date + date fns) --------

def q19_date_battery(spark: SparkSession, sf: str) -> DataFrame:
    o = read(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        (F.dayofweek(d) - 1).alias("dow"),  # Spark 1=Sunday → 0=Sunday
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("q"),
        # emit as TIMESTAMP, not DATE: both engines' timestamp path is proven
        # hash-stable with the driver; date32↔pandas conversion is not
        F.last_day(d).cast("timestamp").alias("eom"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("plus30"),
        F.unix_seconds(d.cast("timestamp")).alias("epoch_s"),
    ).filter(F.col("o_orderkey") % 100 == 0)


Q19_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders WHERE o_orderkey % 100 = 0
"""


# -- q28: catalog merge semantics (last-row upsert) -----------------------------------

def q28_catalog_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Write events twice into a merge-mode table (second write doubles the
    value); the deduped view must equal the doubled data — the reference's
    LastRow upsert (src/mito2/src/read/dedup.rs) as a checkable query."""
    from greptimedb_spark.catalog import Catalog, TableMeta

    e = read(spark, sf, "events").select("event_id", "ts", "value")
    base = os.path.join(tempfile.gettempdir(), "spark_graft_cat")
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    cat = Catalog(spark, base)
    cat.create_table(TableMeta(name="ev", time_index="ts", tags=["event_id"]))
    cat.insert("ev", e)
    cat.insert("ev", e.withColumn("value", F.col("value") * 2))
    merged = cat.read("ev")
    return merged.select(
        "event_id", F.round("value", 4).alias("value")
    ).filter(F.col("event_id") % 20 == 0)


Q28_SQL = """
SELECT event_id, ROUND(value * 2, 4) AS value
FROM events WHERE event_id % 20 = 0
"""


# -- q28b: last_non_null merge mode -----------------------------------------------------

def q28b_catalog_lastnonnull(spark: SparkSession, sf: str) -> DataFrame:
    """Second write nulls the value for odd event_ids and doubles it for even
    ones; LastNonNull must keep the ORIGINAL value where the overwrite is null
    (reference LastNonNull reader, src/mito2/src/read/dedup.rs)."""
    from greptimedb_spark.catalog import Catalog, TableMeta

    e = read(spark, sf, "events").select("event_id", "ts", "value")
    base = os.path.join(tempfile.gettempdir(), "spark_graft_cat2")
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    cat = Catalog(spark, base)
    cat.create_table(
        TableMeta(name="ev", time_index="ts", tags=["event_id"], merge_mode="last_non_null")
    )
    cat.insert("ev", e)
    cat.insert(
        "ev",
        e.withColumn(
            "value",
            F.when(F.col("event_id") % 2 == 0, F.col("value") * 2),
        ),
    )
    merged = cat.read("ev")
    return merged.select(
        "event_id", F.round("value", 4).alias("value")
    ).filter(F.col("event_id") % 5 == 0)


Q28B_SQL = """
SELECT event_id,
       ROUND(CASE WHEN event_id % 2 = 0 THEN value * 2 ELSE value END, 4) AS value
FROM events WHERE event_id % 5 = 0
"""


# -- q29: TABLESAMPLE (seeded; sampling differs per engine → rows-only) ----------------

def q29_tablesample(spark: SparkSession, sf: str) -> DataFrame:
    l = read(spark, sf, "lineitem")
    return l.sample(fraction=0.1, seed=42).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


# -- q29b: deterministic hash sampling (the reproducible TABLESAMPLE) ------------------
# Training-data pipelines need samples that are REPRODUCIBLE across engines,
# runs and partitionings — engine-RNG TABLESAMPLE (q29) is not. The hash
# sample keeps a row iff the first 16 bits of md5(key) fall under the rate;
# per-stratum counts make it a stratified-sampling primitive. Exactly
# oracle-able (md5 is engine-independent).

def q29b_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    l = read(spark, sf, "lineitem")
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")), 1, 4),
        16, 10,
    ).cast("long")
    kept = l.filter(bucket < int(0.1 * 65536))
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("l_orderkey").alias("first_key"),
    )


Q29B_SQL = """
SELECT l_returnflag, COUNT(*) AS n_sampled, MIN(l_orderkey) AS first_key
FROM lineitem
WHERE CAST(('0x' || substr(md5(l_orderkey || '|' || l_linenumber), 1, 4)) AS INT) < 6553
GROUP BY l_returnflag
"""


# -- q44: elementwise vector aggregate (aggrs/vector/{sum,avg}.rs) ---------------------

def q44_vec_agg(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.functions.vector import vec_sum_agg

    e = read(spark, sf, "embeddings")
    summed = e.groupBy("label").agg(vec_sum_agg("embedding").alias("vsum"), F.count(F.lit(1)).alias("n"))
    return summed.select(
        "label",
        "n",
        F.round(F.aggregate("vsum", F.lit(0.0), lambda a, x: a + x), 4).alias("total"),
        F.round(F.element_at("vsum", 1), 5).alias("first_dim_sum"),
    )


Q44_SQL = """
WITH g AS (
  SELECT label, list(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vecs, COUNT(*) AS n
  FROM embeddings GROUP BY label
)
SELECT label, n,
       ROUND(list_aggregate(list_transform(vecs, v -> list_aggregate(v, 'sum')), 'sum'), 4) AS total,
       ROUND(list_aggregate(list_transform(vecs, v -> v[1]), 'sum'), 5) AS first_dim_sum
FROM g
"""


QUERIES = {
    "q16_window_frames": QuerySpec(q16_window_frames, Q16_SQL, "RANGE BETWEEN interval frames"),
    "q17_percent_functions": QuerySpec(q17_percent_functions, Q17_SQL, "percent_rank/cume_dist/nth_value"),
    "q18_collect_aggs": QuerySpec(q18_collect_aggs, Q18_SQL, "array/string/bit/bool aggs"),
    "q19_date_battery": QuerySpec(q19_date_battery, Q19_SQL, "date/time function battery"),
    "q28_catalog_merge": QuerySpec(q28_catalog_merge, Q28_SQL, "last-row upsert merge view"),
    "q28b_catalog_lastnonnull": QuerySpec(q28b_catalog_lastnonnull, Q28B_SQL, "last-non-null merge view"),
    "q29_tablesample": QuerySpec(q29_tablesample, None, "TABLESAMPLE (rows-only)"),
    "q29b_hash_sample": QuerySpec(
        q29b_hash_sample, Q29B_SQL, "deterministic md5 hash sample (stratified counts)"
    ),
    "q44_vec_agg": QuerySpec(q44_vec_agg, Q44_SQL, "elementwise vector sum aggregate"),
}
