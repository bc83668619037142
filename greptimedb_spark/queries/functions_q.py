"""Function-package queries (SURVEY.md §2.8) with DuckDB oracles.

Each query exercises one function family end-to-end on the driver tables so
the correctness gate covers JSON, full-text, text-analysis, vector, IP and
clamp/math functions — not just the relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greptimedb_spark.functions import ip as ipf
from greptimedb_spark.functions import json_fns as j
from greptimedb_spark.functions import math_fns as m
from greptimedb_spark.functions import text as t
from greptimedb_spark.functions import vector as v
from greptimedb_spark.queries import QuerySpec, read


# -- q30: JSON accessors on events.props --------------------------------------

def q30_json(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    return (
        e.withColumn("k", j.json_get_int("props", "$.k"))
        .filter(j.json_path_exists("props", "$.k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(j.json_get_bool(F.lit('{"b": true}'), "$.b"), 1)).alias("n_true_lit"),
        )
    )


Q30_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(*) AS n_true_lit
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
"""


# -- q31: string function battery ----------------------------------------------

def q31_string_fns(spark: SparkSession, sf: str) -> DataFrame:
    c = read(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.length("c_name").alias("name_len"),
        F.locate("0", F.col("c_name")).alias("pos_zero"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.format_string("%s#%d", F.col("c_mktsegment"), F.col("c_nationkey")).alias("seg_tag"),
        F.repeat(F.lit(" "), 3).alias("space3"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("joined"),
    ).filter(F.col("c_custkey") % 50 == 0)


Q31_SQL = """
SELECT c_custkey,
       UPPER(c_name) AS upper_name,
       LENGTH(c_name) AS name_len,
       CAST(COALESCE(NULLIF(INSTR(c_name, '0'), 0), 0) AS INTEGER) AS pos_zero,
       SUBSTRING(c_name, 1, 8) AS prefix8,
       printf('%s#%d', c_mktsegment, c_nationkey) AS seg_tag,
       REPEAT(' ', 3) AS space3,
       CONCAT_WS('-', c_mktsegment, c_name) AS joined
FROM customer WHERE c_custkey % 50 = 0
"""


# -- q32: clamp family -----------------------------------------------------------

def q32_clamp(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(F.avg(m.clamp("value", 2.0, 8.0)), 4).alias("avg_clamped"),
        F.round(F.avg(m.clamp_min("value", 5.0)), 4).alias("avg_clamped_min"),
        F.round(F.avg(m.clamp_max("value", 5.0)), 4).alias("avg_clamped_max"),
    )


Q32_SQL = """
SELECT event_type,
       ROUND(AVG(LEAST(GREATEST(value, 2.0), 8.0)), 4) AS avg_clamped,
       ROUND(AVG(GREATEST(value, 5.0)), 4) AS avg_clamped_min,
       ROUND(AVG(LEAST(value, 5.0)), 4) AS avg_clamped_max
FROM events GROUP BY event_type
"""


# -- q33: IP functions (IPs synthesized from user_id) -----------------------------

def q33_ip(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    ip_str = ipf.ipv4_num_to_string(F.col("user_id") * 2654435761 % 4294967296)
    df = e.select("event_id", ip_str.alias("ip"))
    return df.select(
        "event_id",
        "ip",
        ipf.ipv4_string_to_num("ip").alias("ip_num"),
        ipf.ipv4_to_cidr("ip", 16).alias("cidr16"),
        ipf.ipv4_in_range("ip", "128.0.0.0/1").alias("in_upper_half"),
    ).filter(F.col("event_id") % 20 == 0)


Q33_SQL = """
WITH base AS (
  SELECT event_id,
         CONCAT(CAST(FLOOR(n/16777216) % 256 AS BIGINT), '.', CAST(FLOOR(n/65536) % 256 AS BIGINT), '.',
                CAST(FLOOR(n/256) % 256 AS BIGINT), '.', CAST(n % 256 AS BIGINT)) AS ip, n
  FROM (SELECT event_id, (user_id * 2654435761) % 4294967296 AS n FROM events)
)
SELECT event_id, ip,
       CAST(n AS BIGINT) AS ip_num,
       CONCAT(CAST(FLOOR(n/16777216) % 256 AS BIGINT), '.', CAST(FLOOR(n/65536) % 256 AS BIGINT), '.0.0/16') AS cidr16,
       n >= 2147483648 AS in_upper_half
FROM base WHERE event_id % 20 = 0
"""


# -- q34: vector math on embeddings ------------------------------------------------

def q34_vector_math(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        v.vec_dim("embedding").alias("dim"),
        F.round(v.vec_norm("embedding"), 5).alias("norm"),
        F.round(v.vec_elem_sum("embedding"), 5).alias("elem_sum"),
        F.round(v.vec_elem_avg("embedding"), 6).alias("elem_avg"),
        F.round(v.vec_kth_elem("embedding", 0).cast("double"), 6).alias("first_elem"),
        F.round(v.vec_elem_sum(v.vec_scalar_mul(2.0, "embedding")), 5).alias("sum_x2"),
    ).filter(F.col("vec_id") % 10 == 0)


# DuckDB sums float32 lists in float32; force per-element double cast for parity.
Q34_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       ROUND(sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 5) AS norm,
       ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 5) AS elem_sum,
       ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum') / len(embedding), 6) AS elem_avg,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0), 'sum'), 5) AS sum_x2
FROM embeddings WHERE vec_id % 10 = 0
"""


# -- q35: full-text matches() DSL + matches_term -----------------------------------

def q35_fulltext(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents")
    return d.select(
        "doc_id",
        t.matches("text", "spark AND (join OR merge)").alias("m_bool"),
        t.matches("text", '"hash scan" OR -filter').alias("m_phrase_neg"),
        t.matches_term("text", "scan").alias("m_term"),
        t.matches_term("text", "sca").alias("m_term_partial"),
    ).filter(F.col("doc_id") % 5 == 0)


Q35_SQL = """
SELECT doc_id,
       (lower(text) LIKE '%spark%' AND (lower(text) LIKE '%join%' OR lower(text) LIKE '%merge%')) AS m_bool,
       (lower(text) LIKE '%hash scan%' AND NOT lower(text) LIKE '%filter%') AS m_phrase_neg,
       regexp_matches(text, '(^|[^a-zA-Z0-9_])scan($|[^a-zA-Z0-9_])') AS m_term,
       regexp_matches(text, '(^|[^a-zA-Z0-9_])sca($|[^a-zA-Z0-9_])') AS m_term_partial
FROM documents WHERE doc_id % 5 = 0
"""


# -- q36: text analysis: tokens/quality/lang/punct ----------------------------------

def q36_text_analysis(spark: SparkSession, sf: str) -> DataFrame:
    # Hash-sensitive averages are emitted as scaled BIGINTs (x1e4 / x1e6):
    # ROUND(double, n) can differ from DuckDB's by one ulp, but rounding the
    # scaled product to an integer is stable on both engines.
    d = read(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(t.token_count("text")).alias("total_tokens"),
        F.round(F.avg(t.token_count("text")) * 10000).cast("long").alias("avg_tokens_x1e4"),
        F.round(F.avg(F.length("text")) * 10000).cast("long").alias("avg_chars_x1e4"),
        F.round(F.avg(t.punct_ratio("text")) * 1000000).cast("long").alias("avg_punct_ratio_x1e6"),
        F.round(F.avg(t.stopword_ratio("text")) * 1000000).cast("long").alias("avg_stopword_ratio_x1e6"),
    )


Q36_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(ROUND(AVG(len(regexp_split_to_array(trim(text), '\\s+'))) * 10000) AS BIGINT) AS avg_tokens_x1e4,
       CAST(ROUND(AVG(LENGTH(text)) * 10000) AS BIGINT) AS avg_chars_x1e4,
       CAST(ROUND(AVG(CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / LENGTH(text)) * 1000000) AS BIGINT) AS avg_punct_ratio_x1e6,
       CAST(ROUND(AVG(CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
             t -> list_contains(['the','a','of','to','and','in','is','it','that','for'], t))) AS DOUBLE)
             / len(regexp_split_to_array(lower(trim(text)), '\\s+'))) * 1000000) AS BIGINT) AS avg_stopword_ratio_x1e6
FROM documents GROUP BY lang
"""


# -- q37: document fingerprint (exact dedup key) --------------------------------------

def q37_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents")
    return d.select(
        "doc_id",
        t.fingerprint("text").alias("fp"),
        t.token_count("text").alias("n_tokens"),
    ).filter(F.col("doc_id") % 25 == 0)


Q37_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
FROM documents WHERE doc_id % 25 = 0
"""


# -- q38: vector distance functions ----------------------------------------------------

def q38_vec_distance(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "embeddings")
    first = e.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return (
        e.crossJoin(F.broadcast(first))
        .select(
            "vec_id",
            F.round(v.vec_cos_distance("embedding", "qv") * 100000).cast("long").alias("cos_dist_x1e5"),
            F.round(v.vec_l2sq_distance("embedding", "qv") * 100000).cast("long").alias("l2sq_dist_x1e5"),
            F.round(v.vec_dot_product("embedding", "qv") * 100000).cast("long").alias("dot_x1e5"),
        )
        .filter(F.col("vec_id") % 7 == 0)
    )


Q38_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
     pairs AS (
  SELECT vec_id,
         list_aggregate(list_transform(list_zip(embedding, qv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS dot_raw,
         sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS na,
         sqrt(list_aggregate(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nb,
         list_aggregate(list_transform(list_zip(embedding, qv), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum') AS l2_raw
  FROM embeddings, q
)
SELECT vec_id,
       CAST(ROUND((1 - dot_raw / (na * nb)) * 100000) AS BIGINT) AS cos_dist_x1e5,
       CAST(ROUND(l2_raw * 100000) AS BIGINT) AS l2sq_dist_x1e5,
       CAST(ROUND(dot_raw * 100000) AS BIGINT) AS dot_x1e5
FROM pairs WHERE vec_id % 7 = 0
"""


QUERIES = {
    "q30_json": QuerySpec(q30_json, Q30_SQL, "json_get_*/json_path_exists"),
    "q31_string_fns": QuerySpec(q31_string_fns, Q31_SQL, "string function battery"),
    "q32_clamp": QuerySpec(q32_clamp, Q32_SQL, "clamp/clamp_min/clamp_max"),
    "q33_ip": QuerySpec(q33_ip, Q33_SQL, "ipv4 num/string/cidr/range"),
    "q34_vector_math": QuerySpec(q34_vector_math, Q34_SQL, "vec_* elementwise + norms"),
    "q35_fulltext": QuerySpec(q35_fulltext, Q35_SQL, "matches() DSL + matches_term"),
    "q36_text_analysis": QuerySpec(q36_text_analysis, Q36_SQL, "tokens/punct/stopword stats"),
    "q37_fingerprint": QuerySpec(q37_fingerprint, Q37_SQL, "md5 doc fingerprint"),
    "q38_vec_distance": QuerySpec(q38_vec_distance, Q38_SQL, "cos/l2/dot distances"),
}
