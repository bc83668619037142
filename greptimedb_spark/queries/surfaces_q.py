"""Log-query DSL, ETL pipeline, and multimodal queries for the driver gate
(SURVEY.md §2.12, §2.1 ingest pipelines, multimodal columns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greptimedb_spark import multimodal as MM
from greptimedb_spark import pipeline as P
from greptimedb_spark.logs import ColumnFilter, LogQuery, run_log_query
from greptimedb_spark.queries import QuerySpec, read


# -- q70: log-query DSL filter battery ---------------------------------------------

def q70_logquery(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents")
    q = LogQuery(
        filters=[
            ColumnFilter(
                "", "compound", compound_op="and",
                children=[
                    ColumnFilter("lang", "exact", "en"),
                    ColumnFilter("text", "contains", "join"),
                    ColumnFilter(
                        "", "compound", compound_op="or",
                        children=[
                            ColumnFilter("text", "prefix", "the"),
                            ColumnFilter("text", "regex", r"scan (merge|part)"),
                        ],
                    ),
                    ColumnFilter("n_chars", "between", 100, 400),
                ],
            )
        ],
        columns=["doc_id", "lang", "n_chars"],
    )
    return run_log_query(d, q)


Q70_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE lang = 'en'
  AND text LIKE '%join%'
  AND (text LIKE 'the%' OR regexp_matches(text, 'scan (merge|part)'))
  AND n_chars BETWEEN 100 AND 400
"""


# -- q71: ETL pipeline over synthesized log lines -------------------------------------

def q71_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    base = e.select(
        "event_id",
        F.concat(
            F.col("event_type"), F.lit(" user="), F.col("user_id"),
            F.lit(" val="), F.col("value"),
        ).alias("message"),
        F.col("props"),
    )
    pipe = P.Pipeline([
        P.dissect("message", "%{etype} user=%{uid} val=%{val}"),
        P.letter("etype", "upper"),
        P.simple_extract("props", "k", "k"),
        P.digest("message"),
        P.join_fields("route", ":", ["etype", "uid"]),
        P.filter_rows("CAST(uid AS BIGINT) % 10 = 0"),
        P.select(["event_id", "etype", "uid", "val", "k", "message_digest", "route"]),
    ])
    return pipe.apply(base)


Q71_SQL = """
WITH base AS (
  SELECT event_id,
         CONCAT(event_type, ' user=', user_id, ' val=', value) AS message,
         props, event_type, user_id, value
  FROM events
)
SELECT event_id,
       UPPER(event_type) AS etype,
       CAST(user_id AS VARCHAR) AS uid,
       CAST(value AS VARCHAR) AS val,
       json_extract_string(props, '$.k') AS k,
       md5(message) AS message_digest,
       CONCAT(UPPER(event_type), ':', user_id) AS route
FROM base WHERE user_id % 10 = 0
"""


# -- q72: multimodal binary column + Arrow-batched feature extraction ------------------

def q72_multimodal(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents")
    feats = MM.extract_image_features(MM.attach_binary(d, "text"))
    return feats.select("doc_id", "n_bytes", "sha", "fake_width", "fake_height")


Q72_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS sha,
       CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS fake_width,
       CAST(octet_length(encode(text)) % 48 + 1 AS INTEGER) AS fake_height
FROM documents
"""


QUERIES = {
    "q70_logquery": QuerySpec(q70_logquery, Q70_SQL, "log DSL: compound/prefix/regex/between"),
    "q71_pipeline": QuerySpec(q71_pipeline, Q71_SQL, "ETL: dissect/letter/json/digest/join"),
    "q72_multimodal": QuerySpec(q72_multimodal, Q72_SQL, "binary col + mapInPandas features"),
}
