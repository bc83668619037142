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


# -- q87: InfluxDB line-protocol ingest round-trip ------------------------------------
# Events are FORMATTED as line protocol inside Spark, then PARSED back by
# sources/protocols.parse_influx_lines (the reference's /influxdb/write
# conversion, src/servers/src/influxdb.rs:55-105) and aggregated. The oracle
# computes the same aggregate straight from the table, so the whole
# format→tokenize→type→timestamp path must be the identity to hash-match.

def q87_influx_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    lines = e.select(F.format_string(
        "events,event_type=%s value=%s,user_id=%si %d",
        "event_type", F.col("value").cast("string"), "user_id",
        F.unix_micros("ts") * 1000).alias("line"))
    parsed = proto.parse_influx_lines(lines, precision="ns")
    vals = parsed.filter(F.col("field_key") == "value")
    uids = parsed.filter(F.col("field_key") == "user_id")
    return (
        vals.groupBy(F.col("tags")["event_type"].alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("v_f64").cast("decimal(18,2)")), 2)
            .cast("double").alias("sum_value"),
            F.unix_millis(F.max(proto.TIME_INDEX)).alias("max_ts_ms"),
        )
        .join(
            uids.groupBy(F.col("tags")["event_type"].alias("event_type"))
            .agg(F.sum("v_i64").alias("sum_user_id")),
            "event_type",
        )
        .select("event_type", "n", "sum_value", "sum_user_id", "max_ts_ms")
    )


Q87_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       MAX(epoch_ms(ts)) AS max_ts_ms
FROM events GROUP BY event_type
"""


# -- q88: OpenTSDB put-line ingest round-trip ------------------------------------------
# Same identity proof for the pure-column-algebra opentsdb parser
# (src/servers/src/opentsdb/codec.rs:38-183): seconds-vs-ms heuristic is
# exercised by emitting second-resolution stamps for even event_ids.

def q88_opentsdb_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    ms = F.unix_millis("ts")
    lines = e.select(F.format_string(
        "put events.value %d %s event_type=%s uid=%d",
        F.when(F.col("event_id") % 2 == 0, (ms / 1000).cast("long")).otherwise(ms),
        F.col("value").cast("string"), "event_type", "user_id").alias("line"))
    parsed = proto.parse_opentsdb_puts(lines)
    return (
        parsed.filter(F.col("err").isNull())
        .groupBy(F.col("tags")["event_type"].alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col(proto.VALUE_COL).cast("decimal(18,2)")), 2)
            .cast("double").alias("sum_value"),
            F.sum(F.unix_millis(proto.TIME_INDEX)).alias("sum_ts_ms"),
        )
    )


Q88_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       CAST(SUM(CASE WHEN event_id % 2 = 0
                THEN (epoch_ms(ts) // 1000) * 1000
                ELSE epoch_ms(ts) END) AS BIGINT) AS sum_ts_ms
FROM events GROUP BY event_type
"""


# -- q92: Loki push-payload ingest round-trip ------------------------------------------
# Events are rendered as /loki/api/v1/push JSON payloads, parsed back by
# sources/protocols.parse_loki_push (from_json + explodes — JVM-side), and
# aggregated per label; the oracle aggregates the table directly
# (src/servers/src/http/loki.rs:61-91).

def q92_loki_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    payloads = e.select(F.format_string(
        '{"streams":[{"stream":{"source":"app","event_type":"%s"},'
        '"values":[["%d","evt %d val %s"]]}]}',
        "event_type", F.unix_micros("ts") * 1000, "event_id",
        F.col("value").cast("string")).alias("payload"))
    rows = proto.parse_loki_push(payloads).filter(F.col("err").isNull())
    return (
        rows.groupBy(F.col("labels")["event_type"].alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.unix_millis(F.max(proto.TIME_INDEX)).alias("max_ts_ms"),
            F.round(F.sum(
                F.regexp_extract("line", r"val (\S+)$", 1).cast("decimal(18,2)")
            ), 2).cast("double").alias("sum_value"),
        )
    )


Q92_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       MAX(epoch_ms(ts)) AS max_ts_ms,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


# -- q93: Elasticsearch _bulk ingest round-trip ----------------------------------------
# Events become (create-command, document) NDJSON pairs, parsed back by
# sources/protocols.parse_elasticsearch_bulk and re-aggregated from the
# document JSON (src/servers/src/elasticsearch.rs:291-380).

def q93_es_bulk_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    payloads = e.select(F.format_string(
        '{"create":{"_index":"events"}}\n'
        '{"event_id":%d,"event_type":"%s","value":%s,"ts_ms":%d}',
        "event_id", "event_type", F.col("value").cast("string"),
        F.unix_millis("ts")).alias("payload"))
    rows = proto.parse_elasticsearch_bulk(payloads).filter(F.col("err").isNull())
    return (
        rows.select(
            F.get_json_object("document", "$.event_type").alias("event_type"),
            F.get_json_object("document", "$.value").alias("v"),
            F.get_json_object("document", "$.ts_ms").try_cast("long").alias("ts_ms"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("v").cast("decimal(18,2)")), 2)
            .cast("double").alias("sum_value"),
            F.max("ts_ms").alias("max_ts_ms"),
        )
    )


Q93_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       MAX(epoch_ms(ts)) AS max_ts_ms
FROM events GROUP BY event_type
"""


# -- q94: OTLP/JSON metrics ingest round-trip ------------------------------------------
# Events are rendered as OTLP/JSON gauge exports and parsed back by
# sources/protocols.parse_otlp_metrics_json; the table name exercises the
# legacy normalization (Events.Value -> events_value) and the value the f64
# coercion path (src/servers/src/otlp/metrics.rs:99-567).

def q94_otlp_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    payloads = e.select(F.format_string(
        '{"resourceMetrics":[{"resource":{"attributes":['
        '{"key":"service.name","value":{"stringValue":"app"}}]},'
        '"scopeMetrics":[{"metrics":[{"name":"Events.Value","gauge":{"dataPoints":['
        '{"timeUnixNano":"%d","asDouble":%s,"attributes":['
        '{"key":"event_type","value":{"stringValue":"%s"}}]}]}}]}]}]}',
        F.unix_micros("ts") * 1000, F.col("value").cast("string"),
        "event_type").alias("payload"))
    rows = proto.parse_otlp_metrics_json(payloads).filter(F.col("err").isNull())
    return (
        rows.groupBy("table", F.col("tags")["event_type"].alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col(proto.VALUE_COL).cast("decimal(18,2)")), 2)
            .cast("double").alias("sum_value"),
            F.unix_millis(F.max(proto.TIME_INDEX)).alias("max_ts_ms"),
        )
    )


Q94_SQL = """
SELECT 'events_value' AS "table",
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       MAX(epoch_ms(ts)) AS max_ts_ms
FROM events GROUP BY event_type
"""


# -- q95: OTLP/JSON logs ingest round-trip ---------------------------------------------
# Events become OTLP log records (body + severity + log attributes), parsed
# by sources/protocols.parse_otlp_logs_json into the reference's identity
# log schema (src/servers/src/otlp/logs.rs:199-311) and re-aggregated.

def q95_otlp_logs_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    sev = F.when(F.col("event_type") == "error", F.lit('"severityNumber":17,"severityText":"ERROR",')) \
        .otherwise(F.lit('"severityNumber":9,"severityText":"INFO",'))
    payloads = e.select(F.concat(
        F.lit('{"resourceLogs":[{"resource":{"attributes":['
              '{"key":"service.name","value":{"stringValue":"app"}}]},'
              '"scopeLogs":[{"scope":{"name":"pipeline"},"logRecords":['
              '{"timeUnixNano":"'),
        (F.unix_micros("ts") * 1000).cast("string"),
        F.lit('",'), sev,
        F.lit('"body":{"stringValue":"evt '),
        F.col("event_id").cast("string"),
        F.lit(' val '), F.col("value").cast("string"),
        F.lit('"},"attributes":[{"key":"event_type","value":{"stringValue":"'),
        F.col("event_type"),
        F.lit('"}}]}]}]}]}'),
    ).alias("payload"))
    rows = proto.parse_otlp_logs_json(payloads).filter(F.col("err").isNull())
    return (
        rows.groupBy(
            F.get_json_object("log_attributes", "$.event_type").alias("event_type"),
            "severity_text",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(
                F.regexp_extract("body", r"val (\S+)$", 1).cast("decimal(18,2)")
            ), 2).cast("double").alias("sum_value"),
            F.unix_millis(F.max("timestamp")).alias("max_ts_ms"),
        )
    )


Q95_SQL = """
SELECT event_type,
       CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END AS severity_text,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       MAX(epoch_ms(ts)) AS max_ts_ms
FROM events GROUP BY event_type
"""


# -- q97: Prometheus remote-write ingest round-trip ------------------------------------
# Events become snappy-compressed protobuf WriteRequests (encoder dual) and
# come back through sources/protocols.parse_prom_remote_write — the real
# wire format, handled without external snappy/protobuf libs
# (src/servers/src/prom_store.rs:44-80).

def q97_prom_remote_write(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                proto.encode_write_request([(
                    {"__name__": "events_value", "event_type": t},
                    [(float(v), int(ts))],
                )])
                for t, v, ts in zip(pdf["event_type"], pdf["value"], pdf["ts_ms"])
            ]
            yield pd.DataFrame({"payload": payloads})

    payloads = e.select(
        "event_type", "value", F.unix_millis("ts").alias("ts_ms")
    ).mapInPandas(encode, "payload binary")
    rows = proto.parse_prom_remote_write(payloads).filter(F.col("err").isNull())
    return (
        rows.groupBy("table", F.col("tags")["event_type"].alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col(proto.VALUE_COL).cast("decimal(18,2)")), 2)
            .cast("double").alias("sum_value"),
            F.unix_millis(F.max(proto.TIME_INDEX)).alias("max_ts_ms"),
        )
    )


Q97_SQL = """
SELECT 'events_value' AS "table",
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       MAX(epoch_ms(ts)) AS max_ts_ms
FROM events GROUP BY event_type
"""


# -- q98: OTLP/JSON traces ingest round-trip -------------------------------------------
# Events become spans (start ts = event ts, duration from value), parsed by
# sources/protocols.parse_otlp_traces_json into greptime_trace_v1 rows and
# re-aggregated per service/kind (src/servers/src/otlp/trace.rs:23-66).

def q98_otlp_traces_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    ns = F.unix_micros("ts") * 1000
    dur = (F.col("value") * 1e6).cast("long")  # value ms -> ns, exact (<2^53)
    payloads = e.select(F.format_string(
        '{"resourceSpans":[{"resource":{"attributes":['
        '{"key":"service.name","value":{"stringValue":"svc-%s"}}]},'
        '"scopeSpans":[{"scope":{"name":"events"},"spans":['
        '{"traceId":"t%d","spanId":"s%d","name":"op-%s",'
        '"kind":"SPAN_KIND_SERVER","startTimeUnixNano":"%d",'
        '"endTimeUnixNano":"%d","status":{"code":"STATUS_CODE_OK"}}]}]}]}',
        "event_type", "event_id", "event_id", "event_type",
        ns, ns + dur).alias("payload"))
    rows = proto.parse_otlp_traces_json(payloads).filter(F.col("err").isNull())
    return (
        rows.groupBy("service_name", "span_kind", "span_status_code")
        .agg(
            F.count("*").alias("n"),
            F.sum("duration_nano").alias("sum_duration_nano"),
            F.unix_millis(F.max("timestamp")).alias("max_start_ms"),
        )
    )


Q98_SQL = """
SELECT 'svc-' || event_type AS service_name,
       'SPAN_KIND_SERVER' AS span_kind,
       'STATUS_CODE_OK' AS span_status_code,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_duration_nano,
       MAX(epoch_ms(ts)) AS max_start_ms
FROM events GROUP BY event_type
"""


# -- q99/q100: trace read surface (Jaeger-API analog) -----------------------------------
# Synthesized two-span traces per event (root service span + db child);
# q99 = FindTraces semantics (any-span match returns the WHOLE trace),
# q100 = the read-time service dependency graph
# (src/servers/src/http/jaeger.rs:393-655).

def _event_spans(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "events")
    base = e.select(
        F.concat(F.lit("t"), "event_id").alias("trace_id"),
        F.col("event_id"), F.col("event_type"), F.col("ts"), F.col("value"),
    )
    root = base.select(
        "trace_id", F.concat(F.lit("r"), "event_id").alias("span_id"),
        F.lit(None).cast("string").alias("parent_span_id"),
        F.concat(F.lit("svc-"), "event_type").alias("service_name"),
        F.concat(F.lit("op-"), "event_type").alias("span_name"),
        F.lit("SPAN_KIND_SERVER").alias("span_kind"),
        (F.col("value") * 1000000).cast("long").alias("duration_nano"),
        F.col("ts").alias("timestamp"),
        F.lit("{}").alias("span_attributes"),
    )
    child = base.select(
        "trace_id", F.concat(F.lit("c"), "event_id").alias("span_id"),
        F.concat(F.lit("r"), "event_id").alias("parent_span_id"),
        F.lit("db").alias("service_name"),
        F.lit("query").alias("span_name"),
        F.lit("SPAN_KIND_CLIENT").alias("span_kind"),
        (F.col("value") * 500000).cast("long").alias("duration_nano"),
        F.col("ts").alias("timestamp"),
        F.lit("{}").alias("span_attributes"),
    )
    return root.unionByName(child)


def q99_trace_find(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark import traces as TR

    spans = _event_spans(spark, sf)
    # traces whose DB leg took >= 2ms: whole traces come back (both spans)
    return TR.find_traces(
        spans, service="db", min_duration_ns=2_000_000
    ).select("trace_id", "span_id", "service_name", "span_name", "duration_nano")


Q99_SQL = """
WITH m AS (SELECT event_id, event_type, value FROM events
           WHERE CAST(FLOOR(value * 500000) AS BIGINT) >= 2000000)
SELECT 't' || event_id AS trace_id, 'r' || event_id AS span_id,
       'svc-' || event_type AS service_name, 'op-' || event_type AS span_name,
       CAST(FLOOR(value * 1000000) AS BIGINT) AS duration_nano
FROM m
UNION ALL
SELECT 't' || event_id, 'c' || event_id, 'db', 'query',
       CAST(FLOOR(value * 500000) AS BIGINT)
FROM m
"""


def q100_trace_deps(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark import traces as TR

    return TR.service_dependencies(_event_spans(spark, sf))


Q100_SQL = """
SELECT 'svc-' || event_type AS parent_service,
       'db' AS child_service,
       COUNT(*) AS call_count
FROM events GROUP BY event_type
"""


# -- q101: Splunk HEC ingest round-trip -------------------------------------------------
# Events are rendered as /services/collector/event JSON payloads and parsed
# back by sources/protocols.parse_splunk_hec (splunk.rs:384-446): `index`
# routes the table, `fields` spread to tags, and the `time` field exercises
# BOTH branches of the HEC epoch heuristic — even event_ids send epoch-ms
# integers (>= 1e12 -> ms branch), odd send integer epoch-seconds.

def q101_splunk_hec_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    ms = F.unix_millis("ts")
    time_repr = F.when(F.col("event_id") % 2 == 0, ms.cast("string")) \
        .otherwise((ms / 1000).cast("long").cast("string"))
    payloads = e.select(F.format_string(
        '{"event":"evt %d val %s","time":%s,"index":"events",'
        '"host":"h1","fields":{"event_type":"%s"}}',
        "event_id", F.col("value").cast("string"), time_repr,
        "event_type").alias("payload"))
    rows = proto.parse_splunk_hec(payloads).filter(F.col("err").isNull())
    return (
        rows.groupBy("table", F.col("tags")["event_type"].alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(
                F.regexp_extract("event", r"val (\S+)$", 1).cast("decimal(18,2)")
            ), 2).cast("double").alias("sum_value"),
            F.sum(F.unix_millis(proto.TIME_INDEX)).alias("sum_ts_ms"),
        )
    )


Q101_SQL = """
SELECT 'events' AS "table",
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       CAST(SUM(CASE WHEN event_id % 2 = 0 THEN epoch_ms(ts)
                ELSE (epoch_ms(ts) // 1000) * 1000 END) AS BIGINT) AS sum_ts_ms
FROM events GROUP BY event_type
"""


# -- q102: REAL image decode round-trip (pure-stdlib PPM/BMP pixel path) ----------------
# Each document becomes a tiny constant-color image — even doc_ids as 24-bit
# BI_RGB BMPs, odd as binary PPMs — encoded in one mapInPandas stage and
# decoded by multimodal.decode_images' REAL pixel path (netpbm / BMP byte
# specs, no codec libs). Channel means are exact integers by construction,
# so the aggregate is bit-deterministic and the DuckDB oracle recomputes it
# analytically from doc_id/n_chars.

def q102_image_decode(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark import multimodal as MM

    d = read(spark, sf, "documents").select("doc_id", "n_chars")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                did, nc = int(did), int(nc)
                w, h = did % 8 + 1, did % 6 + 1
                rgb = bytes([nc % 256, did % 256, (nc + did) % 256]) * (w * h)
                payloads.append(MM.encode_bmp(w, h, rgb) if did % 2 == 0
                                else MM.encode_ppm(w, h, rgb))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": payloads})

    media = d.mapInPandas(encode, "doc_id long, media binary")
    dec = MM.decode_images(media)
    return (
        dec.groupBy("format", (F.col("doc_id") % 3).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("width") * F.col("height")).alias("sum_px"),
            F.sum(F.col("mean_r").cast("long")).alias("sum_r"),
            F.sum(F.col("mean_g").cast("long")).alias("sum_g"),
            F.sum(F.col("mean_b").cast("long")).alias("sum_b"),
        )
    )


Q102_SQL = """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format,
       CAST(doc_id % 3 AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM((doc_id % 8 + 1) * (doc_id % 6 + 1)) AS BIGINT) AS sum_px,
       CAST(SUM(n_chars % 256) AS BIGINT) AS sum_r,
       CAST(SUM(doc_id % 256) AS BIGINT) AS sum_g,
       CAST(SUM((n_chars + doc_id) % 256) AS BIGINT) AS sum_b
FROM documents
GROUP BY 1, 2
"""


# -- q103/q104: trace surface last mile (get_trace + get_services) ----------------------
# Pins the remaining Jaeger-analog read APIs to oracles: q103 fetches ONE
# whole trace by id (jaeger.rs handle_get_trace:449), q104 the service list
# (handle_get_services:393). event_id 0 exists at every SF, so trace "t0"
# is deterministic without a driver-side probe.

def q103_trace_get(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark import traces as TR

    spans = _event_spans(spark, sf)
    return TR.get_trace(spans, "t0").select(
        "trace_id", "span_id", "parent_span_id",
        "service_name", "span_name", "span_kind", "duration_nano")


Q103_SQL = """
SELECT 't0' AS trace_id, 'r0' AS span_id, CAST(NULL AS VARCHAR) AS parent_span_id,
       'svc-' || event_type AS service_name, 'op-' || event_type AS span_name,
       'SPAN_KIND_SERVER' AS span_kind,
       CAST(FLOOR(value * 1000000) AS BIGINT) AS duration_nano
FROM events WHERE event_id = 0
UNION ALL
SELECT 't0', 'c0', 'r0', 'db', 'query', 'SPAN_KIND_CLIENT',
       CAST(FLOOR(value * 500000) AS BIGINT)
FROM events WHERE event_id = 0
"""


def q104_trace_services(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark import traces as TR

    return TR.get_services(_event_spans(spark, sf))


Q104_SQL = """
SELECT DISTINCT 'svc-' || event_type AS service_name FROM events
UNION SELECT 'db'
"""


# -- q115: Prometheus remote-write V2 ingest round-trip ----------------------------------
# Events become io.prometheus.write.v2.Request payloads (symbol table +
# labels_refs, the encoder dual) and come back through
# sources/protocols.parse_prom_remote_write_v2 — the real v2 wire format
# the reference negotiates by content-type (http/prom_store.rs:62,
# prom_remote_write/v2.rs), no external protobuf/snappy libs.

def q115_prom_remote_write_v2(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                proto.encode_write_request_v2([(
                    {"__name__": "events_value", "event_type": t},
                    [(float(v), int(ts))],
                )])
                for t, v, ts in zip(pdf["event_type"], pdf["value"],
                                    pdf["ts_ms"])
            ]
            yield pd.DataFrame({"payload": payloads})

    payloads = e.select(
        "event_type", "value", F.unix_millis("ts").alias("ts_ms")
    ).mapInPandas(encode, "payload binary")
    rows = proto.parse_prom_remote_write_v2(payloads).filter(
        F.col("err").isNull())
    return (
        rows.groupBy("table", F.col("tags")["event_type"].alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col(proto.VALUE_COL).cast("decimal(18,2)")), 2)
            .cast("double").alias("sum_value"),
            F.unix_millis(F.max(proto.TIME_INDEX)).alias("max_ts_ms"),
        )
    )


Q115_SQL = """
SELECT 'events_value' AS "table",
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       MAX(epoch_ms(ts)) AS max_ts_ms
FROM events GROUP BY event_type
"""


# -- q116: OTLP histogram shredding round-trip -------------------------------------------
# Events become OTLP/JSON histogram export payloads (bounds [50], per-event
# 0/1 bucket indicators) and come back through the metrics parser's
# histogram fan-out: {name}_bucket rows carry CUMULATIVE counts under an
# `le` tag, plus {name}_sum / {name}_count rows
# (src/servers/src/otlp/metrics.rs encode_histogram:613).

def q116_otlp_histogram(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")
    payload = F.concat(
        F.lit('{"resourceMetrics":[{"resource":{"attributes":[{"key":'
              '"event_type","value":{"stringValue":"'),
        F.col("event_type"),
        F.lit('"}}]},"scopeMetrics":[{"metrics":[{"name":"events.value",'
              '"histogram":{"dataPoints":[{"timeUnixNano":"'),
        (F.unix_millis("ts") * 1_000_000).cast("string"),
        F.lit('","count":"1","sum":'), F.col("value").cast("string"),
        F.lit(',"bucketCounts":["'),
        (F.col("value") <= 50).cast("int").cast("string"),
        F.lit('","'),
        (F.col("value") > 50).cast("int").cast("string"),
        F.lit('"],"explicitBounds":[50]}]}}]}]}]}'),
    )
    rows = proto.parse_otlp_metrics_json(
        e.select(payload.alias("payload"))).filter(F.col("err").isNull())
    return (
        rows.groupBy("table", F.col("tags")["le"].alias("le"))
        .agg(F.count("*").alias("n"),
             F.round(F.sum(F.col(proto.VALUE_COL).cast("decimal(18,2)")), 2)
             .cast("double").alias("sum_value"),
             F.unix_millis(F.max(proto.TIME_INDEX)).alias("max_ts_ms"))
    )


Q116_SQL = """
WITH base AS (SELECT value, epoch_ms(ts) AS ts_ms FROM events)
SELECT 'events_value_bucket' AS "table", '50' AS le, COUNT(*) AS n,
       CAST(SUM(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS DOUBLE) AS sum_value,
       MAX(ts_ms) AS max_ts_ms FROM base
UNION ALL
SELECT 'events_value_bucket', 'inf', COUNT(*),
       CAST(COUNT(*) AS DOUBLE), MAX(ts_ms) FROM base
UNION ALL
SELECT 'events_value_sum', NULL, COUNT(*),
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE),
       MAX(ts_ms) FROM base
UNION ALL
SELECT 'events_value_count', NULL, COUNT(*),
       CAST(COUNT(*) AS DOUBLE), MAX(ts_ms) FROM base
"""


# -- q112: Prometheus remote-read round-trip --------------------------------------------
# The full remote-storage protocol loop (src/servers/src/http/prom_store.rs:745
# remote_read; src/servers/src/prom_store.rs:79-159 query_to_plan; frontend
# prom_store.rs:533 read): events are remote-WRITTEN as snappy/protobuf
# WriteRequests, landed as a metric table, then remote-READ back through a
# snappy ReadRequest whose matchers exercise EQ(__name__), unanchored RE and
# NEQ plus the [start, end] window — and the decoded snappy ReadResponse is
# re-aggregated for the oracle. Both wire directions are the real formats,
# no external protobuf/snappy libs.

def q112_prom_remote_read(spark: SparkSession, sf: str) -> DataFrame:
    from greptimedb_spark.promql.engine import MetricTable
    from greptimedb_spark.sources import prom_remote_read as R
    from greptimedb_spark.sources import protocols as proto

    e = read(spark, sf, "events")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                proto.encode_write_request([(
                    {"__name__": "events_value", "event_type": t,
                     "parity": "even" if int(u) % 2 == 0 else "odd"},
                    [(float(v), int(ts))],
                )])
                for t, u, v, ts in zip(pdf["event_type"], pdf["user_id"],
                                       pdf["value"], pdf["ts_ms"])
            ]
            yield pd.DataFrame({"payload": payloads})

    payloads = e.select(
        "event_type", "user_id", "value", F.unix_millis("ts").alias("ts_ms")
    ).mapInPandas(encode, "payload binary")
    rows = proto.parse_prom_remote_write(payloads).filter(F.col("err").isNull())
    table = rows.select(
        F.col("tags")["event_type"].alias("event_type"),
        F.col("tags")["parity"].alias("parity"),
        F.unix_millis(proto.TIME_INDEX).alias(proto.TIME_INDEX),
        F.col(proto.VALUE_COL),
    )
    tables = {"events_value": MetricTable(
        df=table, time_index=proto.TIME_INDEX, value_col=proto.VALUE_COL,
        tags=["event_type", "parity"])}

    start, end = 1704412800000, 1705708800000  # 2024-01-05 .. 01-20 UTC
    req = R.encode_read_request([{
        "start_timestamp_ms": start, "end_timestamp_ms": end,
        "matchers": [(R.MATCHER_EQ, "__name__", "events_value"),
                     (R.MATCHER_RE, "event_type", "click|sign"),
                     (R.MATCHER_NEQ, "parity", "odd")],
    }], accepted_response_types=[R.SAMPLES_RESPONSE_TYPE])
    (result,) = R.decode_read_response(R.remote_read(tables, req))
    flat = [(dict(t["labels"])["event_type"], v, ts_ms)
            for t in result for v, ts_ms in t["samples"]]
    got = spark.createDataFrame(
        flat, "event_type string, val double, ts_ms long")
    return (
        got.groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum(F.col("val").cast("decimal(18,2)")), 2)
             .cast("double").alias("sum_value"),
             F.min("ts_ms").alias("min_ts_ms"),
             F.max("ts_ms").alias("max_ts_ms"))
    )


Q112_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       MIN(epoch_ms(ts)) AS min_ts_ms,
       MAX(epoch_ms(ts)) AS max_ts_ms
FROM events
WHERE epoch_ms(ts) BETWEEN 1704412800000 AND 1705708800000
  AND regexp_matches(event_type, 'click|sign')
  AND (CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END) <> 'odd'
GROUP BY event_type
"""


QUERIES = {
    "q70_logquery": QuerySpec(q70_logquery, Q70_SQL, "log DSL: compound/prefix/regex/between"),
    "q71_pipeline": QuerySpec(q71_pipeline, Q71_SQL, "ETL: dissect/letter/json/digest/join"),
    "q72_multimodal": QuerySpec(q72_multimodal, Q72_SQL, "binary col + mapInPandas features"),
    "q87_influx_ingest": QuerySpec(
        q87_influx_ingest, Q87_SQL, "influx line-protocol parse round-trip"
    ),
    "q88_opentsdb_ingest": QuerySpec(
        q88_opentsdb_ingest, Q88_SQL, "opentsdb put parse round-trip"
    ),
    "q92_loki_ingest": QuerySpec(
        q92_loki_ingest, Q92_SQL, "loki push payload parse round-trip"
    ),
    "q93_es_bulk_ingest": QuerySpec(
        q93_es_bulk_ingest, Q93_SQL, "elasticsearch _bulk parse round-trip"
    ),
    "q94_otlp_ingest": QuerySpec(
        q94_otlp_ingest, Q94_SQL, "OTLP/JSON metrics parse round-trip"
    ),
    "q95_otlp_logs_ingest": QuerySpec(
        q95_otlp_logs_ingest, Q95_SQL, "OTLP/JSON logs parse round-trip"
    ),
    "q97_prom_remote_write": QuerySpec(
        q97_prom_remote_write, Q97_SQL, "prometheus remote-write parse round-trip"
    ),
    "q98_otlp_traces_ingest": QuerySpec(
        q98_otlp_traces_ingest, Q98_SQL, "OTLP/JSON traces parse round-trip"
    ),
    "q99_trace_find": QuerySpec(
        q99_trace_find, Q99_SQL, "Jaeger FindTraces (whole-trace semi-join)"
    ),
    "q100_trace_deps": QuerySpec(
        q100_trace_deps, Q100_SQL, "trace service-dependency graph"
    ),
    "q101_splunk_hec": QuerySpec(
        q101_splunk_hec_ingest, Q101_SQL, "splunk HEC event parse round-trip"
    ),
    "q102_image_decode": QuerySpec(
        q102_image_decode, Q102_SQL, "real PPM/BMP decode round-trip"
    ),
    "q103_trace_get": QuerySpec(
        q103_trace_get, Q103_SQL, "Jaeger get_trace single-trace fetch"
    ),
    "q104_trace_services": QuerySpec(
        q104_trace_services, Q104_SQL, "Jaeger get_services distinct list"
    ),
    "q112_prom_remote_read": QuerySpec(
        q112_prom_remote_read, Q112_SQL,
        "prometheus remote-read write-then-read wire round-trip"
    ),
    "q115_prom_remote_write_v2": QuerySpec(
        q115_prom_remote_write_v2, Q115_SQL,
        "prometheus remote-write v2 (symbol table) parse round-trip"
    ),
    "q116_otlp_histogram": QuerySpec(
        q116_otlp_histogram, Q116_SQL,
        "OTLP histogram fan-out: le-tagged cumulative buckets + sum/count"
    ),
}
