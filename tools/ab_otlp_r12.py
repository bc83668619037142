"""A/B + parity harness for the r12 OTLP metrics parser restructure.

The r11 form unioned 8 filter branches off one from_json relation; physical
planning duplicated the scan+format+from_json subtree into every branch
(q94: 16 scans / 16 from_json, q116: 18/18). The r12 form builds ONE
array<row-struct> per payload with higher-order functions and explodes once.

This harness keeps the OLD union form frozen (verbatim copy below), proves
row-multiset parity on the real q94/q116 payload streams plus an edge-case
corpus (histogram/summary shredding, bad payloads, missing values/timestamps,
empty arrays), and times both forms interleaved with the noop sink.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from greptimedb_spark.session import get_spark  # noqa: E402
from greptimedb_spark.sources import protocols as proto  # noqa: E402
from greptimedb_spark.sources.protocols import (  # noqa: E402
    TIME_INDEX, VALUE_COL, _OTLP_ATTR, _OTLP_SCHEMA, _fmt_f64_tag,
    _ns_to_ts, normalize_otlp_name,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def parse_otlp_metrics_json_union(
    payloads: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Frozen r11 union-of-8-branches form (verbatim)."""
    parsed = payloads.select(
        F.col(payload_col).alias("_raw"),
        F.from_json(F.col(payload_col), _OTLP_SCHEMA).alias("p"),
    )
    bad = parsed.filter(
        F.col("p").isNull() | F.col("p.resourceMetrics").isNull()
    ).select(
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast("map<string,string>").alias("tags"),
        F.lit(None).cast("timestamp").alias(TIME_INDEX),
        F.lit(None).cast("double").alias(VALUE_COL),
        F.lit(None).cast("string").alias("metric_type"),
        F.concat(F.lit("invalid otlp metrics payload: "),
                 F.substring("_raw", 1, 120)).alias("err"),
    )
    rm = (
        parsed.filter(F.col("p.resourceMetrics").isNotNull())
        .select(F.explode("p.resourceMetrics").alias("rm"))
        .select(F.col("rm.resource.attributes").alias("res_attrs"),
                F.explode("rm.scopeMetrics").alias("sm"))
        .select("res_attrs", F.explode("sm.metrics").alias("m"))
    )
    kinds = []
    for kind in ("gauge", "sum"):
        kinds.append(
            rm.filter(F.col(f"m.{kind}").isNotNull())
            .select("res_attrs", F.col("m.name").alias("name"),
                    F.lit(kind).alias("metric_type"),
                    F.explode(f"m.{kind}.dataPoints").alias("dp"))
        )
    pts = kinds[0].unionByName(kinds[1])
    dp_attrs = F.coalesce(F.col("dp.attributes"),
                          F.expr(f"CAST(array() AS {_OTLP_ATTR})"))
    res_attrs = F.coalesce(F.col("res_attrs"),
                           F.expr(f"CAST(array() AS {_OTLP_ATTR})"))
    dp_keys = F.transform(dp_attrs, lambda e: e["key"])
    res_kept = F.filter(res_attrs, lambda e: ~F.array_contains(dp_keys, e["key"]))
    entries = F.transform(
        F.concat(res_kept, dp_attrs),
        lambda e: F.struct(e["key"].alias("key"),
                           e["value"]["stringValue"].alias("value")),
    )
    value = F.coalesce(F.col("dp.asDouble"), F.col("dp.asInt").try_cast("double"))
    num = pts.select(
        normalize_otlp_name(F.col("name")).alias("table"),
        F.map_from_entries(entries).alias("tags"),
        _ns_to_ts(F.col("dp.timeUnixNano").try_cast("long")).alias(TIME_INDEX),
        value.alias(VALUE_COL),
        "metric_type",
        F.when(value.isNull(), F.lit("missing data point value"))
        .when(F.col("dp.timeUnixNano").try_cast("long").isNull(),
              F.concat(F.lit("invalid otlp timestamp: "),
                       F.coalesce(F.col("dp.timeUnixNano"), F.lit("null"))))
        .alias("err"),
    )

    def _tag_entries(dp_attrs_col):
        dpa = F.coalesce(dp_attrs_col, F.expr(f"CAST(array() AS {_OTLP_ATTR})"))
        ra = F.coalesce(F.col("res_attrs"),
                        F.expr(f"CAST(array() AS {_OTLP_ATTR})"))
        keys = F.transform(dpa, lambda e: e["key"])
        kept = F.filter(ra, lambda e: ~F.array_contains(keys, e["key"]))
        return F.transform(
            F.concat(kept, dpa),
            lambda e: F.struct(e["key"].alias("key"),
                               e["value"]["stringValue"].alias("value")))

    def _row(table_col, tags_col, value_col, mtype):
        ts_ns = F.col("dp.timeUnixNano").try_cast("long")
        return [
            table_col.alias("table"), tags_col.alias("tags"),
            _ns_to_ts(ts_ns).alias(TIME_INDEX),
            value_col.cast("double").alias(VALUE_COL),
            F.lit(mtype).alias("metric_type"),
            F.when(ts_ns.isNull(),
                   F.concat(F.lit("invalid otlp timestamp: "),
                            F.coalesce(F.col("dp.timeUnixNano"),
                                       F.lit("null")))).alias("err"),
        ]

    empty_map = F.expr("CAST(map() AS map<string,string>)")

    hdp = (rm.filter(F.col("m.histogram").isNotNull())
           .select("res_attrs",
                   normalize_otlp_name(F.col("m.name")).alias("name"),
                   F.explode("m.histogram.dataPoints").alias("dp")))
    htags = F.map_from_entries(_tag_entries(F.col("dp.attributes")))
    b = hdp.select(
        "res_attrs", "name", "dp", htags.alias("__tags"),
        F.posexplode(F.coalesce(
            F.col("dp.bucketCounts"),
            F.expr("CAST(array() AS array<string>)"))).alias("idx", "cnt"))
    cum = F.expr("aggregate(slice(dp.bucketCounts, 1, idx + 1), "
                 "CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))")
    le_map = (F.when(F.col("idx") < F.size("dp.explicitBounds"),
                     F.create_map(F.lit("le"), _fmt_f64_tag(
                         F.element_at("dp.explicitBounds",
                                      F.col("idx") + 1))))
              .when(F.col("idx") == F.size("dp.explicitBounds"),
                    F.create_map(F.lit("le"), F.lit("inf")))
              .otherwise(empty_map))
    hist_bucket = b.select(*_row(
        F.concat(F.col("name"), F.lit("_bucket")),
        F.map_concat(F.col("__tags"), le_map), cum, "histogram"))
    hist_sum = hdp.filter(F.col("dp.sum").isNotNull()).select(*_row(
        F.concat(F.col("name"), F.lit("_sum")), htags,
        F.col("dp.sum"), "histogram"))
    hist_count = hdp.select(*_row(
        F.concat(F.col("name"), F.lit("_count")), htags,
        F.col("dp.count").try_cast("double"), "histogram"))

    sdp = (rm.filter(F.col("m.summary").isNotNull())
           .select("res_attrs",
                   normalize_otlp_name(F.col("m.name")).alias("name"),
                   F.explode("m.summary.dataPoints").alias("dp")))
    stags = F.map_from_entries(_tag_entries(F.col("dp.attributes")))
    q = sdp.select(
        "res_attrs", "name", "dp", stags.alias("__tags"),
        F.explode(F.coalesce(
            F.col("dp.quantileValues"),
            F.expr("CAST(array() AS array<struct<quantile:double,"
                   "value:double>>)"))).alias("qv"))
    summ_q = q.select(*_row(
        F.col("name"),
        F.map_concat(F.col("__tags"),
                     F.create_map(F.lit("quantile"),
                                  _fmt_f64_tag(F.col("qv.quantile")))),
        F.col("qv.value"), "summary"))
    summ_count = sdp.select(*_row(
        F.concat(F.col("name"), F.lit("_count")), stags,
        F.col("dp.count").try_cast("double"), "summary"))
    summ_sum = sdp.filter(F.col("dp.sum").isNotNull()).select(*_row(
        F.concat(F.col("name"), F.lit("_sum")), stags,
        F.col("dp.sum"), "summary"))

    out = num
    for part in (hist_bucket, hist_sum, hist_count,
                 summ_q, summ_count, summ_sum):
        out = out.unionByName(part)
    return out.unionByName(bad)


EDGE_PAYLOADS = [
    # plain gauge + sum with resource/dp attribute collision
    '{"resourceMetrics":[{"resource":{"attributes":[{"key":"host","value":'
    '{"stringValue":"res"}}]},"scopeMetrics":[{"metrics":[{"name":"A.b-C",'
    '"gauge":{"dataPoints":[{"timeUnixNano":"1700000000000000000",'
    '"asDouble":1.5,"attributes":[{"key":"host","value":{"stringValue":'
    '"dp"}}]}]}},{"name":"n2","sum":{"dataPoints":[{"timeUnixNano":'
    '"1700000000000000001","asInt":"42"}]}}]}]}]}',
    # histogram: buckets + bounds + sum + count, plus a malformed extra bucket
    '{"resourceMetrics":[{"resource":{},"scopeMetrics":[{"metrics":[{"name":'
    '"h","histogram":{"dataPoints":[{"timeUnixNano":"1700000000000000000",'
    '"count":"6","sum":21.5,"bucketCounts":["1","2","3","4"],'
    '"explicitBounds":[0.1,1]}]}}]}]}]}',
    # histogram without sum, without bounds
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[{"name":"h2",'
    '"histogram":{"dataPoints":[{"timeUnixNano":"1700000000000000000",'
    '"count":"2","bucketCounts":["2"]}]}}]}]}]}',
    # summary with quantiles; integral quantile formats as '1'
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[{"name":"s",'
    '"summary":{"dataPoints":[{"timeUnixNano":"1700000000000000000",'
    '"count":"4","sum":10.0,"quantileValues":[{"quantile":0.5,"value":1.5},'
    '{"quantile":1,"value":3.0}]}]}}]}]}]}',
    # missing value -> err row; bad timestamp -> err row
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[{"name":"m",'
    '"gauge":{"dataPoints":[{"timeUnixNano":"1700000000000000000"}]}}]}]}]}',
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[{"name":"m",'
    '"gauge":{"dataPoints":[{"timeUnixNano":"zap","asDouble":1}]}}]}]}]}',
    # empty containers at every level
    '{"resourceMetrics":[]}',
    '{"resourceMetrics":[{"scopeMetrics":[]}]}',
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[]}]}]}',
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[{"name":"g","gauge":'
    '{"dataPoints":[]}}]}]}]}',
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[{"name":"h","histogram":'
    '{"dataPoints":[{"timeUnixNano":"1700000000000000000","count":"0"}]}}]}]}]}',
    # summary with no quantileValues
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[{"name":"s2","summary":'
    '{"dataPoints":[{"timeUnixNano":"1700000000000000000","count":"1"}]}}]}]}]}',
    # unparseable payloads
    "not json at all",
    '{"foo": 1}',
    '[1,2,3]',
    # null name
    '{"resourceMetrics":[{"scopeMetrics":[{"metrics":[{"gauge":'
    '{"dataPoints":[{"timeUnixNano":"1700000000000000000","asDouble":7}]}}]}]}]}',
]


def _q94_payloads(spark):
    from greptimedb_spark.queries import read

    e = read(spark, SF, "events")
    return e.select(F.format_string(
        '{"resourceMetrics":[{"resource":{"attributes":['
        '{"key":"service.name","value":{"stringValue":"app"}}]},'
        '"scopeMetrics":[{"metrics":[{"name":"Events.Value","gauge":{"dataPoints":['
        '{"timeUnixNano":"%d","asDouble":%s,"attributes":['
        '{"key":"event_type","value":{"stringValue":"%s"}}]}]}}]}]}]}',
        F.unix_micros("ts") * 1000, F.col("value").cast("string"),
        "event_type").alias("payload"))


def _q116_payloads(spark):
    from greptimedb_spark.queries import read

    e = read(spark, SF, "events")
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
    return e.select(payload.alias("payload"))


def _norm(rows):
    out = []
    for r in rows:
        d = r.asDict()
        tags = d["tags"]
        d["tags"] = tuple(sorted(tags.items())) if tags is not None else None
        out.append(tuple(sorted(d.items(), key=lambda kv: kv[0])))
    return sorted(map(repr, out))


def main():
    spark = get_spark()
    edge = spark.createDataFrame([(p,) for p in EDGE_PAYLOADS],
                                 "payload string")
    corpora = {
        "edge": edge,
        "q94": _q94_payloads(spark),
        "q116": _q116_payloads(spark),
    }
    for name, df in corpora.items():
        old = _norm(parse_otlp_metrics_json_union(df).collect())
        new = _norm(proto.parse_otlp_metrics_json(df).collect())
        assert old == new, (
            f"{name}: parity FAILED ({len(old)} vs {len(new)} rows); "
            f"first diff: "
            f"{next((a, b) for a, b in zip(old + ['<end>'], new + ['<end>']) if a != b)}")
        print(f"{name}: parity ok on {len(old)} rows")

    # interleaved noop timing on the real q94/q116 streams
    for name, mk in (("q94", _q94_payloads), ("q116", _q116_payloads)):
        times = {"old": [], "new": []}
        for rep in range(4):
            for label, fn in (("old", parse_otlp_metrics_json_union),
                              ("new", proto.parse_otlp_metrics_json)):
                df = fn(mk(spark)).filter(F.col("err").isNull())
                spark.sparkContext.setJobDescription(f"{name} {label} rep{rep}")
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                times[label].append(round(time.time() - t0, 3))
        print(f"{name}: old={times['old']} new={times['new']}")
    spark.stop()


if __name__ == "__main__":
    main()
