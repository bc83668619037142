"""Trace read surface (traces.py): Jaeger-API semantics over span rows."""

from pyspark.sql import Row

from greptimedb_spark import traces as TR


def _spans(spark):
    rows = [
        # trace A: front -> auth -> db
        Row(trace_id="A", span_id="1", parent_span_id=None,
            service_name="front", span_name="GET /", span_kind="SPAN_KIND_SERVER",
            duration_nano=900, span_attributes='{"env":"prod"}'),
        Row(trace_id="A", span_id="2", parent_span_id="1",
            service_name="auth", span_name="check", span_kind="SPAN_KIND_CLIENT",
            duration_nano=300, span_attributes="{}"),
        Row(trace_id="A", span_id="3", parent_span_id="2",
            service_name="db", span_name="query", span_kind="SPAN_KIND_CLIENT",
            duration_nano=200, span_attributes="{}"),
        # trace B: front -> db
        Row(trace_id="B", span_id="4", parent_span_id=None,
            service_name="front", span_name="GET /x", span_kind="SPAN_KIND_SERVER",
            duration_nano=100, span_attributes='{"env":"dev"}'),
        Row(trace_id="B", span_id="5", parent_span_id="4",
            service_name="db", span_name="query", span_kind="SPAN_KIND_CLIENT",
            duration_nano=50, span_attributes="{}"),
    ]
    import pyspark.sql.functions as F

    return spark.createDataFrame(rows).withColumn(
        "timestamp", F.timestamp_millis(F.lit(1000)))


def test_services_and_operations(spark):
    spans = _spans(spark)
    assert {r["service_name"] for r in TR.get_services(spans).collect()} == \
        {"front", "auth", "db"}
    ops = {(r["operation"], r["span_kind"])
           for r in TR.get_operations(spans, "front").collect()}
    assert ops == {("GET /", "SPAN_KIND_SERVER"), ("GET /x", "SPAN_KIND_SERVER")}
    assert TR.get_operations(spans, "front", span_kind="client").count() == 0


def test_find_traces_whole_trace(spark):
    spans = _spans(spark)
    # auth only appears in trace A, but the WHOLE trace (3 spans) returns
    got = TR.find_traces(spans, service="auth").collect()
    assert sorted(r["span_id"] for r in got) == ["1", "2", "3"]
    # duration predicate matches span 1 only -> still the whole trace A
    got = TR.find_traces(spans, min_duration_ns=500).collect()
    assert sorted(r["span_id"] for r in got) == ["1", "2", "3"]
    # tag match against span_attributes JSON
    got = TR.find_traces(spans, tags={"env": "dev"}).collect()
    assert sorted(r["span_id"] for r in got) == ["4", "5"]
    assert TR.get_trace(spans, "B").count() == 2


def test_find_traces_dotted_tag_keys(spark):
    # OTel attribute keys are routinely dotted (http.method); the lookup
    # must treat them as flat map keys, not JSONPath nesting
    import pyspark.sql.functions as F

    spans = _spans(spark).withColumn(
        "span_attributes",
        F.when(F.col("span_id") == "1",
               F.lit('{"http.method":"GET","http.status_code":"200"}'))
        .otherwise(F.col("span_attributes")))
    got = TR.find_traces(spans, tags={"http.method": "GET"}).collect()
    assert sorted(r["span_id"] for r in got) == ["1", "2", "3"]
    assert TR.find_traces(spans, tags={"http.method": "POST"}).count() == 0
    # two dotted predicates AND together
    got = TR.find_traces(
        spans, tags={"http.method": "GET", "http.status_code": "200"})
    assert got.count() == 3


def test_service_dependencies(spark):
    deps = {(r["parent_service"], r["child_service"]): r["call_count"]
            for r in TR.service_dependencies(_spans(spark)).collect()}
    assert deps == {("front", "auth"): 1, ("auth", "db"): 1, ("front", "db"): 1}
