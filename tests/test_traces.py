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


def test_jaeger_wire_envelopes(spark):
    """Jaeger API JSON structs (jaeger_api.py) vs hand-built
    reference-shaped fixtures (jaeger.rs:65-228 struct definitions +
    traces_from_records conversion)."""
    import json

    import pyspark.sql.functions as F

    from greptimedb_spark import jaeger_api as J

    spans = _spans(spark).withColumn(
        "span_status_code",
        F.when(F.col("span_id") == "2", F.lit("STATUS_CODE_ERROR"))
        .otherwise(F.lit("STATUS_CODE_UNSET"))
    ).withColumn(
        "resource_attributes",
        F.concat(F.lit('{"service.name":"'), "service_name",
                 F.lit('","host.name":"h1"}')))

    sv = J.services_response(TR.get_services(spans))
    assert sv == {"data": ["auth", "db", "front"], "total": 3, "limit": 0,
                  "offset": 0, "errors": []}

    ops = J.operations_response(TR.get_operations(spans, "front"))
    assert ops["data"] == [{"name": "GET /", "spanKind": "server"},
                           {"name": "GET /x", "spanKind": "server"}]
    legacy = J.operations_response(TR.get_operations(spans, "front"),
                                   names_only=True)
    assert legacy["data"] == ["GET /", "GET /x"]

    # an operation seen with both NULL and non-NULL span_kind must not
    # TypeError in the sort (span_kind is Option<String> in the reference)
    mixed = J.operations_response(
        TR.get_operations(
            spans.withColumn(
                "span_kind",
                F.when(F.col("span_id") == "1", F.lit(None))
                .otherwise(F.col("span_kind"))), "front"))
    assert {e["name"] for e in mixed["data"]} == {"GET /", "GET /x"}

    # get_trace -> full Trace struct, checked field-for-field
    tr = J.traces_response(TR.get_trace(spans, "B"))
    assert tr["total"] == 1 and tr["errors"] == []
    (trace,) = tr["data"]
    assert trace["traceID"] == "B"
    root, child = trace["spans"]
    assert root == {
        "traceID": "B", "spanID": "4", "operationName": "GET /x",
        "references": [],
        "startTime": 1_000_000,  # epoch-µs of timestamp_millis(1000)
        "duration": 0,           # 100ns // 1000
        "tags": [
            {"key": "env", "type": "string", "value": "dev"},
            {"key": "span.kind", "type": "string", "value": "server"},
        ],
        "logs": [], "processID": "p1",
    }
    # child: CHILD_OF reference synthesized from parent_span_id; second
    # service in the trace allocates p2
    assert child["references"] == [
        {"traceID": "B", "spanID": "4", "refType": "CHILD_OF"}]
    assert child["processID"] == "p2"
    assert trace["processes"] == {
        "p1": {"serviceName": "front", "tags": [
            {"key": "host.name", "type": "string", "value": "h1"}]},
        "p2": {"serviceName": "db", "tags": [
            {"key": "host.name", "type": "string", "value": "h1"}]},
    }

    # find_traces -> traces ordered by trace_id; error status adds the
    # otel.status_code + error:true tags (jaeger.rs:920-938)
    ft = J.traces_response(TR.find_traces(spans, service="auth"))
    (ta,) = ft["data"]
    err_span = next(s for s in ta["spans"] if s["spanID"] == "2")
    assert {"key": "otel.status_code", "type": "string",
            "value": "ERROR"} in err_span["tags"]
    assert {"key": "error", "type": "boolean", "value": True} \
        in err_span["tags"]
    # tags are sorted by key (span.tags.sort_by in the reference)
    for s in ta["spans"]:
        assert [t["key"] for t in s["tags"]] == \
            sorted(t["key"] for t in s["tags"])

    nf = J.trace_not_found_response()
    assert nf == {"data": None, "total": 0, "limit": 0, "offset": 0,
                  "errors": [{"code": 404, "msg": "trace not found"}]}
    assert json.dumps(tr) and json.dumps(ft)


def test_service_dependencies(spark):
    deps = {(r["parent_service"], r["child_service"]): r["call_count"]
            for r in TR.service_dependencies(_spans(spark)).collect()}
    assert deps == {("front", "auth"): 1, ("auth", "db"): 1, ("front", "db"): 1}
