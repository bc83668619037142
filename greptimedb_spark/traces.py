"""Trace read surface: the Jaeger-API analog over greptime_trace_v1 span
rows (reference write path: src/servers/src/otlp/trace.rs; read path:
src/servers/src/http/jaeger.rs — handle_get_services:393,
handle_get_operations:581, handle_find_traces:526, handle_get_trace:449).

Spans are plain rows (the schema parse_otlp_traces_json emits); every query
here is declarative DataFrame algebra:

- get_services / get_operations — distincts with scan-stage filters.
- find_traces — Jaeger semantics: a trace matches if ANY of its spans
  matches all predicates, and the WHOLE trace comes back. Two phases:
  filter spans → distinct matching trace_ids → semi-join the span table.
  At 100 TB the second phase is a broadcast semi-join when the match set is
  small (the common case — Jaeger limits results), else a shuffle join on
  trace_id, which is also the natural partition key for span storage.
- service_dependencies — the read-time service graph the reference derives
  from parent/child span pairs: a self-join on (trace_id, parent_span_id =
  span_id) grouped into caller→callee edge counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_services(spans: DataFrame) -> DataFrame:
    """Distinct service names (jaeger.rs handle_get_services)."""
    return spans.select("service_name").where(
        F.col("service_name").isNotNull()).distinct()


def get_operations(spans: DataFrame, service: str,
                   span_kind: str | None = None) -> DataFrame:
    """Distinct (operation, kind) for one service; optional kind filter
    takes the bare Jaeger kind ('server' → SPAN_KIND_SERVER)."""
    out = spans.filter(F.col("service_name") == service)
    if span_kind is not None:
        out = out.filter(
            F.col("span_kind") == "SPAN_KIND_" + span_kind.upper())
    return out.select(
        F.col("span_name").alias("operation"), "span_kind").distinct()


def find_traces(
    spans: DataFrame,
    service: str | None = None,
    operation: str | None = None,
    tags: dict | None = None,
    min_duration_ns: int | None = None,
    max_duration_ns: int | None = None,
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> DataFrame:
    """Jaeger FindTraces: return EVERY span of every trace in which at
    least one span satisfies all the predicates (jaeger.rs:526). ``tags``
    match against the span_attributes JSON."""
    cond = F.lit(True)
    if service is not None:
        cond = cond & (F.col("service_name") == service)
    if operation is not None:
        cond = cond & (F.col("span_name") == operation)
    if min_duration_ns is not None:
        cond = cond & (F.col("duration_nano") >= min_duration_ns)
    if max_duration_ns is not None:
        cond = cond & (F.col("duration_nano") <= max_duration_ns)
    if start_ms is not None:
        cond = cond & (F.unix_millis("timestamp") >= start_ms)
    if end_ms is not None:
        cond = cond & (F.unix_millis("timestamp") <= end_ms)
    if tags:
        # span_attributes is a flat JSON object; OTel keys are routinely
        # dotted (http.method), which JSONPath `$.k` would misread as a
        # nested path — parse to a map and look keys up exactly instead.
        attrs = F.from_json("span_attributes", "map<string,string>")
        for k, v in tags.items():
            cond = cond & (F.element_at(attrs, F.lit(k)) == v)
    matching = spans.filter(cond).select("trace_id").distinct()
    return spans.join(matching, "trace_id", "left_semi")


def get_trace(spans: DataFrame, trace_id: str) -> DataFrame:
    """All spans of one trace, root-first (jaeger.rs handle_get_trace)."""
    return spans.filter(F.col("trace_id") == trace_id).orderBy("timestamp")


def service_dependencies(spans: DataFrame) -> DataFrame:
    """Caller→callee service edges with call counts, derived from
    parent/child span pairs inside each trace — the service-dependency
    graph Jaeger's /api/dependencies serves. One self-join keyed on
    (trace_id, span_id): at scale both sides share the trace_id partition
    key, so the join co-locates."""
    parents = spans.select(
        F.col("trace_id").alias("t"),
        F.col("span_id").alias("pid"),
        F.col("service_name").alias("parent_service"),
    )
    children = spans.filter(
        F.col("parent_span_id").isNotNull() & (F.col("parent_span_id") != "")
    ).select(
        F.col("trace_id").alias("t"),
        F.col("parent_span_id").alias("pid"),
        F.col("service_name").alias("child_service"),
    )
    return (
        children.join(parents, ["t", "pid"])
        .filter(F.col("parent_service") != F.col("child_service"))
        .groupBy("parent_service", "child_service")
        .agg(F.count(F.lit(1)).alias("call_count"))
    )
