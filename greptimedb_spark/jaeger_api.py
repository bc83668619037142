"""Jaeger HTTP API wire envelopes over the trace read surface.

`traces.py` returns DataFrames with the reference's span columns; this
module is the last-mile codec that shapes those rows into the exact JSON
structs Jaeger clients consume — the reference's
src/servers/src/http/jaeger.rs:

- `JaegerAPIResponse` {data, total, limit, offset, errors} (jaeger.rs:65)
- `Trace` {traceID, spans[], processes{}, warnings[]} (jaeger.rs:121)
- `Span` camelCase fields with CHILD_OF references synthesized from
  parent_span_id, epoch-µs startTime/duration, and tags assembled from
  span_attributes + span.kind + otel.status_code (traces_from_records,
  jaeger.rs:764-1046)
- process allocation: per-trace `p1, p2, …` ids in span encounter order,
  process tags = resource_attributes minus service.name (jaeger.rs:1000-1041)

Like http_api.py, rendering materializes on the driver — the protocol
edge, same as the reference's result encoders; apply limits upstream.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from greptimedb_spark.http_api import _epoch_us

# jaeger.rs:55-56
TRACE_NOT_FOUND_ERROR_CODE = 404
TRACE_NOT_FOUND_ERROR_MSG = "trace not found"
_REF_TYPE_CHILD_OF = "CHILD_OF"

# otlp/trace.rs:48-66 — tag keys and status literals
_KEY_SERVICE_NAME = "service.name"
_KEY_SPAN_KIND = "span.kind"
_KEY_OTEL_SCOPE_NAME = "otel.scope.name"
_KEY_OTEL_SCOPE_VERSION = "otel.scope.version"
_KEY_OTEL_STATUS_CODE = "otel.status_code"
_KEY_OTEL_STATUS_MESSAGE = "otel.status_description"
_KEY_OTEL_STATUS_ERROR = "error"
_KEY_OTEL_TRACE_STATE = "w3c.tracestate"
_SPAN_STATUS_UNSET = "STATUS_CODE_UNSET"
_SPAN_STATUS_ERROR = "STATUS_CODE_ERROR"


def _api_response(data, total: int | None = None, errors=()) -> dict:
    """JaegerAPIResponse envelope (jaeger.rs:65-71): every field is always
    serialized (no serde skips on the response struct itself)."""
    if total is None:
        total = len(data) if isinstance(data, list) else 0
    return {"data": data, "total": total, "limit": 0, "offset": 0,
            "errors": list(errors)}


def trace_not_found_response() -> dict:
    """JaegerAPIResponse::trace_not_found (jaeger.rs:74-87)."""
    return {"data": None, "total": 0, "limit": 0, "offset": 0,
            "errors": [{"code": TRACE_NOT_FOUND_ERROR_CODE,
                        "msg": TRACE_NOT_FOUND_ERROR_MSG}]}


def services_response(df: DataFrame) -> dict:
    """/api/services envelope: JaegerData::ServiceNames
    (handle_get_services, jaeger.rs:393 + services_from_records)."""
    names = [r[0] for r in df.select("service_name").collect()
             if r[0] is not None]
    return _api_response(sorted(names))


def operations_response(df: DataFrame, names_only: bool = False) -> dict:
    """/api/operations envelope: Operation structs {name, spanKind}
    (jaeger.rs:112-117); ``names_only`` gives the legacy
    /api/services/{svc}/operations shape (JaegerData::OperationsNames —
    plain strings)."""
    # span_kind is Option<String> in the reference — None-safe sort key
    # so an operation seen with both NULL and non-NULL kinds still sorts.
    rows = sorted({(r["operation"], r["span_kind"]) for r in df.collect()},
                  key=lambda t: (t[0], t[1] or ""))
    if names_only:
        return _api_response(sorted({op for op, _ in rows}))
    data = []
    for op, kind in rows:
        entry = {"name": op}
        if kind:
            entry["spanKind"] = _normalize_span_kind(kind)
        data.append(entry)
    return _api_response(data)


def _normalize_span_kind(span_kind: str) -> str:
    """SPAN_KIND_SERVER -> server (jaeger.rs:1147-1155)."""
    return span_kind.removeprefix("SPAN_KIND_").lower()


def _normalize_status_code(status: str) -> str:
    """STATUS_CODE_ERROR -> ERROR (jaeger.rs:1159-1167)."""
    return status.removeprefix("STATUS_CODE_")


def _to_keyvalue(key: str, value) -> dict | None:
    """KeyValue with Jaeger value typing (to_keyvalue, jaeger.rs:1048-1077):
    strings stay strings, numbers -> int64, bools -> boolean, nested
    arrays/objects re-serialize as JSON strings, nulls drop."""
    if value is None:
        return None
    if isinstance(value, bool):
        return {"key": key, "type": "boolean", "value": value}
    if isinstance(value, int):
        return {"key": key, "type": "int64", "value": value}
    if isinstance(value, float):
        return {"key": key, "type": "float64", "value": value}
    if isinstance(value, (list, dict)):
        return {"key": key, "type": "string",
                "value": json.dumps(value, separators=(",", ":"))}
    return {"key": key, "type": "string", "value": str(value)}


def _string_kv(key: str, value: str) -> dict:
    return {"key": key, "type": "string", "value": value}


def traces_response(df: DataFrame) -> dict:
    """find_traces/get_trace envelope: JaegerData::Traces — the
    traces_from_records conversion (jaeger.rs:764-1046) over the span
    columns `traces.py` queries produce. Traces come back ordered by
    trace_id (the reference's BTreeMap), spans in row order, each span's
    tags sorted by key."""
    cols = set(df.columns)
    ts_ntz = isinstance(df.schema["timestamp"].dataType, T.TimestampNTZType) \
        if "timestamp" in cols else True
    trace_spans: dict[str, list] = {}
    trace_procs: dict[str, dict[str, str]] = {}  # trace -> service -> pN
    service_tags: dict[str, list] = {}

    for row in df.collect():
        r = row.asDict()
        trace_id = r.get("trace_id") or ""
        span = {
            "traceID": trace_id,
            "spanID": r.get("span_id") or "",
            "operationName": r.get("span_name") or "",
            "references": [],
            "startTime": 0,
            "duration": 0,
            "tags": [],
            "logs": [],
        }
        ts = r.get("timestamp")
        if ts is not None:
            span["startTime"] = _epoch_us(ts, ts_ntz)
        if r.get("duration_nano") is not None:
            span["duration"] = int(r["duration_nano"]) // 1000
        parent = r.get("parent_span_id")
        if parent:
            span["references"].append({
                "traceID": trace_id, "spanID": parent,
                "refType": _REF_TYPE_CHILD_OF})

        tags: list = []
        attrs = r.get("span_attributes")
        if attrs:
            try:
                for k, v in json.loads(attrs).items():
                    kv = _to_keyvalue(k, v)
                    if kv is not None:
                        tags.append(kv)
            except (json.JSONDecodeError, AttributeError):
                pass
        if r.get("scope_name"):
            tags.append(_string_kv(_KEY_OTEL_SCOPE_NAME, r["scope_name"]))
        if r.get("scope_version"):
            tags.append(_string_kv(_KEY_OTEL_SCOPE_VERSION,
                                   r["scope_version"]))
        if r.get("span_kind"):
            tags.append(_string_kv(
                _KEY_SPAN_KIND, _normalize_span_kind(r["span_kind"])))
        status = r.get("span_status_code")
        if status and status != _SPAN_STATUS_UNSET:
            tags.append(_string_kv(_KEY_OTEL_STATUS_CODE,
                                   _normalize_status_code(status)))
            if status == _SPAN_STATUS_ERROR:
                tags.append({"key": _KEY_OTEL_STATUS_ERROR,
                             "type": "boolean", "value": True})
        if r.get("span_status_message"):
            tags.append(_string_kv(_KEY_OTEL_STATUS_MESSAGE,
                                   r["span_status_message"]))
        if r.get("trace_state"):
            tags.append(_string_kv(_KEY_OTEL_TRACE_STATE, r["trace_state"]))
        span["tags"] = sorted(tags, key=lambda kv: kv["key"])

        service = r.get("service_name")
        if service:
            if service not in service_tags:
                rtags = []
                res = r.get("resource_attributes")
                if res:
                    try:
                        obj = json.loads(res)
                        obj.pop(_KEY_SERVICE_NAME, None)
                        rtags = [kv for k, v in obj.items()
                                 if (kv := _to_keyvalue(k, v)) is not None]
                    except (json.JSONDecodeError, AttributeError):
                        pass
                service_tags[service] = rtags
            procs = trace_procs.setdefault(trace_id, {})
            if service not in procs:
                procs[service] = f"p{len(procs) + 1}"
            span["processID"] = procs[service]

        trace_spans.setdefault(trace_id, []).append(span)

    traces = []
    for trace_id in sorted(trace_spans):
        trace = {"traceID": trace_id, "spans": trace_spans[trace_id]}
        procs = trace_procs.get(trace_id, {})
        if procs:
            trace["processes"] = {
                pid: {"serviceName": svc,
                      "tags": service_tags.get(svc, [])}
                for svc, pid in procs.items()}
        traces.append(trace)
    return _api_response(traces)
