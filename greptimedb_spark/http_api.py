"""HTTP API response codecs: the reference's wire-JSON result shapes.

The reference serves query results over HTTP in two primary JSON envelopes:

- GreptimedbV1 (``/v1/sql``): ``{"output": [{"records": {"schema":
  {"column_schemas": [{"name", "data_type"}]}, "rows": [[...]],
  "total_rows": N}}], "execution_time_ms": T}`` — struct shapes from
  src/servers/src/http.rs:284-336 (ColumnSchema/OutputSchema/
  HttpRecordsOutput) and http/result/greptime_result_v1.rs:30; DDL/DML
  statements render as ``{"affectedrows": N}`` (GreptimeQueryOutput,
  http.rs:388-392, serde lowercase).
- Prometheus (``/v1/prometheus/api/v1/query_range``): ``{"status":
  "success", "data": {"resultType": "matrix"|"vector", "result": [...]}}``
  with per-series ``{"metric": {...}, "values": [[ts, "v"], ...]}`` —
  http/prometheus.rs:82-137 (PromSeriesVector/PromSeriesMatrix/PromData).

The HTTP server itself is out of scope (wire servers, SURVEY §2.1); these
codecs are the last mile so an API consumer of the reference can read this
engine's results unchanged. Rendering a response necessarily materializes
it on the driver — apply LIMIT before formatting, exactly as the
reference's `with_limit` does (greptime_result_v1.rs:66-69).
"""

from __future__ import annotations

import base64
import math
from datetime import date, datetime, timezone
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Spark type -> the reference's ConcreteDataType display name. Spark
# timestamps are µs-resolution, so the honest column type is
# TimestampMicrosecond (values below are emitted as epoch-µs integers,
# matching the reference's convention of raw integers in the column's own
# unit — its ms columns show epoch-ms ints in http.rs test goldens).
_TYPE_NAMES = {
    T.StringType: "String",
    T.BooleanType: "Boolean",
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.TimestampType: "TimestampMicrosecond",
    T.TimestampNTZType: "TimestampMicrosecond",
    T.DateType: "Date",
    T.BinaryType: "Binary",
}


def greptime_type_name(dt: T.DataType) -> str:
    """Reference type name for a Spark type (Json for nested types the
    reference would shred or store as JSON)."""
    if isinstance(dt, T.DecimalType):
        return f"Decimal128({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"List<{greptime_type_name(dt.elementType)}>"
    if isinstance(dt, (T.MapType, T.StructType)):
        return "Json"
    return _TYPE_NAMES.get(type(dt), dt.simpleString())


def _cell(v):
    """One JSON cell: epoch-µs ints for timestamps, ISO strings for dates,
    strings for decimals (lossless), base64 for binary, null for
    non-finite floats (serde_json's f64 behavior)."""
    if v is None:
        return None
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float) and not math.isfinite(v):
        return None
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, (list, dict)):
        return v
    return v


def sql_response(result, execution_time_ms: int = 0) -> dict:
    """GreptimedbV1 `/v1/sql` envelope for one statement's result: a
    DataFrame renders as a records output, an int as affectedrows, and
    None (DDL with no result set) as an empty output list."""
    if result is None:
        output = []
    elif isinstance(result, int):
        output = [{"affectedrows": result}]
    else:
        rows = result.collect()
        output = [{
            "records": {
                "schema": {"column_schemas": [
                    {"name": f.name, "data_type": greptime_type_name(f.dataType)}
                    for f in result.schema.fields
                ]},
                "rows": [[_cell(v) for v in row] for row in rows],
                "total_rows": len(rows),
            }
        }]
    return {"output": output, "execution_time_ms": int(execution_time_ms)}


def _fmt_sample(v) -> str:
    """Prometheus sample-value string: Go's FormatFloat(v, 'f', -1, 64) —
    shortest decimal that round-trips, never exponent notation."""
    f = float(v)
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "+Inf" if f > 0 else "-Inf"
    s = repr(f)
    if "e" in s or "E" in s:  # expand: the 'f' verb never uses exponents
        s = format(Decimal(s), "f")
    if s.endswith(".0"):
        s = s[:-2]
    return s


def prometheus_response(df: DataFrame, result_type: str = "matrix") -> dict:
    """Prometheus HTTP API envelope for a PromQLEngine.evaluate() result
    (columns: ts timestamp, *labels, value). ``matrix`` groups samples per
    labelset; ``vector`` keeps each labelset's LAST sample (an instant
    query is a one-step range query here). Values are [epoch-seconds,
    "formatted"] pairs like the reference emits."""
    label_cols = [c for c in df.columns if c not in ("ts", "value")]
    rows = df.collect()
    series: dict = {}
    for r in rows:
        key = tuple((c, r[c]) for c in label_cols if r[c] is not None)
        ts = r["ts"]
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        series.setdefault(key, []).append(
            (ts.timestamp(), _fmt_sample(r["value"])))
    result = []
    for key in sorted(series, key=lambda k: sorted(k)):
        samples = sorted(series[key])
        metric = {k: v for k, v in key}
        if result_type == "matrix":
            result.append({"metric": metric, "values": [list(s) for s in samples]})
        elif result_type == "vector":
            result.append({"metric": metric, "value": list(samples[-1])})
        else:
            raise ValueError(f"unsupported resultType: {result_type}")
    return {"status": "success",
            "data": {"resultType": result_type, "result": result}}


def _json_cell_str(v) -> str:
    """serde_json Value::to_string() semantics (table format): strings keep
    their JSON quotes, null renders as 'null'."""
    import json

    return json.dumps(_cell(v), separators=(",", ":"))


def table_response(result, execution_time_ms: int = 0) -> str:
    """ASCII `table` response format (http/result/table_result.rs:75-126):
    box-drawing header/rows/footer, column widths from max(name, cells);
    affected-rows statements render as 'N\\n'."""
    if result is None:
        return ""
    if isinstance(result, int):
        return f"{result}\n"
    names = [f.name for f in result.schema.fields]
    rows = [[_json_cell_str(v) for v in row] for row in result.collect()]
    width = [len(n) for n in names]
    for row in rows:
        for i, s in enumerate(row):
            width[i] = max(width[i], len(s))
    out = ["┌" + "┬".join(
        "─" + n.ljust(width[i], "─") + "─" for i, n in enumerate(names)) + "┐"]
    for row in rows:
        out.append("│" + "│".join(
            " " + s.ljust(width[i]) + " " for i, s in enumerate(row)) + "│")
    out.append("└" + "┴".join("─" * (w + 2) for w in width) + "┘")
    return "\n".join(out) + "\n"


def csv_response(result, with_names: bool = False,
                 with_types: bool = False) -> str:
    """RFC-4180 `csv` response format (csv_result.rs:28-150): CRLF rows,
    optional leading names/types rows; NULL -> empty field; affected-rows
    statements render as 'N\\n'."""
    import csv
    import io

    if result is None:
        return ""
    if isinstance(result, int):
        return f"{result}\n"

    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\r\n")
    if with_names:
        w.writerow([f.name for f in result.schema.fields])
    if with_types:
        w.writerow([greptime_type_name(f.dataType)
                    for f in result.schema.fields])

    def cell(v):
        v = _cell(v)
        if v is None:
            return ""
        if isinstance(v, (list, dict)):
            import json

            return json.dumps(v, separators=(",", ":"))
        return v

    for row in result.collect():
        w.writerow([cell(v) for v in row])
    return buf.getvalue()


_EPOCH_DIVISOR_US = {"ns": None, "u": 1, "µ": 1, "us": 1,
                     "ms": 1_000, "s": 1_000_000}


def influxdb_v1_response(result, epoch: str | None = None,
                         execution_time_ms: int = 0) -> dict:
    """InfluxDB v1 `/query`-style envelope (influxdb_result_v1.rs:42-196):
    {"results": [{"statement_id": 0, "series": [{"name": "", "columns",
    "values"}]}]}. ``epoch`` renders timestamp columns as epoch ints at
    that precision ([ns, u, µ, ms, s], like the reference's SqlQuery
    param); default is ISO-8601 strings."""
    if epoch is not None and epoch not in _EPOCH_DIVISOR_US:
        raise ValueError(f"unsupported epoch precision: {epoch}")

    def cell(v):
        if isinstance(v, datetime) and epoch is not None:
            if v.tzinfo is None:
                v = v.replace(tzinfo=timezone.utc)
            us = int(v.timestamp() * 1_000_000)
            div = _EPOCH_DIVISOR_US[epoch]
            return us * 1000 if div is None else us // div
        if isinstance(v, datetime):
            return v.isoformat()
        return _cell(v)

    series = []
    if isinstance(result, DataFrame):
        series.append({
            "name": "",
            "columns": [f.name for f in result.schema.fields],
            "values": [[cell(v) for v in row] for row in result.collect()],
        })
    return {
        "results": [{"statement_id": 0, "series": series}],
        "execution_time_ms": int(execution_time_ms),
    }


def arrow_response(result) -> bytes:
    """`arrow` response format: the result as one Arrow IPC stream —
    byte-compatible with any Arrow reader, like the reference's
    arrow_result.rs (which writes the RecordBatches through
    arrow-ipc's StreamWriter)."""
    import io

    import pyarrow as pa

    tbl = result.toArrow()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue()


def null_response(result) -> str:
    """`null` response format: execute for effect, emit nothing (the
    reference's null_result.rs still runs the query — callers use it for
    benchmarking transfer-free execution)."""
    if isinstance(result, DataFrame):
        result.foreach(lambda _row: None)  # materialize without transfer
    return ""
