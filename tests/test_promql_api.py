"""format_query / parse_query endpoints (promql/api.py) vs the reference's
wire goldens (tests-integration/tests/http.rs:872-881, :1410-1432) and
Prometheus's public String()/prettify/translateAST behavior."""

from __future__ import annotations

from greptimedb_spark.promql import api as A
from greptimedb_spark.promql.parser import parse_promql


def test_reference_wire_goldens():
    # http.rs:878 — format_query
    assert A.format_query("foo/bar") == {"status": "success",
                                         "data": "foo / bar"}
    # http.rs:1421 — parse_query vectorSelector shape, field for field
    assert A.parse_query("http_requests") == {
        "status": "success",
        "data": {"type": "vectorSelector", "name": "http_requests",
                 "matchers": [], "offset": 0, "startOrEnd": None,
                 "timestamp": None}}
    # http.rs:1431 — parse failure envelope
    assert A.parse_query("not http_requests") == {
        "status": "error", "error": "invalid promql query",
        "errorType": "InvalidArguments"}
    assert A.format_query("{{bad") == {
        "status": "error", "error": "invalid promql query",
        "errorType": "InvalidArguments"}
    assert A.parse_query(None) == {
        "status": "error", "error": "query is required",
        "errorType": "InvalidArguments"}


def test_canonical_string():
    cases = {
        "foo/bar": "foo / bar",
        'up{job="api",instance=~"i.*"}': 'up{job="api", instance=~"i.*"}',
        "sum(rate(x[5m]))": "sum(rate(x[5m]))",
        "sum by (job) (x)": "sum by (job) (x)",
        "topk(5, x)": "topk(5, x)",
        "a - b - c": "a - b - c",          # left-assoc: no parens
        "a - (b - c)": "a - (b - c)",      # needed parens reconstructed
        "a * (b + c)": "a * (b + c)",
        "(a ^ b) ^ c": "(a ^ b) ^ c",      # ^ is right-assoc
        "a ^ b ^ c": "a ^ b ^ c",
        "x and y or z": "x and y or z",
        "-x + y": "-x + y",
        "x[5m:1m]": "x[5m:1m]",
        "rate(x[5m] offset 1m)": "rate(x[5m] offset 1m)",
        "x offset -5m": "x offset -5m",
        "a / on (job) group_left (env) b":
            "a / on (job) group_left (env) b",
        "a > bool b": "a > bool b",
    }
    for src, want in cases.items():
        assert A.to_promql(parse_promql(src)) == want, src


def test_duration_format():
    assert A._dur(90_000) == "1m30s"
    assert A._dur(300_000) == "5m"
    assert A._dur(3_600_000) == "1h"
    assert A._dur(90_061_000) == "1d1h1m1s"
    assert A._dur(1500) == "1s500ms"
    assert A._dur(0) == "0s"


def test_prettify_splits_long_expressions():
    long = ("sum by (instance, job, region) (rate(http_requests_total{"
            'job="very-long-job-name", region="us-east-1"}[5m])) '
            "+ sum(rate(errors_total[5m]))")
    out = A.format_query(long)["data"]
    lines = out.split("\n")
    assert len(lines) > 1
    # binary split: operator alone on its own line at the parent level
    assert "+" in [ln.strip() for ln in lines]
    # children indented two spaces per level
    assert lines[0].startswith("  sum by (instance, job, region) (")
    # short expressions stay single-line
    assert "\n" not in A.format_query("sum(rate(x[5m]))")["data"]


def test_parse_query_ast_shapes():
    # matrixSelector
    d = A.parse_query("x[5m] offset 1m")["data"]
    assert d == {"type": "matrixSelector", "name": "x", "matchers": [],
                 "offset": 60_000, "range": 300_000,
                 "startOrEnd": None, "timestamp": None}
    # call with function signature
    d = A.parse_query("rate(x[5m])")["data"]
    assert d["type"] == "call"
    assert d["func"] == {"name": "rate", "argTypes": ["matrix"],
                         "variadic": 0, "returnType": "vector"}
    # aggregation with param + without
    d = A.parse_query("topk without (env) (5, x)")["data"]
    assert d["type"] == "aggregation" and d["op"] == "topk"
    assert d["param"] == {"type": "numberLiteral", "val": "5"}
    assert d["grouping"] == ["env"] and d["without"] is True
    # binaryExpr with vector matching
    d = A.parse_query("a / on (job) group_left (env) b")["data"]
    assert d["type"] == "binaryExpr" and d["op"] == "/"
    assert d["matching"] == {"card": "many-to-one", "labels": ["job"],
                             "on": True, "include": ["env"]}
    assert d["bool"] is False
    # plain arithmetic: matching is null
    d = A.parse_query("1 + 2")["data"]
    assert d["matching"] is None
    assert d["lhs"] == {"type": "numberLiteral", "val": "1"}
    # subquery
    d = A.parse_query("rate(x[5m])[30m:1m]")["data"]
    assert d["type"] == "subquery" and d["range"] == 1_800_000 \
        and d["step"] == 60_000
    # unary + literals
    d = A.parse_query("-x")["data"]
    assert d["type"] == "unaryExpr" and d["op"] == "-"
    assert A.parse_query('"hi"')["data"] == {"type": "stringLiteral",
                                             "val": "hi"}
    # @ modifier
    d = A.parse_query("x @ start()")["data"]
    assert d["startOrEnd"] == "start" and d["timestamp"] is None
