"""Prometheus remote READ (sources/prom_remote_read.py) vs the reference's
semantics: http/prom_store.rs:745 remote_read, prom_store.rs:79-159
(special labels / table_name / query_to_plan), :367-457
(recordbatch_to_timeseries), frontend prom_store.rs:115
(negotiate_response_type), :533-640 (read -> snappy ReadResponse)."""

from __future__ import annotations

import pytest

from greptimedb_spark.sources import prom_remote_read as R


def _q(start=0, end=10**15, matchers=()):
    return {"start_timestamp_ms": start, "end_timestamp_ms": end,
            "matchers": list(matchers)}


# ---- wire codecs ----------------------------------------------------------

def test_read_request_roundtrip_packed_and_unpacked():
    queries = [_q(1_000, 2_000, [(R.MATCHER_EQ, "__name__", "up"),
                                 (R.MATCHER_RE, "job", "a|b")]),
               _q(0, 5, [(R.MATCHER_NEQ, "host", "h1")])]
    for packed in (True, False):
        payload = R.encode_read_request(queries, [0, 1], packed=packed)
        req = R.decode_read_request(payload)
        assert req["queries"] == queries
        assert req["accepted_response_types"] == [0, 1]
    # no accepted_response_types field at all
    req = R.decode_read_request(R.encode_read_request(queries))
    assert req["accepted_response_types"] == []


def test_read_response_roundtrip():
    results = [[{"labels": [("__name__", "up"), ("job", "api")],
                 "samples": [(1.5, 1000), (2.5, 2000)]},
                {"labels": [("__name__", "up")], "samples": []}],
               []]
    got = R.decode_read_response(R.encode_read_response(results))
    assert got == results


def test_negotiate_response_type():
    assert R.negotiate_response_type([]) == 0          # default SAMPLES
    assert R.negotiate_response_type([1, 0]) == 0      # FIFO first supported
    with pytest.raises(ValueError, match="does not support"):
        R.negotiate_response_type([1])                 # streamed-only


def test_table_name_of():
    assert R.table_name_of(
        _q(matchers=[(R.MATCHER_EQ, "__name__", "cpu")])) == "cpu"
    with pytest.raises(ValueError, match="missing '__name__'"):
        R.table_name_of(_q(matchers=[(R.MATCHER_EQ, "job", "x")]))
    # non-EQ, empty value, or duplicated __name__ matchers all rejected
    for bad in ([(R.MATCHER_RE, "__name__", "cpu")],
                [(R.MATCHER_EQ, "__name__", "")],
                [(R.MATCHER_EQ, "__name__", "a"),
                 (R.MATCHER_EQ, "__name__", "b")]):
        with pytest.raises(ValueError, match="exactly one"):
            R.table_name_of(_q(matchers=bad))


def test_extract_schema_from_query():
    q = _q(matchers=[(R.MATCHER_EQ, "__database__", "mydb"),
                     (R.MATCHER_EQ, "__name__", "cpu")])
    assert R.extract_schema_from_query(q) == "mydb"
    assert R.extract_schema_from_query(_q(matchers=[])) is None
    # only EQ matchers select a database
    assert R.extract_schema_from_query(
        _q(matchers=[(R.MATCHER_RE, "__schema__", "x")])) is None


def test_resolve_value_column():
    assert R.resolve_value_column("t", ["v"]) == "v"
    assert R.resolve_value_column("t", ["a", "greptime_value"]) \
        == "greptime_value"
    with pytest.raises(ValueError, match="not found"):
        R.resolve_value_column("t", [])
    with pytest.raises(ValueError, match="ambiguous"):
        R.resolve_value_column("t", ["a", "b"])


# ---- scan + conversion over Spark -----------------------------------------

@pytest.fixture(scope="module")
def metric_df(spark):
    rows = [
        # (ts_ms, host, env, value)
        (1_000, "h1", "prod", 1.0),
        (2_000, "h1", "prod", 2.0),
        (3_000, "h2", "dev", 3.0),
        (4_000, "h2", None, 4.0),     # NULL label
        (5_000, "h3", "prod", None),  # NULL sample value
    ]
    return spark.createDataFrame(
        rows, "greptime_timestamp long, host string, env string, "
              "greptime_value double")


def test_query_scan_matchers(metric_df):
    # time range inclusive both ends (query_to_plan gt_eq/lt_eq)
    got = R.query_scan(metric_df, _q(2_000, 4_000), "greptime_timestamp")
    assert sorted(r.greptime_timestamp for r in got.collect()) \
        == [2_000, 3_000, 4_000]
    # EQ / NEQ (NULL never passes either, like SQL equality)
    assert R.query_scan(metric_df, _q(matchers=[(R.MATCHER_EQ, "env",
                                                 "prod")]),
                        "greptime_timestamp").count() == 3
    assert R.query_scan(metric_df, _q(matchers=[(R.MATCHER_NEQ, "env",
                                                 "prod")]),
                        "greptime_timestamp").count() == 1
    # RE is an UNANCHORED search (DataFusion regexp_match ≡ rlike):
    # "ro" matches "prod"
    assert R.query_scan(metric_df, _q(matchers=[(R.MATCHER_RE, "env",
                                                 "ro")]),
                        "greptime_timestamp").count() == 3
    # NRE admits NULL label values (regexp_match(NULL).is_null())
    got = R.query_scan(metric_df, _q(matchers=[(R.MATCHER_NRE, "env",
                                                "prod")]),
                       "greptime_timestamp")
    assert sorted(r.greptime_timestamp for r in got.collect()) \
        == [3_000, 4_000]
    # special labels are skipped, not filtered on
    assert R.query_scan(
        metric_df,
        _q(matchers=[(R.MATCHER_EQ, "__name__", "cpu"),
                     (R.MATCHER_EQ, "__database__", "db")]),
        "greptime_timestamp").count() == 5
    # a matcher on a missing column is a plan error (DataFusion col())
    with pytest.raises(ValueError, match="no column named 'nope'"):
        R.query_scan(metric_df, _q(matchers=[(R.MATCHER_EQ, "nope", "x")]),
                     "greptime_timestamp")


def test_dataframe_to_timeseries(metric_df):
    ts = R.dataframe_to_timeseries("cpu", metric_df, "greptime_timestamp",
                                   "greptime_value")
    # series sorted by (label count, name/value sequence); __name__ first
    keys = [t["labels"] for t in ts]
    assert keys == [
        [("__name__", "cpu"), ("host", "h2")],                  # NULL env dropped
        [("__name__", "cpu"), ("host", "h1"), ("env", "prod")],
        [("__name__", "cpu"), ("host", "h2"), ("env", "dev")],
        [("__name__", "cpu"), ("host", "h3"), ("env", "prod")],
    ]
    by_key = {tuple(t["labels"]): t["samples"] for t in ts}
    assert by_key[(("__name__", "cpu"), ("host", "h1"),
                   ("env", "prod"))] == [(1.0, 1_000), (2.0, 2_000)]
    # NULL value sample skipped but the series still exists
    assert by_key[(("__name__", "cpu"), ("host", "h3"),
                   ("env", "prod"))] == []


def test_remote_read_end_to_end(spark, metric_df):
    from greptimedb_spark.promql.engine import MetricTable

    tables = {"cpu": MetricTable(df=metric_df,
                                 time_index="greptime_timestamp",
                                 value_col="greptime_value",
                                 tags=["host", "env"])}
    payload = R.encode_read_request(
        [_q(0, 10_000, [(R.MATCHER_EQ, "__name__", "cpu"),
                        (R.MATCHER_RE, "host", "h1|h2")]),
         _q(0, 10_000, [(R.MATCHER_EQ, "__name__", "cpu"),
                        (R.MATCHER_EQ, "env", "dev")])],
        accepted_response_types=[0])
    results = R.decode_read_response(R.remote_read(tables, payload))
    assert len(results) == 2
    assert [t["labels"] for t in results[1]] == [
        [("__name__", "cpu"), ("host", "h2"), ("env", "dev")]]
    assert results[1][0]["samples"] == [(3.0, 3_000)]
    first = {tuple(t["labels"]): t["samples"] for t in results[0]}
    assert first[(("__name__", "cpu"), ("host", "h1"),
                  ("env", "prod"))] == [(1.0, 1_000), (2.0, 2_000)]
    # unknown table + streamed-only negotiation raise like the reference
    with pytest.raises(ValueError, match="table not found"):
        R.remote_read(tables, R.encode_read_request(
            [_q(matchers=[(R.MATCHER_EQ, "__name__", "nope")])]))
    with pytest.raises(ValueError, match="does not support"):
        R.remote_read(tables, R.encode_read_request(
            [_q(matchers=[(R.MATCHER_EQ, "__name__", "cpu")])],
            accepted_response_types=[1]))


def test_write_then_read_roundtrip(spark):
    """The full protocol loop: remote-WRITE a fixture, land it as a table,
    remote-READ it back — the two wire halves against each other."""
    from pyspark.sql import functions as F

    from greptimedb_spark.promql.engine import MetricTable
    from greptimedb_spark.sources import protocols as proto

    series = [({"__name__": "mem", "host": "a"}, [(10.0, 1_000),
                                                  (11.0, 2_000)]),
              ({"__name__": "mem", "host": "b"}, [(20.0, 1_500)])]
    payloads = spark.createDataFrame(
        [(bytearray(proto.encode_write_request(series)),)], "payload binary")
    rows = proto.parse_prom_remote_write(payloads).filter(
        F.col("err").isNull())
    mem = rows.select(
        F.col("tags")["host"].alias("host"),
        F.unix_millis(proto.TIME_INDEX).alias(proto.TIME_INDEX),
        F.col(proto.VALUE_COL))
    tables = {"mem": MetricTable(df=mem, time_index=proto.TIME_INDEX,
                                 value_col=proto.VALUE_COL, tags=["host"])}
    resp = R.remote_read(tables, R.encode_read_request(
        [_q(1_000, 1_600, [(R.MATCHER_EQ, "__name__", "mem")])]))
    (result,) = R.decode_read_response(resp)
    got = {tuple(t["labels"]): t["samples"] for t in result}
    assert got == {
        (("__name__", "mem"), ("host", "a")): [(10.0, 1_000)],
        (("__name__", "mem"), ("host", "b")): [(20.0, 1_500)],
    }
