"""Native-histogram model + PromQL function tests.

Semantics mirrored from reference src/common/query/src/native_histogram.rs
estimators and src/promql/src/functions/native_histogram.rs wiring; expected
values are hand-derived from the documented exponential-bucket math
(bucket idx upper bound = 2^(idx / 2^schema)).
"""

from __future__ import annotations

import math

import pytest

from greptimedb_spark.functions.native_histogram import (
    CUSTOM_BUCKETS_SCHEMA,
    HINT_GAUGE,
    NATIVE_HISTOGRAM_SCHEMA,
    NativeHistogram,
    get_bound,
)


def simple_hist(counts=(1.0, 2.0, 1.0), schema=0, sum_=7.0, zero_count=0.0,
                zero_threshold=0.0):
    """schema-0 histogram: positive buckets idx 0..n-1 → (0.5,1], (1,2], (2,4]…"""
    return NativeHistogram(
        schema=schema, zero_threshold=zero_threshold, sum=sum_,
        positive_spans=[(0, len(counts))], positive_buckets=list(counts),
        count=sum(counts) + zero_count, zero_count=zero_count,
    )


class TestModel:
    def test_get_bound_exponential(self):
        assert get_bound(0, 0, []) == 1.0
        assert get_bound(1, 0, []) == 2.0
        assert get_bound(2, 0, []) == 4.0
        assert get_bound(-1, 0, []) == 0.5
        # schema 2: bounds are 2^(idx/4)
        assert get_bound(1, 2, []) == pytest.approx(2 ** 0.25)
        # schema -1: bounds are 4^idx
        assert get_bound(1, -1, []) == 4.0

    def test_get_bound_custom(self):
        cv = [0.1, 1.0, 10.0]
        assert get_bound(-1, CUSTOM_BUCKETS_SCHEMA, cv) == -math.inf
        assert get_bound(0, CUSTOM_BUCKETS_SCHEMA, cv) == 0.1
        assert get_bound(3, CUSTOM_BUCKETS_SCHEMA, cv) == math.inf

    def test_quantile_exponential_interpolation(self):
        h = simple_hist()
        # rank = 0.5*4 = 2 lands in bucket (1,2] with rank_in=1 of 2:
        # exponential interpolation → 2^((log2 1 + log2 2)/2) = sqrt(2)
        assert h.quantile(0.5) == pytest.approx(math.sqrt(2.0))
        assert h.quantile(0.0) <= 1.0
        assert h.quantile(1.0) == pytest.approx(4.0)
        assert h.quantile(-0.1) == -math.inf
        assert h.quantile(1.1) == math.inf
        assert math.isnan(NativeHistogram(count=0.0).quantile(0.5))

    def test_quantile_zero_bucket(self):
        h = NativeHistogram(
            schema=0, zero_threshold=0.25, zero_count=2.0, count=4.0, sum=3.0,
            positive_spans=[(0, 1)], positive_buckets=[2.0],
        )
        # rank=2 falls at the end of the zero bucket [-0.25, 0.25]; with no
        # negative buckets its lower clamps to 0 → linear interp to 0.25
        assert h.quantile(0.5) == pytest.approx(0.25)

    def test_quantile_custom_buckets(self):
        h = NativeHistogram(
            schema=CUSTOM_BUCKETS_SCHEMA, custom_values=[1.0, 2.0, 5.0],
            positive_spans=[(0, 3)], positive_buckets=[2.0, 4.0, 2.0],
            count=8.0, sum=20.0,
        )
        # rank=4 → bucket (1,2]: rank_in=2 of 4 → 1 + 1*0.5 = 1.5
        assert h.quantile(0.5) == pytest.approx(1.5)

    def test_fraction(self):
        h = simple_hist()
        assert h.fraction(0.5, 4.0) == pytest.approx(1.0)
        assert h.fraction(4.0, 0.5) == 0.0
        # (1, 2] holds 2 of 4 observations
        assert h.fraction(1.0, 2.0) == pytest.approx(0.5)
        # half of bucket (1,2] on the log scale: (1, sqrt 2]
        assert h.fraction(1.0, math.sqrt(2.0)) == pytest.approx(0.25)

    def test_stddev_stdvar(self):
        h = simple_hist()
        # midpoints: sqrt(0.5*1)=0.7071, sqrt(2), sqrt(8); mean = 7/4
        mids = [math.sqrt(0.5), math.sqrt(2.0), math.sqrt(8.0)]
        mean = 7.0 / 4.0
        var = (1 * (mids[0] - mean) ** 2 + 2 * (mids[1] - mean) ** 2
               + 1 * (mids[2] - mean) ** 2) / 4.0
        assert h.estimated_stdvar() == pytest.approx(var)
        assert h.estimated_stddev() == pytest.approx(math.sqrt(var))

    def test_add_sub_roundtrip(self):
        a = simple_hist((1.0, 2.0, 1.0), sum_=7.0)
        b = simple_hist((2.0, 0.0, 3.0), sum_=11.0)
        s = a.add(b)
        assert s is not None
        assert s.count == pytest.approx(9.0)
        assert s.sum == pytest.approx(18.0)
        d = s.sub(b)
        assert d is not None
        assert d.count == pytest.approx(a.count)
        assert d.positive_buckets == pytest.approx(a.positive_buckets)

    def test_add_mixed_schema_merges_down(self):
        a = simple_hist((1.0, 1.0), schema=1, sum_=2.0)  # finer
        b = simple_hist((1.0,), schema=0, sum_=1.0)      # coarser
        s = a.add(b)
        assert s is not None
        assert s.schema == 0
        assert s.count == pytest.approx(3.0)

    def test_detect_reset(self):
        a = simple_hist((1.0, 2.0, 1.0))
        grown = simple_hist((2.0, 2.0, 1.0), sum_=9.0)
        assert not grown.detect_reset(a)
        shrunk = simple_hist((0.0, 2.0, 1.0), sum_=5.0)
        assert shrunk.detect_reset(a)

    def test_scale_marks_gauge(self):
        h = simple_hist().scale(-1.0)
        assert h.reset_hint == HINT_GAUGE
        assert h.count == pytest.approx(-4.0)

    def test_from_struct_int_payload(self):
        row = {
            "schema": 0, "zero_threshold": 0.0, "sum": 7.0, "reset_hint": 0,
            "start_timestamp": None, "custom_values": [],
            "positive_span_offsets": [0], "positive_span_lengths": [3],
            "negative_span_offsets": [], "negative_span_lengths": [],
            "count_u64": 4, "zero_count_u64": 0,
            "positive_buckets_i64": [1, 2, 1], "negative_buckets_i64": [],
            "count_f64": None, "zero_count_f64": None,
            "positive_buckets_f64": None, "negative_buckets_f64": None,
        }
        h = NativeHistogram.from_struct(row)
        assert h.count == 4.0
        assert h.positive_buckets == [1.0, 2.0, 1.0]
        # float round-trip
        h2 = NativeHistogram.from_struct(h.to_struct())
        assert h2.quantile(0.5) == pytest.approx(h.quantile(0.5))

    def test_promql_string(self):
        h = simple_hist()
        s = h.promql_string()
        assert s.startswith("{count:4, sum:7")
        assert "(1,2]:2" in s


@pytest.fixture(scope="module")
def hist_table(spark):
    """9 timestamped histograms for one series, counters growing by 1 obs/step."""
    from datetime import datetime, timedelta, timezone

    rows = []
    for i in range(9):
        counts = [1.0 + i, 2.0 + i, 1.0]
        h = NativeHistogram(
            schema=0, sum=7.0 + 2 * i, positive_spans=[(0, 3)],
            positive_buckets=counts, count=sum(counts),
        )
        rows.append({
            "ts": datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=30 * i),
            "host": "a",
            "h": h.to_struct(),
        })
    from pyspark.sql.types import StructField, StructType, StringType, TimestampType

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("host", StringType()),
        StructField("h", NATIVE_HISTOGRAM_SCHEMA),
    ])
    return spark.createDataFrame(rows, schema)


class TestEngine:
    @pytest.fixture(autouse=True)
    def _engine(self, spark, hist_table):
        from greptimedb_spark.promql.engine import MetricTable, PromQLEngine

        self.engine = PromQLEngine(spark, {
            "http_req_duration": MetricTable(
                df=hist_table, value_col="h", time_index="ts", tags=["host"]),
        })

    def _eval(self, q, start=0, end=240_000, step=60_000):
        return self.engine.evaluate(q, start, end, step).collect()

    def test_histogram_count_sum_avg(self):
        rows = self._eval("histogram_count(http_req_duration)")
        assert len(rows) == 5
        # at t=0 counts = 1+2+1 = 4
        by_ts = {r["ts"].second + 60 * r["ts"].minute: r["value"] for r in rows}
        assert by_ts[0] == pytest.approx(4.0)
        rows = self._eval("histogram_sum(http_req_duration)")
        by_ts = {r["ts"].minute: r["value"] for r in rows}
        assert by_ts[0] == pytest.approx(7.0)
        rows = self._eval("histogram_avg(http_req_duration)")
        assert all(r["value"] > 0 for r in rows)

    def test_histogram_quantile_native(self):
        rows = self._eval("histogram_quantile(0.5, http_req_duration)")
        assert len(rows) == 5
        # t=0: same shape as simple_hist → sqrt(2)
        first = min(rows, key=lambda r: r["ts"])
        assert first["value"] == pytest.approx(math.sqrt(2.0))

    def test_histogram_fraction(self):
        rows = self._eval("histogram_fraction(0.5, 4.0, http_req_duration)")
        assert all(r["value"] == pytest.approx(1.0) for r in rows)

    def test_histogram_rate_renders_gauge(self):
        # counter grows 2 obs / 30s in buckets 0 and 1 → rate over 2m
        rows = self._eval("histogram_count(rate(http_req_duration[2m]))",
                          start=120_000, end=240_000, step=60_000)
        assert rows, "rate produced no samples"
        for r in rows:
            assert r["value"] == pytest.approx(2.0 / 30.0, rel=1e-6)

    def test_histogram_sum_aggregation(self):
        rows = self._eval("histogram_count(sum(http_req_duration))")
        assert len(rows) == 5

    def test_histogram_string_render(self):
        rows = self._eval("http_req_duration")
        assert all(r["value"].startswith("{count:") for r in rows)

    def test_last_over_time_histogram(self):
        rows = self._eval("histogram_count(last_over_time(http_req_duration[2m]))")
        assert rows
