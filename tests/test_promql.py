"""PromQL engine semantics — hand-computed Prometheus-conformant goldens.

Counter fixture mirrors FIXTURES.md §2 (http_requests): 15s scrape interval,
known resets, a gappy series for staleness/lookback checks.
"""

import math

import pytest
from pyspark.sql import functions as F

from greptimedb_spark.promql import MetricTable, PromQLEngine
from greptimedb_spark.promql.parser import (
    Aggregate, BinaryOp, Call, NumberLiteral, VectorSelector, parse_promql,
)

M = 60_000


@pytest.fixture(scope="module")
def engine(spark):
    # counter: two series; api/i1 increments by 10 per 15s; api/i2 by 5 with a
    # reset (drop to 0) at t=120s. Samples every 15s from 0 to 600s.
    rows = []
    v1 = v2 = 0.0
    for i in range(41):
        t = i * 15_000
        rows.append((t, "api", "i1", v1))
        if i == 8:  # t=120s reset
            v2 = 0.0
        rows.append((t, "api", "i2", v2))
        v1 += 10
        v2 += 5
    # gauge with a 2.5-minute gap on one series (for lookback/staleness)
    grows = []
    for i in range(41):
        t = i * 15_000
        grows.append((t, "g1", float(i)))
        if not (10 <= i < 20):
            grows.append((t, "g2", float(100 + i)))
    # classic histogram buckets at one timestamp-ish series
    hrows = []
    for i in range(41):
        t = i * 15_000
        for le, cnt in [("0.1", 1.0), ("0.5", 3.0), ("1", 4.0), ("+Inf", 5.0)]:
            hrows.append((t, "api", le, cnt))

    def mk(rs, schema, tags):
        df = spark.createDataFrame(rs, schema).selectExpr(
            "timestamp_millis(t) AS ts", *schema.split(", ")[1:][0:0] or []
        )
        return df

    cdf = spark.createDataFrame(rows, "t long, job string, instance string, value double") \
        .selectExpr("timestamp_millis(t) AS ts", "job", "instance", "value")
    gdf = spark.createDataFrame(grows, "t long, inst string, value double") \
        .selectExpr("timestamp_millis(t) AS ts", "inst", "value")
    hdf = spark.createDataFrame(hrows, "t long, job string, le string, value double") \
        .selectExpr("timestamp_millis(t) AS ts", "job", "le", "value")
    return PromQLEngine(
        spark,
        {
            "http_requests_total": MetricTable(cdf, tags=["job", "instance"]),
            "node_gauge": MetricTable(gdf, tags=["inst"]),
            "request_duration_bucket": MetricTable(hdf, tags=["job", "le"]),
        },
    )


def _vals(df, label=None):
    out = {}
    for r in df.collect():
        key = int(r.ts.timestamp() * 1000)
        if label:
            key = (key, r[label])
        out[key] = r.value
    return out


# -- parser ---------------------------------------------------------------------

def test_parse_selector():
    ast = parse_promql('http_requests_total{job="api", instance=~"i.*"}[5m] offset 1m')
    assert isinstance(ast, VectorSelector)
    assert ast.metric == "http_requests_total"
    assert ast.range_ms == 300_000 and ast.offset_ms == 60_000
    assert [(m.name, m.op) for m in ast.matchers] == [("job", "="), ("instance", "=~")]


def test_parse_precedence():
    ast = parse_promql("a + b * c")
    assert isinstance(ast, BinaryOp) and ast.op == "+"
    assert isinstance(ast.rhs, BinaryOp) and ast.rhs.op == "*"


def test_parse_aggregate_modifiers():
    ast = parse_promql("sum by (job) (rate(http_requests_total[5m]))")
    assert isinstance(ast, Aggregate) and ast.by == ["job"]
    assert isinstance(ast.expr, Call) and ast.expr.func == "rate"


def test_parse_bool_and_on():
    ast = parse_promql("a > bool on (job) group_left (x) b")
    assert ast.bool_modifier and ast.matching.on == ["job"]
    assert ast.matching.group_left == ["x"]


# -- instant selector + lookback ---------------------------------------------------

def test_instant_selector_lookback(engine):
    # eval at step=60s; g2 has no samples in [150s, 285s] → at t=240s the
    # 5m lookback still finds the t=135s sample (value 109); value persists.
    df = engine.evaluate('node_gauge{inst="g2"}', 0, 600_000, 60_000)
    vals = _vals(df)
    assert vals[0] == 100.0
    assert vals[240_000] == 109.0  # last sample before gap (i=9 → t=135s)
    assert vals[360_000] == 124.0  # sample at exactly t=360s (i=24)
    assert len(vals) == 11


def test_stale_beyond_lookback(spark):
    # one sample at t=0 only; with lookback 5m it serves steps 0..4m, not 6m
    df = spark.createDataFrame([(0, "a", 1.0)], "t long, inst string, value double") \
        .selectExpr("timestamp_millis(t) AS ts", "inst", "value")
    eng = PromQLEngine(spark, {"m": MetricTable(df, tags=["inst"])})
    vals = _vals(eng.evaluate("m", 0, 600_000, 60_000))
    assert set(vals) == {0, 60_000, 120_000, 180_000, 240_000}  # t < x+5m


# -- rate / increase / delta ---------------------------------------------------------

def test_rate_constant_counter(engine):
    # i1 increases 10/15s = 2/3 per sec; interior windows are fully sampled →
    # extrapolated rate == true slope.
    df = engine.evaluate(
        'rate(http_requests_total{instance="i1"}[2m])', 300_000, 600_000, 60_000
    )
    for v in _vals(df).values():
        assert abs(v - 10 / 15) < 1e-9


def test_increase_with_reset(engine):
    # i2: +5/15s with a reset at t=120s. Window (0, 300] has samples 15..300s:
    # first=5 (t=15s), last=60 (t=300s, post-reset at 120s: 0,5,...),
    # correction=+40 (value before drop), raw=last-first+corr.
    df = engine.evaluate(
        'increase(http_requests_total{instance="i2"}[5m])', 300_000, 300_000, 60_000
    )
    v = list(_vals(df).values())[0]
    # samples in (0,300]: t=15..300 (20 samples), first_val=5, last_val=60,
    # correction = 35 (value before the drop) → result=90; sampled=285s,
    # avg=15s, dur_start=15s < 16.5s → +15s, dur_end=0 → ext=300s,
    # factor=300/285 (matches Prometheus extrapolatedRate)
    assert abs(v - 90 * (300 / 285)) < 1e-9


def test_delta_gauge(engine):
    df = engine.evaluate('delta(node_gauge{inst="g1"}[2m])', 300_000, 300_000, 60_000)
    v = list(_vals(df).values())[0]
    # samples (180s,300s]: t=195..300 (8 samples) vals 13..20: raw delta 7 over
    # 105s sampled, extrapolated to 120s → 7*(120/105)
    assert abs(v - 7 * (120 / 105)) < 1e-9


def test_idelta_irate(engine):
    df = engine.evaluate('idelta(http_requests_total{instance="i1"}[2m])', 300_000, 300_000, 60_000)
    assert abs(list(_vals(df).values())[0] - 10.0) < 1e-9
    df = engine.evaluate('irate(http_requests_total{instance="i1"}[2m])', 300_000, 300_000, 60_000)
    assert abs(list(_vals(df).values())[0] - 10 / 15) < 1e-9


def test_changes_resets(engine):
    df = engine.evaluate('resets(http_requests_total{instance="i2"}[10m])', 600_000, 600_000, 60_000)
    assert list(_vals(df).values())[0] == 1.0
    df = engine.evaluate('changes(node_gauge{inst="g1"}[2m])', 300_000, 300_000, 60_000)
    assert list(_vals(df).values())[0] == 7.0  # 8 samples → 7 transitions


def test_over_time_family(engine):
    vals = _vals(engine.evaluate('avg_over_time(node_gauge{inst="g1"}[1m])', 300_000, 300_000, 60_000))
    # window (240,300]: samples 255,270,285,300 → vals 17,18,19,20 → avg 18.5
    assert list(vals.values())[0] == 18.5
    vals = _vals(engine.evaluate('count_over_time(node_gauge{inst="g1"}[1m])', 300_000, 300_000, 60_000))
    assert list(vals.values())[0] == 4.0
    vals = _vals(engine.evaluate('quantile_over_time(0.5, node_gauge{inst="g1"}[1m])', 300_000, 300_000, 60_000))
    assert list(vals.values())[0] == 18.5


def test_deriv_predict_linear(engine):
    # g1 is a perfect line: slope 1/15 per sec
    vals = _vals(engine.evaluate('deriv(node_gauge{inst="g1"}[2m])', 300_000, 300_000, 60_000))
    assert abs(list(vals.values())[0] - 1 / 15) < 1e-9
    vals = _vals(engine.evaluate('predict_linear(node_gauge{inst="g1"}[2m], 60)', 300_000, 300_000, 60_000))
    # value at t=300s is 20; +60s at slope 1/15 → 24
    assert abs(list(vals.values())[0] - 24.0) < 1e-6


# -- aggregations ------------------------------------------------------------------

def test_sum_by(engine):
    df = engine.evaluate("sum by (job) (http_requests_total)", 300_000, 300_000, 60_000)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].job == "api"
    # at t=300s: i1=200 (sample at 300s: v1 after 20 increments... i=20 → 200), i2=60
    assert rows[0].value == 260.0


def test_topk(engine):
    df = engine.evaluate("topk(1, http_requests_total)", 300_000, 300_000, 60_000)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].instance == "i1"


def test_count_and_quantile_agg(engine):
    vals = _vals(engine.evaluate("count(http_requests_total)", 300_000, 300_000, 60_000))
    assert list(vals.values())[0] == 2.0


# -- binary ops --------------------------------------------------------------------

def test_vector_scalar_ops(engine):
    vals = _vals(engine.evaluate('http_requests_total{instance="i1"} * 2 + 1', 300_000, 300_000, 60_000))
    assert list(vals.values())[0] == 401.0
    # comparison filter drops, bool keeps 0/1
    df = engine.evaluate('http_requests_total > 100', 300_000, 300_000, 60_000)
    assert {r.instance for r in df.collect()} == {"i1"}
    df = engine.evaluate('http_requests_total > bool 100', 300_000, 300_000, 60_000)
    got = {r.instance: r.value for r in df.collect()}
    assert got == {"i1": 1.0, "i2": 0.0}


def test_vector_vector_arith(engine):
    df = engine.evaluate(
        'http_requests_total{instance="i1"} - on (job) http_requests_total{instance="i2"}',
        300_000, 300_000, 60_000,
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].value == 140.0  # 200 - 60


def test_and_unless_or(engine):
    df = engine.evaluate(
        'http_requests_total and on (job, instance) http_requests_total{instance="i1"}',
        300_000, 300_000, 60_000,
    )
    assert {r.instance for r in df.collect()} == {"i1"}
    df = engine.evaluate(
        'http_requests_total unless on (job, instance) http_requests_total{instance="i1"}',
        300_000, 300_000, 60_000,
    )
    assert {r.instance for r in df.collect()} == {"i2"}


# -- functions ----------------------------------------------------------------------

def test_math_and_clamp(engine):
    vals = _vals(engine.evaluate('clamp(http_requests_total{instance="i1"}, 0, 50)', 300_000, 300_000, 60_000))
    assert list(vals.values())[0] == 50.0
    vals = _vals(engine.evaluate('sqrt(http_requests_total{instance="i1"})', 300_000, 300_000, 60_000))
    assert abs(list(vals.values())[0] - math.sqrt(200)) < 1e-9


def test_time_vector_scalar_fns(engine):
    vals = _vals(engine.evaluate("time()", 0, 120_000, 60_000))
    assert vals == {0: 0.0, 60_000: 60.0, 120_000: 120.0}
    vals = _vals(engine.evaluate("vector(7)", 0, 60_000, 60_000))
    assert set(vals.values()) == {7.0}
    vals = _vals(engine.evaluate('scalar(http_requests_total{instance="i1"})', 300_000, 300_000, 60_000))
    assert list(vals.values())[0] == 200.0


def test_absent(engine):
    vals = _vals(engine.evaluate('absent(http_requests_total{job="nope"})', 0, 120_000, 60_000))
    assert set(vals.values()) == {1.0} and len(vals) == 3
    vals = _vals(engine.evaluate('absent(http_requests_total{job="api"})', 0, 120_000, 60_000))
    assert len(vals) == 0


def test_group_right_include_label_overwrite(spark):
    """group_right(include): the include label is copied from the ONE
    side, overwriting the many side's value when both carry it
    (prometheus vector-matching contract; reference planner
    group_left/right include handling). Symmetric group_left check too."""
    from greptimedb_spark.promql import MetricTable, PromQLEngine

    many = spark.createDataFrame(
        [(0, "a", "m", 10.0), (0, "b", "m", 20.0)],
        "t long, series string, src string, value double"
    ).selectExpr("timestamp_millis(t) AS ts", "series", "src", "value")
    one = spark.createDataFrame(
        [(0, "o", 2.0)], "t long, src string, value double"
    ).selectExpr("timestamp_millis(t) AS ts", "src", "value")
    eng = PromQLEngine(spark, {
        "many_metric": MetricTable(many, tags=["series", "src"]),
        "one_metric": MetricTable(one, tags=["src"]),
    })
    # one / on () group_right (src) many → labels from many, src := 'o'
    rows = eng.evaluate(
        "one_metric / on () group_right (src) many_metric",
        0, 0, 15_000).collect()
    got = {(r.series, r.src): r.value for r in rows}
    assert got == {("a", "o"): 0.2, ("b", "o"): 0.1}
    # mirrored group_left: many on the left, same label copy from one
    rows = eng.evaluate(
        "many_metric * on () group_left (src) one_metric",
        0, 0, 15_000).collect()
    got = {(r.series, r.src): r.value for r in rows}
    assert got == {("a", "o"): 20.0, ("b", "o"): 40.0}
    # include label NOT on the one side: dropped from the output
    one2 = spark.createDataFrame(
        [(0, 2.0)], "t long, value double"
    ).selectExpr("timestamp_millis(t) AS ts", "value")
    eng2 = PromQLEngine(spark, {
        "many_metric": MetricTable(many, tags=["series", "src"]),
        "one_metric": MetricTable(one2, tags=[]),
    })
    rows = eng2.evaluate(
        "many_metric * on () group_left (env) one_metric",
        0, 0, 15_000).collect()
    assert "env" not in rows[0].asDict()


def test_prometheus_metadata_api(engine):
    """labels / label_values / series endpoints (promql/metadata.py) vs
    the reference's prometheus.rs handler semantics."""
    from greptimedb_spark.promql import metadata as M

    t = engine.tables
    # /api/v1/labels: all tags + __name__, sorted
    all_labels = M.label_names(t)
    assert all_labels[0] == "__name__" and "job" in all_labels \
        and "instance" in all_labels
    # with match[]: only the matched table's tags
    only = M.label_names(t, ['http_requests_total{job="api"}'])
    assert "job" in only and "instance" in only
    # label_values(__name__) = metric names
    names = M.label_values(t, "__name__")
    assert "http_requests_total" in names and names == sorted(names)
    # label_values(tag): distinct live values, matcher- and window-filtered
    vals = M.label_values(t, "instance",
                          matches=["http_requests_total"])
    assert vals == ["i1", "i2"]
    narrowed = M.label_values(
        t, "instance", matches=['http_requests_total{instance="i1"}'])
    assert narrowed == ["i1"]
    # multiple match[] selectors UNION (reference runs each as its own
    # PromQuery and merges — prometheus.rs label_values_query)
    assert M.label_values(
        t, "instance",
        matches=['http_requests_total{instance="i1"}',
                 'http_requests_total{instance="i2"}']) == ["i1", "i2"]
    # tag label without match[] is InvalidArguments in the reference
    with pytest.raises(ValueError, match="match"):
        M.label_values(t, "instance")
    # window excluding all samples -> no values
    assert M.label_values(t, "instance", matches=["http_requests_total"],
                          start_ms=10**15) == []
    # /api/v1/series: labelsets incl __name__, deduped + sorted
    s = M.series(t, ["http_requests_total"])
    assert {"__name__": "http_requests_total", "job": "api",
            "instance": "i1"} in s
    assert len(s) == len({tuple(sorted(d.items())) for d in s})
    # regex matcher narrows; selector on a missing label matches nothing
    assert len(M.series(t, ['http_requests_total{instance=~"i1|i9"}'])) == 1
    assert M.series(t, ['http_requests_total{nope="x"}']) == []
    import pytest as _pytest
    with _pytest.raises(ValueError, match="match"):
        M.series(t, [])
    # envelope
    assert M.prometheus_metadata_response(["a"]) == {
        "status": "success", "data": ["a"]}


def test_label_replace(engine):
    df = engine.evaluate(
        'label_replace(http_requests_total{instance="i1"}, "host", "$1", "instance", "(.*)")',
        300_000, 300_000, 60_000,
    )
    rows = df.collect()
    assert rows[0].host == "i1"


def test_label_replace_duplicate_labelset_is_lazy(engine):
    import pytest

    # collapsing the identity label onto one value must be rejected — but
    # LAZILY: building the expression launches no job; the guard fires on
    # materialization with the reference's error text
    df = engine.evaluate(
        'label_replace(http_requests_total, "instance", "same", "instance", "(.*)")',
        300_000, 300_000, 60_000,
    )  # no error yet: plan construction is pure
    with pytest.raises(Exception, match="same labelset"):
        df.collect()
    # non-colliding overwrite of an existing label still materializes
    ok = engine.evaluate(
        'label_replace(http_requests_total, "instance", "x-$1", "instance", "(.*)")',
        300_000, 300_000, 60_000,
    ).collect()
    assert ok and all(r.instance.startswith("x-") for r in ok)


def test_label_replace_duplicate_labelset_eager_optin(engine):
    import pytest

    # conformance mode: the reference raises at EVAL time unconditionally;
    # spark.greptimedb.promql.eagerLabelsetCheck=true reproduces that
    # (guarding against Catalyst pruning the lazy value-column check)
    spark = engine.tables["http_requests_total"].df.sparkSession
    spark.conf.set("spark.greptimedb.promql.eagerLabelsetCheck", "true")
    try:
        with pytest.raises(ValueError, match="same labelset"):
            engine.evaluate(
                'label_replace(http_requests_total, "instance", "same", '
                '"instance", "(.*)")',
                300_000, 300_000, 60_000,
            )  # raises WITHOUT collect()
    finally:
        spark.conf.unset("spark.greptimedb.promql.eagerLabelsetCheck")


def test_histogram_quantile(engine):
    # buckets: 0.1→1, 0.5→3, 1→4, +Inf→5; q=0.5 → rank 2.5 in bucket (0.1,0.5]:
    # 0.1 + (0.5-0.1)*(2.5-1)/(3-1) = 0.4
    df = engine.evaluate(
        "histogram_quantile(0.5, request_duration_bucket)", 300_000, 300_000, 60_000
    )
    rows = df.collect()
    assert len(rows) == 1
    assert abs(rows[0].value - 0.4) < 1e-9


def test_double_exponential_smoothing(engine):
    # reference loop replicated in python over the g1 window (240s,300s]:
    # samples 255..300 → vals 17,18,19,20; sf=0.5, tf=0.3
    vals = [17.0, 18.0, 19.0, 20.0]
    s0, b = vals[0], vals[1] - vals[0]
    for i in range(1, len(vals)):
        s1 = 0.5 * vals[i] + 0.5 * (s0 + b)
        b = 0.3 * (s1 - s0) + 0.7 * b
        s0 = s1
    df = engine.evaluate(
        'double_exponential_smoothing(node_gauge{inst="g1"}[1m], 0.5, 0.3)',
        300_000, 300_000, 60_000,
    )
    got = list(_vals(df).values())[0]
    assert abs(got - s0) < 1e-9


def test_offset_modifier(engine):
    # value at t with offset 1m == plain value at t-1m (i1: +10 per 15s)
    plain = _vals(engine.evaluate('http_requests_total{instance="i1"}', 240_000, 240_000, 60_000))
    off = _vals(engine.evaluate('http_requests_total{instance="i1"} offset 1m', 300_000, 300_000, 60_000))
    assert list(plain.values())[0] == list(off.values())[0]


def test_count_values(engine):
    df = engine.evaluate('count_values("v", http_requests_total)', 300_000, 300_000, 60_000)
    got = {r["v"]: r.value for r in df.collect()}
    assert got == {"200.0": 1.0, "60.0": 1.0}


def test_agg_without(engine):
    df = engine.evaluate("sum without (instance) (http_requests_total)", 300_000, 300_000, 60_000)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].job == "api" and rows[0].value == 260.0


def test_at_modifier_pins_evaluation_time(engine):
    # `@ 240` pins the selector to t=240s regardless of the grid
    pinned = engine.evaluate(
        'http_requests_total{instance="i1"} @ 240', 60_000, 300_000, 60_000)
    rows = pinned.collect()
    assert len(rows) == 5  # one per grid step
    assert len({r.value for r in rows}) == 1  # same pinned value everywhere
    ref = engine.evaluate(
        'http_requests_total{instance="i1"}', 240_000, 240_000, 60_000).collect()
    assert rows[0].value == ref[0].value


def test_at_modifier_start_end(engine):
    s = engine.evaluate(
        'http_requests_total{instance="i1"} @ start()', 120_000, 300_000, 60_000)
    e = engine.evaluate(
        'http_requests_total{instance="i1"} @ end()', 120_000, 300_000, 60_000)
    sv = {r.value for r in s.collect()}
    ev = {r.value for r in e.collect()}
    assert len(sv) == 1 and len(ev) == 1 and sv != ev


def test_at_modifier_with_range_function(engine):
    # rate over a pinned range window: constant across the grid
    df = engine.evaluate(
        'rate(http_requests_total{instance="i1"}[2m] @ 300)',
        60_000, 300_000, 60_000)
    rows = df.collect()
    assert len(rows) == 5
    assert len({r.value for r in rows}) == 1
