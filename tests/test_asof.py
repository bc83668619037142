"""As-of join operator (operators/asof.py): semantics vs hand-computed
expectations + DuckDB ASOF JOIN parity is covered by the q109 oracle."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from greptimedb_spark.operators.asof import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame([
        Row(k="a", ts=_ts(5), ev="l1"),
        Row(k="a", ts=_ts(10), ev="l2"),
        Row(k="a", ts=_ts(20), ev="l3"),
        Row(k="b", ts=_ts(7), ev="l4"),   # no right rows for b
    ])
    right = spark.createDataFrame([
        Row(k="a", ts=_ts(4), px=1.0, note="r1"),
        Row(k="a", ts=_ts(10), px=2.0, note=None),  # equal-ts + NULL payload
        Row(k="a", ts=_ts(15), px=3.0, note="r3"),
    ])
    return left, right


def test_asof_backward(sides):
    left, right = sides
    out = {r["ev"]: r for r in asof_join(
        left, right, on="ts", by=["k"], value_cols=["px", "note"]).collect()}
    assert out["l1"]["px"] == 1.0 and out["l1"]["note"] == "r1"
    # equal timestamps match (>=), and BOTH payload columns come from that
    # same right row — note stays NULL, it must NOT fall back to r1's note
    assert out["l2"]["px"] == 2.0 and out["l2"]["note"] is None
    assert out["l3"]["px"] == 3.0 and out["l3"]["ts_r"] == _ts(15)
    # unmatched key -> NULL payload, left row survives (left join)
    assert out["l4"]["px"] is None and out["l4"]["ts_r"] is None
    # schema: left cols + matched ts + payloads
    cols = asof_join(left, right, on="ts", by=["k"],
                     value_cols=["px"]).columns
    assert cols == ["k", "ts", "ev", "ts_r", "px"]


def test_asof_forward_and_tolerance(sides):
    left, right = sides
    fwd = {r["ev"]: r for r in asof_join(
        left, right, on="ts", by=["k"], value_cols=["px"],
        direction="forward").collect()}
    assert fwd["l1"]["px"] == 2.0          # nearest following (ts=10)
    assert fwd["l2"]["px"] == 2.0          # equal ts matches forward too
    assert fwd["l3"]["px"] is None         # nothing after ts=20
    tol = {r["ev"]: r for r in asof_join(
        left, right, on="ts", by=["k"], value_cols=["px"],
        tolerance_ms=2_000).collect()}
    assert tol["l1"]["px"] == 1.0          # gap 1s <= 2s
    assert tol["l3"]["px"] is None         # gap 5s > 2s -> payload nulled
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, direction="nearest")


def test_asof_plan_single_shuffle(sides):
    """The scale claim: union + window = ONE exchange, no range-join
    explosion (a BroadcastNestedLoopJoin/CartesianProduct in the plan
    would be the quadratic signature)."""
    left, right = sides
    plan = asof_join(left, right, on="ts", by=["k"], value_cols=["px"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan
