"""Streaming as-of enrichment (streaming/asof_stream.py): within-batch
exact asof semantics, cross-batch state carry, and the documented
latest-known-dimension relaxation."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from greptimedb_spark import get_spark


@pytest.fixture(scope="module")
def spark():
    yield get_spark("test-streaming-asof")


def _t(s):
    return dt.datetime(2024, 1, 2, 0, 0, s)


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "side string, k string, ts timestamp, ev string, px double"
    ).coalesce(1).write.mode("append").parquet(path)


def _flush(spark, src, sink, ckpt):
    from greptimedb_spark.streaming.asof_stream import streaming_asof_join

    stream = spark.readStream.schema(
        "side string, k string, ts timestamp, ev string, px double"
    ).parquet(src)
    lefts = stream.filter("side = 'L'").select("k", "ts", "ev")
    rights = stream.filter("side = 'R'").select("k", "ts", "px")
    out = streaming_asof_join(lefts, rights, on="ts", by=["k"],
                              value_cols=["px"], horizon="1 hour")
    q = (out.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()


def _rows(spark, sink):
    return {r["ev"]: r for r in spark.read.parquet(sink).collect()}


def test_streaming_asof_within_and_across_batches(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / x) for x in ("src", "sink", "ckpt"))
    os.makedirs(src, exist_ok=True)

    # batch 1: right before left (same batch, unordered in the file — the
    # operator sorts by event time) + a left with no right yet
    _write(spark, src, [
        ("L", "a", _t(2), "l1", None),
        ("R", "a", _t(1), None, 1.0),
        ("L", "b", _t(2), "l2", None),
    ])
    _flush(spark, src, sink, ckpt)
    out = _rows(spark, sink)
    assert out["l1"]["px"] == 1.0 and out["l1"]["ts_r"] > 0
    assert out["l2"]["px"] is None and out["l2"]["ts_r"] == -1

    # batch 2: left alone -> matches the right carried in state
    _write(spark, src, [("L", "a", _t(10), "l3", None)])
    _flush(spark, src, sink, ckpt)
    out = _rows(spark, sink)
    assert out["l3"]["px"] == 1.0
    assert out["l3"]["ts_r"] == int(_t(1).replace(
        tzinfo=dt.timezone.utc).timestamp() * 1000)

    # batch 3: newer right updates state; same-batch equal-ts left matches
    # it (>= semantics, rights sort before lefts at the same instant)
    _write(spark, src, [
        ("R", "a", _t(20), None, 2.0),
        ("L", "a", _t(20), "l4", None),
    ])
    _flush(spark, src, sink, ckpt)
    out = _rows(spark, sink)
    assert out["l4"]["px"] == 2.0

    # batch 4: the documented relaxation — state keeps only the NEWEST
    # right, so a left older than it finds no match even though an older
    # right once existed (a batch engine would have matched px=1.0)
    _write(spark, src, [("L", "a", _t(5), "l5", None)])
    _flush(spark, src, sink, ckpt)
    out = _rows(spark, sink)
    assert out["l5"]["px"] is None and out["l5"]["ts_r"] == -1
