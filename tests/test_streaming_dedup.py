"""Stateful streaming dedup (applyInPandasWithState) — parity with batch
exact dedup across micro-batches, state suppression across batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from greptimedb_spark import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-streaming-dedup")
    yield s


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(path)


def _flush(spark, src, sink, ckpt):
    from greptimedb_spark.streaming.dedup_stream import streaming_dedup

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(src)
    )
    out = streaming_dedup(stream, "doc_id", ["text"], "ts",
                          dedup_horizon="1 hour")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_dedup_first_occurrence_across_batches(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)

    # batch 1: A, B, and an in-batch duplicate of A (later ts — suppressed)
    _write_batch(spark, src, [(1, "alpha", t(1)), (2, "beta", t(2)),
                              (3, "alpha", t(3))])
    _flush(spark, src, sink, ckpt)
    got1 = {(r.doc_id, r.ts) for r in spark.read.parquet(sink).collect()}
    assert got1 == {(1, t(1)), (2, t(2))}

    # batch 2: another duplicate of A (cross-batch state suppresses it)
    # plus a new doc C
    _write_batch(spark, src, [(4, "alpha", t(10)), (5, "gamma", t(11))])
    _flush(spark, src, sink, ckpt)
    got2 = {(r.doc_id, r.ts) for r in spark.read.parquet(sink).collect()}
    assert got2 == {(1, t(1)), (2, t(2)), (5, t(11))}

    # parity: the streamed result equals a batch dedup over everything seen
    allrows = spark.read.parquet(src).withColumn(
        "fp", F.xxhash64("text"))
    batch = {(r.doc_id, r.ts) for r in
             allrows.withColumn(
                 "rn", F.row_number().over(
                     __import__("pyspark.sql.window",
                                fromlist=["Window"]).Window
                     .partitionBy("fp").orderBy("ts", "doc_id")))
             .filter("rn = 1").collect()}
    assert got2 == batch


def test_streaming_dedup_in_batch_tiebreak(spark, tmp_path):
    """Same ts → min doc_id wins inside a batch."""
    import datetime as dt

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2026, 1, 1)
    _write_batch(spark, src, [(9, "x", t0), (7, "x", t0), (8, "x", t0)])
    _flush(spark, src, sink, ckpt)
    got = [(r.doc_id, r.fp is not None) for r in
           spark.read.parquet(sink).collect()]
    assert got == [(7, True)]
