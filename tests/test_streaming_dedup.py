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


def test_streaming_session_window(spark, tmp_path):
    """q89's sessionization shape runs as a real Structured Streaming
    aggregation: groupBy(session_window) + watermark, append mode. Two
    micro-batches (maxFilesPerTrigger=1): the second batch's watermark
    passes the first batch's session ends, so those sessions emit; the
    result must equal the batch session computation restricted to emitted
    sessions (closed strictly before the final watermark)."""
    import pyspark.sql.functions as F

    src = tmp_path / "src"
    src.mkdir()
    rows1 = [(1, 1_000), (1, 61_000), (2, 5_000)]          # sessions batch 1
    rows2 = [(1, 10_000_000), (2, 10_000_500)]             # far later: advances watermark
    import glob
    import shutil

    for name, rows in (("a.parquet", rows1), ("b.parquet", rows2)):
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, "user_id long, ms long").select(
            "user_id", F.timestamp_millis("ms").alias("ts")
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.move(glob.glob(stage + "/part-*.parquet")[0], str(src / name))
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    agg = (stream.withWatermark("ts", "10 seconds")
           .groupBy(F.session_window("ts", "2 minutes"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events"))
           .select("user_id",
                   F.unix_millis("session_window.start").alias("start_ms"),
                   "n_events"))
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (agg.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["start_ms"], r["n_events"])
           for r in spark.read.parquet(sink).collect()}
    # batch-1 sessions (closed by the batch-2 watermark): user 1 merges
    # 1s+61s into ONE 2-minute-gap session; user 2 has a singleton
    assert got == {(1, 1_000, 2), (2, 5_000, 1)}
