"""Stateful streaming MinHash-LSH near-dup (applyInPandasWithState):
greedy band-claim semantics within and across micro-batches, and signature
parity with the batch MinHash pipeline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from greptimedb_spark import get_spark


@pytest.fixture(scope="module")
def spark():
    yield get_spark("test-streaming-neardup")


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(path)


def _flush(spark, src, sink, ckpt, **kw):
    from greptimedb_spark.streaming.neardup_stream import (
        streaming_neardup_marks,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(src)
    )
    marks = streaming_neardup_marks(stream, "doc_id", "text", "ts",
                                    dedup_horizon="1 hour", **kw)
    q = (marks.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()


def _kept(spark, sink):
    return {r.doc_id for r in
            (spark.read.parquet(sink).groupBy("doc_id")
             .agg(F.max(F.col("collided").cast("int")).alias("dup"))
             .filter("dup = 0").collect())}


DOC_A = "the quick brown fox jumps over the lazy dog again and again"
DOC_A2 = "the quick brown fox jumps over the lazy dog again and again!"  # near-dup of A
DOC_B = "completely different content about distributed query engines and parquet files"
DOC_C = "a third unrelated piece regarding vector indexes and streaming state stores"


def test_streaming_neardup_suppresses_near_duplicates(spark, tmp_path):
    import datetime as dt

    src, sink, ckpt = (str(tmp_path / x) for x in ("src", "sink", "ckpt"))
    os.makedirs(src, exist_ok=True)
    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)

    # batch 1: A and B; A2 is a near-dup of A (shares most shingles) and
    # must collide in at least one band
    _write_batch(spark, src, [(1, DOC_A, t(1)), (2, DOC_B, t(2)),
                              (3, DOC_A2, t(3))])
    _flush(spark, src, sink, ckpt)
    kept1 = _kept(spark, sink)
    assert 1 in kept1 and 2 in kept1
    assert 3 not in kept1  # near-dup suppressed

    # batch 2: an exact copy of A (cross-batch state) and a fresh doc C
    _write_batch(spark, src, [(4, DOC_A, t(10)), (5, DOC_C, t(11))])
    _flush(spark, src, sink, ckpt)
    kept2 = _kept(spark, sink)
    assert kept2 == {1, 2, 5}

    # every doc emits one mark per band
    counts = {r.doc_id: r["count"] for r in
              spark.read.parquet(sink).groupBy("doc_id").count().collect()}
    assert set(counts.values()) == {16}


def test_streaming_neardup_matches_batch_signatures(spark, tmp_path):
    """The streaming signature expression must equal the batch pipeline's
    (shingle_hashes -> per-hash min) for the same parameters."""
    from greptimedb_spark.operators.dedup import _perm_hash, shingle_hashes
    from greptimedb_spark.streaming.neardup_stream import _signature_expr

    df = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, "one two"), (4, "  spaced   out  text ")],
        "doc_id long, text string")
    stream_sig = {r.doc_id: list(r.sig) for r in df.select(
        "doc_id", _signature_expr(F.col("text"), 8, 3).alias("sig")).collect()}
    batch_sig = {r.id: list(r.sig) for r in (
        shingle_hashes(df, "doc_id", "text", 3)
        .groupBy("id")
        .agg(F.array(*[F.min(_perm_hash(F.col("h"), i)) for i in range(8)])
             .alias("sig"))
        .collect())}
    assert stream_sig == batch_sig
