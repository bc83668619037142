"""Round-12 optimization contracts.

Each test pins the *mechanism* of an r12 optimization (OPTIMIZATION_r12.md),
not just end results — so a refactor that silently reverts one fails here
even while the oracle gate stays green.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


SF = "/root/testdata/sf0.001"


def test_minhash_concurrent_calls_do_not_collide(spark):
    """r11 VERDICT Wrong #3: fixed temp-view names meant two in-flight
    minhash_lsh_pairs calls in one session overwrote each other's views.
    Per-call unique suffixes must make interleaved builds independent."""
    from greptimedb_spark.operators.dedup import minhash_lsh_pairs
    from greptimedb_spark.queries import read

    docs = read(spark, SF, "documents")
    sub = docs.filter(F.col("doc_id") < 50)

    # build BOTH plans before materializing EITHER — with shared view names
    # the second createOrReplaceTempView would redirect the first's pair
    # statement to the wrong source
    full_pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                                   num_hashes=32, bands=8,
                                   jaccard_threshold=0.3)
    sub_pairs = minhash_lsh_pairs(sub, "doc_id", "text",
                                  num_hashes=32, bands=8,
                                  jaccard_threshold=0.3)
    got_full = {tuple(r) for r in full_pairs.collect()}
    got_sub = {tuple(r) for r in sub_pairs.collect()}
    spark.catalog.clearCache()

    # reference: the same two calls run sequentially, each fully materialized
    ref_full = {tuple(r) for r in
                minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32,
                                  bands=8, jaccard_threshold=0.3).collect()}
    spark.catalog.clearCache()
    ref_sub = {tuple(r) for r in
               minhash_lsh_pairs(sub, "doc_id", "text", num_hashes=32,
                                 bands=8, jaccard_threshold=0.3).collect()}
    spark.catalog.clearCache()
    assert got_full == ref_full
    assert got_sub == ref_sub
    # and the subset run must differ from the full run for the test to have
    # any power (the full corpus has pairs outside doc_id < 50)
    assert got_full != got_sub


def test_minhash_big_doc_guard_is_exact(spark):
    """r11 VERDICT Wrong #2: a pathological doc's distinct-hash array rode
    through every candidate join as one giant row. The row-form fallback for
    docs over ``big_doc_hashes`` must yield bit-identical pairs."""
    from greptimedb_spark.operators.dedup import minhash_lsh_pairs

    # near-dup pairs both below and above the guard: docs 0/1 are small
    # near-dups, docs 2/3 are 200-token near-dups ("giant" vs threshold 40)
    small_a = " ".join(f"w{i}" for i in range(12))
    small_b = " ".join(f"w{i}" for i in range(12)) + " tail"
    big_a = " ".join(f"g{i}" for i in range(200))
    big_b = " ".join(f"g{i}" for i in range(200)) + " tail"
    mixed = " ".join(f"g{i}" for i in range(100))  # shares a prefix with big_a
    docs = spark.createDataFrame(
        [(0, small_a), (1, small_b), (2, big_a), (3, big_b), (4, mixed)],
        "doc_id long, text string")

    kw = dict(num_hashes=32, bands=16, shingle_k=3, jaccard_threshold=0.2)
    unguarded = minhash_lsh_pairs(docs, "doc_id", "text",
                                  big_doc_hashes=1 << 30, **kw)
    rows_unguarded = sorted(tuple(r) for r in unguarded.collect())
    spark.catalog.clearCache()
    guarded = minhash_lsh_pairs(docs, "doc_id", "text",
                                big_doc_hashes=40, **kw)
    rows_guarded = sorted(tuple(r) for r in guarded.collect())
    spark.catalog.clearCache()

    assert rows_guarded == rows_unguarded
    # the fixture must actually exercise BOTH paths: a small-small pair and
    # at least one pair involving a >40-shingle doc
    pairs = {(r[0], r[1]) for r in rows_guarded}
    assert (0, 1) in pairs
    assert any(p[0] >= 2 or p[1] >= 2 for p in pairs), pairs


def test_available_now_conf_scopes_and_restores(spark):
    """The no-data-micro-batch suppression must be scoped: set inside the
    context, restored (to the pre-existing value) outside."""
    from greptimedb_spark.streaming import available_now_conf

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old = spark.conf.get(key, "true")
    try:
        spark.conf.set(key, "true")
        with available_now_conf(spark):
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, old)


def test_streaming_dedup_output_unchanged_without_nodata_batch(spark, tmp_path):
    """Suppressing the trailing no-data micro-batch (r12 streaming-floor fix)
    must not change a bounded run's output — our stateful operators emit
    rows only from data batches; timeouts only GC state."""
    import datetime as dt

    from greptimedb_spark.streaming import available_now_conf
    from greptimedb_spark.streaming.dedup_stream import streaming_dedup

    src = str(tmp_path / "src")
    t0 = dt.datetime(2031, 1, 2)
    rows = [(i, f"text {i % 4}", t0 + dt.timedelta(seconds=i))
            for i in range(12)]
    spark.createDataFrame(rows, "doc_id long, text string, ts timestamp") \
        .coalesce(1).write.mode("overwrite").parquet(src)

    def run(tag, ctx):
        sink = str(tmp_path / f"sink_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp").parquet(src)
        out = streaming_dedup(stream, "doc_id", ["text"], "ts",
                              dedup_horizon="1 hour")
        with ctx:
            q = (out.writeStream.format("parquet").option("path", sink)
                 .option("checkpointLocation", ckpt).outputMode("append")
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        return sorted(r[0] for r in spark.read.parquet(sink)
                      .select("doc_id").collect())

    import contextlib

    with_batch = run("on", contextlib.nullcontext())
    without_batch = run("off", available_now_conf(spark))
    assert with_batch == without_batch == [0, 1, 2, 3]


def test_read_cache_evicts_dead_session_entries(spark):
    """r11 VERDICT Wrong #4: _READ_CACHE/_VIEW_CACHE entries for stopped
    sessions accumulated forever. A cache miss must prune them."""
    import greptimedb_spark.queries as q

    class _DeadSC:
        _jsc = None

    class _DeadSession:
        _sc = _DeadSC()

    dead = _DeadSession()
    q._READ_CACHE[(id(dead), "/nonexistent/table.parquet")] = (dead, None)
    q._VIEW_CACHE[(id(dead), "__t_dead_view")] = dead
    # a real miss on the live session triggers the prune sweep
    q.read(spark, SF, "nation")
    assert (id(dead), "/nonexistent/table.parquet") not in q._READ_CACHE
    assert (id(dead), "__t_dead_view") not in q._VIEW_CACHE
    # live-session entries survive
    assert any(v[0] is spark for v in q._READ_CACHE.values())


@pytest.mark.parametrize("parser", [
    "parse_otlp_metrics_json", "parse_otlp_logs_json",
    "parse_otlp_traces_json", "parse_loki_push",
])
def test_json_parsers_are_single_pass(spark, parser):
    """r12: the from_json-based parsers build every row kind (data rows AND
    bad-payload rows) in ONE array per payload and explode once. The union
    forms duplicated the scan+from_json subtree into every branch (metrics:
    8 scans / 8 JSON parses of each payload for q94; logs/traces/loki: 2).
    Pin: exactly one from_json and one Generate, no Union, no re-scan."""
    from greptimedb_spark.sources import protocols as proto

    payloads = spark.createDataFrame([("{}",), ("junk",)], "payload string")
    plan = _plan(getattr(proto, parser)(payloads))
    # node detail sections start with "(n) Name"; count operator occurrences
    import re

    def n_nodes(name):
        return len(re.findall(rf"\(\d+\) {name}\b", plan))

    assert plan.count("from_json") <= 2  # one tree line + one detail section
    assert n_nodes("Generate") == 1
    assert n_nodes("Union") == 0
    assert n_nodes("Scan ExistingRDD") + n_nodes("Scan parquet") <= 1
