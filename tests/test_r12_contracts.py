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
