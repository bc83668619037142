"""Driver-facing query registry.

Each module exports ``QUERIES: dict[str, QuerySpec]``; a QuerySpec bundles the
Spark DataFrame builder with the equivalent ANSI-SQL oracle string DuckDB runs
on the same parquet tables (None → driver runs a weaker rows-only check).

Cross-engine determinism rules (so the driver's order-insensitive value-hash
matches):
- money sums go through DECIMAL(18,2) so both engines add exactly;
- irrational stats (stddev/corr/percentile/cos-distance) are rounded to a few
  decimals on BOTH sides;
- every top-k has a total order (metric, then unique key) so ties can't make
  the engines pick different row sets;
- timestamps are emitted as epoch milliseconds (BIGINT) to dodge ns-vs-µs
  parquet precision differences between readers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


# Per-session resolved-plan cache: (session id, table path) → DataFrame.
# spark.read.parquet() costs ~150 ms of py4j + footer/schema work per call
# even warm, and a bench pass issues ~13 read() calls INSIDE timed regions
# (r11 measurement: ~2 s/pass of pure metadata overhead). DataFrames are
# immutable, so handing back the same analyzed plan is safe; nothing here
# caches *data* — every action still computes from the parquet files. The
# driver tables are read-only; a path whose contents change mid-session must
# not go through this cache.
# the cached session object rides along so a recycled id() of a dead session
# can never alias a live one
_READ_CACHE: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}


def _session_alive(spark: SparkSession) -> bool:
    """True while the session's SparkContext is running. SparkContext.stop()
    nulls _jsc, so this is a pure attribute check — no py4j round trip."""
    try:
        sc = spark._sc
        return sc is not None and sc._jsc is not None
    except Exception:
        return False


def _prune_dead_sessions() -> None:
    """Evict cache entries owned by stopped sessions (r11 VERDICT Wrong #4:
    entries for terminated sessions accumulated forever). Called on cache
    misses only — a once-per-(session, path) event, so the sweep is O(cache)
    amortized over a session's lifetime, not per lookup."""
    for cache, live in (
        (_READ_CACHE, lambda v: _session_alive(v[0])),
        (_VIEW_CACHE, _session_alive),
    ):
        for key in [k for k, v in cache.items() if not live(v)]:
            cache.pop(key, None)


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table. The events parquet stores TIMESTAMP(NANOS), which
    Spark 4 refuses by default — read nanos as long and truncate to µs
    timestamps (matches DuckDB's epoch_us() flooring)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (id(spark), path)
    cached = _READ_CACHE.get(key)
    if cached is not None and cached[0] is spark:
        return cached[1]
    _prune_dead_sessions()
    from pyspark.errors.exceptions.captured import AnalysisException
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    # newer testdata stores TIMESTAMP(MICROS, isAdjustedToUTC=false) which a
    # plain session surfaces as TIMESTAMP_NTZ — unusable with unix_micros/
    # windows; normalize to TIMESTAMP (session tz is UTC either way)
    for f_ in df.schema.fields:
        if f_.dataType.typeName() == "timestamp_ntz":
            # pin UTC so the NTZ wall-clock → instant cast is a no-op shift
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    _READ_CACHE[key] = (spark, df)
    return df


def source_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of a driver table (0 when not statable, e.g. remote FS)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path) for f in fs
            )
        return os.path.getsize(path)
    except OSError:
        return 0


def read_spread(spark: SparkSession, sf_dir: str, name: str, *by: str) -> DataFrame:
    """read() + a scale-adaptive repartition for compute-heavy consumers.

    A source too small to fill the cluster's default parallelism with ≥ 8 MB
    splits scans as a handful of tasks (locally: ONE — the testdata tables
    are single-row-group parquet), serializing every downstream
    partial-aggregate/join on one core (guide §2.2/§2.5: scale-adaptive
    partitioning, derived from input size — not a constant tuned for either
    mode). Hash-repartitioning on a deterministic high-cardinality key avoids
    the local sort a round-robin repartition pays (SPARK-23207) and lets a
    downstream groupBy/join on the same key reuse the exchange. At 100 TB the
    size guard makes this a no-op — the scan already has enough splits.
    """
    df = read(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    nbytes = source_bytes(sf_dir, name)
    if nbytes and nbytes < target * (8 << 20):
        from pyspark.sql import functions as F

        return df.repartition(target, *[F.col(c) for c in by])
    return df


# Per-session registered temp views over read()/read_spread() plans.
# Why views at all: a builder that chains ~10-40 classic DataFrame ops pays a
# py4j round trip PLUS an eager Catalyst analysis of the accumulated tree per
# op (r11 cProfile on q52: ~1,050 py4j commands ≈ 0.4-0.5 s per build). A
# builder that issues ONE spark.sql() statement over a pre-registered view
# analyzes once. The view wraps the same cached read()/read_spread() plan —
# metadata only, every action still computes from parquet.
_VIEW_CACHE: dict[tuple[int, str], SparkSession] = {}


def table_view(spark: SparkSession, sf_dir: str, name: str, *spread_by: str) -> str:
    """Register (once per session + path [+ spread key]) a temp view over
    read() / read_spread() and return its deterministic name. Views are
    session-scoped and overwritten, never dropped (dropping would race other
    builders in flight)."""
    import re

    slug = re.sub(r"[^A-Za-z0-9]", "_", sf_dir.rstrip("/"))
    vname = f"__t{slug}_{name}" + (f"__by_{'_'.join(spread_by)}" if spread_by else "")
    key = (id(spark), vname)
    cached = _VIEW_CACHE.get(key)
    if cached is not None and cached is spark:
        return vname
    _prune_dead_sessions()
    df = read_spread(spark, sf_dir, name, *spread_by) if spread_by else read(spark, sf_dir, name)
    df.createOrReplaceTempView(vname)
    _VIEW_CACHE[key] = spark
    return vname


def all_queries() -> dict[str, QuerySpec]:
    from greptimedb_spark.queries import (
        relational,
        timeseries,
        functions_q,
        llmdata,
        promql_q,
        surfaces_q,
        stats_q,
        misc_q,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (relational, timeseries, functions_q, llmdata, promql_q, surfaces_q, stats_q, misc_q):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
