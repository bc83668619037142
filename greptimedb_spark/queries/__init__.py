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


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table. The events parquet stores TIMESTAMP(NANOS), which
    Spark 4 refuses by default — read nanos as long and truncate to µs
    timestamps (matches DuckDB's epoch_us() flooring)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
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
    return df


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
