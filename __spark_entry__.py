"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` maps every implemented
operator from SURVEY.md §2 to a (spark, sf_dir) → DataFrame builder;
``oracle_sql()`` gives the DuckDB-equivalent SQL for the correctness gate.
Implementations live in greptimedb_spark/queries/*.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TSBS-style hourly multi-aggregate by series over events,
    through the RANGE query engine (tumbling path)."""
    from greptimedb_spark.queries.timeseries import q23_range_tumbling

    return q23_range_tumbling(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from greptimedb_spark.queries import all_queries

    return {name: spec.build for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from greptimedb_spark.queries import all_queries

    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
