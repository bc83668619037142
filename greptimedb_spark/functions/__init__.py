"""GreptimeDB's custom function packages re-expressed as Spark column
expressions (reference registry: src/common/function/src/function_registry.rs:207-252).

Everything here is built from pyspark.sql.functions (JVM-side, codegen-able);
Python/pandas UDFs appear only where column algebra genuinely can't express
the semantics (none so far — geo hashing uses bit algebra, IP uses arithmetic).

``register_all(spark)`` exposes the packages to SQL as named functions where a
SQL surface is useful.
"""

from greptimedb_spark.functions import ip, json_fns, math_fns, text, vector  # noqa: F401


def register_all(spark) -> None:
    text.register(spark)
    vector.register(spark)
