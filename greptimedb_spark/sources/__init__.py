"""External file tables + COPY TO/FROM (SURVEY.md §2.1).

Reference: ``CREATE EXTERNAL TABLE … WITH (FORMAT=csv|json|parquet|orc)``
(src/common/datasource/src/file_format/, src/file-engine/) and
``COPY TABLE TO/FROM`` (src/operator/src/statement/copy_table_{to,from}.rs).
Spark's DataFrameReader/Writer covers every format natively; this module is
the thin façade mapping the reference's statement surface onto it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"csv", "json", "parquet", "orc"}


def external_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    name: str | None = None,
    **options,
) -> DataFrame:
    """CREATE EXTERNAL TABLE analog: lazily-scanned file-backed DataFrame;
    optionally registered as a temp view."""
    fmt = fmt.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (one of {sorted(_FORMATS)})")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema:
        reader = reader.schema(schema)
    df = reader.options(**options).load(path)
    if name:
        df.createOrReplaceTempView(name)
    return df


def copy_table_to(df: DataFrame, path: str, fmt: str = "parquet",
                  mode: str = "overwrite", partition_by: list[str] | None = None,
                  **options) -> None:
    """COPY TABLE TO analog (copy_table_to.rs:108)."""
    fmt = fmt.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def copy_table_from(spark: SparkSession, path: str, fmt: str = "parquet",
                    schema: str | None = None, **options) -> DataFrame:
    """COPY TABLE FROM analog (copy_table_from.rs:362)."""
    return external_table(spark, path, fmt, schema, **options)
