"""JSON functions (reference src/common/function/src/scalars/json/*.rs).

GreptimeDB stores JSON as JSONB and exposes json_get_<type>/json_is_*/
json_path_exists. Spark-side we keep JSON as strings and compile each accessor
to get_json_object / try_cast — all JVM expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_json(col) -> Column:
    """Validate/normalize JSON text (reference json/parse_json.rs). Invalid → NULL."""
    return F.when(F.try_variant_get(F.try_parse_json(_c(col)), "$", "string").isNotNull(), _c(col))


def json_get_string(col, path: str) -> Column:
    return F.get_json_object(_c(col), path)


def json_get_int(col, path: str) -> Column:
    # try_cast handles sign and whitespace like the reference's jsonb→i64
    # conversion (json/get.rs); non-integral text → NULL.
    return F.get_json_object(_c(col), path).try_cast("long")


def json_get_float(col, path: str) -> Column:
    return F.get_json_object(_c(col), path).cast("double")


def json_get_bool(col, path: str) -> Column:
    return F.get_json_object(_c(col), path).cast("boolean")


def json_path_exists(col, path: str) -> Column:
    return F.get_json_object(_c(col), path).isNotNull()


def json_object_keys(col) -> Column:
    return F.json_object_keys(_c(col))


def json_to_string(col) -> Column:
    return _c(col).cast("string")
