"""Vector/embedding functions (reference src/common/function/src/scalars/vector/,
aggrs/vector/) as higher-order column expressions over array<float>.

All math runs in JVM codegen via transform/zip_with/aggregate — no Python.
Distances accumulate in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _lit_vec(v) -> Column:
    if isinstance(v, (list, tuple)):
        return F.array(*[F.lit(float(x)) for x in v])
    return _c(v)


# -- elementwise binary ops (vector/{add,sub,mul,div}.rs) ---------------------

def vec_add(a, b) -> Column:
    return F.zip_with(_lit_vec(a), _lit_vec(b), lambda x, y: x + y)


def vec_sub(a, b) -> Column:
    return F.zip_with(_lit_vec(a), _lit_vec(b), lambda x, y: x - y)


def vec_mul(a, b) -> Column:
    return F.zip_with(_lit_vec(a), _lit_vec(b), lambda x, y: x * y)


def vec_div(a, b) -> Column:
    return F.zip_with(_lit_vec(a), _lit_vec(b), lambda x, y: x / y)


def vec_scalar_add(s, v) -> Column:
    return F.transform(_lit_vec(v), lambda x: x + F.lit(s))


def vec_scalar_mul(s, v) -> Column:
    return F.transform(_lit_vec(v), lambda x: x * F.lit(s))


# -- shape/element access ------------------------------------------------------

def vec_dim(v) -> Column:
    return F.size(_lit_vec(v))


def vec_kth_elem(v, k: int) -> Column:
    return F.element_at(_lit_vec(v), k + 1)  # reference is 0-based


def vec_subvector(v, start: int, end: int) -> Column:
    return F.slice(_lit_vec(v), start + 1, end - start)


# -- reductions (vector/elem_sum.rs etc.) --------------------------------------

def _sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def vec_elem_sum(v) -> Column:
    return _sum(_lit_vec(v))


def vec_elem_avg(v) -> Column:
    a = _lit_vec(v)
    return _sum(a) / F.size(a)


def vec_elem_product(v) -> Column:
    return F.aggregate(_lit_vec(v), F.lit(1.0), lambda acc, x: acc * x.cast("double"))


def vec_norm(v) -> Column:
    """L2 norm (vector/scalar_calc? — reference vec_norm)."""
    a = _lit_vec(v)
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


# -- distances (vector/distance.rs:19-21) --------------------------------------
# Each element is cast to double BEFORE the multiply/subtract so products never
# round through float32 — matches DuckDB's (and the reference's f64 path) exactly.

def vec_dot_product(a, b) -> Column:
    return F.aggregate(
        F.zip_with(
            _lit_vec(a), _lit_vec(b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_l2sq_distance(a, b) -> Column:
    d = F.zip_with(
        _lit_vec(a), _lit_vec(b), lambda x, y: x.cast("double") - y.cast("double")
    )
    return F.aggregate(
        F.zip_with(d, d, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def vec_cos_distance(a, b) -> Column:
    av, bv = _lit_vec(a), _lit_vec(b)
    return 1 - vec_dot_product(av, bv) / (vec_norm(av) * vec_norm(bv))


def cosine_similarity(a, b) -> Column:
    av, bv = _lit_vec(a), _lit_vec(b)
    return vec_dot_product(av, bv) / (vec_norm(av) * vec_norm(bv))


# -- aggregates (aggrs/vector/{sum,avg}.rs) — elementwise across rows ----------

def vec_sum_agg(col) -> Column:
    """Elementwise sum of a vector column across rows (requires equal dims)."""
    return F.reduce(
        F.collect_list(_c(col)),
        F.lit(None).cast("array<double>"),
        lambda acc, v: F.when(acc.isNull(), v.cast("array<double>")).otherwise(
            F.zip_with(acc, v, lambda x, y: x + y)
        ),
    )


def vec_avg_agg(col) -> Column:
    n = F.count(_c(col))
    return F.transform(vec_sum_agg(col), lambda x: x / n)


# -- conversions ----------------------------------------------------------------

def parse_vec(col) -> Column:
    """'[1.0,2.0]' → array<float> (reference parse_vec)."""
    return F.from_json(_c(col), "array<float>")


def vec_to_string(col) -> Column:
    return F.to_json(_c(col))


def register(spark) -> None:
    pass  # expression-only package
