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
    """SQL surface with reference-exact float32 arithmetic (the reference's
    vector type is f32; doing the math in float64 column algebra yields
    different last digits than the sqlness goldens). Arrow-batched numpy
    UDFs; vectors interchange as array<float> columns or '[1.0, 2.0]'
    literal strings (both accepted everywhere, like the reference's
    implicit parse_vec coercion)."""
    import json as _json

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _vec(x):
        if x is None:
            return None
        if isinstance(x, (bytes, bytearray)):
            # packed little-endian f32 (the reference's storage form)
            return np.frombuffer(bytes(x), dtype="<f4")
        if isinstance(x, str):
            return np.asarray(_json.loads(x), dtype=np.float32)
        return np.asarray(x, dtype=np.float32)

    def _f32s(x) -> str:
        return np.format_float_positional(np.float32(x), trim="-")

    def _short(x):
        # float64 holding exactly the shortest-repr decimal of the f32
        # result — survives the conformance gate's 9-decimal rounding
        return float(_f32s(x))

    def _render(a) -> str:
        return "[" + ",".join(_f32s(v) for v in a) + "]"

    def _arr_udf(fn, nargs, ret="array<float>"):
        if nargs == 1:
            @pandas_udf(ret, PandasUDFType.SCALAR)
            def f(a):
                return pd.Series(
                    [None if x is None else fn(x) for x in a], dtype=object)
        elif nargs == 2:
            @pandas_udf(ret, PandasUDFType.SCALAR)
            def f(a, b):
                return pd.Series(
                    [None if x is None or y is None else fn(x, y)
                     for x, y in zip(a, b)], dtype=object)
        else:
            @pandas_udf(ret, PandasUDFType.SCALAR)
            def f(a, b, c):
                return pd.Series(
                    [None if x is None else fn(x, y, z)
                     for x, y, z in zip(a, b, c)], dtype=object)
        return f

    def _pair(a, b):
        # the reference rejects mismatched dimensions
        # ("vectors length not match", vector.result:177); numpy would
        # silently BROADCAST a length-1 operand instead — guard it
        va, vb = _vec(a), _vec(b)
        if len(va) != len(vb):
            raise ValueError(
                f"vectors length not match: {len(va)} vs {len(vb)}")
        return va, vb

    def _ew(op):
        return lambda a, b: [float(v) for v in op(*_pair(a, b))]

    reg = spark.udf.register
    reg("gt_vec_pack", _arr_udf(
        lambda x: np.asarray(_vec(x), dtype="<f4").tobytes(), 1, "binary"))

    def _pack_dim(x, n):
        # ingest-time dimension validation for VECTOR(n) columns — the
        # reference rejects wrong-dim literals at insert
        # (types/vector/vector.result "INSERT INTO t VALUES (4, '[1.0]')")
        v = np.asarray(_vec(x), dtype="<f4")
        if len(v) != int(n):
            raise ValueError(
                f"vector dimension mismatch: expected {int(n)}, got {len(v)}")
        return v.tobytes()

    reg("gt_vec_pack_dim", _arr_udf(_pack_dim, 2, "binary"))
    reg("parse_vec", _arr_udf(lambda s: [float(v) for v in _vec(s)], 1))
    reg("vec_to_string", _arr_udf(lambda v: _render(_vec(v)), 1, "string"))
    reg("vec_add", _arr_udf(_ew(lambda x, y: x + y), 2))
    reg("vec_sub", _arr_udf(_ew(lambda x, y: x - y), 2))
    reg("vec_mul", _arr_udf(_ew(lambda x, y: x * y), 2))
    reg("vec_div", _arr_udf(_ew(lambda x, y: x / y), 2))
    reg("vec_scalar_add", _arr_udf(
        lambda s, v: [float(x) for x in np.float32(s) + _vec(v)], 2))
    reg("vec_scalar_mul", _arr_udf(
        lambda s, v: [float(x) for x in np.float32(s) * _vec(v)], 2))
    reg("vec_norm", _arr_udf(
        lambda v: [float(x) for x in
                   _vec(v) / np.float32(np.sqrt((_vec(v) ** 2).sum()))], 1))
    reg("vec_dim", _arr_udf(lambda v: len(_vec(v)), 1, "bigint"))
    reg("vec_kth_elem", _arr_udf(
        lambda v, k: _short(_vec(v)[int(k)]) if 0 <= int(k) < len(_vec(v))
        else None, 2, "double"))
    reg("vec_subvector", _arr_udf(
        lambda v, a, b: [float(x) for x in _vec(v)[int(a):int(b)]], 3))
    reg("vec_elem_sum", _arr_udf(
        lambda v: _short(_vec(v).sum()), 1, "double"))
    reg("vec_elem_avg", _arr_udf(
        lambda v: _short(_vec(v).mean()) if len(_vec(v)) else None,
        1, "double"))
    reg("vec_elem_product", _arr_udf(
        lambda v: _short(_vec(v).prod()), 1, "double"))
    reg("vec_dot_product", _arr_udf(
        lambda a, b: _short(np.dot(*_pair(a, b))), 2, "double"))

    def _l2sq(a, b):
        va, vb = _pair(a, b)
        return _short(((va - vb) ** 2).sum())

    reg("vec_l2sq_distance", _arr_udf(_l2sq, 2, "double"))

    def _cos(a, b):
        va, vb = _pair(a, b)
        denom = np.float32(np.sqrt((va ** 2).sum())) * np.float32(
            np.sqrt((vb ** 2).sum()))
        if denom == 0:
            return 1.0  # reference: zero vector → distance 1
        return _short(1 - np.dot(va, vb) / denom)

    reg("vec_cos_distance", _arr_udf(_cos, 2, "double"))

    @pandas_udf("array<float>", PandasUDFType.GROUPED_AGG)
    def _vec_sum(col):
        arrs = [_vec(v) for v in col if v is not None]
        return [float(x) for x in np.sum(arrs, axis=0)] if arrs else None

    @pandas_udf("array<float>", PandasUDFType.GROUPED_AGG)
    def _vec_avg(col):
        arrs = [_vec(v) for v in col if v is not None]
        if not arrs:
            return None
        return [float(x) for x in
                np.sum(arrs, axis=0, dtype=np.float32) / np.float32(len(arrs))]

    @pandas_udf("array<float>", PandasUDFType.GROUPED_AGG)
    def _vec_product(col):
        arrs = [_vec(v) for v in col if v is not None]
        if not arrs:
            return None
        return [float(x) for x in np.prod(np.stack(arrs), axis=0,
                                          dtype=np.float32)]

    reg("vec_sum", _vec_sum)
    reg("vec_avg", _vec_avg)
    reg("vec_product", _vec_product)
