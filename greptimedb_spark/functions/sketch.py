"""Mergeable sketch aggregates (reference src/common/function/src/aggrs/approximate/).

- hll / hll_merge / hll_count (hll.rs:42-43, scalars/hll_count.rs:31): Spark
  3.5+ ships Apache DataSketches HLL natively — hll_sketch_agg produces a
  mergeable binary state, hll_union merges states, hll_sketch_estimate reads
  the count. Exactly the reference's state/merge/calc triple.
- uddsketch_state / uddsketch_merge / uddsketch_calc (uddsketch.rs:37-39):
  Spark has no mergeable quantile-sketch state type exposed to SQL; the
  direct-quantile path is percentile_approx (same accuracy class). For state
  parity we reuse the HLL pattern API-wise but compute via percentile_approx;
  a custom binary-state pandas UDAF is noted as future work.
- count_hash (count_hash.rs:57-70): count of distinct hashed tuples.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hll(col) -> Column:
    """Mergeable HLL state (binary)."""
    return F.hll_sketch_agg(col)


def hll_merge(col) -> Column:
    """Merge HLL states."""
    return F.hll_union_agg(col)


def hll_count(col) -> Column:
    """Estimate distinct count from a state."""
    return F.hll_sketch_estimate(col)


def approx_distinct(col) -> Column:
    return F.approx_count_distinct(col)


def uddsketch_calc(quantile: float, col) -> Column:
    """Quantile estimate (percentile_approx ≈ UDDSketch accuracy class)."""
    return F.percentile_approx(col, quantile)


# ---------------------------------------------------------------------------
# UDDSketch mergeable state (reference uddsketch.rs / the UDDSketch paper:
# log-bucketed quantile sketch with uniform bucket collapse).
#
# State layout (JSON bytes — engine-portable, deterministic):
#   {"b": max_buckets, "a": original_alpha, "g": current_gamma,
#    "n": count, "z": zero_count, "p": {key: count}, "m": {key: count}}
# A value v>0 lands in bucket ceil(ln(v)/ln(gamma)); negatives mirror into
# "m"; compaction squares gamma and halves keys (k -> ceil(k/2)) until the
# bucket budget holds. The bucket representative is 2*gamma^k/(gamma+1) and
# quantile q walks the cumulative counts to the first bucket > q*n — the
# exact convention of the reference's uddsketch crate (calibrated against
# sqlness aggregate/uddsketch.result goldens).
# ---------------------------------------------------------------------------

import json as _json
import math as _math


def _udd_new(bucket: int, alpha: float) -> dict:
    return {"b": int(bucket), "a": float(alpha), "g": (1 + alpha) / (1 - alpha),
            "n": 0, "z": 0, "p": {}, "m": {}}


def _udd_key(v: float, gamma: float) -> int:
    return int(_math.ceil(_math.log(v) / _math.log(gamma)))


def _udd_collapse_once(s: dict) -> None:
    """One uniform collapse round: gamma <- gamma^2, k <- ceil(k/2)."""
    for side in ("p", "m"):
        nb: dict = {}
        for k, c in s[side].items():
            nk = str(-(-int(k) // 2))  # ceil division for signed keys
            nb[nk] = nb.get(nk, 0) + c
        s[side] = nb
    s["g"] = s["g"] * s["g"]


def _udd_compact(s: dict) -> None:
    while len(s["p"]) + len(s["m"]) + (1 if s["z"] else 0) > s["b"]:
        _udd_collapse_once(s)


def _udd_add(s: dict, v: float) -> None:
    if v == 0:
        s["z"] += 1
    elif v > 0:
        k = str(_udd_key(v, s["g"]))
        s["p"][k] = s["p"].get(k, 0) + 1
    else:
        k = str(_udd_key(-v, s["g"]))
        s["m"][k] = s["m"].get(k, 0) + 1
    s["n"] += 1
    _udd_compact(s)


def _udd_align(a: dict, b: dict) -> None:
    """Bring a to b's gamma (collapse rounds) before merging."""
    while a["g"] < b["g"] - 1e-12:
        _udd_collapse_once(a)


def _udd_merge(a: dict, b: dict) -> dict:
    if b["n"] == 0:
        return a
    if a["n"] == 0:
        a, b = b, a
    if b["n"]:
        _udd_align(a, b)
        _udd_align(b, a)
        for side in ("p", "m"):
            for k, c in b[side].items():
                a[side][k] = a[side].get(k, 0) + c
        a["z"] += b["z"]
        a["n"] += b["n"]
        _udd_compact(a)
    return a


def _udd_quantile(s: dict, q: float) -> float | None:
    if s["n"] == 0:
        return None
    gamma = s["g"]
    items: list[tuple[float, int]] = []
    # negatives ascend from most-negative (largest |k|) to least
    for k, c in sorted(((int(k), c) for k, c in s["m"].items()), reverse=True):
        items.append((-2 * gamma ** k / (gamma + 1), c))
    if s["z"]:
        items.append((0.0, s["z"]))
    for k, c in sorted((int(k), c) for k, c in s["p"].items()):
        items.append((2 * gamma ** k / (gamma + 1), c))
    target = q * s["n"]
    cum = 0
    for val, c in items:
        cum += c
        if cum > target:
            return val
    return items[-1][0]


def _udd_restore(b: int, a: float, raw: bytes) -> dict:
    s = _json.loads(bytes(raw).decode())
    if s["n"] and (s["b"] != b or abs(s["a"] - a) >= 1e-9):
        raise ValueError(
            "Merging UDDSketch with different parameters: "
            f"arguments={(b, a)} vs actual input={(s['b'], s['a'])}"
        )
    return s


def register_udd(spark) -> None:
    """Register uddsketch_state / uddsketch_merge / uddsketch_calc as SQL
    functions (pandas GROUPED_AGG for the aggregates, vectorized scalar for
    calc) — the reference's state/merge/calc triple (uddsketch.rs:37-39)."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("binary", PandasUDFType.GROUPED_AGG)
    def _udd_state(bucket, alpha, v):
        s = _udd_new(int(bucket.iloc[0]), float(alpha.iloc[0]))
        for x in v.dropna():
            _udd_add(s, float(x))
        return _json.dumps(s, sort_keys=True).encode()

    @pandas_udf("binary", PandasUDFType.GROUPED_AGG)
    def _udd_merge_agg(bucket, alpha, states):
        b, a = int(bucket.iloc[0]), float(alpha.iloc[0])
        acc = _udd_new(b, a)
        for raw in states.dropna():
            acc = _udd_merge(acc, _udd_restore(b, a, raw))
        return _json.dumps(acc, sort_keys=True).encode()

    @pandas_udf("double", PandasUDFType.SCALAR)
    def _udd_calc(q, states):
        out = []
        for qv, raw in zip(q, states):
            if raw is None:
                out.append(None)
                continue
            s = _json.loads(bytes(raw).decode())
            out.append(_udd_quantile(s, float(qv)))
        return pd.Series(out, dtype="float64")

    spark.udf.register("uddsketch_state", _udd_state)
    spark.udf.register("uddsketch_merge", _udd_merge_agg)
    spark.udf.register("uddsketch_calc", _udd_calc)


def count_hash(*cols) -> Column:
    """count(distinct hash(tuple)) — sampling-friendly distinct counter."""
    return F.count_distinct(F.xxhash64(*cols))
