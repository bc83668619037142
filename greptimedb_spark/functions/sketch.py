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

def register_weighted_pct(spark) -> None:
    """approx_percentile_cont[_with_weight] / approx_median as pure-SQL temp
    functions over a sorted (value, weight) array — stays in whole-stage
    codegen and composes with any other aggregate in the same SELECT (a
    pandas GROUPED_AGG UDAF cannot).

    Reproduces DataFusion's t-digest EXACTLY (single-node, single-batch
    semantics, which is what the sqlness goldens pin): the centroid
    compression fold of merge_sorted_f64 with max_size=100 and the k_to_q
    scale function, then estimate_quantile's neighbour interpolation clamped
    to the branch-specific [min, max]
    (datafusion physical-expr tdigest.rs, ported from the tdigest crate;
    verified against aggregate/approx_percentile_cont{,_with_weight}.result
    and aggregate/approx_median.result incl. the 1000-row compressed case)."""
    # merge_sorted_f64's compression loop as an aggregate() fold: state =
    # (cs compressed, cm/cw current centroid, wsf weight_so_far, k k_limit,
    # sm/wm sums-and-weights pending merge into the current centroid)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gt_td_compress("
        "a ARRAY<STRUCT<v: DOUBLE, w: DOUBLE>>, W DOUBLE) "
        "RETURNS ARRAY<STRUCT<m: DOUBLE, w: DOUBLE>> RETURN "
        "aggregate(slice(a, 2, greatest(size(a) - 1, 0)), "
        "struct(CAST(array() AS ARRAY<STRUCT<m: DOUBLE, w: DOUBLE>>) AS cs, "
        "get(a, 0).v AS cm, get(a, 0).w AS cw, get(a, 0).w AS wsf, 1D AS k, "
        "0D AS sm, 0D AS wm), "
        "(st, x) -> CASE WHEN st.wsf + x.w <= "
        "(CASE WHEN st.k / 100D >= 0.5D "
        "THEN 1D - 2D * pow(1D - st.k / 100D, 2) "
        "ELSE 2D * pow(st.k / 100D, 2) END) * W THEN "
        "struct(st.cs AS cs, st.cm AS cm, st.cw AS cw, st.wsf + x.w AS wsf, "
        "st.k AS k, st.sm + x.v * x.w AS sm, st.wm + x.w AS wm) "
        "ELSE struct(array_append(st.cs, "
        "struct((st.sm + st.cw * st.cm) / (st.cw + st.wm) AS m, "
        "st.cw + st.wm AS w)) AS cs, x.v AS cm, x.w AS cw, "
        "st.wsf + x.w AS wsf, st.k + 1D AS k, 0D AS sm, 0D AS wm) END, "
        "st -> array_append(st.cs, "
        "struct((st.sm + st.cw * st.cm) / (st.cw + st.wm) AS m, "
        "st.cw + st.wm AS w)))")
    # estimate_quantile: pos = largest centroid whose exclusive weight
    # prefix <= rank (equivalent to both of the reference's scan
    # directions); interpolate against the neighbour means, clamp to the
    # branch min/max
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gt_td_cums("
        "cs ARRAY<STRUCT<m: DOUBLE, w: DOUBLE>>) RETURNS ARRAY<DOUBLE> "
        "RETURN aggregate(cs, array(0D), "
        "(ac, x) -> array_append(ac, ac[size(ac)-1] + x.w))")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gt_td_pos("
        "cs ARRAY<STRUCT<m: DOUBLE, w: DOUBLE>>, rank DOUBLE) RETURNS INT "
        "RETURN size(filter(sequence(1, size(cs)), "
        "i -> element_at(gt_td_cums(cs), i) <= rank))")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gt_td_interp("
        "cs ARRAY<STRUCT<m: DOUBLE, w: DOUBLE>>, rank DOUBLE, p INT, "
        "mn DOUBLE, mx DOUBLE) RETURNS DOUBLE RETURN "
        "least(greatest("
        "element_at(cs, p).m + ((rank - element_at(gt_td_cums(cs), p)) "
        "/ element_at(cs, p).w - 0.5D) * CASE WHEN size(cs) <= 1 THEN 0D "
        "WHEN p = 1 THEN element_at(cs, 2).m - element_at(cs, 1).m "
        "WHEN p = size(cs) THEN element_at(cs, p).m - element_at(cs, p-1).m "
        "ELSE (element_at(cs, p+1).m - element_at(cs, p-1).m) / 2D END, "
        "CASE WHEN size(cs) <= 1 OR p = 1 THEN mn "
        "ELSE element_at(cs, p-1).m END), "
        "CASE WHEN size(cs) <= 1 OR p = size(cs) THEN mx "
        "ELSE element_at(cs, p+1).m END)")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gt_td_est("
        "cs ARRAY<STRUCT<m: DOUBLE, w: DOUBLE>>, q DOUBLE, W DOUBLE, "
        "mn DOUBLE, mx DOUBLE) RETURNS DOUBLE RETURN "
        "gt_td_interp(cs, q * W, gt_td_pos(cs, q * W), mn, mx)")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gt_apcw("
        "a ARRAY<STRUCT<v: DOUBLE, w: DOUBLE>>, q DOUBLE) RETURNS DOUBLE "
        "RETURN CASE WHEN a IS NULL OR size(a) = 0 THEN NULL "
        "WHEN q >= 1D THEN get(a, size(a)-1).v "
        "WHEN q <= 0D THEN get(a, 0).v "
        "ELSE gt_td_est("
        "gt_td_compress(a, aggregate(a, 0D, (ac, x) -> ac + x.w)), q, "
        "aggregate(a, 0D, (ac, x) -> ac + x.w), "
        "get(a, 0).v, get(a, size(a)-1).v) END")


def register_tdigest_merge(spark) -> None:
    """The merge half of the distributed t-digest: combine per-partition
    partial states (each ≤100 centroids) into one estimate — DataFusion's
    merge_digests (concatenate centroids sorted by mean, recompress with
    merge_sorted_f64, estimate with the global min/max/weight). Requires
    register_weighted_pct (gt_td_compress / gt_td_est)."""
    register_weighted_pct(spark)
    # a partial: cs = compressed centroids, w = total weight, mn/mx = group
    # value bounds (needed for the estimate's clamp branches)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gt_td_partial("
        "a ARRAY<STRUCT<v: DOUBLE, w: DOUBLE>>) RETURNS "
        "STRUCT<cs: ARRAY<STRUCT<m: DOUBLE, w: DOUBLE>>, w: DOUBLE, "
        "mn: DOUBLE, mx: DOUBLE> RETURN "
        "CASE WHEN a IS NULL OR size(a) = 0 THEN NULL ELSE "
        "struct(gt_td_compress(a, aggregate(a, 0D, (ac, x) -> ac + x.w)) AS cs, "
        "aggregate(a, 0D, (ac, x) -> ac + x.w) AS w, "
        "get(a, 0).v AS mn, get(a, size(a)-1).v AS mx) END")
    # merged estimate: centroids re-enter compression as weighted values
    # (struct<v,w> array_sort orders by v = mean first — merge_sorted_f64's
    # sort-by-mean), W/mn/mx fold across partials
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gt_td_final("
        "parts0 ARRAY<STRUCT<cs: ARRAY<STRUCT<m: DOUBLE, w: DOUBLE>>, "
        "w: DOUBLE, mn: DOUBLE, mx: DOUBLE>>, q DOUBLE) RETURNS DOUBLE "
        "RETURN CASE WHEN size(filter(parts0, p -> p IS NOT NULL)) = 0 "
        "THEN NULL "
        "WHEN q <= 0D THEN aggregate(filter(parts0, p -> p IS NOT NULL), "
        "CAST(NULL AS DOUBLE), (ac, p) -> least(coalesce(ac, p.mn), p.mn)) "
        "WHEN q >= 1D THEN aggregate(filter(parts0, p -> p IS NOT NULL), "
        "CAST(NULL AS DOUBLE), (ac, p) -> greatest(coalesce(ac, p.mx), p.mx)) "
        "ELSE gt_td_est("
        "gt_td_compress(array_sort(flatten(transform("
        "filter(parts0, p -> p IS NOT NULL), "
        "p -> transform(p.cs, c -> struct(c.m AS v, c.w AS w))))), "
        "aggregate(filter(parts0, p -> p IS NOT NULL), 0D, (ac, p) -> ac + p.w)), "
        "q, "
        "aggregate(filter(parts0, p -> p IS NOT NULL), 0D, (ac, p) -> ac + p.w), "
        "aggregate(filter(parts0, p -> p IS NOT NULL), CAST(NULL AS DOUBLE), "
        "(ac, p) -> least(coalesce(ac, p.mn), p.mn)), "
        "aggregate(filter(parts0, p -> p IS NOT NULL), CAST(NULL AS DOUBLE), "
        "(ac, p) -> greatest(coalesce(ac, p.mx), p.mx))) END")


def percentile_cont_bounded(
    df,
    group_cols: list,
    value_col: str,
    q: float,
    weight_col: str | None = None,
):
    """approx_percentile_cont with BOUNDED per-group state — the 100-TB path.

    The single-batch lowering in sql.py (gt_apcw over a full collect_list)
    reproduces the reference goldens exactly but materializes every group
    row in one aggregate buffer. This variant is the honest distributed
    t-digest (DataFusion physical-expr tdigest.rs partial aggregation):

      stage 1  groupBy(keys, spark_partition_id): sort + compress each
               partition's slice of the group to ≤100 centroids (the
               collect_list here is bounded by the PARTITION, which fits
               executor memory by definition);
      stage 2  groupBy(keys): concatenate the ≤100-centroid partials sorted
               by mean, recompress once, estimate against the global
               min/max/weight.

    State per group at the final aggregate = (#partitions holding the
    group) × 100 centroids — independent of row count. Estimates differ
    from the single-batch path only within t-digest error bounds
    (tests/test_sql_functions.py::test_percentile_bounded_vs_exact).

    Returns one row per group with column ``pct``.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    register_tdigest_merge(spark)
    w = weight_col or "1D"
    pair = (f"CASE WHEN {value_col} IS NOT NULL AND {w} IS NOT NULL THEN "
            f"struct(CAST({value_col} AS DOUBLE) AS v, "
            f"CAST({w} AS DOUBLE) AS w) END")
    partials = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy(*group_cols, "__pid")
        .agg(F.expr(
            f"gt_td_partial(array_sort(collect_list({pair})))"
        ).alias("__part"))
    )
    return (
        partials.groupBy(*group_cols)
        .agg(F.expr(f"gt_td_final(collect_list(__part), {q!r}D)").alias("pct"))
    )


def count_hash(*cols) -> Column:
    """count(distinct hash(tuple)) — sampling-friendly distinct counter."""
    return F.count_distinct(F.xxhash64(*cols))
