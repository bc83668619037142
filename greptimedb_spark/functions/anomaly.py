"""Anomaly-score window functions (reference
src/common/function/src/scalars/anomaly/{mad,iqr,zscore}.rs, registered as
window UDFs at anomaly/mod.rs:86-88).

Each score is computed over a Window spec (typically partitionBy(series)
orderBy(ts) rowsBetween(-n, 0)) using only built-in aggregates — stays in
JVM codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def anomaly_score_zscore(col, w: WindowSpec) -> Column:
    """|x - mean| / stddev over the window."""
    c = _c(col)
    mu = F.avg(c).over(w)
    sd = F.stddev_pop(c).over(w)
    return F.when(sd > 0, F.abs(c - mu) / sd).otherwise(F.lit(0.0))


def anomaly_score_mad(col, w: WindowSpec) -> Column:
    """|x - median| / (1.4826 * MAD) over the window; MAD approximated with
    percentile_approx of absolute deviations from the window median.

    Exact two-pass MAD needs the median first; inside a single window pass we
    use the median-of-window then percentile of |x-med| via a second window —
    callers get both passes fused by Catalyst when the window spec matches."""
    c = _c(col)
    med = F.percentile_approx(c, 0.5).over(w)
    # deviation uses the *current row's* window median — second pass
    dev = F.abs(c - med)
    mad = F.percentile_approx(dev, 0.5).over(w)
    return F.when(mad > 0, F.abs(c - med) / (1.4826 * mad)).otherwise(F.lit(0.0))


def anomaly_score_iqr(col, w: WindowSpec) -> Column:
    """Distance outside the [Q1 - 1.5 IQR, Q3 + 1.5 IQR] fence, in IQR units."""
    c = _c(col)
    q1 = F.percentile_approx(c, 0.25).over(w)
    q3 = F.percentile_approx(c, 0.75).over(w)
    iqr = q3 - q1
    lo = q1 - 1.5 * iqr
    hi = q3 + 1.5 * iqr
    return F.when(iqr <= 0, F.lit(0.0)).otherwise(
        F.when(c < lo, (lo - c) / iqr).when(c > hi, (c - hi) / iqr).otherwise(F.lit(0.0))
    )


def register(spark) -> None:
    """SQL window surface. The scores are expanded by the SQL front door
    into plain window algebra over the caller's OVER(…) spec (works for any
    frame — trailing, centered, leading), built from count/avg/stddev_pop/
    percentile window aggregates. Only the MAD *scale* (median of absolute
    deviations from the frame median) is frame-level-irreducible — it is
    this one frame-only grouped-agg UDF."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def _mad_scale(v):
        vals = v.to_numpy(dtype=float)
        vals = vals[np.isfinite(vals)]
        if len(vals) == 0:
            return None
        med = float(np.median(vals))
        return float(np.median(np.abs(vals - med)))

    spark.udf.register("gt_mad_scale", _mad_scale)


# score = ratio(distance, scale); scale 0 → 0 on-center else +inf
# (reference anomaly/utils.rs:98 anomaly_ratio)
_RATIO = ("(CASE WHEN {s} = 0.0 THEN (CASE WHEN {d} = 0.0 THEN 0.0 "
          "ELSE double('inf') END) ELSE {d} / {s} END)")


def zscore_sql(v: str, w: str) -> str:
    """|x-mean|/pop-stddev over the frame; <2 samples → NULL (zscore.rs:38)."""
    d = f"abs({v} - avg({v}) OVER ({w}))"
    s = f"stddev_pop({v}) OVER ({w})"
    r = _RATIO.format(d=d, s=s)
    return (f"(CASE WHEN count({v}) OVER ({w}) < 2 "
            f"THEN CAST(NULL AS DOUBLE) ELSE {r} END)")


def mad_sql(v: str, w: str) -> str:
    """|x-median|/(1.4826*MAD); <3 samples → NULL (mad.rs:41)."""
    med = f"percentile({v}, 0.5) OVER ({w})"
    d = f"abs({v} - {med})"
    s = f"(1.4826 * (gt_mad_scale({v}) OVER ({w})))"
    r = _RATIO.format(d=d, s=s)
    return (f"(CASE WHEN count({v}) OVER ({w}) < 3 "
            f"THEN CAST(NULL AS DOUBLE) ELSE {r} END)")


def iqr_sql(v: str, k: str, w: str) -> str:
    """Distance beyond the [Q1-k*IQR, Q3+k*IQR] fences in IQR units;
    <3 samples → NULL (iqr.rs:43); linear-interpolated quartiles."""
    q1 = f"percentile({v}, 0.25) OVER ({w})"
    q3 = f"percentile({v}, 0.75) OVER ({w})"
    iqr = f"({q3} - {q1})"
    lo = f"({q1} - ({k}) * {iqr})"
    hi = f"({q3} + ({k}) * {iqr})"
    below = _RATIO.format(d=f"({lo} - {v})", s=iqr)
    above = _RATIO.format(d=f"({v} - {hi})", s=iqr)
    return (f"(CASE WHEN count({v}) OVER ({w}) < 3 THEN CAST(NULL AS DOUBLE) "
            f"WHEN {v} < {lo} THEN {below} "
            f"WHEN {v} > {hi} THEN {above} ELSE 0.0 END)")
