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
