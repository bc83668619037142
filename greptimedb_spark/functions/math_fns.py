"""Math extras (reference src/common/function/src/scalars/math/{clamp,modulo,rate}.rs)."""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def clamp(col, lo, hi) -> Column:
    """clamp(v, lo, hi) — reference math/clamp.rs (min > max is rejected,
    function/arithmetic.sql golden)."""
    if isinstance(lo, (int, float)) and isinstance(hi, (int, float)) and lo > hi:
        raise ValueError(f"min '{lo}' > max '{hi}'")
    return F.least(F.greatest(F.col(col) if isinstance(col, str) else col, F.lit(lo)), F.lit(hi))


def clamp_min(col, lo) -> Column:
    return F.greatest(F.col(col) if isinstance(col, str) else col, F.lit(lo))


def clamp_max(col, hi) -> Column:
    return F.least(F.col(col) if isinstance(col, str) else col, F.lit(hi))


def rate(value: str, ts: str, partition_by: list[str]) -> Column:
    """Per-series rate between consecutive rows (reference math/rate.rs):
    (v - lag(v)) / (t - lag(t)) with t in seconds."""
    w = Window.partitionBy(*partition_by).orderBy(ts)
    t_s = F.unix_micros(F.col(ts)) / 1e6
    return (F.col(value) - F.lag(value).over(w)) / (t_s - F.lag(t_s).over(w))
