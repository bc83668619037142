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


def count_hash(*cols) -> Column:
    """count(distinct hash(tuple)) — sampling-friendly distinct counter."""
    return F.count_distinct(F.xxhash64(*cols))
