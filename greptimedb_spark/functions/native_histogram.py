"""Prometheus native histograms (exponential / custom-bucket sparse histograms).

Field contract and estimator semantics follow the reference implementation
(reference: src/common/query/src/native_histogram.rs:42-139 for the struct
field contract, :558-788 for the bucket materialization / quantile / fraction
estimators, :404-446 for stdvar/stddev, :1188-1220 for bucket bounds) and the
PromQL function surface wired in reference: src/query/src/promql/planner.rs:3057-3090
(histogram_count/sum/avg/stddev/stdvar/fraction) and :4042 (native
histogram_quantile plan).

Spark-first design: a native histogram is one nullable STRUCT column whose
children mirror the reference's persisted field names, so Parquet keeps each
child as its own column chunk (column pruning still works: histogram_count
reads only `count_u64`/`count_f64`).  The estimators are Arrow-batched pandas
UDFs — per-row bucket walks are genuinely imperative (sparse span decoding +
interpolation), which is the documented escape hatch; everything around them
(grouping, joins, step alignment) stays in native Spark.
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass, field

_F64_MAX = sys.float_info.max

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

CUSTOM_BUCKETS_SCHEMA = -53
MIN_EXPONENTIAL_SCHEMA = -4
MAX_EXPONENTIAL_SCHEMA = 8

# Reset hints (reference: native_histogram.rs:141-191)
HINT_UNKNOWN = 0
HINT_COUNTER_RESET = 1
HINT_NOT_COUNTER_RESET = 2
HINT_GAUGE = 3

# Spark children of the native-histogram struct.  Unsigned reference fields
# (count_u64, span lengths) map to the next-wider signed Spark type.
NATIVE_HISTOGRAM_SCHEMA = StructType([
    StructField("schema", IntegerType()),
    StructField("zero_threshold", DoubleType()),
    StructField("sum", DoubleType()),
    StructField("reset_hint", IntegerType()),
    StructField("start_timestamp", LongType()),
    StructField("custom_values", ArrayType(DoubleType())),
    StructField("positive_span_offsets", ArrayType(IntegerType())),
    StructField("positive_span_lengths", ArrayType(LongType())),
    StructField("negative_span_offsets", ArrayType(IntegerType())),
    StructField("negative_span_lengths", ArrayType(LongType())),
    StructField("count_u64", LongType()),
    StructField("zero_count_u64", LongType()),
    StructField("positive_buckets_i64", ArrayType(LongType())),
    StructField("negative_buckets_i64", ArrayType(LongType())),
    StructField("count_f64", DoubleType()),
    StructField("zero_count_f64", DoubleType()),
    StructField("positive_buckets_f64", ArrayType(DoubleType())),
    StructField("negative_buckets_f64", ArrayType(DoubleType())),
])

FIELD_NAMES = [f.name for f in NATIVE_HISTOGRAM_SCHEMA.fields]


def is_native_histogram_type(dt) -> bool:
    """A struct with the native-histogram child names is a histogram column."""
    return isinstance(dt, StructType) and {f.name for f in dt.fields} >= {
        "schema", "zero_threshold", "sum", "positive_span_offsets",
    }


def _exponential_overflow_index(schema: int) -> int | None:
    if not (MIN_EXPONENTIAL_SCHEMA <= schema <= MAX_EXPONENTIAL_SCHEMA):
        return None
    if schema >= 0:
        return (1024 << schema) + 1
    return (1024 >> (-schema)) + 1


def get_bound(idx: int, schema: int, custom_values: list[float]) -> float | None:
    """Upper bound of bucket `idx` (reference: native_histogram.rs:1188)."""
    if schema == CUSTOM_BUCKETS_SCHEMA:
        if idx == -1:
            return -math.inf
        if idx == len(custom_values):
            return math.inf
        if 0 <= idx < len(custom_values):
            return custom_values[idx]
        return None
    overflow = _exponential_overflow_index(schema)
    if overflow is None or idx > overflow:
        return None
    if idx == overflow:
        return math.inf
    if idx == overflow - 1:
        return _F64_MAX
    if schema < 0:
        exponent = idx << (-schema)
        if exponent < -1074 or exponent > 1023:
            return 0.0 if exponent < 0 else math.inf
        return 2.0 ** exponent
    return 2.0 ** (idx / (1 << schema))


@dataclass
class _Bucket:
    lower: float
    upper: float
    count: float
    # boundary rule (native_histogram.rs:203): "open_left" → (a,b],
    # "open_right" → [a,b), "closed_both" → [a,b]
    rule: str = "open_left"


@dataclass
class NativeHistogram:
    """Query-time histogram with absolute f64 counts
    (reference: native_histogram.rs:223-248)."""

    schema: int = 0
    zero_threshold: float = 0.0
    sum: float = 0.0
    reset_hint: int = HINT_UNKNOWN
    start_timestamp: int | None = None
    custom_values: list[float] = field(default_factory=list)
    positive_spans: list[tuple[int, int]] = field(default_factory=list)  # (offset, length)
    negative_spans: list[tuple[int, int]] = field(default_factory=list)
    count: float = 0.0
    zero_count: float = 0.0
    positive_buckets: list[float] = field(default_factory=list)
    negative_buckets: list[float] = field(default_factory=list)

    # -- struct row <-> model ------------------------------------------------

    @classmethod
    def from_struct(cls, row) -> "NativeHistogram | None":
        """Build from a struct value (dict from Arrow, or Row).  The populated
        int/float family is the type signal (native_histogram.rs:63-64)."""
        if row is None:
            return None
        raw = row.get if isinstance(row, dict) else lambda k, d=None: getattr(row, k, d)

        def get(k, d=None):
            # Arrow→pandas renders NULL struct children as NaN floats
            v = raw(k, d)
            if isinstance(v, float) and math.isnan(v):
                return d
            return v

        def lst(name):
            v = raw(name)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return []
            return list(v)

        if get("schema") is None and get("count_u64") is None and get("count_f64") is None:
            return None  # NULL struct row
        int_payload = get("count_u64") is not None
        if int_payload:
            count = float(get("count_u64") or 0)
            zero_count = float(get("zero_count_u64") or 0)
            pos = [float(x) for x in lst("positive_buckets_i64")]
            neg = [float(x) for x in lst("negative_buckets_i64")]
        else:
            if get("count_f64") is None and get("schema") is None:
                return None
            count = float(get("count_f64") or 0.0)
            zero_count = float(get("zero_count_f64") or 0.0)
            pos = [float(x) for x in lst("positive_buckets_f64")]
            neg = [float(x) for x in lst("negative_buckets_f64")]
        s = get("sum")
        return cls(
            schema=int(get("schema") or 0),
            zero_threshold=float(get("zero_threshold") or 0.0),
            sum=float(s) if s is not None else math.nan,
            reset_hint=int(get("reset_hint") or 0),
            start_timestamp=get("start_timestamp"),
            custom_values=[float(x) for x in lst("custom_values")],
            positive_spans=list(zip(lst("positive_span_offsets"),
                                    [int(x) for x in lst("positive_span_lengths")])),
            negative_spans=list(zip(lst("negative_span_offsets"),
                                    [int(x) for x in lst("negative_span_lengths")])),
            count=count,
            zero_count=zero_count,
            positive_buckets=pos,
            negative_buckets=neg,
        )

    def to_struct(self) -> dict:
        """Serialize back as a float-family struct row (query results are
        always absolute f64 counts, native_histogram.rs:19-21)."""
        return {
            "schema": self.schema,
            "zero_threshold": self.zero_threshold,
            "sum": self.sum,
            "reset_hint": self.reset_hint,
            "start_timestamp": self.start_timestamp,
            "custom_values": list(self.custom_values),
            "positive_span_offsets": [o for o, _ in self.positive_spans],
            "positive_span_lengths": [l for _, l in self.positive_spans],
            "negative_span_offsets": [o for o, _ in self.negative_spans],
            "negative_span_lengths": [l for _, l in self.negative_spans],
            "count_u64": None,
            "zero_count_u64": None,
            "positive_buckets_i64": None,
            "negative_buckets_i64": None,
            "count_f64": self.count,
            "zero_count_f64": self.zero_count,
            "positive_buckets_f64": list(self.positive_buckets),
            "negative_buckets_f64": list(self.negative_buckets),
        }

    # -- bucket materialization ---------------------------------------------

    def uses_custom_buckets(self) -> bool:
        return self.schema == CUSTOM_BUCKETS_SCHEMA

    def _side_indices(self, spans) -> list[int] | None:
        out, idx = [], 0
        for offset, length in spans:
            idx += offset
            for _ in range(length):
                out.append(idx)
                idx += 1
        return out

    def _side_buckets(self, positive: bool) -> list[_Bucket] | None:
        spans, counts = ((self.positive_spans, self.positive_buckets) if positive
                         else (self.negative_spans, self.negative_buckets))
        idxs = self._side_indices(spans)
        if idxs is None or len(idxs) != len(counts):
            return None
        out = []
        for idx, count in zip(idxs, counts):
            upper = get_bound(idx, self.schema, self.custom_values)
            lower = get_bound(idx - 1, self.schema, self.custom_values)
            if upper is None or lower is None:
                return None
            if positive:
                # custom idx 0 has lower = -Inf and is ClosedBoth in the
                # reference (native_histogram.rs:588-592)
                rule = ("closed_both"
                        if self.uses_custom_buckets() and idx == 0
                        else "open_left")
                out.append(_Bucket(lower, upper, count, rule))
            else:
                out.append(_Bucket(-upper, -lower, count, "open_right"))
        return out

    def all_buckets(self) -> list[_Bucket] | None:
        """Negative buckets (ascending), zero bucket, positive buckets
        (native_histogram.rs:558-571)."""
        neg = self._side_buckets(False)
        pos = self._side_buckets(True)
        if neg is None or pos is None:
            return None
        buckets = list(reversed(neg))
        if self.zero_count != 0.0:
            buckets.append(_Bucket(-self.zero_threshold, self.zero_threshold,
                                   self.zero_count, "closed_both"))
        buckets.extend(pos)
        return buckets

    # -- estimators (native_histogram.rs:611-788) ----------------------------

    def quantile(self, q: float) -> float:
        if q < 0.0:
            return -math.inf
        if q > 1.0:
            return math.inf
        if self.count == 0.0 or math.isnan(q):
            return math.nan
        buckets = self.all_buckets()
        if buckets is None:
            return math.nan
        rank = q * self.count
        cum = 0.0
        for b in buckets:
            if b.count == 0.0:
                continue
            cum += b.count
            if cum < rank:
                continue
            lower, upper = b.lower, b.upper
            if not self.uses_custom_buckets() and lower < 0.0 and upper > 0.0:
                if not self.negative_buckets and self.positive_buckets:
                    lower = 0.0
                elif not self.positive_buckets and self.negative_buckets:
                    upper = 0.0
            elif self.uses_custom_buckets():
                if lower == -math.inf:
                    if upper <= 0.0:
                        return upper
                    lower = 0.0
                elif upper == math.inf:
                    return lower
            rank_in = rank - (cum - b.count)
            frac = rank_in / b.count
            if self.uses_custom_buckets() or (lower <= 0.0 and upper >= 0.0):
                return lower + (upper - lower) * frac
            log_lower = math.log2(abs(lower))
            log_upper = math.log2(abs(upper))
            if lower > 0.0:
                return 2.0 ** (log_lower + (log_upper - log_lower) * frac)
            return -(2.0 ** (log_upper + (log_lower - log_upper) * (1.0 - frac)))
        return math.nan

    def _interpolate_rank(self, b: _Bucket, rank: float, value: float,
                          zero_bucket: bool) -> float:
        if self.uses_custom_buckets() or zero_bucket:
            if b.lower == -math.inf:
                return b.count
            return rank + b.count * (value - b.lower) / (b.upper - b.lower)
        log_lower = math.log2(abs(b.lower))
        log_upper = math.log2(abs(b.upper))
        log_value = math.log2(abs(value))
        if value > 0.0:
            frac = (log_value - log_lower) / (log_upper - log_lower)
        else:
            frac = 1.0 - ((log_value - log_upper) / (log_lower - log_upper))
        return rank + b.count * frac

    def fraction(self, lower: float, upper: float) -> float:
        if self.count == 0.0 or math.isnan(lower) or math.isnan(upper):
            return math.nan
        if lower >= upper:
            return 0.0
        buckets = self.all_buckets()
        if buckets is None:
            return math.nan
        count = (sum(b.count for b in buckets) if math.isnan(self.sum)
                 else self.count)
        rank = lower_rank = upper_rank = 0.0
        lower_set = upper_set = False
        for b in buckets:
            blower, bupper = b.lower, b.upper
            zero_bucket = blower <= 0.0 and bupper >= 0.0
            if zero_bucket:
                if not self.negative_buckets and self.positive_buckets:
                    blower = 0.0
                elif not self.positive_buckets and self.negative_buckets:
                    bupper = 0.0
            bb = _Bucket(blower, bupper, b.count)
            if not lower_set and blower >= lower:
                lower_rank, lower_set = rank, True
            if not upper_set and blower >= upper:
                upper_rank, upper_set = rank, True
            if lower_set and upper_set:
                break
            if not lower_set and blower < lower and bupper > lower:
                lower_rank = self._interpolate_rank(bb, rank, lower, zero_bucket)
                lower_set = True
            if not upper_set and blower < upper and bupper > upper:
                upper_rank = self._interpolate_rank(bb, rank, upper, zero_bucket)
                upper_set = True
            if lower_set and upper_set:
                break
            rank += b.count
        if not lower_set or lower_rank > count:
            lower_rank = count
        if not upper_set or upper_rank > count:
            upper_rank = count
        return (upper_rank - lower_rank) / self.count

    def _midpoint(self, b: _Bucket) -> float:
        if self.uses_custom_buckets():
            return (b.lower + b.upper) / 2.0
        if b.lower <= 0.0 and b.upper >= 0.0:
            return 0.0
        if b.upper < 0.0:
            return -math.sqrt(abs(b.lower) * abs(b.upper))
        return math.sqrt(b.lower * b.upper)

    def estimated_stdvar(self) -> float:
        if self.count == 0.0:
            return math.nan
        mean = self.sum / self.count
        buckets = self.all_buckets()
        if buckets is None:
            return math.nan
        return sum(b.count * (self._midpoint(b) - mean) ** 2
                   for b in buckets) / self.count

    def estimated_stddev(self) -> float:
        return math.sqrt(self.estimated_stdvar())

    # -- arithmetic (native_histogram.rs:262-478, simplified reconcile) -------

    def _side_map(self, positive: bool) -> dict[int, float] | None:
        spans, counts = ((self.positive_spans, self.positive_buckets) if positive
                         else (self.negative_spans, self.negative_buckets))
        idxs = self._side_indices(spans)
        if idxs is None or len(idxs) != len(counts):
            return None
        return dict(zip(idxs, counts))

    @staticmethod
    def _map_to_spans(m: dict[int, float]) -> tuple[list[tuple[int, int]], list[float]]:
        spans: list[tuple[int, int]] = []
        buckets: list[float] = []
        prev_end = 0
        for idx in sorted(m):
            if spans and idx == prev_end:
                spans[-1] = (spans[-1][0], spans[-1][1] + 1)
            else:
                spans.append((idx - prev_end if spans else idx, 1))
            buckets.append(m[idx])
            prev_end = idx + 1
        return spans, buckets

    @staticmethod
    def _ceil_div(value: int, divisor: int) -> int:
        q, r = divmod(value, divisor)
        return q + (1 if r else 0)

    def _rescaled_map(self, positive: bool, target_schema: int) -> dict[int, float] | None:
        """Merge exponential buckets down to a coarser schema
        (reference: native_histogram.rs:827-848 reconcile_exponential)."""
        m = self._side_map(positive)
        if m is None:
            return None
        if target_schema == self.schema:
            return m
        factor = 1 << (self.schema - target_schema)
        out: dict[int, float] = {}
        for idx, count in m.items():
            nidx = self._ceil_div(idx, factor)
            out[nidx] = out.get(nidx, 0.0) + count
        return out

    def _combine(self, other: "NativeHistogram", sign: float) -> "NativeHistogram | None":
        if self.uses_custom_buckets() != other.uses_custom_buckets():
            return None
        if self.uses_custom_buckets():
            if self.custom_values != other.custom_values:
                return None
            target_schema = CUSTOM_BUCKETS_SCHEMA
            a_pos, b_pos = self._side_map(True), other._side_map(True)
            a_neg, b_neg = self._side_map(False), other._side_map(False)
        else:
            target_schema = min(self.schema, other.schema)
            a_pos = self._rescaled_map(True, target_schema)
            b_pos = other._rescaled_map(True, target_schema)
            a_neg = self._rescaled_map(False, target_schema)
            b_neg = other._rescaled_map(False, target_schema)
        if None in (a_pos, b_pos, a_neg, b_neg):
            return None
        zero_threshold = max(self.zero_threshold, other.zero_threshold)

        def fold_zero(m: dict[int, float]) -> tuple[dict[int, float], float]:
            if target_schema == CUSTOM_BUCKETS_SCHEMA or zero_threshold == 0.0:
                return m, 0.0
            kept, folded = {}, 0.0
            for idx, count in m.items():
                ub = get_bound(idx, target_schema, [])
                if ub is not None and ub <= zero_threshold:
                    folded += count
                else:
                    kept[idx] = count
            return kept, folded

        a_pos, az1 = fold_zero(a_pos)
        a_neg, az2 = fold_zero(a_neg)
        b_pos, bz1 = fold_zero(b_pos)
        b_neg, bz2 = fold_zero(b_neg)

        pos = dict(a_pos)
        for idx, c in b_pos.items():
            pos[idx] = pos.get(idx, 0.0) + sign * c
        neg = dict(a_neg)
        for idx, c in b_neg.items():
            neg[idx] = neg.get(idx, 0.0) + sign * c
        pos = {i: c for i, c in pos.items() if c != 0.0}
        neg = {i: c for i, c in neg.items() if c != 0.0}
        pos_spans, pos_buckets = self._map_to_spans(pos)
        neg_spans, neg_buckets = self._map_to_spans(neg)
        return NativeHistogram(
            schema=target_schema,
            zero_threshold=zero_threshold,
            sum=self.sum + sign * other.sum,
            reset_hint=HINT_GAUGE if sign < 0 else self.reset_hint,
            start_timestamp=self.start_timestamp,
            custom_values=list(self.custom_values),
            positive_spans=pos_spans,
            negative_spans=neg_spans,
            count=self.count + sign * other.count,
            zero_count=(self.zero_count + az1 + az2) + sign * (other.zero_count + bz1 + bz2),
            positive_buckets=pos_buckets,
            negative_buckets=neg_buckets,
        )

    def add(self, other: "NativeHistogram") -> "NativeHistogram | None":
        return self._combine(other, 1.0)

    def sub(self, other: "NativeHistogram") -> "NativeHistogram | None":
        return self._combine(other, -1.0)

    def scale(self, factor: float) -> "NativeHistogram":
        return NativeHistogram(
            schema=self.schema, zero_threshold=self.zero_threshold,
            sum=self.sum * factor,
            reset_hint=HINT_GAUGE if factor < 0 else self.reset_hint,
            start_timestamp=self.start_timestamp,
            custom_values=list(self.custom_values),
            positive_spans=list(self.positive_spans),
            negative_spans=list(self.negative_spans),
            count=self.count * factor, zero_count=self.zero_count * factor,
            positive_buckets=[c * factor for c in self.positive_buckets],
            negative_buckets=[c * factor for c in self.negative_buckets],
        )

    def _expanded_zero_threshold(self, zt: float) -> float | None:
        """Push `zt` past any populated bucket it cuts through
        (native_histogram.rs:949-968 expanded_zero_threshold)."""
        if self.uses_custom_buckets():
            return zt
        for positive in (True, False):
            m = self._side_map(positive)
            if m is None:
                return None
            for idx, count in m.items():
                if count == 0.0:
                    continue
                lower = get_bound(idx - 1, self.schema, [])
                upper = get_bound(idx, self.schema, [])
                if lower is None or upper is None:
                    return None
                if lower < zt < upper:
                    zt = upper
        return zt

    def _fold_below(self, m: dict[int, float], zt: float) -> tuple[dict[int, float], float] | None:
        """Split a side map at zero threshold `zt`: buckets entirely inside
        fold into the zero count (native_histogram.rs:1133-1150)."""
        kept, folded = {}, 0.0
        for idx, count in m.items():
            ub = get_bound(idx, self.schema, [])
            if ub is None:
                return None
            if ub <= zt:
                folded += count
            else:
                kept[idx] = count
        return kept, folded

    def _custom_mapped(self, positive: bool, new_values: list[float]) -> dict[int, float] | None:
        """Re-bin custom buckets onto a different custom-value boundary list
        (native_histogram.rs:1115-1131 map_custom_side)."""
        m = self._side_map(positive)
        if m is None:
            return None
        if new_values == self.custom_values:
            return m
        out: dict[int, float] = {}
        for idx, count in m.items():
            ub = get_bound(idx, CUSTOM_BUCKETS_SCHEMA, self.custom_values)
            if ub is None:
                return None
            t = next((i for i, v in enumerate(new_values) if v >= ub),
                     len(new_values))
            out[t] = out.get(t, 0.0) + count
        return out

    @staticmethod
    def _maps_have_reset(cur: dict[int, float], prev: dict[int, float]) -> bool:
        return any(cur.get(i, 0.0) < prev.get(i, 0.0)
                   for i in set(cur) | set(prev))

    def detect_reset(self, previous: "NativeHistogram") -> bool:
        """Reference-faithful counter-reset detection
        (native_histogram.rs:483-532): explicit hints first, then total
        count, then bucket-wise comparison after reconciling layouts.  The
        sum is deliberately NOT compared — negative observations can shrink
        it without a reset."""
        if self.reset_hint == HINT_COUNTER_RESET:
            return True
        if self.reset_hint == HINT_NOT_COUNTER_RESET:
            return False
        if self.count < previous.count:
            return True
        cu, pu = self.uses_custom_buckets(), previous.uses_custom_buckets()
        if cu != pu:
            return True
        if cu:
            if self.custom_values == previous.custom_values:
                vals = self.custom_values
            else:
                vals = [v for v in self.custom_values
                        if v in previous.custom_values]
            cur = self._custom_mapped(True, vals)
            prev = previous._custom_mapped(True, vals)
            if cur is None or prev is None:
                return True
            return (self.zero_count < previous.zero_count
                    or self._maps_have_reset(cur, prev))
        # exponential: resolution increase or zero-threshold shrink is a reset
        if (self.schema > previous.schema
                or self.zero_threshold < previous.zero_threshold):
            return True
        p_pos, p_neg = previous._side_map(True), previous._side_map(False)
        if p_pos is None or p_neg is None:
            return True
        p_zero = previous.zero_count
        if self.zero_threshold > previous.zero_threshold:
            expanded = previous._expanded_zero_threshold(self.zero_threshold)
            if expanded is None or expanded != self.zero_threshold:
                return True
            fp = previous._fold_below(p_pos, self.zero_threshold)
            fn_ = previous._fold_below(p_neg, self.zero_threshold)
            if fp is None or fn_ is None:
                return True
            p_pos, z1 = fp
            p_neg, z2 = fn_
            p_zero += z1 + z2
        if self.zero_count < p_zero:
            return True
        if previous.schema > self.schema:
            factor = 1 << (previous.schema - self.schema)
            rp: dict[int, float] = {}
            for i, c in p_pos.items():
                ni = self._ceil_div(i, factor)
                rp[ni] = rp.get(ni, 0.0) + c
            rn: dict[int, float] = {}
            for i, c in p_neg.items():
                ni = self._ceil_div(i, factor)
                rn[ni] = rn.get(ni, 0.0) + c
            p_pos, p_neg = rp, rn
        cur_pos, cur_neg = self._side_map(True), self._side_map(False)
        if cur_pos is None or cur_neg is None:
            return True
        return (self._maps_have_reset(cur_pos, p_pos)
                or self._maps_have_reset(cur_neg, p_neg))

    def promql_string(self) -> str:
        """Render like the reference's golden output
        (native_histogram.rs:380-401; Rust f64 Display: `inf`, `NaN`,
        positional notation — never scientific)."""
        def fmt(v: float) -> str:
            if math.isnan(v):
                return "NaN"
            if v == math.inf:
                return "inf"
            if v == -math.inf:
                return "-inf"
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            s = repr(v)
            if "e" in s or "E" in s:
                from decimal import Decimal
                s = format(Decimal(s), "f")
            return s

        _EDGES = {"open_left": ("(", "]"), "open_right": ("[", ")"),
                  "closed_both": ("[", "]")}
        parts = [f"count:{fmt(self.count)}", f"sum:{fmt(self.sum)}"]
        buckets = self.all_buckets() or []
        for b in buckets:
            if b.count == 0.0:
                continue
            left, right = _EDGES[b.rule]
            parts.append(f"{left}{fmt(b.lower)},{fmt(b.upper)}{right}:{fmt(b.count)}")
        return "{" + ", ".join(parts) + "}"


# -- Arrow-batched column functions -----------------------------------------


def _struct_records(col) -> list[dict | None]:
    """A struct argument reaches a pandas UDF as a pd.DataFrame (one column
    per child); normalize to per-row dicts, NULL structs to None."""
    if isinstance(col, pd.DataFrame):
        return col.to_dict("records")
    return list(col)


def _scalar_estimator(fn):
    @pandas_udf(DoubleType())
    def udf(col: pd.DataFrame) -> pd.Series:
        return pd.Series([fn(NativeHistogram.from_struct(row)) for row in
                          _struct_records(col)], dtype="float64")
    return udf


histogram_count = _scalar_estimator(lambda h: h.count if h else math.nan)
histogram_sum = _scalar_estimator(lambda h: h.sum if h else math.nan)
histogram_avg = _scalar_estimator(
    lambda h: (h.sum / h.count) if h and h.count != 0.0 else math.nan)
histogram_stddev = _scalar_estimator(lambda h: h.estimated_stddev() if h else math.nan)
histogram_stdvar = _scalar_estimator(lambda h: h.estimated_stdvar() if h else math.nan)


def histogram_quantile_native(col, q: float):
    @pandas_udf(DoubleType())
    def udf(c: pd.DataFrame) -> pd.Series:
        def one(row):
            h = NativeHistogram.from_struct(row)
            return h.quantile(q) if h is not None else math.nan
        return pd.Series([one(r) for r in _struct_records(c)], dtype="float64")
    return udf(col)


def histogram_fraction_native(col, lower: float, upper: float):
    @pandas_udf(DoubleType())
    def udf(c: pd.DataFrame) -> pd.Series:
        def one(row):
            h = NativeHistogram.from_struct(row)
            return h.fraction(lower, upper) if h is not None else math.nan
        return pd.Series([one(r) for r in _struct_records(c)], dtype="float64")
    return udf(col)


def histogram_promql_string(col):
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def udf(c: pd.DataFrame) -> pd.Series:
        def one(row):
            h = NativeHistogram.from_struct(row)
            return h.promql_string() if h is not None else None
        return pd.Series([one(r) for r in _struct_records(c)], dtype="object")
    return udf(col)
