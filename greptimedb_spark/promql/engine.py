"""PromQL evaluator: AST → declarative DataFrame pipelines.

Semantics ported from the reference's extension plans (file:line cites per
function below); execution shape is Spark-first:

- Instant selector + lookback/staleness (reference InstantManipulate,
  src/promql/src/extension_plan/instant_manipulate.rs:517 — window
  ``(t-lookback, t]``): each sample explodes to the aligned eval steps it can
  serve (bounded fan-out = lookback/step), then one grouped ``max_by``
  per (step, series) picks the latest sample. No per-series loops, one
  shuffle, map-side partial aggregation.
- Range selector (reference RangeManipulate,
  src/promql/src/extension_plan/range_manipulate.rs:693 — window
  ``(t-range, t]``): same explosion with fan-out range/step, but the grouped
  aggregate computes exactly the statistics the wrapping function needs
  (first/last/count/sums) instead of materializing per-window arrays.
- Counter semantics (rate/increase/resets/changes): per-series cumulative
  reset-correction/change counters via a single window pass *before*
  explosion, so window stats reduce to last-minus-first — the same
  incremental trick the reference applies inside its kernel
  (src/promql/src/functions/extrapolate_rate.rs:215-231), but expressed as
  codegen'd window + aggregate instead of a stateful scan.
- Extrapolation math for rate/increase/delta ported exactly from
  extrapolate_rate.rs:244-281 (Prometheus extrapolatedRate).

Every eval step is a long (epoch ms) column named ``__t``; vectors carry
(``__t``, *labels, value).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greptimedb_spark.promql.parser import (
    Aggregate, BinaryOp, Call, LabelMatcher, NumberLiteral, StringLiteral,
    Unary, VectorMatching, VectorSelector, parse_promql,
)

DEFAULT_LOOKBACK_MS = 300_000  # 5m, reference src/query/src/parser.rs:40


@dataclass
class MetricTable:
    df: DataFrame
    value_col: str = "value"
    time_index: str = "ts"
    tags: list[str] = field(default_factory=list)
    fields: list[str] | None = None  # all field columns (for __field__ selection)


@dataclass
class VectorResult:
    df: DataFrame  # (__t long, *labels, value double)
    labels: list[str]


@dataclass
class _Ctx:
    start: int
    end: int
    step: int
    lookback: int


class PromQLEngine:
    """Evaluate PromQL text over registered metric tables."""

    def __init__(self, spark: SparkSession, tables: dict[str, MetricTable],
                 lookback_ms: int = DEFAULT_LOOKBACK_MS):
        self.spark = spark
        self.tables = tables
        self.lookback_ms = lookback_ms

    def evaluate(self, query: str, start_ms: int, end_ms: int, step_ms: int) -> DataFrame:
        """Range-query evaluation; returns (ts timestamp, *labels, value)."""
        ast = parse_promql(query)
        ctx = _Ctx(start_ms, end_ms, step_ms, self.lookback_ms)
        res = self._eval(ast, ctx)
        if isinstance(res, (int, float)):
            res = self._scalar_to_vector(float(res), ctx)
        out = res.df.select(
            F.timestamp_millis(F.col("__t")).alias("ts"),
            *res.labels,
            F.col("value").cast("double").alias("value"),
        )
        return out

    # -- dispatch ---------------------------------------------------------

    def _eval(self, node, ctx: _Ctx):
        if isinstance(node, NumberLiteral):
            return node.value
        if isinstance(node, StringLiteral):
            return node.value
        if isinstance(node, VectorSelector):
            if node.range_ms is not None:
                raise ValueError("raw range vector needs a function (e.g. rate)")
            return self._instant_selector(node, ctx)
        if isinstance(node, Unary):
            inner = self._eval(node.expr, ctx)
            if isinstance(inner, float):
                return -inner
            return VectorResult(inner.df.withColumn("value", -F.col("value")), inner.labels)
        if isinstance(node, Aggregate):
            return self._aggregate(node, ctx)
        if isinstance(node, Call):
            return self._call(node, ctx)
        if isinstance(node, BinaryOp):
            return self._binary(node, ctx)
        raise ValueError(f"unsupported node {node}")

    # -- selectors ----------------------------------------------------------

    def _metric_base(self, sel: VectorSelector):
        # bare {__name__="m"} selectors name the metric via matcher; the
        # __schema__/__database__ matchers are single-catalog no-ops here
        metric = sel.metric
        matchers = []
        empty = False
        field_sel = None
        for m in sel.matchers:
            if m.name == "__name__" and m.op == "=" and not metric:
                metric = m.value
            elif m.name in ("__schema__", "__database__"):
                # single default schema: anything else selects nothing
                if m.value not in ("public", "greptime", ""):
                    empty = True
            elif m.name == "__field__":
                if field_sel is not None:
                    raise ValueError("multiple __field__ selections not supported")
                field_sel = m.value
            elif m.name != "__name__":
                matchers.append(m)
        mt = self.tables.get(metric)
        if mt is None:
            raise ValueError(f"unknown metric {metric!r}")
        value_col = mt.value_col
        if field_sel is not None:
            if mt.fields and field_sel not in mt.fields:
                raise ValueError(f"unknown field {field_sel!r} on {metric}")
            value_col = field_sel
        elif mt.fields and len(mt.fields) > 1:
            raise ValueError(
                f"metric {metric!r} has multiple fields {mt.fields}; select one "
                "with {__field__=\"...\"}"
            )
        df = mt.df
        if empty:
            df = df.filter(F.lit(False))
        for m in matchers:
            c = F.col(m.name)
            if m.op == "=":
                df = df.filter(c == m.value)
            elif m.op == "!=":
                df = df.filter(c != m.value)
            elif m.op == "=~":
                df = df.filter(c.rlike(f"^(?:{m.value})$"))
            else:
                df = df.filter(~c.rlike(f"^(?:{m.value})$"))
        ts_ms = (F.unix_micros(F.col(mt.time_index)) / 1000).cast("long")
        if sel.offset_ms:
            ts_ms = ts_ms + F.lit(sel.offset_ms)
        base = df.select(
            ts_ms.alias("__x"),
            *[F.col(t).cast("string").alias(t) for t in mt.tags],
            F.col(value_col).cast("double").alias("value"),
        )
        return base, list(mt.tags)

    def _explode_steps(self, df: DataFrame, window_ms: int, ctx: _Ctx) -> DataFrame:
        """Attach ``__t``: every aligned eval step this sample is visible at —
        t ≡ start (mod step), t ∈ [start, end], t ∈ [x, x+window)."""
        x = F.col("__x")
        start, end, step = F.lit(ctx.start), F.lit(ctx.end), F.lit(ctx.step)
        n_lo = F.greatest(-F.floor((start - x) / step), F.lit(0)).cast("long")
        n_hi = F.least(
            (-F.floor((start - x - F.lit(window_ms)) / step) - 1).cast("long"),
            ((end - start) / step).cast("long"),
        )
        steps = F.when(
            n_hi >= n_lo,
            F.transform(F.sequence(n_lo, n_hi), lambda n: start + n * step),
        ).otherwise(F.array().cast("array<long>"))
        return df.withColumn("__t", F.explode(steps))

    def _instant_selector(self, sel: VectorSelector, ctx: _Ctx) -> VectorResult:
        base, tags = self._metric_base(sel)
        exploded = self._explode_steps(base, ctx.lookback, ctx)
        out = exploded.groupBy("__t", *tags).agg(
            F.expr("max_by(value, __x)").alias("value")
        )
        return VectorResult(out, tags)

    # -- range functions -------------------------------------------------------

    _RANGE_FNS = {
        "rate", "increase", "delta", "idelta", "irate",
        "avg_over_time", "min_over_time", "max_over_time", "sum_over_time",
        "count_over_time", "last_over_time", "stddev_over_time",
        "stdvar_over_time", "quantile_over_time", "present_over_time",
        "changes", "resets", "deriv", "predict_linear",
        "double_exponential_smoothing", "holt_winters",
    }

    def _range_fn(self, fn: str, sel: VectorSelector, ctx: _Ctx, extra=None) -> VectorResult:
        if sel.range_ms is None:
            raise ValueError(f"{fn}() needs a range vector")
        base, tags = self._metric_base(sel)
        rng = sel.range_ms

        needs_series_pass = fn in (
            "rate", "increase", "idelta", "irate", "changes", "resets"
        )
        if needs_series_pass:
            w = Window.partitionBy(*tags).orderBy("__x") if tags else Window.orderBy("__x")
            prev_v = F.lag("value").over(w)
            cum = Window.partitionBy(*tags).orderBy("__x").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            ) if tags else Window.orderBy("__x").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            base = (
                base.withColumn("__prev_v", prev_v)
                .withColumn("__prev_x", F.lag("__x").over(w))
                .withColumn(
                    "__cum_corr",
                    F.sum(
                        F.when(F.col("value") < F.col("__prev_v"), F.col("__prev_v")).otherwise(0.0)
                    ).over(cum),
                )
                .withColumn(
                    "__cum_chg",
                    F.sum(
                        F.when(
                            F.col("__prev_v").isNotNull()
                            & (
                                (F.col("value") != F.col("__prev_v"))
                                | (F.isnan("value") != F.isnan("__prev_v"))
                            ),
                            1,
                        ).otherwise(0)
                    ).over(cum),
                )
                .withColumn(
                    "__cum_rst",
                    F.sum(
                        F.when(F.col("value") < F.col("__prev_v"), 1).otherwise(0)
                    ).over(cum),
                )
            )

        ex = self._explode_steps(base, rng, ctx)

        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.min("__x").alias("first_ts"),
            F.max("__x").alias("last_ts"),
            F.expr("min_by(value, __x)").alias("first_val"),
            F.expr("max_by(value, __x)").alias("last_val"),
        ]
        if needs_series_pass:
            aggs += [
                F.expr("min_by(__cum_corr, __x)").alias("corr_first"),
                F.expr("max_by(__cum_corr, __x)").alias("corr_last"),
                F.expr("min_by(__cum_chg, __x)").alias("chg_first"),
                F.expr("max_by(__cum_chg, __x)").alias("chg_last"),
                F.expr("min_by(__cum_rst, __x)").alias("rst_first"),
                F.expr("max_by(__cum_rst, __x)").alias("rst_last"),
                F.expr("max_by(__prev_v, __x)").alias("last_prev_v"),
                F.expr("max_by(__prev_x, __x)").alias("last_prev_x"),
            ]
        if fn in ("avg_over_time",):
            aggs.append(F.avg("value").alias("v_avg"))
        if fn in ("min_over_time",):
            aggs.append(F.min("value").alias("v_min"))
        if fn in ("max_over_time",):
            aggs.append(F.max("value").alias("v_max"))
        if fn in ("sum_over_time",):
            aggs.append(F.sum("value").alias("v_sum"))
        if fn in ("stddev_over_time", "stdvar_over_time"):
            aggs.append(F.var_pop("value").alias("v_varp"))
        if fn == "quantile_over_time":
            aggs.append(F.percentile("value", float(extra)).alias("v_quant"))
        if fn in ("deriv", "predict_linear"):
            xs = (F.col("__x") - F.col("__t")) / 1000.0
            aggs += [
                F.sum(xs).alias("sx"),
                F.sum("value").alias("sy"),
                F.sum(xs * F.col("value")).alias("sxy"),
                F.sum(xs * xs).alias("sxx"),
            ]
        if fn in ("double_exponential_smoothing", "holt_winters"):
            # bounded per-window sample array (≤ range/scrape-interval rows)
            # for the sequential Holt-Winters recurrence
            aggs.append(
                F.sort_array(F.collect_list(F.struct("__x", "value"))).alias("samples")
            )

        g = ex.groupBy("__t", *tags).agg(*aggs)
        value = self._range_value(fn, g, rng, extra)
        out = g.withColumn("value", value).filter(F.col("value").isNotNull()).select(
            "__t", *tags, "value"
        )
        return VectorResult(out, tags)

    def _range_value(self, fn: str, g: DataFrame, rng: int, extra) -> Column:
        n = F.col("n")
        first_ts, last_ts = F.col("first_ts"), F.col("last_ts")
        first_val, last_val = F.col("first_val"), F.col("last_val")

        if fn in ("rate", "increase", "delta"):
            is_counter = fn in ("rate", "increase")
            is_rate = fn == "rate"
            corr = (F.col("corr_last") - F.col("corr_first")) if is_counter else F.lit(0.0)
            result = last_val - first_val + corr
            range_end = F.col("__t")
            range_start = range_end - F.lit(rng)
            sampled = (last_ts - first_ts).cast("double")
            avg_int = sampled / (n - 1)
            dur_start = (first_ts - range_start).cast("double")
            dur_end = (range_end - last_ts).cast("double")
            if is_counter:
                # zero-crossing cap, extrapolate_rate.rs:247-253
                dur_zero = sampled * (first_val / result)
                dur_start = F.when(
                    (result > 0) & (first_val >= 0) & (dur_zero < dur_start), dur_zero
                ).otherwise(dur_start)
            thresh = avg_int * 1.1
            ext = (
                sampled
                + F.when(dur_start < thresh, dur_start).otherwise(avg_int / 2)
                + F.when(dur_end < thresh, dur_end).otherwise(avg_int / 2)
            )
            factor = ext / sampled
            if is_rate:
                factor = factor / F.lit(rng / 1000.0)
            return F.when(n >= 2, result * factor)

        if fn in ("idelta", "irate"):
            ok = (n >= 2) & F.col("last_prev_x").isNotNull() & (
                F.col("last_prev_x") > F.col("__t") - F.lit(rng)
            )
            if fn == "idelta":
                return F.when(ok, last_val - F.col("last_prev_v"))
            raw = last_val - F.col("last_prev_v")
            adjusted = F.when(raw < 0, last_val).otherwise(raw)  # reset → counter restarted
            dt_s = (last_ts - F.col("last_prev_x")) / 1000.0
            return F.when(ok, adjusted / dt_s)

        if fn == "changes":
            return F.when(n >= 1, F.col("chg_last") - F.col("chg_first")).cast("double")
        if fn == "resets":
            return F.when(n >= 1, F.col("rst_last") - F.col("rst_first")).cast("double")
        if fn == "avg_over_time":
            return F.col("v_avg")
        if fn == "min_over_time":
            return F.col("v_min")
        if fn == "max_over_time":
            return F.col("v_max")
        if fn == "sum_over_time":
            return F.col("v_sum")
        if fn == "count_over_time":
            return n.cast("double")
        if fn == "last_over_time":
            return last_val
        if fn == "present_over_time":
            return F.lit(1.0)
        if fn == "stddev_over_time":
            return F.sqrt(F.col("v_varp"))
        if fn == "stdvar_over_time":
            return F.col("v_varp")
        if fn == "quantile_over_time":
            return F.col("v_quant")
        if fn in ("double_exponential_smoothing", "holt_winters"):
            sf_, tf_ = extra  # smoothing factor, trend factor
            # Prometheus double-exponential smoothing (functions.go
            # funcDoubleExponentialSmoothing): s0=v0, b=v1-v0, then for i>=1:
            # s1 = sf*v_i + (1-sf)*(s0+b); b = tf*(s1-s0) + (1-tf)*b.
            # Expressed as an array fold with a (s, b, idx, v0) accumulator.
            vals = F.transform(F.col("samples"), lambda s: s["value"])
            init = F.struct(
                F.lit(0.0).alias("s"), F.lit(0.0).alias("b"),
                F.lit(0).alias("idx"), F.lit(0.0).alias("v0"),
            )

            def step(acc, v):
                first = acc["idx"] == 0
                second = acc["idx"] == 1
                b_in = F.when(second, v - acc["v0"]).otherwise(acc["b"])
                s1 = F.lit(sf_) * v + (1 - F.lit(sf_)) * (acc["s"] + b_in)
                b_new = F.lit(tf_) * (s1 - acc["s"]) + (1 - F.lit(tf_)) * b_in
                return F.struct(
                    F.when(first, v).otherwise(s1).alias("s"),
                    F.when(first, F.lit(0.0)).otherwise(b_new).alias("b"),
                    (acc["idx"] + 1).alias("idx"),
                    F.when(first, v).otherwise(acc["v0"]).alias("v0"),
                )

            folded = F.aggregate(vals, init, step)
            return F.when(n >= 2, folded["s"])
        if fn in ("deriv", "predict_linear"):
            sx, sy, sxy, sxx = F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx")
            denom = n * sxx - sx * sx
            slope = (n * sxy - sx * sy) / denom
            if fn == "deriv":
                return F.when((n >= 2) & (denom != 0), slope)
            intercept = (sy - slope * sx) / n
            return F.when((n >= 2) & (denom != 0), intercept + slope * F.lit(float(extra)))
        raise ValueError(f"unhandled range fn {fn}")

    # -- aggregation operators ----------------------------------------------------

    def _aggregate(self, node: Aggregate, ctx: _Ctx) -> VectorResult:
        inner = self._eval(node.expr, ctx)
        if not isinstance(inner, VectorResult):
            raise ValueError("aggregate over non-vector")
        if node.by is not None:
            keep = [l for l in inner.labels if l in node.by]
        elif node.without is not None:
            keep = [l for l in inner.labels if l not in node.without]
        else:
            keep = []
        op = node.op
        if op in ("topk", "bottomk"):
            k = int(self._eval(node.param, ctx))
            order = F.desc("value") if op == "topk" else F.asc("value")
            w = Window.partitionBy("__t", *keep).orderBy(
                order, *[F.asc(l) for l in inner.labels]
            )
            out = (
                inner.df.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= k)
                .drop("__rk")
            )
            return VectorResult(out, inner.labels)  # topk keeps original labels
        if op == "count_values":
            label = str(self._eval(node.param, ctx))
            out = (
                inner.df.withColumn(label, F.col("value").cast("string"))
                .groupBy("__t", *keep, label)
                .agg(F.count(F.lit(1)).cast("double").alias("value"))
            )
            return VectorResult(out, keep + [label])
        agg = {
            "sum": F.sum("value"),
            "avg": F.avg("value"),
            "min": F.min("value"),
            "max": F.max("value"),
            "count": F.count(F.lit(1)).cast("double"),
            "stddev": F.expr("stddev_pop(value)"),
            "stdvar": F.expr("var_pop(value)"),
            "group": F.lit(1.0),
            "quantile": F.percentile("value", float(self._eval(node.param, ctx)))
            if node.param is not None else None,
        }.get(op)
        if agg is None:
            raise ValueError(f"unsupported aggregation {op}")
        out = inner.df.groupBy("__t", *keep).agg(agg.alias("value"))
        return VectorResult(out, keep)

    # -- function calls ---------------------------------------------------------

    _MATH_FNS = {
        "abs": F.abs, "ceil": F.ceil, "floor": F.floor, "exp": F.exp,
        "ln": F.log, "log2": F.log2, "log10": F.log10, "sqrt": F.sqrt,
        "sgn": F.signum,
    }

    def _call(self, node: Call, ctx: _Ctx):
        fn = node.func
        if fn in self._RANGE_FNS:
            if fn == "quantile_over_time":
                q = self._eval(node.args[0], ctx)
                return self._range_fn(fn, node.args[1], ctx, extra=q)
            if fn == "predict_linear":
                d = self._eval(node.args[1], ctx)
                return self._range_fn(fn, node.args[0], ctx, extra=d)
            if fn in ("double_exponential_smoothing", "holt_winters"):
                sf_ = self._eval(node.args[1], ctx)
                tf_ = self._eval(node.args[2], ctx)
                return self._range_fn(fn, node.args[0], ctx, extra=(float(sf_), float(tf_)))
            return self._range_fn(fn, node.args[0], ctx)
        if fn in self._MATH_FNS:
            v = self._eval(node.args[0], ctx)
            if isinstance(v, float):
                return float(getattr(math, {"ln": "log"}.get(fn, fn), lambda x: x)(v))
            out = v.df.withColumn(
                "value", self._MATH_FNS[fn](F.col("value")).cast("double")
            )
            return VectorResult(out, v.labels)
        if fn == "round":
            v = self._eval(node.args[0], ctx)
            to = self._eval(node.args[1], ctx) if len(node.args) > 1 else 1.0
            out = v.df.withColumn("value", F.round(F.col("value") / to) * to)
            return VectorResult(out, v.labels)
        if fn in ("clamp", "clamp_min", "clamp_max"):
            v = self._eval(node.args[0], ctx)
            c = F.col("value")
            if fn == "clamp":
                lo, hi = self._eval(node.args[1], ctx), self._eval(node.args[2], ctx)
                c = F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
            elif fn == "clamp_min":
                c = F.greatest(c, F.lit(self._eval(node.args[1], ctx)))
            else:
                c = F.least(c, F.lit(self._eval(node.args[1], ctx)))
            return VectorResult(v.df.withColumn("value", c), v.labels)
        if fn == "time":
            return VectorResult(
                self._grid(ctx).withColumn("value", F.col("__t") / 1000.0), []
            )
        if fn == "vector":
            s = self._eval(node.args[0], ctx)
            return self._scalar_to_vector(float(s), ctx)
        if fn == "scalar":
            v = self._eval(node.args[0], ctx)
            g = v.df.groupBy("__t").agg(
                F.count(F.lit(1)).alias("n"), F.first("value").alias("v")
            )
            grid = self._grid(ctx)
            out = grid.join(g, "__t", "left").select(
                "__t",
                F.when(F.col("n") == 1, F.col("v")).otherwise(float("nan")).alias("value"),
            )
            return VectorResult(out, [])
        if fn == "absent":
            v = self._eval(node.args[0], ctx)
            present = v.df.select("__t").distinct()
            out = self._grid(ctx).join(present, "__t", "left_anti").withColumn(
                "value", F.lit(1.0)
            )
            return VectorResult(out, [])
        if fn == "absent_over_time":
            sel = node.args[0]
            base, tags = self._metric_base(sel)
            ex = self._explode_steps(base, sel.range_ms, ctx)
            present = ex.select("__t").distinct()
            out = self._grid(ctx).join(present, "__t", "left_anti").withColumn(
                "value", F.lit(1.0)
            )
            return VectorResult(out, [])
        if fn == "label_replace":
            v = self._eval(node.args[0], ctx)
            dst, repl, src, regex = [self._eval(a, ctx) for a in node.args[1:5]]
            src_col = F.col(src) if src in v.labels else F.lit("")
            matched = src_col.rlike(f"^(?:{regex})$")
            replaced = F.regexp_replace(src_col, f"^(?:{regex})$", repl.replace("$", "$"))
            new = F.when(matched, replaced).otherwise(
                F.col(dst) if dst in v.labels else F.lit(None).cast("string")
            )
            labels = v.labels + ([dst] if dst not in v.labels else [])
            return VectorResult(v.df.withColumn(dst, new), labels)
        if fn == "label_join":
            v = self._eval(node.args[0], ctx)
            dst = self._eval(node.args[1], ctx)
            sep = self._eval(node.args[2], ctx)
            srcs = [self._eval(a, ctx) for a in node.args[3:]]
            new = F.concat_ws(sep, *[F.col(s) for s in srcs])
            labels = v.labels + ([dst] if dst not in v.labels else [])
            return VectorResult(v.df.withColumn(dst, new), labels)
        if fn in ("sort", "sort_desc"):
            return self._eval(node.args[0], ctx)  # ordering applied at output
        if fn == "histogram_quantile":
            q = self._eval(node.args[0], ctx)
            return self._histogram_quantile(float(q), self._eval(node.args[1], ctx))
        raise ValueError(f"unsupported function {fn}")

    def _histogram_quantile(self, q: float, v: VectorResult) -> VectorResult:
        """Classic le-bucket quantile (reference HistogramFold,
        src/promql/src/extension_plan/histogram_fold.rs:73): group buckets by
        (step, labels-minus-le), sort by le, linear-interpolate inside the
        target bucket."""
        if "le" not in v.labels:
            raise ValueError("histogram_quantile needs an 'le' label")
        keep = [l for l in v.labels if l != "le"]
        le_num = F.when(F.lower("le").isin("inf", "+inf"), F.lit(float("inf"))).otherwise(
            F.col("le").cast("double")
        )
        g = (
            v.df.withColumn("__le", le_num)
            .groupBy("__t", *keep)
            .agg(F.sort_array(F.collect_list(F.struct("__le", "value"))).alias("b"))
        )
        b = F.col("b")
        total = F.element_at(b, -1)["value"]
        rank = F.lit(q) * total
        # first bucket with cumulative count >= rank
        hit = F.filter(b, lambda s: s["value"] >= rank)
        bucket = F.element_at(hit, 1)
        below = F.filter(b, lambda s: s["value"] < rank)
        prev = F.element_at(below, -1)
        lower = F.when(F.size(below) > 0, prev["__le"]).otherwise(
            F.when(bucket["__le"] > 0, F.lit(0.0)).otherwise(bucket["__le"])
        )
        lower_count = F.when(F.size(below) > 0, prev["value"]).otherwise(F.lit(0.0))
        interp = lower + (bucket["__le"] - lower) * (rank - lower_count) / (
            bucket["value"] - lower_count
        )
        val = (
            F.when(total <= 0, F.lit(float("nan")))
            .when(F.isnull(bucket["__le"]), F.lit(float("nan")))
            .when(F.col("__inf_le").isNull(), F.lit(float("nan")))
            .when(bucket["__le"] == float("inf"), F.col("__max_finite_le"))
            .otherwise(interp)
        )
        out = (
            g.withColumn(
                "__inf_le",
                F.element_at(F.filter(b, lambda s: s["__le"] == float("inf")), 1)["__le"],
            )
            .withColumn(
                "__max_finite_le",
                F.element_at(F.filter(b, lambda s: s["__le"] != float("inf")), -1)["__le"],
            )
            .withColumn("value", val)
            .select("__t", *keep, "value")
        )
        return VectorResult(out, keep)

    # -- binary operators -----------------------------------------------------------

    _CMP = {"==": "==", "!=": "!=", ">": ">", "<": "<", ">=": ">=", "<=": "<="}

    def _binary(self, node: BinaryOp, ctx: _Ctx):
        lhs = self._eval(node.lhs, ctx)
        rhs = self._eval(node.rhs, ctx)
        op = node.op

        if isinstance(lhs, float) and isinstance(rhs, float):
            return self._fold_scalar(op, lhs, rhs)

        if isinstance(lhs, float) or isinstance(rhs, float):
            v, s, flipped = (rhs, lhs, True) if isinstance(lhs, float) else (lhs, rhs, False)
            c = F.col("value")
            sc = F.lit(s)
            a, b = (sc, c) if flipped else (c, sc)
            if op in self._CMP:
                cond = self._cmp_col(op, a, b)
                if node.bool_modifier:
                    out = v.df.withColumn("value", cond.cast("double"))
                else:
                    out = v.df.filter(cond)
                return VectorResult(out, v.labels)
            out = v.df.withColumn("value", self._arith_col(op, a, b))
            return VectorResult(out, v.labels)

        return self._vector_binary(node, lhs, rhs)

    @staticmethod
    def _fold_scalar(op: str, a: float, b: float) -> float:
        if op == "^":
            return a ** b
        if op == "%":
            return math.fmod(a, b)
        if op in ("+", "-", "*", "/"):
            try:
                return {"+": a + b, "-": a - b, "*": a * b, "/": a / b if b != 0 else math.inf * (1 if a > 0 else -1 if a < 0 else math.nan)}[op]
            except ZeroDivisionError:
                return math.nan
        return float({"==": a == b, "!=": a != b, ">": a > b, "<": a < b, ">=": a >= b, "<=": a <= b}[op])

    @staticmethod
    def _cmp_col(op: str, a: Column, b: Column) -> Column:
        return {
            "==": a == b, "!=": a != b, ">": a > b,
            "<": a < b, ">=": a >= b, "<=": a <= b,
        }[op]

    @staticmethod
    def _arith_col(op: str, a: Column, b: Column) -> Column:
        if op == "^":
            return F.pow(a, b)
        if op == "%":
            return a % b  # Java fmod == Go math.Mod (Prometheus semantics)
        return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[op]

    def _vector_binary(self, node: BinaryOp, lhs: VectorResult, rhs: VectorResult):
        op = node.op
        m = node.matching or VectorMatching()
        if m.on is not None:
            match_labels = [l for l in m.on]
        else:
            common = set(lhs.labels) & set(rhs.labels)
            if m.ignoring:
                common -= set(m.ignoring)
            match_labels = sorted(common)

        l = lhs.df.select("__t", *lhs.labels, F.col("value").alias("__lv"))
        r = rhs.df.select("__t", *rhs.labels, F.col("value").alias("__rv"))

        if op in ("and", "unless"):
            keys = ["__t", *match_labels]
            how = "left_semi" if op == "and" else "left_anti"
            out = lhs.df.join(r.select(*keys).distinct(), keys, how)
            return VectorResult(out, lhs.labels)
        if op == "or":
            keys = ["__t", *match_labels]
            extra = r.join(l.select(*keys).distinct(), keys, "left_anti")
            rhs_as_lhs = extra.select(
                "__t",
                *[
                    (F.col(lab) if lab in rhs.labels else F.lit(None).cast("string")).alias(lab)
                    for lab in lhs.labels
                ],
                F.col("__rv").alias("value"),
            )
            out = lhs.df.select("__t", *lhs.labels, "value").unionByName(rhs_as_lhs)
            return VectorResult(out, lhs.labels)

        # arithmetic / comparison joins
        group_left = m.group_left is not None
        group_right = m.group_right is not None
        keys = ["__t", *match_labels]
        if group_left or group_right:
            many, one = (lhs, rhs) if group_left else (rhs, lhs)
            many_df = many.df.select("__t", *many.labels, F.col("value").alias("__mv"))
            extra = (m.group_left or m.group_right or [])
            one_cols = [c for c in extra if c in one.labels]
            one_df = one.df.select(keys + one_cols + [F.col("value").alias("__ov")])
            j = many_df.join(one_df, keys, "inner")
            a, b = (F.col("__mv"), F.col("__ov")) if group_left else (F.col("__ov"), F.col("__mv"))
            labels = many.labels + [c for c in one_cols if c not in many.labels]
        else:
            j = l.select(keys + [F.col("__lv")]).join(
                r.select(keys + [F.col("__rv")]), keys, "inner"
            )
            a, b = F.col("__lv"), F.col("__rv")
            labels = match_labels

        if op in self._CMP:
            cond = self._cmp_col(op, a, b)
            if node.bool_modifier:
                out = j.withColumn("value", cond.cast("double"))
            else:
                out = j.filter(cond).withColumn("value", a)
        else:
            out = j.withColumn("value", self._arith_col(op, a, b))
        return VectorResult(out.select("__t", *labels, "value"), labels)

    # -- misc -------------------------------------------------------------------

    def _grid(self, ctx: _Ctx) -> DataFrame:
        return self.spark.range(0, (ctx.end - ctx.start) // ctx.step + 1).select(
            (F.lit(ctx.start) + F.col("id") * ctx.step).alias("__t")
        )

    def _scalar_to_vector(self, s: float, ctx: _Ctx) -> VectorResult:
        return VectorResult(self._grid(ctx).withColumn("value", F.lit(s)), [])
